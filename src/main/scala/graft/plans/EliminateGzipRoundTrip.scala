package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{GzipCompress, GzipCompressString, GzipDecompress, GzipDecompressToString}

/**
 * Optimizer rule: eliminate gzip round-trips.
 *
 * When an ingest stage (W1: `gzip_string(payload)`) and an export stage
 * (T1/T2: `gunzip_string(traceData)`) compose adjacently in one plan,
 * the payload is compressed only to be immediately decompressed. The
 * rewrite `decompress(compress(x)) → x` is exact (any compressor output
 * decompresses to its input; error policy is irrelevant because the
 * inner compress always yields valid gzip), and removes both codec
 * passes from the hot path. (The flagship pipeline itself keeps gunzip
 * above its sort exchange deliberately — shuffling compressed bytes is
 * the better trade — so its pair is non-adjacent and stays.)
 *
 * The reverse direction (`compress(decompress(x)) → x`) is NOT applied:
 * gzip is not canonical — recompression may produce different (equally
 * valid) bytes, so that rewrite would change the output.
 *
 * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`).
 */
object EliminateGzipRoundTrip extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // only when the inflate is unbounded: a maxBytes-guarded decompress
      // can throw/null on oversized payloads, so eliminating it would
      // change semantics for exactly the rows the guard exists to catch
      case GzipDecompressToString(GzipCompressString(child), _, mb)
          if mb == Long.MaxValue => child
      case GzipDecompress(GzipCompress(child), _, mb)
          if mb == Long.MaxValue => child
    }
}
