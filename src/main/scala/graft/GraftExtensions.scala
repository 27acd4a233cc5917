package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/**
 * SQL surface for graft's custom expressions, registered through the
 * standard `SparkSessionExtensions` hook:
 *
 * {{{
 *   SparkSession.builder()
 *     .withExtensions(new GraftExtensions)          // or
 *     .config("spark.sql.extensions", "graft.GraftExtensions")
 * }}}
 *
 * After registration every kernel is available to pure-SQL users:
 * `SELECT gunzip_string(trace_data)`, `minhash_text(text, 3, 64, 42)`,
 * `cosine_similarity(a, b)`, … — same codegen'd expressions the
 * DataFrame API builds, no UDF indirection.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  private val registry: Seq[(String, FunctionBuilder)] = Seq(
    "gzip" -> { args => GzipCompress(args.head) },
    "gzip_string" -> { args => GzipCompressString(args.head) },
    // gunzip(bytes[, maxBytes]) / gunzip_string(bytes[, maxBytes])
    "gunzip" -> { args =>
      GzipDecompress(args.head,
        maxBytes = if (args.length > 1) longArg(args(1), "maxBytes") else Long.MaxValue)
    },
    "gunzip_string" -> { args =>
      GzipDecompressToString(args.head,
        maxBytes = if (args.length > 1) longArg(args(1), "maxBytes") else Long.MaxValue)
    },
    "cosine_similarity" -> { args => CosineSimilarity(args(0), args(1)) },
    "dot_product" -> { args => DotProduct(args(0), args(1)) },
    "l2_distance" -> { args => L2Distance(args(0), args(1)) },
    "argmin_l2" -> { args => ArgminL2(args(0), args(1)) },
    "min_l2" -> { args => MinL2(args(0), args(1)) },
    "argmax_dot" -> { args => ArgmaxDot(args(0), args(1)) },
    "hyperplane_bucket" -> { args => HyperplaneBucket(args(0), args(1)) },
    "centroid_residual" -> { args => CentroidResidual(args(0), args(1), args(2)) },
    "doc_fingerprint" -> { args => DocFingerprint(args.head) },
    "simhash_text" -> { args => SimHashText(args.head) },
    // minhash_text(text[, w, k, seed])
    "minhash_text" -> { args =>
      MinHashText(args.head,
        if (args.length > 1) intArg(args(1), "w") else 3,
        if (args.length > 2) intArg(args(2), "k") else 64,
        if (args.length > 3) longArg(args(3), "seed") else 42L)
    },
    // shingle_hash_set(text[, w])
    "shingle_hash_set" -> { args =>
      ShingleHashSet(args.head, if (args.length > 1) intArg(args(1), "w") else 3)
    },
    "sorted_intersect_size" -> { args => SortedIntersectSize(args(0), args(1)) },
    "lane_match_count" -> { args => LaneMatchCount(args(0), args(1)) })

  override def apply(ext: SparkSessionExtensions): Unit = {
    registry.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.EliminateGzipRoundTrip)
  }
}

object GraftExtensions {
  /** Register the same functions into an already-running session (the
    * builder-time hook is preferred; this serves shared sessions/REPLs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val ext = new GraftExtensions
    ext.registry.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.CatalystBridge.registerFunction(
        spark, FunctionIdentifier(name), ext.info(name), builder)
    }
  }
}
