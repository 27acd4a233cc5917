package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Bucket-local qualifying-pair generators — the LSH scoring hot path.
 *
 * An LSH bucket of n members holds n·(n−1)/2 candidate pairs. The
 * composed formulation (double `posexplode` → filter i<j → score →
 * filter ≥ threshold) materializes every one of those intermediate pair
 * rows through the Generate operators, and for minhash each row copies
 * two full k-lane signatures (k=64 longs = 512 bytes per side) before
 * the score filter throws most of them away — at maxBucket=1000 that is
 * up to 500k row materializations and ~0.5 GB of signature copies per
 * degenerate bucket, per band (BENCH_r07's top CPU burner at 54% of the
 * whole suite).
 *
 * These [[Generator]]s collapse enumerate→score→filter into one
 * operator: `eval` is called ONCE per bucket, decodes the member array
 * to primitive JVM arrays once, walks the i<j triangle in a tight loop,
 * and emits ONLY the qualifying pairs (the output-sized set). Scoring
 * early-exits as soon as the remaining lanes cannot reach the
 * threshold — on dissimilar pairs (the common case by construction)
 * that is ~(1−τ)·k lanes instead of k. `CodegenFallback` is deliberate:
 * GenerateExec calls a non-codegen generator's `eval` once per input
 * row, so the per-bucket interpretation overhead is amortized over the
 * whole triangle — the inner loop is plain JVM code either way.
 *
 * Semantics are IDENTICAL to the composed form (DedupSpec's randomized
 * brute-force cross-checks cover both families): pairs are emitted as
 * (min(id), max(id)) with the same double-division estimate, and a pair
 * colliding in several bands is still emitted once per band (the
 * caller's `dropDuplicates`/distinct handles multiplicity exactly as
 * before).
 *
 * Ids are BIGINT by contract (every dedup surface keys on long
 * doc/asset ids; an integral id column upcasts for free at the struct
 * build — string ids would need the composed formulation). Signature
 * array types are accepted with any `containsNull` flag: frames built
 * with `array()` or read back from parquet mark elements nullable even
 * when no element is null, and an ACTUAL null lane still fails loud at
 * decode.
 */
private[graft] object PairGen {
  val hammingSchema: StructType = new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)
    .add("hamming", IntegerType, nullable = false)
}

/**
 * Shared per-bucket triangle enumeration: decode the member array once,
 * walk the i<j triangle lazily, emit only qualifying (min-id, max-id,
 * score) rows. Subclasses supply the payload decode and per-pair score
 * via [[scorer]] — returning null marks a non-qualifying pair (nothing
 * is materialized for it; the boxed score allocates only on the
 * output-sized qualifying set).
 */
private[graft] abstract class BucketPairGenerator
    extends UnaryExpression with Generator with CodegenFallback {

  /** Decode the bucket's payloads once; the returned function scores
    * member pair (i, j), null ⇒ not qualifying. */
  protected def scorer(arr: ArrayData, n: Int): (Int, Int) => Any

  override final def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) {
      ids(i) = arr.getStruct(i, 2).getLong(0)
      i += 1
    }
    val score = scorer(arr, n)
    new Iterator[InternalRow] {
      private var pi = 0
      private var pj = 0 // next pj to try is pj + 1
      private var nextRow: InternalRow = _

      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && pi < n - 1) {
          pj += 1
          if (pj >= n) { pi += 1; pj = pi + 1 }
          if (pi < n - 1 && pj < n) {
            val s = score(pi, pj)
            if (s != null) {
              val ia = ids(pi); val ib = ids(pj)
              nextRow = new GenericInternalRow(Array[Any](
                math.min(ia, ib), math.max(ia, ib), s))
            }
          }
        }
      }

      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; advance(); r
      }
    }
  }
}

/** hamming_qualifying_pairs(items, maxHamming):
  * array<struct<id: long, sh: long>> →
  * rows (id_a, id_b, hamming) for every unordered in-bucket pair with
  * bit_count(sh_a ^ sh_b) ≤ maxHamming. */
case class HammingQualifyingPairs(child: Expression, maxHamming: Int)
    extends BucketPairGenerator {

  override def elementSchema: StructType = PairGen.hammingSchema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
        s(0).dataType == LongType && s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<struct<id: long, sh: long>>, got $other")
  }

  override protected def scorer(arr: ArrayData, n: Int): (Int, Int) => Any = {
    val shs = new Array[Long](n)
    var i = 0
    while (i < n) {
      shs(i) = arr.getStruct(i, 2).getLong(1)
      i += 1
    }
    (i, j) => {
      val h = java.lang.Long.bitCount(shs(i) ^ shs(j))
      if (h <= maxHamming) Integer.valueOf(h) else null
    }
  }

  override def prettyName: String = "hamming_qualifying_pairs"
  override protected def withNewChildInternal(c: Expression): HammingQualifyingPairs =
    copy(child = c)
}

/** id_pairs(ids): array<long> → rows (id_a, id_b) — the lazy i<j
  * triangle over a bucket's member ids, (min, max)-oriented, no
  * scoring. The r19 minhash-candidate shape separates pair ENUMERATION
  * from pair SCORING: buckets aggregate bare ids (12-byte banded rows
  * instead of id+signature structs — the collect_list of 512-byte
  * signature payloads was the measured CPU burner at 5.2 of the 7
  * CPU-s of `dedup_minhash_keep`), the enumerated pairs are deduped
  * across bands, and only then are signatures attached by key join and
  * scored ONCE per distinct pair ([[TextHash.laneMatchCount]]). Lazy
  * iterator: an oversized-but-capped bucket's triangle never
  * materializes as a JVM array. */
case class IdPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<long>, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val ids = arr.toLongArray()
    (0 until n - 1).iterator.flatMap { i =>
      (i + 1 until n).iterator.map { j =>
        val a = ids(i); val b = ids(j)
        new GenericInternalRow(
          Array[Any](math.min(a, b), math.max(a, b)))
      }
    }
  }

  override def prettyName: String = "id_pairs"
  override protected def withNewChildInternal(c: Expression): IdPairs =
    copy(child = c)
}
