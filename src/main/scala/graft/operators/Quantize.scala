package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding compression (SURVEY §2.3 extension surface): per-dimension
 * scalar quantization of an `array<float>` column to 8-bit codes — the
 * 4× storage/bandwidth reduction step an ANN index applies before
 * sharding vectors at 100 TB.
 *
 * code = floor((x - min_d) · 255 / (max_d - min_d)), clamped to 255 (the
 * max element itself can round either side of 255.0 in IEEE arithmetic).
 * Every operation is double-precision IEEE with a fixed evaluation
 * order, so a SQL engine replays it bit-for-bit — this operator is
 * deliberately the float counterexample to the "keep oracles
 * integer-exact" rule: float arithmetic IS reproducible across engines
 * when the expression tree is identical; only reduction ORDER (sums) is
 * not. Min/max are order-free reductions, which is why they are safe
 * where a mean would not be.
 *
 * Scale shape: one posexplode pass → per-dim min/max aggregate (dim-count
 * rows — model state), broadcast back onto the element stream; no
 * corpus shuffle beyond the (dim) aggregate's partial-combine exchange.
 */
object Quantize {

  /** @return (`vec_id`, `dim`, `q`) — one row per vector element. */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = df.select(col(idCol).as("vec_id"),
      posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("x"))
    val stats = e.groupBy(col("dim")).agg(
      min(col("x")).cast("double").as("mn"),
      max(col("x")).cast("double").as("mx"))
    e.join(broadcast(stats), "dim")
      .withColumn("q",
        when(col("mx") === col("mn"), lit(0L)) // degenerate constant dim
          .otherwise(least(
            floor(((col("x").cast("double") - col("mn")) * lit(255.0))
              / (col("mx") - col("mn"))),
            lit(255L))))
      .select(col("vec_id"), col("dim"), col("q"))
  }

  /**
   * Product quantization (Jégou, Douze, Schmid, "Product Quantization
   * for Nearest Neighbor Search", IEEE TPAMI 2011) — the vector
   * compression behind billion-scale ANN indexes: split each d-dim
   * vector into `m` subvectors, k-means each subspace to
   * `codebookSize` centroids, and store every vector as its m nearest
   * centroid indices. At d=64, m=8, 16 centroids that is 8 codes vs
   * 256 float bytes (32×); codebooks are m × codebookSize × d/m floats
   * of bounded driver-side model state (the same contract as the IVF
   * coarse quantizer and the k-means seeds).
   *
   * Subspace fits use k-means|| init ([[Clustering.kmeansCentroids]])
   * so training is O(m · iters) corpus passes; encoding is one pass
   * with the codegen'd per-subspace argmin (no shuffle, no UDF).
   *
   * @return (codebooks, encoded) — codebooks(j)(c) is subspace j's
   *         centroid c; encoded is (`vec_id`, `codes` array<int>)
   */
  def productQuantize(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      codebookSize: Int = 16,
      iters: Int = 3): (Seq[Seq[Seq[Float]]], DataFrame) = {
    require(m >= 1, s"m must be positive: $m")
    require(codebookSize >= 2, s"codebookSize must be >= 2: $codebookSize")
    val dim = df.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"m ($m) must divide the vector dim ($dim)")
    val sub = dim / m
    val codebooks: Seq[Seq[Seq[Float]]] = (0 until m).map { j =>
      Clustering.kmeansCentroids(
        df.select(col(idCol).as("id"),
          slice(col(vecCol), j * sub + 1, sub).as("v")),
        "id", "v", codebookSize, iters, init = "parallel")
    }
    val codes = (0 until m).map { j =>
      Clustering.assignCol(
        slice(col(vecCol), j * sub + 1, sub),
        typedLit(codebooks(j)), codebooks(j).length)
    }
    val encoded = df.select(col(idCol).cast("long").as("vec_id"),
      array(codes: _*).as("codes"))
    (codebooks, encoded)
  }
}
