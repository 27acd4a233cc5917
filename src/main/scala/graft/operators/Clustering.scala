package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.l2_distance

/**
 * Embedding clustering (SURVEY §2.3 extension surface): deterministic
 * Lloyd's k-means over an `array<float>` column — the semantic-grouping
 * primitive behind embedding-based corpus curation (topic balancing,
 * semantic dedup at the cluster level, diversity sampling).
 *
 * Scale shape per iteration: centroids are a broadcast literal (k × dim
 * doubles — model state, the same contract as the IVF coarse quantizer,
 * `Similarity.ivfTopK`); assignment is one corpus scan with the
 * codegen'd `l2_distance` kernel evaluated k times per row (no corpus
 * shuffle); the update step shuffles only (cluster, dim) partial sums —
 * map-side combine keeps the exchange at k × dim × partitions rows.
 * Driver-side state is k × dim means per iteration, never data.
 *
 * Determinism: seeding is farthest-first traversal (k-center init) from
 * a content-independent anchor (the row with the smallest `mix64(id)`),
 * each subsequent seed the point farthest from the chosen set with an
 * id tie-break — deterministic, and unlike a pure random pick it cannot
 * drop two seeds into one well-separated cluster (the classic Lloyd's
 * local optimum that splits a group and merges two others). Costs k-1
 * extra TakeOrdered scans at init; k-means|| replaces it at extreme k.
 * Centroid means sum doubles in partition order, so a point EXACTLY
 * equidistant to two evolving centroids could in principle flip with
 * summation order; real-valued embeddings make that a measure-zero
 * edge, and the spec pins recovery of well-separated clusters.
 */
object Clustering {

  /** Argmin cluster index by L2 distance; ties take the lowest index. */
  private def assignCol(vec: Column, centsCol: Column, k: Int): Column =
    element_at(
      sort_array(
        zip_with(centsCol, sequence(lit(0), lit(k - 1)),
          (cent, idx) => struct(l2_distance(vec, cent).as("d"), idx.cast("int").as("i"))),
        asc = true), 1).getField("i")

  /**
   * @return (`id`, `cluster`, `dist`) — final assignment and distance to
   *         the final centroid.
   */
  def kmeans(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(iters >= 1, s"iters must be positive: $iters")
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))

    // farthest-first seeding from a deterministic anchor (bounded model
    // state: one vector collected per seed)
    val anchor = v.orderBy(xxhash64(col("id")).asc, col("id").asc)
      .limit(1).collect()
    require(anchor.nonEmpty, "input is empty — nothing to cluster")
    var cents: Seq[Seq[Float]] = Seq(anchor.head.getSeq[Float](1))
    var exhausted = false
    while (cents.length < k && !exhausted) {
      val cc = typedLit(cents)
      val far = v
        .withColumn("__dmin",
          array_min(transform(cc, c => l2_distance(col("v"), c))))
        .orderBy(col("__dmin").desc, col("id").asc)
        .limit(1).collect().head
      // no point is farther than 0 from the seed set ⇒ fewer distinct
      // points than k: stop (duplicate seeds would only make clusters
      // that can never win an assignment)
      if (far.getDouble(2) <= 0.0) exhausted = true
      else cents = cents :+ far.getSeq[Float](1)
    }
    val kk = cents.length

    for (_ <- 1 to iters) {
      val cc = typedLit(cents)
      val sums = v
        .withColumn("cluster", assignCol(col("v"), cc, kk))
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byCluster.get(ci) match {
          case Some(rows) =>
            val dims = rows.map(r => r.getInt(1) -> (r.getDouble(2) / r.getLong(3))).toMap
            old.indices.map(d => dims(d).toFloat)
          case None => old // empty cluster keeps its centroid
        }
      }
    }

    val cc = typedLit(cents)
    v.withColumn("cluster", assignCol(col("v"), cc, kk).cast("long"))
      .withColumn("dist", l2_distance(col("v"), element_at(cc, col("cluster").cast("int") + 1)))
      .select(col("id"), col("cluster"), col("dist"))
  }
}
