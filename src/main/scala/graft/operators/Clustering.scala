package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{argmin_l2, l2_distance, min_l2}

/**
 * Embedding clustering (SURVEY §2.3 extension surface): deterministic
 * Lloyd's k-means over an `array<float>` column — the semantic-grouping
 * primitive behind embedding-based corpus curation (topic balancing,
 * semantic dedup at the cluster level, diversity sampling).
 *
 * Scale shape per iteration: centroids are a broadcast literal (k × dim
 * doubles — model state, the same contract as the IVF coarse quantizer,
 * `Similarity.ivfTopK`); assignment is one corpus scan with the single
 * codegen'd `argmin_l2` kernel call per row (no corpus shuffle, no
 * per-row allocation); the update step shuffles only (cluster, dim)
 * partial sums — map-side combine keeps the exchange at
 * k × dim × partitions rows. Driver-side state is k × dim means per
 * iteration, never data.
 *
 * Determinism: the default k-means|| seeding derives its "randomness"
 * from per-(id, round) hashes; the opt-in farthest-first traversal
 * (k-center init) starts from a content-independent anchor (the row
 * with the smallest `mix64(id)`), each subsequent seed the point
 * farthest from the chosen set with an id tie-break — deterministic,
 * and unlike a pure random pick it cannot drop two seeds into one
 * well-separated cluster (the classic Lloyd's local optimum that
 * splits a group and merges two others), at the cost of one corpus
 * pass PER SEED — which is why it is not the default.
 * Centroid means sum doubles in partition order, so a point EXACTLY
 * equidistant to two evolving centroids could in principle flip with
 * summation order; real-valued embeddings make that a measure-zero
 * edge, and the spec pins recovery of well-separated clusters.
 */
object Clustering {

  /** Argmin cluster index by L2 distance; ties take the lowest index.
    * (Shared with [[Quantize.productQuantize]]'s per-subspace encoder.)
    * One codegen'd kernel call per row — this column is evaluated over
    * the FULL corpus every Lloyd iteration and in every PQ/IVF encode,
    * so an interpreted zip_with/sort_array here (which additionally
    * sorts k structs where argmin is a linear scan) would put the
    * round-1-measured ~35× HOF interpreter tax on the dominant scan. */
  private[operators] def assignCol(vec: Column, centsCol: Column): Column =
    argmin_l2(vec, centsCol)

  /**
   * k-means|| seeding (Bahmani, Moseley, Vattani, Kumar, Vassilvitskii,
   * "Scalable K-Means++", VLDB'12) — the initialization for LARGE k.
   * Farthest-first (the default init below) runs one full corpus scan
   * per seed: k = 10,000 topic clusters over 100 TB would mean 10,000
   * passes. k-means|| instead takes a FIXED number of passes: each round
   * every point volunteers as a candidate independently with probability
   * min(1, l·d²(x,C)/cost(C)) — decided by a deterministic per-(id,
   * round) hash, so the "randomness" is reproducible — which lands ≈ l
   * new candidates per round near mass the current set covers badly.
   * The ≈ l·rounds candidates are then weighted by how many points they
   * win and reduced to k seeds ON THE DRIVER by greedy weighted
   * k-means++ (argmax of weight·d² instead of sampling: deterministic,
   * and fine at candidate cardinality). Driver state is candidates +
   * weights — bounded model state, never data.
   *
   * @return up to k seed centroids (fewer if the input has fewer
   *         distinct points than k)
   */
  def kmeansParInit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rounds: Int = 4,
      oversample: Int = 0,
      seed: Long = 42L): Seq[Seq[Float]] = {
    require(k >= 1, s"k must be positive: $k")
    require(rounds >= 1, s"rounds must be positive: $rounds")
    val l = if (oversample > 0) oversample else math.max(2 * k, 2)
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")).persist()
    try {
      val anchor = v.orderBy(xxhash64(col("id")).asc, col("id").asc)
        .limit(1).collect()
      require(anchor.nonEmpty, "input is empty — nothing to cluster")
      var cands: Vector[Seq[Float]] = Vector(anchor.head.getSeq[Float](1))
      var round = 1
      var covered = false
      while (round <= rounds && !covered) {
        val cc = typedLit(cands)
        val withD = v.withColumn("__dmin", min_l2(col("v"), cc))
          .withColumn("__d2", col("__dmin") * col("__dmin"))
        val cost = withD.agg(sum(col("__d2"))).collect().head.getDouble(0)
        if (cost <= 0.0) covered = true // every point coincides with a candidate
        else {
          // u ~ U[0,1) from a per-(id, round, seed) hash; admit iff
          // u·cost < l·d² ⟺ u < min(1, l·d²/cost)
          val u01 = pmod(xxhash64(col("id"), lit(round), lit(seed)), lit(1L << 32))
            .cast("double") / lit((1L << 32).toDouble)
          val picked = withD.filter(u01 * lit(cost) < lit(l.toDouble) * col("__d2"))
            .select(col("v")).collect().map(_.getSeq[Float](0))
          cands = (cands ++ picked).distinct
        }
        round += 1
      }
      // weight candidates by the points they win, then reduce driver-side
      val cc = typedLit(cands)
      val wts = v.withColumn("ci", assignCol(col("v"), cc))
        .groupBy(col("ci")).agg(count(lit(1)).as("n")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      def d2(a: Seq[Float], b: Seq[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
        s
      }
      // canonical order makes every argmax tie-break deterministic
      val canon = cands.zipWithIndex
        .map { case (c, i) => (c, wts.getOrElse(i, 0L) max 1L) }
        .sortBy { case (c, w) => (-w, c.mkString(",")) }
      var seeds = Vector(canon.head._1)
      var stuck = false
      while (seeds.length < math.min(k, canon.length) && !stuck) {
        val (best, score) = canon.map { case (c, w) =>
          (c, w.toDouble * seeds.iterator.map(s => d2(c, s)).min)
        }.maxBy(_._2)
        if (score <= 0.0) stuck = true // remaining candidates coincide with seeds
        else seeds = seeds :+ best
      }
      seeds
    } finally v.unpersist()
  }

  /** Driver-side Lloyd over an in-memory point set: farthest-first
    * seeding from the first point, then `iters` assign/mean rounds —
    * deterministic (fixed iteration order, double accumulation). Used on
    * HASH-ORDERED SAMPLES a few thousand points long, where a Spark job
    * per iteration would be pure scheduling overhead. */
  private[operators] def lloydOnPoints(
      pts: Array[IndexedSeq[Float]],
      k: Int,
      iters: Int): Seq[Seq[Float]] = {
    require(pts.nonEmpty, "empty sample — nothing to cluster")
    def d2(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }
    var cents = Vector(pts.head)
    while (cents.length < k) {
      // argmax distance-to-seed-set; ties (incl. fewer distinct points
      // than k → duplicate centroids) take the first, which is harmless:
      // argmin assignment ties to the lower index, duplicates sit empty
      cents = cents :+ pts.maxBy(p => cents.iterator.map(c => d2(p, c)).min)
    }
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length)(new Array[Double](pts.head.length))
      val counts = new Array[Long](cents.length)
      pts.foreach { p =>
        var best = 0; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < cents.length) {
          val d = d2(p, cents(c)); if (d < bestD) { bestD = d; best = c }; c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old // empty cluster keeps its centroid
        else sums(c).map(s => (s / counts(c)).toFloat).toIndexedSeq
      }
    }
    cents.map(_.toSeq)
  }

  /** One deterministic hash-ordered sample of `sampleN` vectors — the
    * shared sampling contract of every sampled trainer here (content-
    * independent, reproducible, one TakeOrdered pass, no full shuffle). */
  /** The deterministic hash-ordered training sample: the `sampleN`
    * corpus vectors with the smallest (xxhash64(id), id) keys —
    * content-independent, identical on any cluster layout.
    *
    * Scale shape: a bare TakeOrdered would keep a top-`sampleN` heap
    * PER PARTITION and ship partitions × sampleN vectors to the driver
    * — at 1000 executors × 4096 × 256-dim floats that is gigabytes of
    * driver merge for a parameter-sized sample. Instead, one count
    * sizes a hash THRESHOLD expected to pass ~4× sampleN rows, the
    * filter prunes map-side (rows never leave their partition), and
    * the TakeOrdered runs over the ~4·sampleN candidates. The result is
    * BIT-IDENTICAL to the bare TakeOrdered whenever the candidate set
    * covers the true top-sampleN (candidates ≥ sampleN guarantees it:
    * every candidate precedes every non-candidate in hash order); the
    * one-in-millions unlucky draw falls back to the unpruned pass, so
    * the sample is the same deterministic function of the data either
    * way — QuantizeSpec/ClusteringSpec and the `ann_train_recovery`
    * oracle pin exactly that. */
  private[operators] def hashSample(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      sampleN: Int,
      knownN: Long = -1L): Array[IndexedSeq[Float]] = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    // `knownN` lets a caller that already counted the frame (or a 1:1
    // derivation of it) skip this scan — an IVF-PQ build samples twice
    // (coarse cells, then PQ residuals of the SAME rows) and would
    // otherwise pay two full counts per build
    val n = if (knownN >= 0L) knownN else v.count()
    def takeOrdered(in: DataFrame): Array[IndexedSeq[Float]] =
      in.orderBy(xxhash64(col("id")).asc, col("id").asc)
        .limit(sampleN)
        .select(col("v")).collect()
        .map(_.getSeq[Float](0).toIndexedSeq)
    if (n <= 4L * sampleN) return takeOrdered(v)
    // threshold t with E[#{hash < t}] = 4·sampleN: hashes are ~uniform
    // in [Long.Min, Long.Max], so t = Long.Min + 2⁶⁴ · (4·sampleN / n),
    // computed in Double (exactness is irrelevant — only coverage is,
    // and the fallback guards the tail)
    val t = Long.MinValue + (math.pow(2.0, 64) * (4.0 * sampleN / n)).toLong
    val pruned = takeOrdered(v.filter(xxhash64(col("id")) < lit(t)))
    if (pruned.length >= math.min(sampleN, n).toInt) pruned
    else takeOrdered(v)
  }

  /**
   * Sample-trained centroids — the INDEX-TRAINING scale path. The full-
   * corpus [[kmeansCentroids]] is the right contract when the output IS
   * the clustering of every row (`embed_kmeans`); a quantizer (IVF
   * cells, PQ codebooks) only needs centroids representative of the
   * DISTRIBUTION, and at 100 TB nobody Lloyd-iterates the corpus for
   * that — production ANN indexes (the faiss train/add split) fit on a
   * bounded sample and touch the corpus exactly twice: once to draw the
   * sample, once to encode. This method is that contract: the
   * threshold-pruned hash draw ([[hashSample]] — deterministic,
   * content-independent, map-side pruned so the driver merge is
   * sample-sized, never partitions × sample), Lloyd runs on the driver
   * in microseconds, and the returned centroids ship back as a
   * broadcast literal.
   *
   * Driver state is sampleN × dim floats — bounded by the PARAMETER, not
   * the data, same contract as the collected codebooks themselves.
   */
  def kmeansCentroidsSampled(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 10,
      sampleN: Int = 4096,
      knownN: Long = -1L): Seq[Seq[Float]] = {
    require(k >= 1, s"k must be positive: $k")
    require(sampleN >= k, s"sampleN ($sampleN) must be >= k ($k)")
    lloydOnPoints(hashSample(df, idCol, vecCol, sampleN, knownN), k, iters)
  }

  /**
   * The Lloyd's fit alone — final centroids, no assignment pass. What
   * [[kmeans]] runs before assigning, and what
   * [[Quantize.productQuantize]] calls once per subspace (a PQ codebook
   * IS a set of k-means centroids; the assignment there is the encoder).
   *
   * @param init `"parallel"` (default — k-means|| above, O(rounds)
   *             corpus passes regardless of k: the only init that
   *             survives large k at scale) or `"farthest"`
   *             (farthest-first traversal — k corpus passes, best
   *             geometric spread at small k; opt-in)
   */
  def kmeansCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5,
      init: String = "parallel"): Seq[Seq[Float]] = {
    require(k >= 1, s"k must be positive: $k")
    require(iters >= 1, s"iters must be positive: $iters")
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    runLloyd(v, seedCentroids(v, k, init), iters, costs = null)
  }

  /** The seeding stage shared by [[kmeansCentroids]] and
    * [[kmeansWithCosts]]: k-means|| or farthest-first traversal (see
    * [[kmeansCentroids]]'s `init` doc). Expects the normalized
    * (`id`, `v`) projection. */
  private def seedCentroids(
      v: DataFrame, k: Int, init: String): Seq[Seq[Float]] = {
    require(init == "farthest" || init == "parallel", s"unknown init: $init")
    if (init == "parallel") kmeansParInit(v, "id", "v", k)
    else {
      // farthest-first seeding from a deterministic anchor (bounded model
      // state: one vector collected per seed)
      val anchor = v.orderBy(xxhash64(col("id")).asc, col("id").asc)
        .limit(1).collect()
      require(anchor.nonEmpty, "input is empty — nothing to cluster")
      var cs: Seq[Seq[Float]] = Seq(anchor.head.getSeq[Float](1))
      var exhausted = false
      while (cs.length < k && !exhausted) {
        val cc = typedLit(cs)
        val far = v
          .withColumn("__dmin", min_l2(col("v"), cc))
          .orderBy(col("__dmin").desc, col("id").asc)
          .limit(1).collect().head
        // no point is farther than 0 from the seed set ⇒ fewer distinct
        // points than k: stop (duplicate seeds would only make clusters
        // that can never win an assignment)
        if (far.getDouble(2) <= 0.0) exhausted = true
        else cs = cs :+ far.getSeq[Float](1)
      }
      cs
    }
  }

  /** The shared Lloyd loop: per round ONE corpus scan aggregates
    * (Σx, Σx², n) per (cluster, dim) — the Σx² term rides the same
    * exchange so the per-round cost J(assign_t, cents_{t+1}) =
    * Σ (Σx² − (Σx)²/n) is FREE telemetry (centroid = mean minimizes the
    * within-cluster quadratic, hence the closed form). When `costs` is
    * non-null it receives one entry per round; Lloyd's guarantees the
    * sequence is non-increasing (reassignment then re-centering each
    * only lower J), which [[graft.queries.ExtensionQueries]] exposes as
    * the driver-checkable `embed_kmeans_verdict`. */
  private def runLloyd(
      v: DataFrame,
      init: Seq[Seq[Float]],
      iters: Int,
      costs: scala.collection.mutable.Buffer[Double]): Seq[Seq[Float]] = {
    var cents = init
    for (_ <- 1 to iters) {
      val cc = typedLit(cents)
      val sums = v
        .withColumn("cluster", assignCol(col("v"), cc))
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("x").cast("double")).as("s"),
          sum(col("x").cast("double") * col("x").cast("double")).as("sq"),
          count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byCluster.get(ci) match {
          case Some(rows) =>
            val dims = rows.map(r => r.getInt(1) -> (r.getDouble(2) / r.getLong(4))).toMap
            old.indices.map(d => dims(d).toFloat)
          case None => old // empty cluster keeps its centroid
        }
      }
      if (costs != null) {
        costs += sums.map { r =>
          val s = r.getDouble(2); val sq = r.getDouble(3); val n = r.getLong(4)
          sq - (s * s) / n
        }.sum
      }
    }
    cents
  }

  /**
   * [[kmeans]] plus its per-iteration cost curve — the convergence
   * telemetry a clustering job monitors: J_t = J(assign_t, cents_{t+1}),
   * read off the SAME per-round aggregate the centroid update uses
   * (no extra corpus pass). Lloyd's invariant: J_1 ≥ J_2 ≥ … — the
   * property the `embed_kmeans_verdict` / `embed_kmeans_par_verdict`
   * pair oracles, one per seeding strategy (the invariant holds for ANY
   * init, which is what makes it the right driver-checkable contract
   * for both).
   *
   * @param init see [[kmeansCentroids]]
   * @return (per-iteration costs, final (`id`, `cluster`, `dist`) frame)
   */
  def kmeansWithCosts(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5,
      init: String = "parallel"): (Seq[Double], DataFrame) = {
    require(k >= 1, s"k must be positive: $k")
    require(iters >= 1, s"iters must be positive: $iters")
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val cents0 = seedCentroids(v, k, init)
    val costs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val cents = runLloyd(v, cents0, iters, costs)
    val cc = typedLit(cents)
    val assigned = v.withColumn("cluster", assignCol(col("v"), cc).cast("long"))
      .withColumn("dist", l2_distance(col("v"), element_at(cc, col("cluster").cast("int") + 1)))
      .select(col("id"), col("cluster"), col("dist"))
    (costs.toSeq, assigned)
  }

  /**
   * @param init see [[kmeansCentroids]]
   * @return (`id`, `cluster`, `dist`) — final assignment and distance to
   *         the final centroid.
   */
  def kmeans(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5,
      init: String = "parallel"): DataFrame = {
    val cents = kmeansCentroids(df, idCol, vecCol, k, iters, init)
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val cc = typedLit(cents)
    v.withColumn("cluster", assignCol(col("v"), cc).cast("long"))
      .withColumn("dist", l2_distance(col("v"), element_at(cc, col("cluster").cast("int") + 1)))
      .select(col("id"), col("cluster"), col("dist"))
  }
}
