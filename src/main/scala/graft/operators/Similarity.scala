package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, hyperplane_bucket, l2_distance}

/**
 * Similarity search over embedding columns (`array<float>`; SURVEY §2.3).
 *
 * Two paths:
 *  - [[bruteForceTopK]] — exact: broadcast the (small) query set against
 *    the corpus, score with the codegen'd cosine kernel, take top-k per
 *    query with the window-rank pattern. At 100 TB this is one corpus
 *    scan, no corpus shuffle (queries are broadcast), and the only
 *    exchange is the per-query top-k combine — the right baseline when
 *    the query set is bounded.
 *  - [[lshTopK]] — approximate: random-hyperplane LSH (sign of dot with
 *    `nBits` fixed pseudo-random planes → bucket id). Corpus is scored
 *    only within matching buckets (multi-probe = exact bucket here),
 *    cutting compared pairs by ~2^nBits while keeping recall high for
 *    near neighbors; re-ranking is exact cosine. The bucketing is
 *    deterministic (seeded planes), so results are reproducible.
 */
object Similarity {

  /** Deterministic pseudo-random unit-ish hyperplanes: plane p component i
    * derived from splitmix64(seed, p, i), mapped to [-1, 1). Generated as
    * a literal array — tiny (nBits × dim), shipped in the plan. */
  private def planes(nBits: Int, dim: Int, seed: Long): Array[Array[Float]] =
    Array.tabulate(nBits) { p =>
      Array.tabulate(dim) { i =>
        val h = graft.functions.TextHash.mix64(seed + p * 1000003L + i)
        ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }
    }

  /** Exact top-k cosine neighbors for each query row.
    * queries/corpus: (idCol, vecCol). Output: query_id, rank, neighbor_id,
    * score. Excludes self-matches when ids collide. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine_similarity(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hard-negative mining for contrastive/embedding-model training: for
    * each query vector, the k nearest corpus vectors carrying a DIFFERENT
    * label — close in embedding space but the wrong class, exactly the
    * negatives a contrastive objective wants. Same scan shape as
    * [[bruteForceTopK]] (corpus-side codegen'd cosine against a broadcast
    * query set) with the label inequality fused into the join condition,
    * so mismatched pairs are dropped before the window rank. At 100 TB
    * the corpus side swaps for the IVF/LSH candidate generators and the
    * re-rank stays identical — the label predicate composes unchanged. */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int = 10): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("query_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("neighbor_label"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          col("query_label") =!= col("neighbor_label"))
      .withColumn("score", cosine_similarity(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("neighbor_label"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH bucket id: sign bit per hyperplane, packed into a long. One
    * codegen'd kernel call per row — this is evaluated over the FULL
    * corpus, where an interpreted aggregate/zip_with HOF would pay the
    * per-row lambda tax on the scan that dominates at 100 TB. */
  private def bucketCol(
      vec: org.apache.spark.sql.Column,
      planesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hyperplane_bucket(vec, planesCol)

  /** Approximate top-k via random-hyperplane LSH bucketing + exact
    * re-rank inside the candidate buckets. Multi-probe: each query also
    * probes every bucket within hamming distance `probeRadius` of its own
    * (all ≤-probeRadius-bit flips — the standard recall lever that costs
    * probe fan-out on the tiny query side instead of more corpus
    * replication; probeRadius=0 probes only the query's own bucket). */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nBits: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      probeRadius: Int = 1): DataFrame = {
    val ps = planes(nBits, dim, seed)
    val planesCol = typedLit(ps.map(_.toSeq).toSeq)

    require(nBits <= 20, s"nBits too large for probe enumeration: $nBits")
    require(probeRadius >= 0, s"probeRadius must be non-negative: $probeRadius")
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("__b", bucketCol(col("qv"), planesCol))
    // probe every bucket within hamming distance `probeRadius` of the
    // query's own: all XOR masks of popcount ≤ probeRadius (sum of
    // C(nBits, r) probes — the full contract, not just single-bit flips)
    val flipMasks = (1L until (1L << nBits))
      .filter(m => java.lang.Long.bitCount(m) <= probeRadius)
    // Σ C(nBits, r) grows toward 2^nBits: an oversized radius would both
    // build a near-2^nBits-element literal array into the plan (driver
    // analysis blow-up before any job runs) and multiply every query row
    // by that factor — cap the enumeration where the approximation has
    // stopped being one
    require(flipMasks.length < 1024,
      s"probe enumeration too large: radius $probeRadius at $nBits bits = " +
        s"${flipMasks.length + 1} probes per query (cap 1024) — at that " +
        "breadth use bruteForceTopK or lower the radius")
    val probeCols = col("__b") +: flipMasks.map(m => col("__b").bitwiseXOR(lit(m)))
    val q = q0.withColumn("bucket", explode(array(probeCols: _*))).drop("__b")

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", bucketCol(col("cv"), planesCol))

    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine_similarity(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * IVF-flat approximate top-k: the other classic ANN scale path.
   *
   * Coarse quantizer: `nCells` k-means centroids trained on one bounded
   * hash-ordered sample ([[Clustering.kmeansCentroidsSampled]] — the
   * faiss train/add split; same single TakeOrdered corpus pass a naive
   * row pick would cost, but the cells track the density modes, which is
   * what makes nProbe/nCells an honest recall dial). Collecting the
   * centroids to the driver is bounded model state (nCells × dim
   * floats), not data — every IVF implementation ships its coarse
   * quantizer to all workers.
   *
   * Index side: each corpus vector is assigned to its L2-nearest cell —
   * one broadcast table scan with the codegen'd `argmin_l2` kernel, no
   * shuffle. Query side: each query probes its `nProbe` nearest cells;
   * exact cosine re-rank happens only inside probed cells, cutting
   * compared pairs by ~nCells/nProbe.
   */
  /** `carryCols`: extra corpus columns carried through the one index
    * scan into the output (e.g. a label for [[hardNegativesIvf]]) — the
    * alternative is a second corpus-sized scan just to re-join payload. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      trainSampleN: Int = 4096,
      carryCols: Seq[String] = Nil): DataFrame = {
    val cents = Clustering.kmeansCentroidsSampled(
      corpus, idCol, vecCol, nCells, iters = 5, sampleN = trainSampleN)
    val centsCol = typedLit(cents)

    // corpus side: one codegen'd argmin kernel call per row — no k-struct
    // allocation, no interpreter boundary on the scan that dominates
    val c = corpus.select(
        (Seq(col(idCol).as("neighbor_id"), col(vecCol).as("cv")) ++
          carryCols.map(col)): _*)
      .withColumn("cell", graft.functions.argmin_l2(col("cv"), centsCol))
    // query side: the shared probe enumeration (probeCells) — ties →
    // lowest cell idx, matching argmin_l2's tie-break
    val q = probeCells(queries, idCol, vecCol, cents, nProbe)

    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine_similarity(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select((Seq(col("query_id"), col("rank"), col("neighbor_id"),
        col("score")) ++ carryCols.map(col)): _*)
      .orderBy(col("query_id"), col("rank"))
  }

  /** The scale path for [[hardNegatives]]: IVF candidate generation with
    * an overfetch factor, then the label filter and exact re-rank on the
    * (tiny) candidate set. At 100 TB the brute-force different-label scan
    * is a full corpus pass per mining run; this probes `nProbe` cells and
    * pays the label filter on queries × k × overfetch rows instead. The
    * overfetch absorbs candidates lost to the label filter — with
    * `overfetch ≥ 1/(1 − max label share)` the expected qualifying pool
    * stays ≥ k. Recall is measured against the exact miner by the same
    * [[recallAtK]] telemetry as every other ANN family. */
  def hardNegativesIvf(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      overfetch: Int = 4): DataFrame = {
    require(overfetch >= 1, s"overfetch must be >= 1: $overfetch")
    // the label rides the IVF index scan via carryCols — no second
    // corpus pass to re-join payload; the query labels broadcast
    val labeled = ivfTopK(corpus, queries, idCol, vecCol,
        k = k * overfetch, nCells = nCells, nProbe = nProbe,
        carryCols = Seq(labelCol))
      .withColumnRenamed(labelCol, "neighbor_label")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(labelCol).as("query_label"))), "query_id")
      .filter(col("query_label") =!= col("neighbor_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    labeled
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("neighbor_label"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Shortfall telemetry for [[hardNegativesIvf]]: per query, how many
    * negatives the miner actually returned vs the k requested. The
    * overfetch-sufficiency condition in the miner's doc is about
    * EXPECTATION, not a guarantee — a query whose probed cells are
    * dominated by its own label can come back short with no signal
    * beyond recall. This makes an undersized overfetch directly
    * observable (and `hardneg_shortfall` oracles the fixture's
    * sufficiency as a constant-verdict row set). */
  def hardNegativesShortfall(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      overfetch: Int = 4): DataFrame = {
    val mined = hardNegativesIvf(corpus, queries, idCol, vecCol, labelCol,
      k, nCells, nProbe, overfetch)
    queries.select(col(idCol).as("query_id"))
      .join(mined.groupBy(col("query_id"))
        .agg(count(lit(1)).as("__n")), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("__n"), lit(0L)).as("n_returned"),
        (lit(k.toLong) - coalesce(col("__n"), lit(0L))).as("shortfall"),
        (coalesce(col("__n"), lit(0L)) === k).as("overfetch_sufficient"))
      .orderBy(col("query_id"))
  }

  /**
   * IVF-PQ — the composed production ANN index (Jégou et al., TPAMI'11
   * §V; the faiss `IndexIVFPQ` layout): a sample-trained coarse
   * quantizer assigns each vector to a cell, and the RESIDUAL (vector −
   * cell centroid) is product-quantized to m codes. The stored corpus is
   * (cell, m codes) — the same ~32× compression as flat PQ — while the
   * query probes only its `nProbe` nearest cells, pruning
   * ~nCells/nProbe of even that compressed scan. Search ranks by ADC
   * against the query residual per probed cell.
   *
   * All model state (cell centroids + codebooks) is bounded driver-side
   * data shipped as literals; the probe side (queries × nProbe rows,
   * with per-probe residuals) broadcasts; the corpus side is one scan
   * of codes with a codegen'd ADC expression and the per-query top-k
   * window as the only exchange.
   */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      codebookSize: Int = 16,
      trainSampleN: Int = 4096): DataFrame = {
    // trainSampleN > 0 (default): faiss-style train/add split — coarse
    // quantizer AND codebooks fit on one bounded hash-ordered sample,
    // driver-side; the corpus is touched once to draw the sample and
    // once to encode. 0 falls back to distributed k-means||+Lloyd, for
    // corpora that are themselves sample-sized.
    // one count serves both samplers (cells here, PQ below — withCell is
    // a 1:1 derivation of corpus, so the counts are equal by construction)
    val n = if (trainSampleN > 0) corpus.count() else -1L
    val cellCents =
      if (trainSampleN > 0)
        Clustering.kmeansCentroidsSampled(
          corpus, idCol, vecCol, nCells, iters = 5, sampleN = trainSampleN,
          knownN = n)
      else Clustering.kmeansCentroids(
        corpus, idCol, vecCol, nCells, iters = 3, init = "parallel")
    val dim = cellCents.head.length
    require(dim % m == 0, s"m ($m) must divide the vector dim ($dim)")
    val sub = dim / m
    val ccLit = typedLit(cellCents)

    def cellOf(vec: org.apache.spark.sql.Column) =
      Clustering.assignCol(vec, ccLit)
    // codegen'd on both sides: corpus-side it runs per corpus row (the
    // scan that dominates), query-side it's just the same kernel reused
    def residual(vec: org.apache.spark.sql.Column, cell: org.apache.spark.sql.Column) =
      graft.functions.centroid_residual(vec, ccLit, cell)

    // index: (vec_id, cell, codes) — residual PQ codebooks trained once.
    // Persisted (CacheScope): cell assignment + residual projection feed
    // BOTH codebook training and the final index materialization; without
    // the cache the corpus-wide assignment scan would run twice. The
    // cache is scoped to the query — the caller's harness releases it
    // after the consuming action. Train-once serve-many state lives in
    // the PARQUET index artifact (`AnnIndex`), not in this session cache.
    val withCell = graft.CacheScope.scoped(corpus
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .withColumn("cell", cellOf(col("v")))
      .withColumn("res", residual(col("v"), col("cell"))))
    val (codebooks, _) = Quantize.productQuantize(
      withCell, "vec_id", "res", m, codebookSize, iters = 3,
      trainSampleN = trainSampleN, knownN = n)
    val codes = (0 until m).map { j =>
      Clustering.assignCol(slice(col("res"), j * sub + 1, sub),
        typedLit(codebooks(j)))
    }
    val index = withCell.select(col("vec_id"), col("cell"), array(codes: _*).as("codes"))
    ivfPqServe(index, queries, idCol, vecCol, cellCents, codebooks, k, nProbe)
  }

  /**
   * ADC serving over a MATERIALIZED IVF-PQ index (`vec_id`, `cell`,
   * `codes`) — shared by [[ivfPqTopK]] (in-memory index) and
   * [[AnnIndex.searchIvfPq]] (index loaded from parquet: the
   * encode-once / serve-many production path). The corpus-sized side
   * streams codes only; queries broadcast with one residual per probed
   * cell; the per-query top-k window is the single exchange.
   */
  private[operators] def ivfPqServe(
      index: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cellCents: Seq[Seq[Float]],
      codebooks: Seq[Seq[Seq[Float]]],
      k: Int,
      nProbe: Int): DataFrame = {
    require(cellCents.nonEmpty && codebooks.nonEmpty, "empty IVF-PQ model")
    val q = ivfPqProbes(queries, idCol, vecCol, cellCents, nProbe)
    ivfPqServeProbed(index, q, codebooks, k)
  }

  /** The ONE query-side probe enumeration every IVF family shares: per
    * query, its `nProbe` nearest coarse cells by L2 (ties → lowest cell
    * idx, matching `argmin_l2`'s tie-break) — (`query_id`, `qv`,
    * `cell`), one row per probed cell. Interpreted HOFs are fine HERE:
    * this is the tiny broadcast side. */
  private[operators] def probeCells(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cellCents: Seq[Seq[Float]],
      nProbe: Int): DataFrame = {
    require(cellCents.nonEmpty, "empty IVF cell model")
    val nc = cellCents.length
    val ccLit = typedLit(cellCents)
    def bestCellsL2(vec: org.apache.spark.sql.Column) =
      sort_array(
        zip_with(ccLit, sequence(lit(0), lit(nc - 1)),
          (cent, idx) => struct(l2_distance(vec, cent).as("d"), idx.cast("int").as("i"))),
        asc = true)
    queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell",
        explode(transform(slice(bestCellsL2(col("qv")), 1, math.min(nProbe, nc)),
          s => s.getField("i"))))
  }

  /** Query-side probe stage of [[ivfPqServe]]: [[probeCells]] plus one
    * residual per probed cell — (`query_id`, `cell`, `qres`). Exposed
    * separately so the durable path ([[AnnIndex.searchIvfPq]]) can
    * collect the (bounded, ≤ nCells) probed-cell set and PRUNE the codes
    * scan's partitions before the join — the in-memory path composes the
    * two stages unchanged. */
  private[operators] def ivfPqProbes(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cellCents: Seq[Seq[Float]],
      nProbe: Int): DataFrame = {
    val ccLit = typedLit(cellCents)
    probeCells(queries, idCol, vecCol, cellCents, nProbe)
      .withColumn("qres", graft.functions.centroid_residual(col("qv"), ccLit, col("cell")))
      .select(col("query_id"), col("cell"), col("qres"))
  }

  /** ADC scoring + per-query top-k over an already-probed query side
    * (`query_id`, `cell`, `qres` from [[ivfPqProbes]]). */
  private[operators] def ivfPqServeProbed(
      index: DataFrame,
      q: DataFrame,
      codebooks: Seq[Seq[Seq[Float]]],
      k: Int): DataFrame = {
    require(codebooks.nonEmpty, "empty PQ codebook model")
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val dist = (0 until m).map { j =>
      val cb = typedLit(codebooks(j))
      val d = graft.functions.l2_distance(
        slice(col("qres"), j * sub + 1, sub),
        element_at(cb, element_at(col("codes"), j + 1) + 1))
      d * d
    }.reduce(_ + _)
    val scored = index.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("approx_dist", dist)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist").asc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("approx_dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * Recall@k telemetry: per query, how many of the EXACT top-k neighbors
   * the approximate index recovered — the acceptance metric for tuning
   * nBits/probeRadius/nCells/nProbe, registered as a first-class query
   * surface (the analog of the reference's external-engine artifact
   * checks, README.md:123-128: the engine itself reports the number a
   * user would otherwise have to join by hand).
   *
   * Scale shape: both inputs are per-query top-k results (queries × k
   * rows — bounded, nothing corpus-sized), so the semi-join and count
   * are trivial; the cost is producing the two inputs, which is the
   * point of the measurement.
   *
   * @param approx (query_id, neighbor_id, …) from an ANN method
   * @param exact  (query_id, neighbor_id, …) from [[bruteForceTopK]]
   * @return (query_id, hits, k_exact, recall) ordered by query_id
   */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    // ONE consumption of `exact`: k_exact and hits fold into a single
    // aggregate over a left join, so the brute-force-top-k subtree
    // appears once in the plan. The previous two-consumer shape
    // (separate k_exact aggregate + semi-join) made Catalyst evaluate
    // the full corpus×queries exact scan TWICE per recall query — at
    // 100 TB, recall telemetry would pay a second corpus pass per
    // measurement. dropDuplicates on the approx side keeps the count
    // at-most-once per exact row (top-k outputs are already unique per
    // (query, neighbor); this guards composed callers).
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val a = approx.select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("__hit", lit(1))
    e.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k_exact"), count(col("__hit")).as("hits"))
      .withColumn("recall", col("hits").cast("double") / col("k_exact"))
      .select(col("query_id"), col("hits"), col("k_exact"), col("recall"))
      .orderBy(col("query_id"))
  }

  /** Embedding near-duplicate pairs: all (a < b) pairs with cosine above
    * `threshold`, bucketed by LSH to avoid the full cross join. */
  def embeddingNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nBits: Int = 6,
      dim: Int = 64,
      seed: Long = 42L,
      maxBucket: Int = 100000): DataFrame = {
    val ps = planes(nBits, dim, seed)
    val planesCol = typedLit(ps.map(_.toSeq).toSeq)
    // scope-cached for the same three-consumer shape as semanticDedup
    // (bucket-size aggregate + both self-join sides)
    val v0 = graft.CacheScope.scoped(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
        .withColumn("bucket", bucketCol(col("v"), planesCol)))
    // skew/blowup guard: a degenerate bucket (e.g. all-zero vectors all
    // hashing to one code) would self-join to maxBucket² pairs; the
    // oversized-key set is tiny, so it broadcasts as an anti-join filter
    val big = v0.groupBy(col("bucket")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket).select(col("bucket"))
    val v = v0.join(broadcast(big), Seq("bucket"), "left_anti")
    val a = v.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val b = v.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", cosine_similarity(col("va"), col("vb")))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /**
   * Incremental embedding-space admission — the semantic analog of
   * [[Dedup.admitNewNearDup]]'s lexical band check: an incoming batch
   * row is admitted only if NO existing-corpus vector in its LSH bucket
   * matches at cosine ≥ `threshold`. This is the continuous-ingest
   * counterpart of [[semanticDedup]] (which dedups a static corpus):
   * the standing corpus publishes its bucketed vectors once; every new
   * batch buckets with the SAME seeded planes and checks only its
   * collisions. Recall is the LSH contract (a near-dup hashing to a
   * different bucket slips through — tune nBits down / re-run
   * semanticDedup periodically to catch stragglers).
   *
   * Scale shape: both sides bucket via the codegen'd kernel (one scan
   * each, no corpus shuffle); the incoming BATCH is the small side and
   * broadcasts, so the standing corpus is never repartitioned; the
   * final anti-join keys are batch-sized.
   *
   * @return the admitted subset of `incoming` (original schema)
   */
  def admitNewEmbeddings(
      incoming: DataFrame,
      existing: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nBits: Int = 8,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val ps = planes(nBits, dim, seed)
    val planesCol = typedLit(ps.map(_.toSeq).toSeq)
    val inc = incoming
      .select(col(idCol).as("__in_id"), col(vecCol).as("__in_v"))
      .withColumn("bucket", bucketCol(col("__in_v"), planesCol))
    val ex = existing.select(col(vecCol).as("__ex_v"))
      .withColumn("bucket", bucketCol(col("__ex_v"), planesCol))
    val rejected = ex.join(broadcast(inc), Seq("bucket"))
      .filter(cosine_similarity(col("__in_v"), col("__ex_v")) >= threshold)
      .select(col("__in_id")).distinct()
    incoming.join(broadcast(rejected),
      incoming(idCol) === rejected("__in_id"), "left_anti")
  }

  /**
   * Semantic deduplication (the SemDeDup recipe — Abbas et al., 2023,
   * arXiv:2303.09540: embedding-space duplicate pruning for web-scale
   * pretraining data): cluster the corpus with a SAMPLE-TRAINED k-means
   * quantizer, confine candidate pairs to clusters, keep one survivor
   * (min id) per cosine-connected group. Catches paraphrase-level
   * duplicates that no lexical (minhash/simhash) family can see.
   *
   * Scale shape: centroids are bounded driver-trained model state
   * ([[Clustering.kmeansCentroidsSampled]] — one TakeOrdered pass);
   * cluster assignment is one corpus scan with the codegen'd
   * `argmin_l2` kernel; the self-join is per-cluster, never global,
   * with the same oversized-bucket guard as
   * [[embeddingNearDupPairs]]; connected components run on the
   * candidate-PAIR graph, which is duplicate-sized, not corpus-sized.
   * At 100 TB: k scales with corpus size (clusters stay ~constant),
   * so the per-cluster quadratic term is bounded by design.
   *
   * @return the deduplicated corpus (survivors, original schema)
   */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 16,
      threshold: Double = 0.95,
      trainSampleN: Int = 4096,
      maxCluster: Int = 100000,
      maxIter: Int = 20): DataFrame = {
    val cents = Clustering.kmeansCentroidsSampled(
      corpus, idCol, vecCol, k, iters = 5, sampleN = trainSampleN)
    val cc = typedLit(cents)
    // scope-cache the corpus-wide assignment: it feeds the oversized-
    // cluster aggregate AND both aliased sides of the self-join (which
    // Catalyst cannot dedupe) — uncached, the argmin kernel scan would
    // execute three times per action (the ivfPqTopK precedent)
    val v0 = graft.CacheScope.scoped(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
        .withColumn("cl", graft.functions.argmin_l2(col("v"), cc)))
    val big = v0.groupBy(col("cl")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxCluster).select(col("cl"))
    val v = v0.join(broadcast(big), Seq("cl"), "left_anti")
    val a = v.select(col("cl"), col("id").as("id_a"), col("v").as("va"))
    val b = v.select(col("cl"), col("id").as("id_b"), col("v").as("vb"))
    val edges = a.join(b, Seq("cl"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine_similarity(col("va"), col("vb")) >= threshold)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val losers = Components.connectedComponents(edges, maxIter)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("__loser"))
    corpus.join(losers, corpus(idCol) === col("__loser"), "left_anti")
  }

  /**
   * Approximate top-k over a PQ-ENCODED corpus by asymmetric distance
   * (ADC — Jégou et al., TPAMI'11): queries keep full precision, the
   * corpus is only its m codes, and the distance is
   * Σ_j ‖q_subj − codebook_j[code_j]‖² — each term a codegen'd L2
   * against a centroid looked up from the broadcast codebook literal.
   *
   * Scale shape: the corpus side streams (vec_id, m ints) — the point
   * of PQ is that this is ~32× smaller than the vectors, so the scan
   * that dominates ANN serving reads codes, not floats. Queries
   * broadcast; the only exchange is the per-query top-k window.
   * Encode once with [[Quantize.productQuantize]], serve many.
   *
   * @param encoded (`vec_id`, `codes`) from [[Quantize.productQuantize]]
   * @return query_id, rank, neighbor_id, approx_dist (ascending L2²)
   */
  def pqTopK(
      encoded: DataFrame,
      queries: DataFrame,
      codebooks: Seq[Seq[Seq[Float]]],
      idCol: String,
      vecCol: String,
      k: Int = 10): DataFrame = {
    require(codebooks.nonEmpty, "empty codebooks")
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
    val dist = (0 until m).map { j =>
      val cb = typedLit(codebooks(j))
      val d = graft.functions.l2_distance(
        slice(col("qv"), j * sub + 1, sub),
        element_at(cb, element_at(col("codes"), j + 1) + 1))
      d * d
    }.reduce(_ + _)
    val scored = encoded.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("approx_dist", dist)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist").asc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("approx_dist"))
      .orderBy(col("query_id"), col("rank"))
  }
}
