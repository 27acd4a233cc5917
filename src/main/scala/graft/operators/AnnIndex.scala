package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Durable ANN index artifacts — the encode-once / serve-many contract
 * (SURVEY §2.3 similarity-search family; the faiss write_index /
 * read_index analog re-expressed as parquet):
 *
 *  - `<dir>/codes/`  — the corpus-sized payload: (`vec_id`, `cell`,
 *    `codes` array<int>), ~(8 + m) bytes per vector instead of dim × 4.
 *    This is what a 1000-executor serving job scans, with cell as a
 *    pushdown-friendly column.
 *  - `<dir>/model/`  — bounded model state as rows (`kind`, `i`, `j`,
 *    `vec`): coarse cells (kind = "cell") and per-subspace codebooks
 *    (kind = "codebook", i = subspace, j = centroid). Collected at load
 *    time — nCells × dim + m × codebookSize × (dim/m) floats, a
 *    parameter-sized read, never data.
 *
 * Build trains with the sampled quantizers (2 corpus passes — see
 * [[Clustering.kmeansCentroidsSampled]]) and writes both artifacts;
 * search loads the model, broadcasts the queries, and runs the same ADC
 * plan as the in-memory [[Similarity.ivfPqTopK]] (shared
 * `Similarity.ivfPqServe`), so AnnIndexSpec can pin bit-for-bit parity
 * between the two.
 */
object AnnIndex {

  /** The deterministic training half of [[writeIvfPq]]: sampled coarse
    * cells + sampled PQ codebooks, plus the scope-cached cell-assigned
    * residual frame training and encoding share. Training is a pure
    * function of (corpus content, params) — the sample is hash-ordered
    * and Lloyd runs on the driver — so a re-fit with the same params
    * recovers bit-identical model state from the corpus alone: the
    * faiss-style train/add split's recovery guarantee, driver-gated by
    * the `ann_train_recovery` row. */
  private[graft] def trainIvfPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      m: Int,
      codebookSize: Int,
      trainSampleN: Int)
      : (Seq[Seq[Float]], Seq[Seq[Seq[Float]]], DataFrame) = {
    // ONE count per build: both samplers (coarse cells over `corpus`,
    // PQ over the 1:1-derived `withCell`) need the row count to size
    // their hash-prune threshold, and the frames have identical counts
    val n = corpus.count()
    val cellCents = Clustering.kmeansCentroidsSampled(
      corpus, idCol, vecCol, nCells, iters = 5, sampleN = trainSampleN,
      knownN = n)
    val dim = cellCents.head.length
    require(dim % m == 0, s"m ($m) must divide the vector dim ($dim)")
    val ccLit = typedLit(cellCents)

    // scope-cached: productQuantize's training-sample collect and the
    // codes write both consume this corpus-wide assignment+residual
    // scan — uncached it would execute twice (the ivfPqTopK precedent)
    val withCell = graft.CacheScope.scoped(corpus
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .withColumn("cell", Clustering.assignCol(col("v"), ccLit))
      .withColumn("res", graft.functions.centroid_residual(col("v"), ccLit, col("cell"))))
    val (codebooks, _) = Quantize.productQuantize(
      withCell, "vec_id", "res", m, codebookSize, iters = 3,
      trainSampleN = trainSampleN, knownN = n)
    (cellCents, codebooks, withCell)
  }

  /**
   * Keyed DELETE on a durable ANN artifact (PQ or flat) — the takedown
   * operation, completing the story across all three durable indexes
   * ([[graft.sources.v2.ShardDelete]] for the corpus table,
   * [[Retrieval.deleteDocsFromIndex]] for BM25): publishes a committed
   * [[KeyTombstones]] segment of `vec_id`s that [[searchIvfPq]]/
   * [[searchIvf]] anti-join out of the codes/vectors scan and
   * [[occupancyDrift]] out of its stored histogram — a deleted vector
   * stops serving immediately, exactly as faiss `remove_ids` (the
   * quantizer model keeps its training, the payload rows go).
   * Materialization is the artifact's EXISTING maintenance pass: the
   * periodic [[writeIvfPq]]/[[writeIvf]] rebuild IS this index's
   * compaction, and a rebuild clears the tombstones (it indexes exactly
   * what the caller passes). Re-using a deleted vec_id before a rebuild
   * is undefined, same contract as the BM25 tombstones.
   */
  def deleteVecs(spark: SparkSession, dir: String, vecIds: DataFrame): Unit =
    KeyTombstones.publish(spark, dir, vecIds, "vec_id")

  /** Train an IVF-PQ index over `corpus` and persist it under `dir`. */
  def writeIvfPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nCells: Int = 16,
      m: Int = 8,
      codebookSize: Int = 16,
      trainSampleN: Int = 4096): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // a rebuild indexes exactly what the caller passes: stale takedown
    // tombstones must not suppress deliberately re-ingested vectors
    KeyTombstones.clear(new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf()), dir)
    val (cellCents, codebooks, withCell) =
      trainIvfPq(corpus, idCol, vecCol, nCells, m, codebookSize, trainSampleN)
    val sub = cellCents.head.length / m
    // partitionBy("cell"): the serve path filters on the probed cell set,
    // so cell as a DIRECTORY partition turns that filter into file-listing
    // pruning — a 1000-executor serving job reads nProbe/nCells of the
    // codes, not all of them (the r9 verdict's #1 gap). nCells is bounded
    // (10²–10⁴ directories), well inside the partitioned-layout
    // cardinality contract (Scale.writePartitioned). The repartition
    // clusters by cell FIRST: a dynamic-partition write otherwise opens
    // input_partitions × nCells parquet writers (the ×10 scale probe
    // measured the writer-init cost growing 32× for 10× rows), and a
    // serve then lists that many small files per probed cell.
    encodeWithModel(withCell, codebooks, sub)
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/codes")

    val modelRows =
      cellCents.zipWithIndex.map { case (v, i) => ("cell", i, 0, v) } ++
        codebooks.zipWithIndex.flatMap { case (book, j) =>
          book.zipWithIndex.map { case (v, c) => ("codebook", j, c, v) }
        }
    modelRows.toDF("kind", "i", "j", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
  }

  /** PQ-encode a cell-assigned frame (`vec_id`, `cell`, `res`) into the
    * codes layout (`vec_id`, `codes`, `cell`) — the ONE encoder both the
    * initial build and [[appendIvfPq]] share, so appended codes cannot
    * drift from built ones on the same frozen model. */
  private def encodeWithModel(
      withCell: DataFrame, codebooks: Seq[Seq[Seq[Float]]], sub: Int): DataFrame = {
    val m = codebooks.length
    val codes = (0 until m).map { j =>
      Clustering.assignCol(slice(col("res"), j * sub + 1, sub), typedLit(codebooks(j)))
    }
    withCell.select(col("vec_id"), array(codes: _*).as("codes"), col("cell"))
  }

  /** Assign + residual against a FROZEN cell model — shared by
    * [[appendIvfPq]] and [[occupancyDrift]]'s batch side. */
  private def assignFrozen(
      batch: DataFrame, idCol: String, vecCol: String,
      cells: Seq[Seq[Float]]): DataFrame = {
    val ccLit = typedLit(cells)
    batch
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .withColumn("cell", Clustering.assignCol(col("v"), ccLit))
      .withColumn("res", graft.functions.centroid_residual(col("v"), ccLit, col("cell")))
  }

  /**
   * Incremental admission: encode `batch` against the FROZEN model under
   * `dir` (no retrain — identical cells/codebooks ⇒ identical codes as a
   * full rebuild over base ∪ batch would produce for these vectors) and
   * append it as new files under the same cell partitioning. The nightly
   * 100 TB operating mode: ingest appends touch only the new batch, the
   * serve path picks the new codes up through the same partition-pruned
   * scan, and [[occupancyDrift]] tells the operator when accumulated
   * distribution shift justifies a retrain+rebuild.
   *
   * Small-file pressure: each append lands ≤ one file per (cell ×
   * batch partition), so file count grows with append cadence × nCells
   * — bounded per night, but a quarter of nightly appends should end in
   * a rebuild ([[writeIvfPq]] overwrite), which IS the artifact's
   * compaction; the drift gate usually forces one sooner anyway.
   */
  def appendIvfPq(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String): Unit = {
    val (cells, books) = loadModel(spark, dir)
    val dim = cells.head.length
    val sub = dim / books.length
    encodeWithModel(assignFrozen(batch, idCol, vecCol, cells), books, sub)
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("append").parquet(s"$dir/codes")
  }

  /**
   * Cell-occupancy drift between the index's stored codes and a candidate
   * batch: total-variation distance between the two cell-frequency
   * distributions, the retrain signal for [[appendIvfPq]]. Both sides are
   * nCells-sized aggregates (one scan each, codes/vectors never leave the
   * executors); TV ∈ [0, 1], 0 = identical occupancy. A batch drawn from
   * the training distribution lands near 0; a shifted source concentrates
   * mass in few cells and pushes TV toward 1 — the registered
   * `ann_append_drift` verdict gates both polarities.
   */
  def occupancyDrift(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    // cells-only load + artifact sniff: the drift signal works the same
    // over a PQ index (codes) and a flat index (vectors) — both store a
    // cell column and a cells-only model suffices for batch assignment
    val cells = loadCellsOnly(spark, dir)
    val codesPath = new org.apache.hadoop.fs.Path(s"$dir/codes")
    val fs = codesPath.getFileSystem(spark.sessionState.newHadoopConf())
    val stored = if (fs.exists(codesPath)) "codes" else "vectors"
    // tombstoned vectors are no longer part of the standing index's
    // occupancy — drift must compare against what actually serves
    val base = KeyTombstones.minus(spark, fs, dir,
        graft.sources.ParquetSchemaCache.read(spark, s"$dir/$stored"), "vec_id")
      .groupBy(col("cell")).agg(count(lit(1)).as("__nb"))
    val b = assignFrozen(batch, idCol, vecCol, cells)
      .groupBy(col("cell")).agg(count(lit(1)).as("__nn"))
    // TV = ½ Σ_cells |p_base − p_batch|; both histograms are nCells rows,
    // so the join/aggregate below is model-sized, not data-sized.
    // An EMPTY side would make its total 0, every normalized term
    // 0/0 → NULL, and the fold would return NULL — a silent non-answer
    // the caller reads as "no drift". The guard lives INSIDE the
    // tv_distance expression (when/raise_error): a select-then-drop
    // assert_true column is pruned whole by CollapseProject and never
    // executes (verified against this Spark build).
    base.join(b, Seq("cell"), "full")
      .agg(
        sum(coalesce(col("__nb"), lit(0L))).as("__tb"),
        sum(coalesce(col("__nn"), lit(0L))).as("__tn"),
        collect_list(struct(coalesce(col("__nb"), lit(0L)).as("nb"),
          coalesce(col("__nn"), lit(0L)).as("nn"))).as("__h"))
      .select(
        when(col("__tb") > 0 && col("__tn") > 0,
          aggregate(col("__h"), lit(0.0d),
            (acc, x) => acc
              + abs(x.getField("nb").cast("double") / col("__tb")
                - x.getField("nn").cast("double") / col("__tn")))
            .multiply(0.5))
          .otherwise(raise_error(
            lit("occupancyDrift: empty index or empty batch")))
          .as("tv_distance"))
  }

  /**
   * Durable IVF-FLAT index: coarse cells + RAW vectors partitioned by
   * cell — the exact-rerank sibling of the PQ artifact for
   * recall-critical serving (PQ trades recall for ~(8+m)-byte rows; flat
   * keeps exact cosine inside the probed cells at dim×4 bytes/vector).
   * Same serve contract as [[searchIvfPq]]: load the parameter-sized
   * model, collect the bounded probed-cell set, prune the vectors scan's
   * partitions, rank inside the probed cells only.
   */
  def writeIvf(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nCells: Int = 16,
      trainSampleN: Int = 4096): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    KeyTombstones.clear(new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf()), dir)
    val cells = Clustering.kmeansCentroidsSampled(
      corpus, idCol, vecCol, nCells, iters = 5, sampleN = trainSampleN)
    corpus.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .withColumn("cell", Clustering.assignCol(col("v"), typedLit(cells)))
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/vectors")
    cells.zipWithIndex.map { case (v, i) => ("cell", i, 0, v) }
      .toDF("kind", "i", "j", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
  }

  /** Incremental admission for the FLAT artifact: assign the batch
    * against the FROZEN cells and append it as new files under the same
    * cell partitioning (the [[appendIvfPq]] contract without the PQ
    * encode — raw vectors carry no model state to drift). */
  def appendIvf(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String): Unit = {
    val cells = loadCellsOnly(spark, dir)
    batch.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .withColumn("cell", Clustering.assignCol(col("v"), typedLit(cells)))
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("append").parquet(s"$dir/vectors")
  }

  /** Serve top-k from a persisted IVF-flat index: exact cosine over the
    * probed cells' vectors only — partition-pruned like [[searchIvfPq]],
    * and bit-equal to the in-memory [[Similarity.ivfTopK]] under the
    * same parameters (identical deterministic training ⇒ identical
    * cells ⇒ identical probes and scores). */
  def searchIvf(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = loadCellsOnly(spark, dir)
    val q = graft.CacheScope.scoped(
      Similarity.probeCells(queries, idCol, vecCol, cells, nProbe))
    val probed = q.select(col("cell")).distinct().collect().map(_.getInt(0))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val vectors = KeyTombstones.minus(spark, fs, dir,
      graft.sources.ParquetSchemaCache.read(spark, s"$dir/vectors")
        .filter(col("cell").isin(probed.map(Int.box): _*)), "vec_id")
    val scored = vectors.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("score", graft.functions.cosine_similarity(col("qv"), col("v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Load a cells-only model (the IVF-flat artifact — [[loadModel]]
    * demands codebooks too and is the PQ artifact's loader). */
  private def loadCellsOnly(spark: SparkSession, dir: String): Seq[Seq[Float]] = {
    val rows = graft.sources.ParquetSchemaCache.read(spark, s"$dir/model")
      .filter(col("kind") === "cell")
      .select(col("i"), col("vec")).collect()
    val cells = rows.sortBy(_.getInt(0))
      .map(_.getSeq[Float](1).toIndexedSeq: Seq[Float]).toSeq
    require(cells.nonEmpty, s"no IVF cell model under $dir/model")
    cells
  }

  /** Load the bounded model state written by [[writeIvfPq]]. */
  def loadModel(spark: SparkSession, dir: String): (Seq[Seq[Float]], Seq[Seq[Seq[Float]]]) = {
    val rows = graft.sources.ParquetSchemaCache.read(spark, s"$dir/model")
      .select(col("kind"), col("i"), col("j"), col("vec")).collect()
    val cells = rows.filter(_.getString(0) == "cell")
      .sortBy(_.getInt(1)).map(_.getSeq[Float](3).toIndexedSeq: Seq[Float]).toSeq
    val books = rows.filter(_.getString(0) == "codebook")
      .groupBy(_.getInt(1)).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getInt(2)).map(_.getSeq[Float](3).toIndexedSeq: Seq[Float]).toSeq
      }
    require(cells.nonEmpty && books.nonEmpty, s"no IVF-PQ model under $dir/model")
    (cells, books)
  }

  /** Serve top-k from a persisted index: scan codes, never vectors — and
    * only the PROBED cells' codes. The probed-cell set is bounded by the
    * model (≤ nCells distinct ints however many queries arrive), so
    * collecting it is a parameter-sized action; pushing it as an
    * `isin` filter on the partition column prunes the codes scan to
    * ≤ nProbe·|queries| directories at file-listing time — the IVF
    * contract (touch nProbe/nCells of the corpus) holds on the durable
    * path, not just in memory (AnnIndexSpec asserts selectedPartitions). */
  def searchIvfPq(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nProbe: Int = 4): DataFrame = {
    val (cells, books) = loadModel(spark, dir)
    // scope-cached: the probe side feeds both the probed-cell collect and
    // the serve join — uncached, the query-side assignment would run twice
    val q = graft.CacheScope.scoped(
      Similarity.ivfPqProbes(queries, idCol, vecCol, cells, nProbe))
    val probed = q.select(col("cell")).distinct().collect().map(_.getInt(0))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val index = KeyTombstones.minus(spark, fs, dir,
      graft.sources.ParquetSchemaCache.read(spark, s"$dir/codes")
        .filter(col("cell").isin(probed.map(Int.box): _*)), "vec_id")
    Similarity.ivfPqServeProbed(index, q, books, k)
  }
}
