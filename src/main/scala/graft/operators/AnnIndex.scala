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
    val cellCents = Clustering.kmeansCentroidsSampled(
      corpus, idCol, vecCol, nCells, iters = 5, sampleN = trainSampleN)
    val dim = cellCents.head.length
    require(dim % m == 0, s"m ($m) must divide the vector dim ($dim)")
    val sub = dim / m
    val ccLit = typedLit(cellCents)

    // scope-cached: productQuantize's training-sample collect and the
    // codes write below both consume this corpus-wide assignment+residual
    // scan — uncached it would execute twice (the ivfPqTopK precedent)
    val withCell = graft.CacheScope.scoped(corpus
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .withColumn("cell", Clustering.assignCol(col("v"), ccLit))
      .withColumn("res", graft.functions.centroid_residual(col("v"), ccLit, col("cell"))))
    val (codebooks, _) = Quantize.productQuantize(
      withCell, "vec_id", "res", m, codebookSize, iters = 3,
      trainSampleN = trainSampleN)
    val codes = (0 until m).map { j =>
      Clustering.assignCol(slice(col("res"), j * sub + 1, sub), typedLit(codebooks(j)))
    }
    withCell.select(col("vec_id"), col("cell"), array(codes: _*).as("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")

    val modelRows =
      cellCents.zipWithIndex.map { case (v, i) => ("cell", i, 0, v) } ++
        codebooks.zipWithIndex.flatMap { case (book, j) =>
          book.zipWithIndex.map { case (v, c) => ("codebook", j, c, v) }
        }
    modelRows.toDF("kind", "i", "j", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
  }

  /** Load the bounded model state written by [[writeIvfPq]]. */
  def loadModel(spark: SparkSession, dir: String): (Seq[Seq[Float]], Seq[Seq[Seq[Float]]]) = {
    val rows = spark.read.parquet(s"$dir/model")
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

  /** Serve top-k from a persisted index: scan codes, never vectors. */
  def searchIvfPq(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nProbe: Int = 4): DataFrame = {
    val (cells, books) = loadModel(spark, dir)
    val index = spark.read.parquet(s"$dir/codes")
    Similarity.ivfPqServe(index, queries, idCol, vecCol, cells, books, k, nProbe)
  }
}
