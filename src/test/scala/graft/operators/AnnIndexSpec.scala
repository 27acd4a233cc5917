package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  test("write/load/search round-trip matches the in-memory IVF-PQ result exactly") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-index").toString

    AnnIndex.writeIvfPq(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, codebookSize = 16, trainSampleN = 512)
    val served = AnnIndex.searchIvfPq(spark, dir, queries, "vec_id", "embedding",
      k = 10, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSeq

    // the same training parameters in memory — identical deterministic
    // sampling + Lloyd ⇒ identical model ⇒ identical serving result
    val inMemory = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 10, nCells = 8, nProbe = 4, m = 8, codebookSize = 16, trainSampleN = 512)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSeq
    assert(served == inMemory, s"served != in-memory:\n$served\nvs\n$inMemory")

    // the model artifact is parameter-sized: 8 cells + 8×16 codebook rows
    val model = spark.read.parquet(s"$dir/model")
    assert(model.count() == 8 + 8 * 16)
    // codes artifact carries (8 + m) small columns, never the vectors
    val codesSchema = spark.read.parquet(s"$dir/codes").schema.fieldNames.toSet
    assert(codesSchema == Set("vec_id", "cell", "codes"))
  }

  test("loadModel reconstructs cells and codebooks in rank order") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 2f, 0f)),
      (1L, Seq(0f, 1f, 0f, 2f)),
      (2L, Seq(3f, 0f, 1f, 0f)),
      (3L, Seq(0f, 3f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-model").toString
    AnnIndex.writeIvfPq(emb, "vec_id", "embedding", dir,
      nCells = 2, m = 2, codebookSize = 2, trainSampleN = 4)
    val (cells, books) = AnnIndex.loadModel(spark, dir)
    assert(cells.length == 2 && cells.forall(_.length == 4))
    assert(books.length == 2 && books.forall(b => b.length == 2 && b.forall(_.length == 2)))
    // served result is well-formed on the tiny fixture
    val out = AnnIndex.searchIvfPq(spark, dir, emb.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 2, nProbe = 2).collect()
    assert(out.nonEmpty && out.forall(_.getLong(2) != 0L))
  }
}
