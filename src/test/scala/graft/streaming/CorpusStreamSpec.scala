package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest equals the batch pipeline on the fixture") {
    val streamed = EventStreams.runToBatch(spark,
      CorpusStream.cleanIngest(CorpusStream.readDocuments(spark, sfDir)),
      "t_corpus_ingest", outputMode = "append")
      .collect().map(_.toSeq).toSet
    // set comparison rather than exceptAll: ExceptAll over a Deduplicate
    // child trips an attribute-binding bug in the batch planner
    val batch = CorpusStream.cleanIngest(
      spark.read.parquet(s"$sfDir/documents.parquet"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("cross-batch dedup: a duplicate arriving in a later micro-batch is rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus-stream").toString
    val slice1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 60L),
      (2L, "a completely different document with the usual words in it too", "en", "s", 62L))
    val slice2 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 60L), // dup of 1
      (4L, "and one more fresh document that is long enough to pass the gate", "en", "s", 65L))
    Seq(slice1, slice2).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$dir/slice$i")
      new java.io.File(s"$dir/slice$i").listFiles()
        .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val streamIn = spark.readStream
      .schema(CorpusStream.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/slice*")
    val admitted = EventStreams.runToBatch(spark,
      CorpusStream.cleanIngest(streamIn),
      "t_corpus_dedup", outputMode = "append")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted.contains(1L) && admitted.contains(2L) && admitted.contains(4L),
      s"fresh docs missing: $admitted")
    assert(!admitted.contains(3L), s"cross-batch duplicate admitted: $admitted")
  }
}
