package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest equals the batch pipeline on the fixture") {
    val streamed = EventStreams.runToBatch(spark,
      CorpusStream.cleanIngest(CorpusStream.readDocuments(spark, sfDir)),
      "t_corpus_ingest", outputMode = "append")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    // compare at the contract level — the admitted (digest, n_tokens)
    // set; the surviving doc_id per digest is unspecified in batch.
    // (Set compare rather than exceptAll: ExceptAll over a Deduplicate
    // child trips an attribute-binding bug in the batch planner.)
    val batch = CorpusStream.cleanIngest(
      spark.read.parquet(s"$sfDir/documents.parquet"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("appendShards: per-batch dirs, exactly-once content, idempotent restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-append").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 60L),
      (2L, "a completely different document with the usual words in it too", "en", "s", 62L),
      (3L, "and one more fresh document that is long enough to pass the gate", "en", "s", 65L))
    rows.grouped(2).zipWithIndex.foreach { case (slice, i) =>
      slice.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$in/slice$i")
      new java.io.File(s"$in/slice$i").listFiles()
        .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    def stream() = spark.readStream.schema(CorpusStream.docSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/slice*")
    val q = CorpusStream.appendShards(CorpusStream.cleanIngest(stream()), out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val batchDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(batchDirs.length >= 2, s"expected one dir per micro-batch, got ${batchDirs.toSeq}")
    val written = spark.read.parquet(s"$out/batch=*").select("doc_id").as[Long].collect().sorted
    assert(written.toSeq == Seq(1L, 2L, 3L))
    // restart on the same checkpoint with no new input: nothing new written
    val before = new java.io.File(out).listFiles().map(_.getName).toSet
    val q2 = CorpusStream.appendShards(CorpusStream.cleanIngest(stream()), out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val after = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(after == before, s"restart wrote new batch dirs: ${after -- before}")
    val rewritten = spark.read.parquet(s"$out/batch=*").select("doc_id").as[Long].collect().sorted
    assert(rewritten.toSeq == Seq(1L, 2L, 3L))
  }

  test("indexDocsStream: streamed segments serve bit-equal to a batch index; replay idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft-idx-stream").toString
    val in = s"$base/in"; val idx = s"$base/idx"; val ckpt = s"$base/ckpt"
    val rows = Seq(
      (1L, "alpha beta alpha gamma delta words here", "en", "s", 39L),
      (2L, "beta beta gamma something else entirely", "en", "s", 39L),
      (3L, "alpha delta delta delta and a tail", "en", "s", 34L),
      (4L, "gamma alpha beta beta beta closing doc", "en", "s", 38L))
    rows.grouped(2).zipWithIndex.foreach { case (slice, i) =>
      slice.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$in/slice$i")
      new java.io.File(s"$in/slice$i").listFiles()
        .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val q = CorpusStream.indexDocsStream(
      spark.readStream.schema(CorpusStream.docSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/slice*"),
      "doc_id", "text", idx, ckpt)
    try q.processAllAvailable() finally q.stop()
    val segs = new java.io.File(s"$idx/postings").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(segs.length >= 2, s"expected one segment per micro-batch: ${segs.toSeq}")

    val queries = Seq(1 -> "alpha", 1 -> "delta", 2 -> "beta").toDF("query_id", "term")
    val batchIdx = s"$base/batchIdx"
    graft.operators.Retrieval.writeIndex(
      rows.toDF("doc_id", "text", "lang", "source", "n_chars"),
      "doc_id", "text", batchIdx)
    val servedStream = graft.operators.Retrieval
      .searchIndex(spark, idx, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    val servedBatch = graft.operators.Retrieval
      .searchIndex(spark, batchIdx, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(servedStream.nonEmpty)
    assert(servedStream == servedBatch)

    // replaying a segment (same id, same docs) changes nothing — the
    // overwrite recipe is what makes a crashed-and-replayed batch safe
    graft.operators.Retrieval.writeIndexSegment(
      rows.take(2).toDF("doc_id", "text", "lang", "source", "n_chars"),
      "doc_id", "text", idx, segment = segs.head)
    val replayed = graft.operators.Retrieval
      .searchIndex(spark, idx, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(replayed == servedStream)
    graft.CacheScope.releaseAll()
  }

  test("streaming semantic admission: near-dups of standing OR earlier-admitted vectors rejected") {
    val base = java.nio.file.Files.createTempDirectory("graft-emb-stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val standing = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val slice1 = Seq(
      (10L, Seq(0.999f, 0.001f, 0f, 0f)), // near-dup of standing 0 → rejected
      (11L, Seq(0f, 0f, 1f, 0f)))         // novel → admitted
    val slice2 = Seq(
      (12L, Seq(0f, 0.001f, 0.999f, 0f)), // near-dup of 11 (admitted batch 0) → rejected
      (13L, Seq(0f, 0f, 0f, 1f)))         // novel → admitted
    Seq(slice1, slice2).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("vec_id", "embedding")
        .coalesce(1).write.parquet(s"$in/slice$i")
      new java.io.File(s"$in/slice$i").listFiles()
        .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val streamIn = spark.readStream.schema(CorpusStream.embSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/slice*")
    val q = CorpusStream.admitEmbeddingsStream(streamIn, standing, out, ckpt,
      threshold = 0.99, nBits = 2, dim = 4)
    try q.processAllAvailable() finally q.stop()
    val admitted = spark.read.parquet(s"$out/batch=*")
      .select("vec_id").as[Long].collect().toSet
    assert(admitted == Set(11L, 13L), s"admitted: $admitted")
    // restart on the same checkpoint: no new input → nothing changes
    val q2 = CorpusStream.admitEmbeddingsStream(
      spark.readStream.schema(CorpusStream.embSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/slice*"),
      standing, out, ckpt, threshold = 0.99, nBits = 2, dim = 4)
    try q2.processAllAvailable() finally q2.stop()
    val again = spark.read.parquet(s"$out/batch=*")
      .select("vec_id").as[Long].collect().toSet
    assert(again == Set(11L, 13L), s"restart changed admissions: $again")
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

  test("streaming logit quality filter is bit-identical to the batch classifier") {
    val streamed = EventStreams.runToBatch(spark,
      CorpusStream.scoreQualityStream(CorpusStream.readDocuments(spark, sfDir)),
      "t_logit_stream", outputMode = "append")
      .select("doc_id", "score_p12").as[(Long, Long)].collect().toSet
    val batch = graft.operators.TextAnalysis.logitQuality(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
      .filter(col("keep"))
      .select("doc_id", "score_p12").as[(Long, Long)].collect().toSet
    assert(streamed.nonEmpty, "the fixture must have passing docs")
    assert(streamed == batch)
  }
}
