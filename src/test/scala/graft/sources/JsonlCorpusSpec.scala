package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JsonlCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-jsonl-spec").toString

  test("readQuarantined: corrupt lines preserved verbatim, good lines typed, nobody dropped") {
    val dir = tmp()
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "a", "n_chars": 11}""",
      """{"doc_id": 2, "text": BROKEN""",                       // malformed
      """{"doc_id": 3, "text": "quoted \" brace } ok", "lang": "en", "source": "b", "n_chars": 20}""",
      """not json at all""",                                    // malformed
      "",                                                       // blank line
      "   ",                                                    // whitespace only
      "null")                              // JSON null literal: no record
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val in = JsonlCorpus.readQuarantined(spark, dir)
      .select("doc_id", "text", "line_ok", "_raw").collect()
    assert(in.length == lines.length, "a line was dropped or duplicated")
    val ok = in.filter(_.getAs[Boolean]("line_ok"))
    val bad = in.filterNot(_.getAs[Boolean]("line_ok"))
    assert(ok.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L))
    // escaping round-trips: the parsed text is the ORIGINAL string
    assert(ok.find(_.getAs[Long]("doc_id") == 3L).get
      .getAs[String]("text") == "quoted \" brace } ok")
    // the quarantine lane preserves raw bytes and parses nothing —
    // including blank / whitespace-only / `null`-literal lines, which
    // from_json parses to a NULL struct with a NULL corrupt column (the
    // struct-null guard catches what corrupt.isNull alone cannot)
    assert(bad.map(_.getAs[String]("_raw")).toSet ==
      Set(lines(1), lines(3), "", "   ", "null"))
    assert(bad.forall(r => r.isNullAt(r.fieldIndex("doc_id"))))
  }

  test("writeJsonl -> readQuarantined round trip: every row ok, content identical") {
    val dir = tmp()
    val docs = Tables.documents(spark, sfDir).limit(50)
    JsonlCorpus.writeJsonl(docs.select(
      col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")), dir)
    val back = JsonlCorpus.readQuarantined(spark, dir)
    // the corrupt-only projection MUST be queryable — the raw-json-scan
    // formulation throws QUERY_ONLY_CORRUPT_RECORD_COLUMN on exactly
    // this audit count, which is why the operator parses off a text scan
    assert(back.filter(!col("line_ok")).count() == 0, "round trip quarantined rows")
    val orig = docs.select(col("doc_id"), md5(col("text")).as("d"))
      .as[(Long, String)].collect().toMap
    val got = back.select(col("doc_id"), md5(col("text")).as("d"))
      .as[(Long, String)].collect().toMap
    assert(got == orig, "round-tripped text diverged")
  }

  test("gzip-compressed JSONL (.jsonl.gz) decompresses transparently through the same reader") {
    // raw LLM-corpus drops ship compressed; the text scan's Hadoop codec
    // chain must decompress by extension with quarantine intact
    val dir = tmp()
    val lines = Seq(
      """{"doc_id": 41, "text": "compressed ok", "lang": "en", "source": "gz", "n_chars": 13}""",
      """{"doc_id": 42, "broken""")
    val gz = java.nio.file.Paths.get(dir, "part-00000.jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val in = JsonlCorpus.readQuarantined(spark, dir)
      .select("doc_id", "text", "line_ok", "_raw").collect()
    assert(in.length == 2)
    val ok = in.filter(_.getAs[Boolean]("line_ok"))
    assert(ok.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq ==
      Seq((41L, "compressed ok")))
    assert(in.filterNot(_.getAs[Boolean]("line_ok"))
      .map(_.getAs[String]("_raw")).toSeq == Seq(lines(1)))
  }

  test("readQuarantinedStream: micro-batches quarantine malformed lines and match the batch reader") {
    val dir = tmp()
    def writeShard(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    writeShard("shard-0.jsonl", Seq(
      """{"doc_id": 1, "text": "first", "lang": "en", "source": "s", "n_chars": 5}""",
      """{"doc_id": 2, BROKEN"""))
    writeShard("shard-1.jsonl", Seq(
      """{"doc_id": 3, "text": "second", "lang": "en", "source": "s", "n_chars": 6}"""))
    val q = JsonlCorpus.readQuarantinedStream(spark, dir)
      .writeStream.format("memory").queryName("jsonl_quarantine")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("jsonl_quarantine")
      .select("doc_id", "text", "line_ok", "_raw").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)),
        r.getAs[Boolean]("line_ok"), Option(r.get(3)))).toSet
    // the malformed line quarantined (query still alive past it) and
    // the lanes are identical to the batch reader over the same files
    val batch = JsonlCorpus.readQuarantined(spark, dir)
      .select("doc_id", "text", "line_ok", "_raw").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)),
        r.getAs[Boolean]("line_ok"), Option(r.get(3)))).toSet
    assert(streamed == batch, s"stream/batch lanes diverged:\n$streamed\nvs\n$batch")
    assert(streamed.count(!_._3) == 1 && streamed.size == 3)
  }

  test("readQuarantined refuses a schema that already claims _raw") {
    val e = intercept[IllegalArgumentException] {
      JsonlCorpus.readQuarantined(spark, "/nonexistent",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("_raw",
            org.apache.spark.sql.types.StringType))))
    }
    assert(e.getMessage.contains("_raw"))
  }

  test("every reader-owned column name is rejected up front, not shadowed") {
    // line_ok would be silently OVERWRITTEN by the projection and value
    // would throw an ambiguous-reference reader error mid-plan — both
    // must instead fail the loud contract check before the path opens
    for (name <- Seq("line_ok", "value", "__graft_corrupt")) {
      val e = intercept[IllegalArgumentException] {
        JsonlCorpus.readQuarantined(spark, "/nonexistent",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(name,
              org.apache.spark.sql.types.StringType))))
      }
      assert(e.getMessage.contains(name), s"message must name the clash: $name")
    }
  }
}
