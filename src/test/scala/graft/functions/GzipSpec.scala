package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class GzipSpec extends SparkSpec {
  import spark.implicits._

  test("codec round-trip: decompress(compress(s)) == s (property, 100 samples)") {
    val gen = Gen.stringOf(Gen.frequency(8 -> Gen.asciiPrintableChar, 2 -> Gen.alphaNumChar))
    (0 until 100).foreach { i =>
      val s = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val bytes = s.getBytes("UTF-8")
      assert(GzipCodec.decompress(GzipCodec.compress(bytes)).sameElements(bytes))
    }
  }

  test("codec handles unicode and large payloads") {
    val payloads = Seq("", "héllo wörld ✓ 센서", "x" * 1000000,
      """{"value": 250, "status": "WARN", "temp": 45.5}""")
    payloads.foreach { s =>
      val rt = new String(GzipCodec.decompress(GzipCodec.compress(s.getBytes("UTF-8"))), "UTF-8")
      assert(rt == s)
    }
  }

  test("column round-trip through whole-stage codegen") {
    val df = Seq("a", "bb", "{\"k\": 1}", "é✓").toDF("s")
      .select(col("s"), gunzip_string(gzip_string(col("s"))).as("rt"))
    assert(df.filter(col("s") =!= col("rt")).count() == 0)
  }

  test("null input → null output (null-intolerant expressions)") {
    val df = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("i", "s")
      .select(gunzip_string(gzip_string(col("s"))).as("rt"))
    val rows = df.collect().map(r => Option(r.getString(0)))
    assert(rows.count(_.isEmpty) == 1 && rows.flatten.toSeq == Seq("x"))
  }

  test("corrupt gzip: failOnError=true aborts (reference policy), lenient mode yields null") {
    val corrupt = Seq(Array[Byte](1, 2, 3, 4)).toDF("b")
    intercept[Exception] { // ZipException locally, SparkException from tasks
      corrupt.select(gunzip(col("b"))).collect()
    }
    val lenient = corrupt.select(gunzip(col("b"), failOnError = false)).collect()
    assert(lenient.head.isNullAt(0))
  }

  test("maxBytes bounds the inflated size: strict throws, lenient nulls, under-limit unaffected") {
    // ~1000:1 ratio payload: 8 MiB of zeros gzips to ~8 KiB — the shape of
    // a decompression bomb a 100 TB third-party corpus will contain
    val bomb = GzipCodec.compress(new Array[Byte](8 * 1024 * 1024))
    assert(bomb.length < 64 * 1024)
    // kernel level
    intercept[java.io.IOException] { GzipCodec.decompress(bomb, 1024L * 1024) }
    assert(GzipCodec.decompressOrNull(bomb, 1024L * 1024) == null)
    assert(GzipCodec.decompress(bomb, 16L * 1024 * 1024).length == 8 * 1024 * 1024)
    // column level, through a real scan so codegen carries the limit
    val dir = java.nio.file.Files.createTempDirectory("graft-gz-bomb").toString
    val small = GzipCodec.compress("ok".getBytes("UTF-8"))
    Seq(bomb, small).toDF("gz").write.mode("overwrite").parquet(dir)
    val scanned = spark.read.parquet(dir)
    intercept[Exception] { // SparkException from the failing task
      scanned.select(gunzip(col("gz"), maxBytes = 1024L * 1024)).collect()
    }
    val lenient = scanned
      .select(gunzip_string(col("gz"), failOnError = false, maxBytes = 1024L * 1024).as("rt"))
      .collect().map(r => Option(r.getString(0)))
    assert(lenient.toSet == Set(Some("ok"), None))
  }

  test("lenient gunzip inside WholeStageCodegen: corrupt → null, not NPE") {
    // LocalRelation inputs are folded by ConvertToLocalRelation and never
    // exercise codegen — round 1's lenient-mode codegen bug (isNull never
    // set from the null result) was invisible to the local-only test. A
    // parquet round-trip forces a real scan + generated projection.
    val dir = java.nio.file.Files.createTempDirectory("graft-gz-lenient").toString
    val good = GzipCodec.compress("ok".getBytes("UTF-8"))
    Seq(good, Array[Byte](1, 2, 3, 4)).toDF("gz").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(gunzip_string(col("gz"), failOnError = false).as("rt"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val rows = df.collect().map(r => Option(r.getString(0)))
    assert(rows.toSet == Set(Some("ok"), None))

    val binDf = spark.read.parquet(dir)
      .select(gunzip(col("gz"), failOnError = false).as("rt"))
    val binRows = binDf.collect().map(r => Option(r.get(0)))
    assert(binRows.count(_.isEmpty) == 1)
  }

  test("gunzip stays inside WholeStageCodegen (no fallback in the hot path)") {
    import spark.implicits._
    // pre-compress eagerly so EliminateGzipRoundTrip has nothing to fold —
    // this test is about the DEcompress expression's codegen
    val gzipped = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text")).as[String].collect()
      .map(t => graft.functions.GzipCodec.compress(t.getBytes("UTF-8")))
    // parquet round-trip: a real scan, so ConvertToLocalRelation can't
    // eagerly evaluate the projection away
    val dir = java.nio.file.Files.createTempDirectory("graft-gz").toString
    gzipped.toSeq.toDF("gz").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).select(gunzip_string(col("gz")).as("rt"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [gunzip_string("), plan)
    assert(df.count() == 500)
  }
}
