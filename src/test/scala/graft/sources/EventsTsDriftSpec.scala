package graft.sources

import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The driver's `events.parquet` fixture has shipped `ts` under two
  * different parquet physical types across fixture generations:
  * TIMESTAMP(NANOS) (readable by Spark only as raw longs in legacy mode)
  * through round 5, TIMESTAMP(MICROS) since round 6. The round-6 regen
  * silently broke all 23 events-family queries because the reader assumed
  * the nanos shape. This spec pins the contract that [[Tables.events]]
  * normalizes EVERY generation to the same µs-precision TimestampNTZType
  * column, so a future regen can't repeat that failure class.
  */
class EventsTsDriftSpec extends SparkSpec {
  import spark.implicits._

  private val wall = LocalDateTime.of(2024, 3, 1, 12, 30, 45, 123456000)

  private def readEvents(dir: String) = Tables.events(spark, dir)

  private def writeFixture(rows: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-evts").toString
    rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("nanos-generation fixture (ts as raw INT64 nanos) normalizes to µs NTZ") {
    // Spark cannot WRITE parquet TIMESTAMP(NANOS); a plain INT64 column
    // named ts reads back as LongType — the exact schema shape the legacy
    // nanosAsLong reader produces for the real nanos fixture.
    val nanos = wall.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000000L + 123456789L
    val dir = writeFixture(Seq((1L, nanos, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val df = readEvents(dir)
    assert(df.schema("ts").dataType == TimestampNTZType)
    val got = df.select(col("ts").cast(StringType)).as[String].head()
    // ns truncate to µs: wall clock preserved to the microsecond
    assert(got.startsWith("2024-03-01 12:30:45"), s"wall clock drifted: $got")
  }

  test("micros-generation fixture (ts as TIMESTAMP_NTZ) passes through unchanged") {
    val dir = writeFixture(Seq((1L, wall, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val df = readEvents(dir)
    assert(df.schema("ts").dataType == TimestampNTZType)
    val got = df.select(col("ts").cast(StringType)).as[String].head()
    assert(got == "2024-03-01 12:30:45.123456", s"value changed in passthrough: $got")
  }

  test("LTZ-generation fixture (ts as TIMESTAMP with UTC adjust) keeps the wall clock") {
    val dir = writeFixture(Seq((1L, Timestamp.from(wall.toInstant(ZoneOffset.UTC)), 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val df = readEvents(dir)
    assert(df.schema("ts").dataType == TimestampNTZType)
    val got = df.select(col("ts").cast(StringType)).as[String].head()
    assert(got == "2024-03-01 12:30:45.123456", s"wall clock drifted through LTZ cast: $got")
  }

  test("a DATE-generation orders fixture normalizes to midnight NTZ") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ord").toString
    Seq((1L, 2L, "O", 10.5, java.sql.Date.valueOf("2024-03-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val df = Tables.orders(spark, dir)
    assert(df.schema("o_orderdate").dataType == TimestampNTZType)
    val got = df.select(col("o_orderdate").cast(StringType)).as[String].head()
    assert(got == "2024-03-01 00:00:00", s"DATE should map to midnight NTZ: $got")
  }

  test("the real orders/lineitem fixtures read their date columns as NTZ") {
    assert(Tables.orders(spark, sfDir).schema("o_orderdate").dataType == TimestampNTZType)
    assert(Tables.lineitem(spark, sfDir).schema("l_shipdate").dataType == TimestampNTZType)
  }

  test("the real driver fixture reads as µs NTZ through the same path") {
    val df = readEvents(sfDir)
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.filter(col("ts").isNotNull).count() > 0)
  }

  test("streaming reader agrees with the batch reader on the real fixture") {
    val batch = readEvents(sfDir)
      .withColumn("ts", col("ts").cast(TimestampType))
    val streamed = graft.streaming.EventStreams.runToBatch(spark,
      graft.streaming.EventStreams.readEvents(spark, sfDir), "t_evdrift")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("narrow-width regen of documents/embeddings normalizes to the pinned widths") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wid").toString
    Seq((1, "hello world", "en", "src0", 11))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .selectExpr("cast(doc_id as int) doc_id", "text", "lang", "source",
        "cast(n_chars as int) n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val docs = Tables.documents(spark, dir)
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)

    // integral-width drift still normalizes silently (representation
    // only); the float32 lane pin passes float lanes through unchanged
    Seq((7, Seq(1.0f, 2.0f), 3L)).toDF("vec_id", "embedding", "label")
      .selectExpr("cast(vec_id as int) vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val emb = Tables.embeddings(spark, dir)
    assert(emb.schema("vec_id").dataType == LongType)
    assert(emb.schema("label").dataType == IntegerType)
    assert(emb.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true))
  }

  test("a float64 embeddings regen fails loudly instead of silently narrowing") {
    // the one width pin that would change VALUES (lanes truncated while
    // the oracle reads full-precision doubles) refuses to cast — see
    // Tables.embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft-wid64").toString
    Seq((7, Seq(1.0, 2.0), 3L)).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val ex = intercept[IllegalArgumentException] {
      Tables.embeddings(spark, dir)
    }
    assert(ex.getMessage.contains("array<float>"), ex.getMessage)
  }

  test("current-generation fixtures pass the width pins unchanged (casts fold away)") {
    val docs = Tables.documents(spark, sfDir)
    assert(docs.schema("doc_id").dataType == LongType)
    val emb = Tables.embeddings(spark, sfDir)
    assert(emb.schema("embedding").dataType.asInstanceOf[ArrayType].elementType == FloatType)
    // the no-op casts must not survive optimization (scan stays prunable)
    val p = docs.select("doc_id").queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("cast(doc_id"), s"same-type cast survived:\n$p")
  }
}
