package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Anomaly
import graft.sources.Tables

class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming flags match the batch operator on the fixture (exact-integer parity)") {
    val streamed = EventStreams.runToBatch(spark,
      AnomalyStream.zscoreFlags(spark,
        EventStreams.readEvents(spark, sfDir),
        windowRows = 20, k = 2, minObs = 10).toDF(),
      "t_anomaly_parity")
      .select("event_id").as[Long].collect().toSet
    val batch = Anomaly.zscoreFlags(Tables.events(spark, sfDir),
      "event_type", "ts", "event_id", "value",
      windowRows = 20, k = 2, minObs = 10)
      .select("event_id").as[Long].collect().toSet
    assert(batch.nonEmpty, "fixture should produce at least one anomaly at k=2")
    assert(streamed == batch,
      s"stream/batch diverged: only-stream=${streamed -- batch} only-batch=${batch -- streamed}")
  }

  test("negative exact-half-cent values round like the batch operator (HALF_UP)") {
    // -0.125 → -12.5 cents: Spark round() (HALF_UP, away from zero)
    // gives -13; Math.round would give -12 — and against a steady -0.12
    // history (-12 cents under BOTH roundings) that one-cent difference
    // is exactly the difference between flagging and not: d = n·x − S is
    // -10 under HALF_UP (flags at k=2) and 0 under Math.round (silent).
    def t(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$i%02d")
    val rows = (1 to 10).map(i => (i.toLong, t(i), "m", -0.12)) :+
      (11L, t(11), "m", -0.125)
    val df = rows.toDF("event_id", "ts", "key", "value")
    val batch = Anomaly.zscoreFlags(df, "key", "ts", "event_id", "value",
      windowRows = 50, k = 2, minObs = 5)
      .select("event_id").as[Long].collect().toSet
    assert(batch == Set(11L), s"batch should flag the half-cent spike: $batch")
    val dir = java.nio.file.Files.createTempDirectory("graft-anomaly-half").toString
    df.coalesce(1).write.parquet(s"$dir/in")
    val streamIn = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, key STRING, value DOUBLE")
      .parquet(s"$dir/in")
    val streamed = EventStreams.runToBatch(spark,
      AnomalyStream.zscoreFlags(spark, streamIn,
        keyCol = "key", windowRows = 50, k = 2, minObs = 5).toDF(),
      "t_anomaly_halfcent")
      .select("event_id").as[Long].collect().toSet
    assert(streamed == batch,
      s"stream/batch diverged on negative half-cent rounding: $streamed vs $batch")
  }

  test("cross-batch state: a spike flags only because history carried over") {
    val dir = java.nio.file.Files.createTempDirectory("graft-anomaly-stream").toString
    def t(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$i%02d")
    // slice 1: 11 steady observations; slice 2: the spike + one steady.
    // At the spike, n = 13 -> z^2 = 12 > 9 flags at k = 3 — but ONLY if
    // the 11 slice-1 values are still in the window.
    val slice1 = (1 to 11).map(i => (i.toLong, t(i), "m", 10.0))
    val slice2 = Seq((12L, t(12), "m", 100.0), (13L, t(13), "m", 10.0))
    Seq(slice1, slice2).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("event_id", "ts", "key", "value")
        .coalesce(1).write.parquet(s"$dir/slice$i")
      new java.io.File(s"$dir/slice$i").listFiles()
        .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val streamIn = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, key STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/slice*")
    val flagged = EventStreams.runToBatch(spark,
      AnomalyStream.zscoreFlags(spark, streamIn,
        keyCol = "key", windowRows = 50, k = 3, minObs = 5).toDF(),
      "t_anomaly_xbatch")
      .select("event_id").as[Long].collect().toSet
    assert(flagged == Set(12L),
      s"expected exactly the spike (needs slice-1 history in state): $flagged")
  }
}
