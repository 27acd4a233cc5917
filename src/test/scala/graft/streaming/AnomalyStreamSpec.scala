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
