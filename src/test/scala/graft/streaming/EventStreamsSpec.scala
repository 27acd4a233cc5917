package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.Tables

class EventStreamsSpec extends SparkSpec {

  private def batchEvents = Tables.events(spark, sfDir)
    .withColumn("ts", col("ts").cast(TimestampType)) // streaming twin uses LTZ

  test("streaming tumbling-window counts equal the batch computation") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.tumblingCounts(EventStreams.readEvents(spark, sfDir)),
      "t_tumbling", outputMode = "complete")
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming session windows equal the batch session_window computation") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.sessionStats(EventStreams.readEvents(spark, sfDir)),
      "t_sessions", outputMode = "complete")
    val batch = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup passes each event_id once") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.dedupedStream(EventStreams.readEvents(spark, sfDir)),
      "t_dedup")
    assert(streamed.count() == batchEvents.count()) // fixture has unique ids
    assert(streamed.select("event_id").distinct().count() == streamed.count())
  }

  test("mapGroupsWithState running totals equal the batch groupBy") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.runningTotals(spark, EventStreams.readEvents(spark, sfDir)),
      "t_state", outputMode = "update")
    val batch = batchEvents.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // update mode re-emits a row per user per micro-batch; keep the last
    val last = streamed.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(last.size == batch.size)
    last.foreach { case (u, (n, s)) =>
      assert(n == batch(u)._1, s"user $u count")
      assert(math.abs(s - batch(u)._2) < 1e-6, s"user $u sum") // double assoc.
    }
  }
}
