package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.Tables

class EventStreamsSpec extends SparkSpec {

  // The streaming twin is LTZ by engine mandate (Spark rejects NTZ
  // watermark columns — EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so parity
  // casts the NTZ batch read to LTZ under the UTC pin readEvents verifies
  // (fail-loud require at the read site; the pin itself is set at session
  // build, here via SparkSpec).
  private def batchEvents = Tables.events(spark, sfDir)
    .withColumn("ts", col("ts").cast(TimestampType))

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

  test("streaming sliding-window counts equal the batch computation") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.slidingCounts(EventStreams.readEvents(spark, sfDir)),
      "t_sliding", outputMode = "complete")
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
    assert(streamed.count() > batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type")).count().count(),
      "sliding should produce more windows than tumbling")
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

  test("RocksDB state store: stateful session windows produce identical results") {
    // same query, state spilled to local-disk RocksDB instead of executor
    // heap (the 100 TB state config) — results must be bit-identical
    val rocks = EventStreams.withRocksDBState(spark) {
      EventStreams.runToBatch(spark,
        EventStreams.sessionStats(EventStreams.readEvents(spark, sfDir)),
        "t_sessions_rocksdb", outputMode = "complete")
        .collect()
    }
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .forall(_ != EventStreams.RocksDBProvider), "provider conf not restored")
    val heap = EventStreams.runToBatch(spark,
      EventStreams.sessionStats(EventStreams.readEvents(spark, sfDir)),
      "t_sessions_heap", outputMode = "complete")
      .collect()
    assert(rocks.nonEmpty)
    assert(rocks.map(_.toSeq).toSet == heap.map(_.toSeq).toSet)
  }

  test("streaming dedup passes each event_id once") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.dedupedStream(EventStreams.readEvents(spark, sfDir)),
      "t_dedup")
    assert(streamed.count() == batchEvents.count()) // fixture has unique ids
    assert(streamed.select("event_id").distinct().count() == streamed.count())
  }

  test("flatMapGroupsWithState sessions: cross-batch state + event-time timeout") {
    // stream the fixture in 3 time-ordered micro-batches so sessions span
    // batches and the watermark advances enough to fire timeouts
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ev = batchEvents.orderBy(col("ts")).cache()
    val n = ev.count()
    val slices = ev.collect().grouped((n / 3 + 1).toInt).toSeq
    slices.zipWithIndex.foreach { case (rows, i) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq), ev.schema)
      df.coalesce(1).write.parquet(s"$dir/slice$i")
      // distinct mtimes so the file source processes slices in time order
      new java.io.File(s"$dir/slice$i").listFiles().foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val streamIn = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/slice*")
    val emitted = EventStreams.runToBatch(spark,
      EventStreams.sessionsWithState(spark, streamIn, gapMinutes = 30, watermark = "1 minute"),
      "t_fmgws", outputMode = "append")
      .collect()
    assert(emitted.nonEmpty, "no sessions emitted — timeouts never fired")
    // every emitted session must exactly match a batch-computed session
    val batch = graft.operators.Sessionize.sessionStats(ev)
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp]("session_start")) ->
        ((r.getAs[java.sql.Timestamp]("session_end"), r.getLong(4), r.getDouble(5))))
      .toMap
    emitted.foreach { r =>
      val key = (r.getLong(0), r.getAs[java.sql.Timestamp]("session_start"))
      val (bEnd, bN, bSum) = batch.getOrElse(key, fail(s"phantom session $key"))
      assert(r.getAs[java.sql.Timestamp]("session_end") == bEnd, s"end mismatch $key")
      assert(r.getLong(3) == bN, s"count mismatch $key")
      assert(math.abs(r.getDouble(4) - bSum) < 1e-6, s"sum mismatch $key")
    }
  }

  test("RocksDB state store: windowed agg matches the default provider's result") {
    // the production state store for large state (spills to disk instead
    // of executor heap) — same query, provider swapped by config
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val streamed = EventStreams.runToBatch(spark,
        EventStreams.tumblingCounts(EventStreams.readEvents(spark, sfDir)),
        "t_rocksdb", outputMode = "complete")
      val batch = batchEvents
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-stream join equals the batch interval join") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.clickPurchaseJoin(EventStreams.readEvents(spark, sfDir)),
      "t_ssjoin", outputMode = "append")
    val clicks = batchEvents.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = batchEvents.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    val batch = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 10 minutes") &&
        col("purchase_ts") <= col("click_ts"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
    assert(streamed.count() > 0, "no joined rows — fixture should have matches")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("mapGroupsWithState running totals equal the batch groupBy") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.runningTotals(spark, EventStreams.readEvents(spark, sfDir)),
      "t_state", outputMode = "update")
    val batch = batchEvents.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast("double").as("sum_value"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // update mode re-emits a row per user per micro-batch; keep the last
    val last = streamed.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(last.size == batch.size)
    last.foreach { case (u, (n, s)) =>
      assert(n == batch(u)._1, s"user $u count")
      // cents accumulation is exact — the streamed total must be
      // BIT-equal to the batch DECIMAL(12,2) sum, no tolerance
      assert(s == batch(u)._2, s"user $u sum")
    }
  }

  test("sessionsWithState: admissible late events open/extend the right interval") {
    // three micro-batches (maxFilesPerTrigger=1, mtime-ordered):
    //   slice 0: u1 @12:00; u2 @13:00 (advances wm to 09:00 with 4h delay)
    //   slice 1: u1 @09:30 (LATE but > wm: must become its OWN earlier
    //            session — the old tail-append merged it into [12:00]);
    //            u1 @12:10 (extends [12:00] forward)
    //   slice 2: u2 @20:00 (wm -> 16:00, sealing everything open)
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val slices = Seq(
      Seq((1L, t("2024-01-01 12:00:00"), 1.0), (2L, t("2024-01-01 13:00:00"), 1.0)),
      Seq((1L, t("2024-01-01 09:30:00"), 5.0), (1L, t("2024-01-01 12:10:00"), 2.0)),
      Seq((2L, t("2024-01-01 20:00:00"), 1.0)))
    slices.zipWithIndex.foreach { case (rows, i) =>
      val rdd = spark.sparkContext.parallelize(rows.map {
        case (u, ts, v) => org.apache.spark.sql.Row(u, ts, v) }, 1)
      spark.createDataFrame(rdd, schema)
        .coalesce(1).write.parquet(s"$dir/slice$i")
      new java.io.File(s"$dir/slice$i").listFiles()
        .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/slice*")
    val out = EventStreams.runToBatch(spark,
      EventStreams.sessionsWithState(spark, streamIn,
        gapMinutes = 30, watermark = "4 hours"),
      "t_late_sessions", outputMode = "append")
      .filter(col("user_id") === 1L)
      .select("session_start", "session_end", "n_events", "sum_value")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp](0).toString.take(19),
        r.getAs[java.sql.Timestamp](1).toString.take(19),
        r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // TWO u1 sessions: the late 09:30 event is its own interval (the
    // pre-fix merge reported one session starting 12:00 with n=3), and
    // 12:10 extended the open [12:00] one
    assert(out.toSeq == Seq(
      ("2024-01-01 09:30:00", "2024-01-01 09:30:00", 1L, 5.0),
      ("2024-01-01 12:00:00", "2024-01-01 12:10:00", 2L, 3.0)),
      s"got ${out.toSeq}")
  }

  test("readEvents fails loud on a non-UTC session instead of rewriting it") {
    val other = spark.newSession()
    other.conf.set("spark.sql.session.timeZone", "America/New_York")
    val e = intercept[IllegalArgumentException] {
      EventStreams.readEvents(other, sfDir)
    }
    assert(e.getMessage.contains("timeZone"))
    // the caller's deliberate pin must survive — a read is not entitled
    // to rewrite shared session state
    assert(other.conf.get("spark.sql.session.timeZone") == "America/New_York")
  }
}
