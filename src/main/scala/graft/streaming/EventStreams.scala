package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface (SURVEY §7.2 step 5 — a NEW capability;
 * the reference has no streaming semantics, §2.2). Batch/stream parity is
 * the design rule: every transform here has a batch twin, and
 * EventStreamsSpec asserts equality on the fixture.
 *
 * Scale notes: file-source streaming partitions by input file; the
 * aggregations below are watermark-bounded so state is O(open windows ×
 * keys), not O(history). At 100 TB/day the same plans run on a Kafka
 * source unchanged — source swap is config, not code.
 */
object EventStreams extends Serializable {

  /** Streaming read of the events table (file micro-batches). Fixture
    * generations have shipped `ts` as TIMESTAMP(NANOS) (readable only as
    * long in legacy mode — see Tables.events) or TIMESTAMP(MICROS);
    * sniff the footer via a batch read and normalize either to LTZ µs.
    *
    * LTZ here is deliberate and LOAD-BEARING, unlike the batch reader's
    * NTZ: Spark's event-time machinery rejects TIMESTAMP_NTZ watermark
    * columns outright ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE] — verified
    * against 4.1; every downstream `withWatermark` would fail analysis),
    * so stream/batch parity relies on the UTC session pin to make the
    * LTZ and NTZ readings of the same instant agree. That pin is
    * CHECKED here (fail loud), not silently installed: a read that
    * rewrote the session timezone would change the semantics of every
    * other query in a session that deliberately pinned something else —
    * a hidden global side effect for a local parity need. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    // parity with Tables.events' naive-UTC reading requires the session
    // TZ pin wherever an LTZ column is compared against the NTZ batch
    // twin — verify it at the read site so a mis-pinned session fails
    // at the source, not as a silent wall-clock shift downstream
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"readEvents needs spark.sql.session.timeZone=UTC for LTZ/NTZ parity " +
        s"with the batch reader, but the session pins '$tz' — set UTC at " +
        "session build (all graft entry points do) rather than relying on " +
        "this read to rewrite shared session state")
    // deliberate narrow session side effect — see Tables.events: the flag
    // only affects NANOS parquet, which is otherwise unreadable outright
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // schema via Tables' resolved-schema cache (footer read once per
    // process, not once per streaming query construction) — the conf
    // above is set before the first inference, same as the batch path
    val fileSchema = graft.sources.Tables.table(spark, sfDir, "events").schema
    // file-stream sources need a directory; glob-filter the events table
    val stream = spark.readStream
      .schema(fileSchema)
      .format("parquet")
      .option("pathGlobFilter", "events.parquet")
      .load(sfDir)
    fileSchema("ts").dataType match {
      case LongType => stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => stream.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Tumbling-window counts per event type with a watermark. The batch
    * twin runs the identical expression tree over Tables.events. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window counts (window longer than slide ⇒ each event lands
    * in windowLen/slide windows; state still watermark-bounded). */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Event-time session windows (30-minute gap) per user — the streaming
    * twin of [[graft.operators.Sessionize]]. */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Watermarked streaming dedup by event_id (exactly-once style ingest
    * guard; state bounded by the watermark horizon). */
  def dedupedStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Accumulated per-user state for [[runningTotals]]. */
  case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  /** Internal state for [[runningTotals]]: the sum lives in exact cents
    * (Long), not a Double — cent addition is associative, so the total
    * is independent of the order rows arrive in (shuffle order within a
    * micro-batch, and batch slicing across restarts, are both
    * nondeterministic). The emitted `sum_value` is then one exact
    * cents/100 division — bit-identical to the batch/oracle
    * `SUM(CAST(value AS DECIMAL(12,2)))::DOUBLE` convention. */
  case class RunningCents(n_events: Long, cents: Long)

  /** Custom streaming state via `mapGroupsWithState`: per-user running
    * totals that survive across micro-batches (the escape hatch for
    * state machines session_window can't express — per-key counters,
    * CEP-ish logic, custom eviction). State size is O(distinct users);
    * production would add a `GroupStateTimeout` eviction policy.
    *
    * Values go through the engine-wide DECIMAL(12,2) convention BEFORE
    * the stateful operator (Spark's own cast, so the rounding rule can't
    * drift from the batch twins), then accumulate as exact cents — see
    * [[RunningCents]]. */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.selectExpr("user_id",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[RunningCents, UserTotals](GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          var n = state.getOption.map(_.n_events).getOrElse(0L)
          var c = state.getOption.map(_.cents).getOrElse(0L)
          rows.foreach { case (_, v) => n += 1; c += v }
          state.update(RunningCents(n, c))
          UserTotals(user, n, c / 100.0)
      }
      .toDF()
  }

  /** One closed session emitted by [[sessionsWithState]]. */
  case class ClosedSession(
      user_id: Long, session_start: java.time.Instant,
      session_end: java.time.Instant, n_events: Long, sum_value: Double)

  /** Internal state row (public: the state-store encoder's generated
    * code must reach the accessors). Times in micros since epoch. */
  case class OpenSession(startUs: Long, endUs: Long, nEvents: Long, sumValue: Double)

  private def us(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def instant(us: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)

  /**
   * Streaming session assembly via `flatMapGroupsWithState` with an
   * event-time timeout — the full custom-state API: sessions that span
   * micro-batches live in the state store; a session closes once the
   * watermark passes its end + gap (no earlier event can then join it —
   * the stateful operator drops rows below the watermark). State per
   * user is the list of OPEN sessions — usually one, more only while a
   * late-but-admissible event opens an earlier interval that the
   * watermark has not yet sealed; all are bounded by the watermark
   * delay, so state stays O(users × delay/gap).
   *
   * Merging is interval-based, not tail-append: each event either lands
   * within `gap` of an existing open interval (extending EITHER end —
   * an admissible late event earlier than the session start widens
   * session_start, matching the batch twin) or opens a new interval,
   * and intervals that come within the gap of each other merge. A
   * tail-append formulation would fold ANY older event into the open
   * session (ts − end is negative, trivially ≤ gap) and never lower
   * the start — silently diverging from batch parity on cross-batch
   * late arrivals. (session_window expresses sessions too; this is the
   * escape hatch shape for semantics it can't, e.g. per-session early
   * triggers or custom close conditions.)
   */
  def sessionsWithState(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "2 hours"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val gapUs = gapMinutes * 60L * 1000000L

    def close(s: OpenSession, user: Long): ClosedSession =
      ClosedSession(user, instant(s.startUs), instant(s.endUs), s.nEvents, s.sumValue)

    // emit the sessions the watermark has sealed; keep the rest in state
    // with the timeout on the earliest still-open close point, clamped
    // ABOVE the watermark (setTimeoutTimestamp at or below the current
    // watermark throws and the failed batch would replay forever — a
    // session already sealed by this batch's watermark closes here, not
    // via a below-watermark timeout)
    def drain(user: Long, sessions: Seq[OpenSession],
        state: GroupState[Seq[OpenSession]]): Iterator[ClosedSession] = {
      val wmMs = state.getCurrentWatermarkMs()
      val (done, stillOpen) =
        sessions.partition(s => (s.endUs + gapUs) / 1000 <= wmMs)
      if (stillOpen.isEmpty) state.remove()
      else {
        state.update(stillOpen)
        val t = stillOpen.map(s => (s.endUs + gapUs) / 1000).min
        state.setTimeoutTimestamp(math.max(t, wmMs + 1))
      }
      done.sortBy(_.startUs).map(close(_, user)).iterator
    }

    events
      .withWatermark("ts", watermark)
      // keep `ts` a timestamp column — converting it here would strip the
      // watermark tag the stateful operator requires
      .selectExpr("user_id", "ts", "value")
      .as[(Long, java.time.Instant, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[OpenSession], ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows: Iterator[(Long, java.time.Instant, Double)],
            state: GroupState[Seq[OpenSession]]) =>
          if (state.hasTimedOut) {
            drain(user, state.getOption.getOrElse(Seq.empty), state)
          } else {
            // every event is a unit interval; sweep-merge the union of
            // state's open intervals and this batch's, joining any two
            // within `gap` of each other
            val pts = rows.map { case (_, i, v) =>
              OpenSession(us(i), us(i), 1L, v) }.toSeq
            val all = (state.getOption.getOrElse(Seq.empty) ++ pts)
              .sortBy(_.startUs)
            val merged = all.foldLeft(List.empty[OpenSession]) { (acc, s) =>
              acc match {
                case h :: t if s.startUs - h.endUs <= gapUs =>
                  OpenSession(h.startUs, math.max(h.endUs, s.endUs),
                    h.nEvents + s.nEvents, h.sumValue + s.sumValue) :: t
                case _ => s :: acc
              }
            }.reverse
            drain(user, merged, state)
          }
      }
      .toDF()
  }

  /**
   * Stream-stream inner join: each click joined to the same user's
   * purchases in the preceding `lookback` window — the two-stream shape
   * (attribution, enrichment) that batch twins express as an interval
   * join ([[graft.operators.Temporal.intervalJoin]] is the batch
   * analog). Both sides carry watermarks AND the join condition bounds
   * event time on both sides; together those let Spark evict buffered
   * rows once the watermark passes, so join state is O(lookback ×
   * rate), not O(history). Self-joining one source stream is fine —
   * Spark plans two independent scans.
   */
  def clickPurchaseJoin(
      events: DataFrame,
      lookback: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr(s"INTERVAL $lookback") &&
        col("purchase_ts") <= col("click_ts"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  /** RocksDB state-store provider — the 100 TB streaming-state config.
    * The default provider keeps every key's state in executor heap
    * (state size caps at memory); RocksDB spills state to local disk with
    * changelog checkpointing, so state scales with disk, not heap. Same
    * query code — the provider is pure session config. */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the RocksDB state-store provider active (restores the
    * previous provider after). Applies to queries STARTED inside. */
  def withRocksDBState[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDBProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Run any of the above to completion against the (bounded) fixture and
    * return the materialized result — used by tests to assert batch
    * parity.
    *
    * `skipNoDataBatches = true` disables the engine's trailing NO-DATA
    * micro-batch (`spark.sql.streaming.noDataMicroBatches.enabled`) for
    * the query — correct ONLY for queries whose output is complete
    * without it (stream-stream INNER joins emit matches in the batch
    * both sides arrive; the no-data batch exists to advance the
    * watermark for state EVICTION and append-mode window FLUSH). A
    * bounded run-to-completion replay stops right after, so eviction is
    * pure waste — and it is not cheap waste: every stateful no-data
    * batch re-opens all state stores, and in one-JVM local mode
    * provider init serializes behind the global registry lock (measured
    * r20: per-task block time ∝ partition count — 7.6/32/133 task-s at
    * 8/16/32 partitions for the SAME click join, ~60 ms × N_partitions
    * each). Append-mode AGGREGATIONS must keep the default (their final
    * windows only emit when the watermark advances past them). */
  def runToBatch(spark: SparkSession, streaming: DataFrame, name: String,
      outputMode: String = "append",
      skipNoDataBatches: Boolean = false): DataFrame = {
    // The conf flip is session-shared and harnesses (Verify) run queries
    // from a thread pool, so the flip-start-restore window is serialized
    // on this object: StreamExecution CLONES the session at start() (the
    // conf is captured there, not per batch), so restoring right after
    // start is sound, and every no-data-DEPENDENT query (the append-mode
    // windowed aggs) also starts through this method, i.e. inside the
    // same lock. The non-runToBatch stream sites (foreachBatch feeds)
    // are stateless — no-data batches never fire for them — so a
    // concurrent start there is conf-indifferent.
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val q = EventStreams.synchronized {
      val prev = spark.conf.getOption(key)
      if (skipNoDataBatches) spark.conf.set(key, "false")
      try {
        streaming.writeStream
          .format("memory")
          .queryName(name)
          .outputMode(outputMode)
          .start()
      } finally if (skipNoDataBatches) prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    try {
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }
}
