package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Gap-based sessionization over an event stream table (SURVEY §2.3).
 *
 * Batch algorithm: per user, order by time; a new session starts when the
 * gap from the previous event exceeds `gapMinutes`; session id = running
 * count of session starts. One shuffle (partitionBy user), everything else
 * is per-partition window arithmetic — at 100 TB this scales with the
 * number of users per partition, and AQE handles skewed users.
 *
 * The streaming twin (session_window + watermark) lives in
 * [[graft.streaming.EventStreams]]; its batch/stream equivalence is
 * tested in EventStreamsSpec. Boundary note: this operator keeps an
 * exactly-gap-sized silence in ONE session (strict `>` split, tested in
 * SessionizeSpec), while Spark's `session_window` closes at `>=` gap —
 * the two agree except for events landing exactly on the gap boundary.
 */
object Sessionize {

  /** Assign session ids: adds session_seq (per-user session ordinal). */
  def assign(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull, 1L)
          .when(unix_micros(col(tsCol).cast(TimestampType)) -
            unix_micros(col("__prev_ts").cast(TimestampType)) > gapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session aggregates: bounds, event count, value sum. Unordered —
    * a global ORDER BY is a range exchange every caller would pay whether
    * or not they need it; ordering belongs at the query edge. The grouping
    * needs no new shuffle: the window in [[assign]] already partitioned by
    * user, and (user, session_seq) distribution is a refinement of it. */
  def sessionStats(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      valueCol: String = "value",
      gapMinutes: Int = 30): DataFrame =
    assign(events, userCol, tsCol, idCol, gapMinutes)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))

  /**
   * State-run intervals (the SCD2 / "attribute history" build): per key,
   * collapse consecutive runs of an equal state value into one row with
   * `[start_ts, end_ts]` observed bounds and `valid_to` = the NEXT run's
   * start (NULL on the current run) — exactly the half-open validity
   * chain a type-2 dimension table stores. Gaps-and-islands via a
   * change-flag running sum, NOT the textbook `rn − rn_per_state` trick:
   * the flag needs only `lag` over the key partition, so every window
   * and the run aggregation share ONE hash exchange on the key (the
   * rn-pair version adds a second exchange on (key, state)).
   *
   * 100 TB: one shuffle of (key, ts, state); per-key data is processed
   * as a sorted stream — skewed keys are the only hazard, and they're
   * real entities (a device emitting billions of status rows), split by
   * AQE. Deterministic: `idCol` tie-breaks equal timestamps.
   */
  def stateRuns(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      stateCol: String = "event_type"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(stateCol), 1).over(byUser)
    events
      // null-SAFE change detection: `prev =!= state` is NULL (→ no new
      // run) when either side is a NULL state, silently absorbing
      // NULL-state periods into the preceding run; <=> compares them as
      // values, and the explicit first-row test keeps "no previous row"
      // distinct from "previous state was NULL"
      .withColumn("__chg",
        when(row_number().over(byUser) === 1 ||
          !(prev <=> col(stateCol)), 1L).otherwise(0L))
      .withColumn("run_seq", sum(col("__chg")).over(cum))
      // (key) hash-partitioning satisfies the (key, run_seq) clustering,
      // so this group-by adds no exchange; min(state) = the run's state
      // (constant within a run by construction)
      .groupBy(col(userCol), col("run_seq"))
      .agg(
        min(col(stateCol)).as("state"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to",
        lead(col("start_ts"), 1).over(
          Window.partitionBy(col(userCol)).orderBy(col("run_seq"))))
  }
}
