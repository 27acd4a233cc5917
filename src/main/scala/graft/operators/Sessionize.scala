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
}
