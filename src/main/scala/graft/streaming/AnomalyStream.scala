package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Streaming twin of [[graft.operators.Anomaly.zscoreFlags]]: continuous
 * trailing-window z-score monitoring over an event stream, carrying the
 * per-key trailing window across micro-batches in the state store.
 *
 * The kernel is the SAME exact-integer form as the batch operator —
 * cents fixed-point, `(n·x − S)² > k²·(n·Q − S²)` — so batch and stream
 * agree bit-for-bit on identical input order (AnomalyStreamSpec pins
 * set-equality against the batch operator on the fixture, plus a
 * cross-batch case where the flag is only computable with carried
 * state).
 *
 * State per key is the last `windowRows − 1` cents values — O(keys ×
 * windowRows) longs, bounded. `flatMapGroupsWithState` rather than a
 * windowed aggregate because the trailing ROWS frame has no
 * event-time-window equivalent (it is count-based, not time-based).
 * Production eviction: add a `GroupStateTimeout` when the key domain
 * churns; series keys here (metric names) are a stable small set.
 *
 * Within a micro-batch, rows are folded in (ts, id) order; cross-batch
 * order is the source's trigger order — the standard streaming contract
 * (a late row lands in the window of its ARRIVAL batch; use the batch
 * operator for retrospective exactness on disordered history).
 */
object AnomalyStream extends Serializable {

  case class AnomalyFlag(
      series: String, event_id: Long, ts: java.time.Instant, value: Double)

  /** Trailing cents ring (public: the state-store encoder's generated
    * code must reach the accessor). */
  case class Ring(values: Seq[Long])

  def zscoreFlags(
      spark: SparkSession,
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      idCol: String = "event_id",
      valueCol: String = "value",
      windowRows: Int = 50,
      k: Int = 3,
      minObs: Int = 20): Dataset[AnomalyFlag] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    require(windowRows >= 2 && windowRows <= 1000 &&
        minObs >= 2 && minObs <= windowRows,
      s"need 2 <= minObs ($minObs) <= windowRows ($windowRows) <= 1000 " +
        "(the n term of the batch operator's BIGINT overflow envelope)")
    require(k >= 1 && k <= 3,
      s"k must be in [1, 3] (same BIGINT overflow envelope as the batch " +
        s"operator): $k")
    val kk = k.toLong * k

    events
      .selectExpr(s"$keyCol AS series", s"$idCol AS event_id",
        s"$tsCol AS ts", s"$valueCol AS value")
      // a NULL value row would fail the non-nullable tuple encoder and
      // turn one poison row into a forever-replaying micro-batch; the
      // batch twin never FLAGS such a row (every comparison against a
      // null cents is false), so dropping it here keeps the flag sets
      // identical while the stream stays alive
      .filter(col("value").isNotNull && col("ts").isNotNull &&
        col("event_id").isNotNull)
      .as[(String, Long, java.time.Instant, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Ring, AnomalyFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (series, rows, state: GroupState[Ring]) =>
          var hist = state.getOption.map(_.values.toVector).getOrElse(Vector.empty)
          val out = Vector.newBuilder[AnomalyFlag]
          // same fold order as the batch window: (ts, id) ascending
          def tsUs(i: java.time.Instant): Long =
            i.getEpochSecond * 1000000L + i.getNano / 1000L
          rows.toSeq.sortBy(r => (tsUs(r._3), r._2)).foreach { case (_, id, ts, v) =>
            // cents via the SAME rounding as the batch round(value·100):
            // Spark's Round on DoubleType is BigDecimal(Double.toString)
            // HALF_UP — half away from zero. Math.round would round half
            // toward +∞ and diverge from the batch twin on negative
            // exact-half-cent values (−0.125 → −13 here, −12 there).
            val x = java.math.BigDecimal.valueOf(v * 100)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            // the batch operator's third overflow-envelope leg, enforced
            // with the same fail-loud policy (Anomaly.zscoreFlags): past
            // 1e6 cents x·x silently wraps BIGINT here and the
            // cross-multiplied comparison would emit inverted flags
            require(math.abs(x) <= 1000000L,
              s"anomalyStream: |$valueCol|·100 = $x exceeds the 1e6-cent " +
                "overflow envelope (see Anomaly.zscoreFlags); rescale the metric")
            val win = hist.takeRight(windowRows - 1) :+ x
            val n = win.length.toLong
            if (n >= minObs) {
              val s = win.sum
              val q = win.map(c => c * c).sum
              val d = n * x - s
              if (d * d > kk * (n * q - s * s)) out += AnomalyFlag(series, id, ts, v)
            }
            hist = (hist :+ x).takeRight(windowRows - 1)
          }
          state.update(Ring(hist))
          out.result().iterator
      }
  }
}
