package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Profile

/**
 * Streaming twin of [[graft.operators.Profile.attrition]]: continuous
 * per-stage rejection accounting over an unbounded ingest stream — the
 * live "where is my corpus going" monitor for a cleaning pipeline's
 * feed (a stage whose rejection share jumps mid-ingest is an upstream
 * incident, and this surface is where it shows first).
 *
 * The stage charge is [[Profile.firstFailStage]] — the SAME column
 * expression as the batch operator, so charging semantics cannot drift
 * — and rejection counts are associative, so after any number of
 * micro-batches the cumulative counts equal the batch operator's over
 * the union of those batches; running [[Profile.waterfall]] on an
 * emitted snapshot reproduces the batch report EXACTLY
 * (AttritionStreamSpec pins equality across a multi-batch run).
 *
 * State is the running count per stage — O(stages) longs, the smallest
 * state a streaming monitor can carry; Spark's streaming aggregation
 * holds it, no custom state function needed. Emit with output mode
 * `complete`: the full counts table is tiny (≤ stages + 1 rows) and
 * re-emitting it per trigger is the natural monitoring-sink shape.
 */
object AttritionStream {

  /** Cumulative per-stage rejection counts (`__ff`, `__rej`) over the
    * stream — feed snapshots to [[Profile.waterfall]] for the report. */
  def stageCounts(stream: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "attrition needs at least one stage")
    stream.select(Profile.firstFailStage(stages).as("__ff"))
      .groupBy(col("__ff")).agg(count(lit(1)).as("__rej"))
  }
}
