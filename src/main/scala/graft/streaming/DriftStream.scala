package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Profile

/**
 * Continuous distribution-drift monitoring — the streaming twin of
 * [[Profile.histogramDrift]]: every micro-batch of the incoming drop is
 * scored against the STANDING reference snapshot's equi-depth bins, and
 * one summary row per batch (`batch_id`, `tv_ppm`, `drifted`, batch
 * row count) lands under `out/batch=<id>` with the
 * [[CorpusStream.appendShards]] exactly-once recipe. The kernel is the
 * identical operator the batch gate runs — same boundaries, same
 * fixed-point TV — so DriftStreamSpec pins each streamed verdict
 * bit-equal to `histogramDrift(reference, thatBatch)`.
 *
 * Scale note: the reference's boundaries are computed ONCE here (a
 * driver-side model-state collect inside the operator) per micro-batch
 * against the same static frame; for a long-running monitor, pass a
 * reference that is itself a small persisted/cached frame so the
 * boundary aggregate doesn't rescan the historical corpus every batch
 * (or materialize the reference histogram nightly — the
 * [[Profile.momentStats]] maintenance pattern).
 */
object DriftStream {

  /** Start the monitor: one (batch_id, n_rows, tv_ppm, drifted) summary
    * row per micro-batch, exactly-once. */
  def driftStream(
      streaming: DataFrame,
      reference: DataFrame,
      valueCol: String,
      out: String,
      checkpoint: String,
      buckets: Int = 8,
      thresholdPpm: Long = 100000L): org.apache.spark.sql.streaming.StreamingQuery =
    streaming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // a batch with no non-null values has no distribution to score —
        // emit nothing rather than poison the stream: histogramDrift
        // REQUIRES a non-empty non-null side, and a throwing batch would
        // replay forever off the checkpoint (match the callee's
        // precondition exactly, not just row count)
        if (!batch.filter(col(valueCol).isNotNull).isEmpty) {
        val summary = Profile
          .histogramDrift(reference, batch, valueCol, buckets, thresholdPpm)
          .agg(
            sum(col("n_new")).as("n_rows"),
            max(col("tv_ppm")).as("tv_ppm"),      // constant per report
            max(col("drifted")).as("drifted"))
          .withColumn("batch_id", lit(batchId))
          .select(col("batch_id"), col("n_rows"), col("tv_ppm"), col("drifted"))
        summary.coalesce(1).write.mode("overwrite").parquet(s"$out/batch=$batchId")
        }
      }
      .start()
}
