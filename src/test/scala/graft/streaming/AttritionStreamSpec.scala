package graft.streaming

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Profile

class AttritionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("cumulative stream counts + waterfall == batch attrition over all micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-attrition-stream").toString
    // two slices, one file each, forced into separate micro-batches —
    // the equality below only holds if counts carry across batches
    val slice1 = Seq(1L, 5L, 10L, 15L)
    val slice2 = Seq(20L, 25L, 30L, 35L)
    Seq(slice1, slice2).zipWithIndex.foreach { case (rows, i) =>
      rows.map(Tuple1(_)).toDF("v").coalesce(1).write.parquet(s"$dir/slice$i")
      new java.io.File(s"$dir/slice$i").listFiles()
        .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val stages = Seq(
      "ge10" -> (col("v") >= 10),
      "le30" -> (col("v") <= 30),
      "even" -> (col("v") % 2 === 0))
    val streamIn = spark.readStream.schema("v LONG")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/slice*")
    val snapshot = EventStreams.runToBatch(spark,
      AttritionStream.stageCounts(streamIn, stages),
      "t_attrition_counts", outputMode = "complete")
    val streamed = Profile.waterfall(snapshot, stages.map(_._1))
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val batch = Profile.attrition(
      (slice1 ++ slice2).map(Tuple1(_)).toDF("v"), stages)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(streamed == batch,
      s"stream/batch waterfalls diverged:\n$streamed\nvs\n$batch")
    // and the fixture genuinely exercises every stage
    assert(batch.map(_._4).forall(_ > 0) && batch == Seq(
      (0L, "ge10", 8L, 2L, 6L),
      (1L, "le30", 6L, 1L, 5L),
      (2L, "even", 5L, 2L, 3L)))
  }
}
