package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.v2.{EventLogOffset, EventLogSource}

class EventLogSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.EventLogSource"

  private def streamDf(total: Long = 500, partitions: Int = 4, batchRows: Long = 100) =
    spark.readStream.format(fmt)
      .option("topic", "t1").option("partitions", partitions)
      .option("totalPerPartition", total).option("batchRows", batchRows)
      .load()

  test("offset JSON round-trips through the checkpoint format") {
    val o = EventLogOffset(Array(0L, 17L, 4000000000L))
    assert(EventLogOffset.parse(o.json()).offsets.toSeq == o.offsets.toSeq)
    assert(EventLogOffset.parse("[]").offsets.isEmpty)
  }

  test("stream delivers every (partition, offset) exactly once, in micro-batches") {
    val q = streamDf().writeStream.format("memory")
      .queryName("t_eventlog").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val out = spark.table("t_eventlog")
    assert(out.count() == 4 * 500)
    assert(out.select("partition", "offset").distinct().count() == 4 * 500,
      "duplicate (partition, offset) delivered")
    // admission control paced the read: 500 rows/partition at 100/batch ⇒
    // several micro-batches, not one catch-all
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      q.recentProgress.map(_.numInputRows).mkString(","))
    // content is the deterministic generator output
    val r = out.filter($"partition" === 2 && $"offset" === 7).head()
    assert(new String(r.getAs[Array[Byte]]("key"), "UTF-8") == "k-2-7")
    assert(new String(r.getAs[Array[Byte]]("value"), "UTF-8") ==
      new String(EventLogSource.valueBytes(2, 7L), "UTF-8"))
  }

  test("batch read (full replay) equals the streamed delivery") {
    val batch = spark.read.format(fmt)
      .option("topic", "t1").option("partitions", "4")
      .option("totalPerPartition", "500").load()
    assert(batch.count() == 4 * 500)
    val streamed = spark.table("t_eventlog") // from the previous test's run
    assert(batch.exceptAll(streamed).isEmpty && streamed.exceptAll(batch).isEmpty)
  }

  test("checkpoint restart resumes from the recovered offset (no re-read)") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-eventlog-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-eventlog-out").toString
    def runOnce(): Unit = {
      val q = streamDf(total = 300, partitions = 2, batchRows = 50)
        .selectExpr("partition", "offset")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    runOnce()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 2 * 300)
    runOnce() // same checkpoint: recovered offsets are exhausted
    val again = spark.read.parquet(out)
    assert(again.count() == n1, "restart re-delivered rows")
    assert(again.select("partition", "offset").distinct().count() == n1)
  }
}
