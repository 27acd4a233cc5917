package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Profile

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  test("driftStream: per-batch verdicts bit-equal the batch gate; restart writes nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft-drift-stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val reference = (1 to 200).map(i => (i.toLong, (i % 50 + 20).toLong))
      .toDF("doc_id", "v")

    // batch 0: same shape as the reference (quiet); batch 1: shifted (loud)
    val slices = Seq(
      (1 to 100).map(i => (1000L + i, (i % 50 + 20).toLong)),
      (1 to 100).map(i => (2000L + i, (i % 50 + 520).toLong)))
    slices.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "v").coalesce(1).write.parquet(s"$in/slice$i")
      new java.io.File(s"$in/slice$i").listFiles()
        .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/slice*")

    val q = DriftStream.driftStream(stream(), reference, "v", out, ckpt,
      buckets = 5, thresholdPpm = 100000L)
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(s"$out/batch=*")
      .orderBy("batch_id")
      .select("batch_id", "n_rows", "tv_ppm", "drifted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.length == 2, got.toSeq.toString)

    // each streamed verdict equals the batch operator on that slice
    got.zip(slices).foreach { case ((_, n, tv, drifted), rows) =>
      val direct = Profile.histogramDrift(reference, rows.toDF("doc_id", "v"), "v",
        buckets = 5, thresholdPpm = 100000L)
        .agg(sum("n_new"), max("tv_ppm"), max("drifted")).collect()(0)
      assert(n == direct.getLong(0))
      assert(tv == direct.getLong(1))
      assert(drifted == direct.getBoolean(2))
    }
    assert(!got(0)._4 && got(1)._4,
      s"expected quiet batch 0 and drifted batch 1: ${got.toSeq}")

    // restart on the same checkpoint, no new input: nothing written
    val before = new java.io.File(out).listFiles().map(_.getName).toSet
    val q2 = DriftStream.driftStream(stream(), reference, "v", out, ckpt,
      buckets = 5, thresholdPpm = 100000L)
    try q2.processAllAvailable() finally q2.stop()
    assert(new java.io.File(out).listFiles().map(_.getName).toSet == before)
  }
}
