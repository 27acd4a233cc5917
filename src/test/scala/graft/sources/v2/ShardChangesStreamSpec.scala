package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/**
 * Streaming change feed ([[ShardVersionsSource]] /
 * [[ShardChangesStream.replay]]): version ticks replay exactly-once
 * through the checkpoint, every streamed window is bit-equal to the
 * batch [[ShardSnapshot.readChanges]] of the same pair, and composing
 * the windows over a copy at v1 reconstructs v3 — the full CDC
 * contract, stream-shaped.
 */
class ShardChangesStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("ld", StringType)))

  private def digest(df: DataFrame): String =
    df.agg(md5(concat_ws("|",
      array_sort(collect_list(concat_ws(":", col("doc_id"),
        coalesce(col("ld"), lit("∅")),
        coalesce(col("change"), lit("-")))))))).head().getString(0)

  test("streamed windows == batch readChanges; exactly-once restart; windows compose to v3") {
    val base = java.nio.file.Files.createTempDirectory("graft-cdc-stream").toString
    val table = s"$base/table"; val out = s"$base/feed"; val ckpt = s"$base/ckpt"
    (0L until 200L).map(i => (i, s"v$i")).toDF("doc_id", "ld")
      .repartitionByRange(4, col("doc_id"))
      .write.format("graft.sources.v2.ShardSink")
      .option("path", table).option("statsColumn", "doc_id")
      .mode("append").save()
    val v1 = ShardSnapshot.create(spark, table)

    // stream starts with only v1 live: one base, no window yet
    val q0 = ShardChangesStream.replay(spark, table, schema, "doc_id", out, ckpt)
    try q0.processAllAvailable() finally q0.stop()
    assert(!new java.io.File(out).exists() ||
      new java.io.File(out).listFiles().isEmpty)

    // two mutation waves bracketed by snapshots
    ShardDelete.upsertByKey(spark, table, schema, "doc_id",
      Seq((10L, "UPD10"), (999L, "NEW999")).toDF("doc_id", "ld"))
    val v2 = ShardSnapshot.create(spark, table)
    ShardDelete.deleteByKey(spark, table, schema, "doc_id",
      Seq(20L, 21L).toDF("k"))
    val v3 = ShardSnapshot.create(spark, table)

    // restart on the same checkpoint: exactly the two new windows land
    val q1 = ShardChangesStream.replay(spark, table, schema, "doc_id", out, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    def windows(): Set[String] =
      new java.io.File(out).listFiles().map(_.getName)
        .filter(_.startsWith("window=")).toSet
    assert(windows() == Set(s"window=${v1}_$v2", s"window=${v2}_$v3"))

    // streamed ≡ batch, window for window
    def streamed(vf: Int, vt: Int): DataFrame =
      spark.read.parquet(s"$out/window=${vf}_$vt")
    assert(digest(streamed(v1, v2)) ==
      digest(ShardSnapshot.readChanges(spark, table, schema, "doc_id", v1, v2)))
    assert(digest(streamed(v2, v3)) ==
      digest(ShardSnapshot.readChanges(spark, table, schema, "doc_id", v2, v3)))

    // exactly-once: a third restart with no new snapshots writes nothing
    def listing(): Set[(String, Long)] = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
      val b = Set.newBuilder[(String, Long)]
      while (it.hasNext) {
        val p = it.next()
        if (java.nio.file.Files.isRegularFile(p))
          b += ((p.toString, java.nio.file.Files.size(p)))
      }
      b.result()
    }
    val before = listing()
    val q2 = ShardChangesStream.replay(spark, table, schema, "doc_id", out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(listing() == before, "restart with no new snapshots wrote data")

    // composition: v1 + w1 + w2 == v3 (apply = delete touched keys,
    // append non-removed rows — the shard_changes_apply recipe)
    def apply1(state: DataFrame, w: DataFrame): DataFrame = {
      val touched = w.select(col("doc_id")).distinct()
      state.join(touched, Seq("doc_id"), "left_anti")
        .unionByName(w.filter(col("change") =!= "removed")
          .select(col("doc_id"), col("ld")))
    }
    val v1State = ShardSnapshot.read(spark, table, schema, v1)
    val reconstructed = apply1(apply1(v1State, streamed(v1, v2)), streamed(v2, v3))
    def tableDigest(df: DataFrame): String =
      df.agg(md5(concat_ws("|", array_sort(collect_list(
        concat_ws(":", col("doc_id"), col("ld"))))))).head().getString(0)
    assert(tableDigest(reconstructed) ==
      tableDigest(ShardSnapshot.read(spark, table, schema, v3)))

    // retention violation fails loud: drop the base of a pending window
    ShardDelete.upsertByKey(spark, table, schema, "doc_id",
      Seq((30L, "UPD30")).toDF("doc_id", "ld"))
    ShardSnapshot.create(spark, table) // v4 — makes (v3, v4) pending
    ShardSnapshot.drop(spark, table, v3) // the pending window's base
    val q3 = ShardChangesStream.replay(spark, table, schema, "doc_id", out, ckpt)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    q3.stop()
    assert(err.getMessage.contains("no longer retained") ||
      Option(err.getCause).exists(_.getMessage.contains("no longer retained")))

    // offsets are MONOTONE: with every snapshot dropped (a retention
    // sweep during consumer downtime), the next end must stay at the
    // checkpointed base — a regressed 0 would later resume from a fresh
    // snapshot base and silently skip the missed catch-up windows,
    // bypassing the loud retention check above
    val empty = java.nio.file.Files
      .createTempDirectory("graft-cdc-empty").toString
    val stream = new ShardVersionsStream(empty, 0)
    val limit = org.apache.spark.sql.connector.read.streaming
      .ReadLimit.allAvailable()
    assert(stream.latestOffset(ShardVersionOffset(99), limit)
      .asInstanceOf[ShardVersionOffset].v == 99)
  }

  test("watermark base: create-then-drop churn before first delivery fails loud") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val limit = ReadLimit.allAvailable()
    def mkTable(): String = {
      val t = java.nio.file.Files
        .createTempDirectory("graft-cdc-wm").toString + "/t"
      (0L until 20L).map(i => (i, s"v$i")).toDF("doc_id", "ld")
        .write.format("graft.sources.v2.ShardSink")
        .option("path", t).mode("append").save()
      t
    }

    // (1) stream starts before ANY snapshot: offset is the 0 watermark;
    // v1, v2 created and v1 DROPPED during downtime — the r18 ADVICE
    // hole was s == 0 bypassing the retention require and silently
    // pairing only the survivors. Must fail loud now.
    val t1 = mkTable()
    val s1 = new ShardVersionsStream(t1, 0)
    val off0 = s1.initialOffset().asInstanceOf[ShardVersionOffset]
    assert(off0.v == 0, "fresh table watermark base should be -hwm = 0")
    assert(ShardSnapshot.create(spark, t1) == 1)
    assert(ShardSnapshot.create(spark, t1) == 2)
    ShardSnapshot.drop(spark, t1, 1)
    val e1 = s1.latestOffset(off0, limit).asInstanceOf[ShardVersionOffset]
    assert(e1.v == 2)
    val err = intercept[IllegalArgumentException] {
      s1.planInputPartitions(off0, e1)
    }
    assert(err.getMessage.contains("no longer retained"))

    // (2) same churn with the anchor retained: windows pair from v1
    val t2 = mkTable()
    val s2 = new ShardVersionsStream(t2, 0)
    val off2 = s2.initialOffset().asInstanceOf[ShardVersionOffset]
    assert(ShardSnapshot.create(spark, t2) == 1)
    assert(ShardSnapshot.create(spark, t2) == 2)
    val e2 = s2.latestOffset(off2, limit).asInstanceOf[ShardVersionOffset]
    val parts = s2.planInputPartitions(off2, e2)
    assert(parts.length == 1 &&
      parts.head.asInstanceOf[ShardVersionsPartition].pairs == Seq((1, 2)))

    // (3) versions created AND dropped before the stream ever started
    // are NOT its concern: the watermark pins the pre-start hwm, the
    // anchor is the first post-start version, and the feed begins there
    val t3 = mkTable()
    assert(ShardSnapshot.create(spark, t3) == 1)
    ShardSnapshot.drop(spark, t3, 1)
    val s3 = new ShardVersionsStream(t3, 0)
    val off3 = s3.initialOffset().asInstanceOf[ShardVersionOffset]
    assert(off3.v == -1, "pre-start hwm must ride the offset as -hwm")
    // no live snapshots: the offset must HOLD (not collapse to 0)
    assert(s3.latestOffset(off3, limit)
      .asInstanceOf[ShardVersionOffset].v == -1)
    assert(ShardSnapshot.create(spark, t3) == 2)
    assert(ShardSnapshot.create(spark, t3) == 3)
    val e3 = s3.latestOffset(off3, limit).asInstanceOf[ShardVersionOffset]
    val parts3 = s3.planInputPartitions(off3, e3)
    assert(parts3.length == 1 &&
      parts3.head.asInstanceOf[ShardVersionsPartition].pairs == Seq((2, 3)),
      "anchor must be the first post-start version (hwm+1), not min(live)")
  }
}
