package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Kafka-shaped streaming source (SURVEY §2.3 streaming extension): a
 * DataSource V2 `MicroBatchStream` with the exact semantics a Kafka topic
 * would have — named topic, N partitions, per-partition monotonically
 * increasing offsets, (key, value, timestamp) records — minus the broker
 * (records are generated deterministically from (partition, offset), so
 * every read of an offset range is reproducible and batch/stream parity
 * is testable).
 *
 *   spark.readStream.format("graft.sources.v2.EventLogSource")
 *     .option("topic", "events").option("partitions", 4)
 *     .option("totalPerPartition", 1000).option("batchRows", 100).load()
 *
 * The V2 streaming contract done the way the real Kafka source does it:
 *  - **offset-range planning**: each micro-batch is planInputPartitions
 *    (start, end) over per-partition offset ranges — one InputPartition
 *    per topic-partition slice, read partition-locally (no driver
 *    materialization).
 *  - **admission control** ([[SupportsAdmissionControl]]): the next batch
 *    end is computed FROM the checkpointed start offset, so rate limiting
 *    is restart-safe and offsets never regress; `reportLatestOffset`
 *    exposes the true high-watermark for lag metrics.
 *  - **checkpoint resume**: offsets serialize to JSON; a restarted query
 *    resumes from the recovered offset and re-reads nothing (asserted in
 *    EventLogSourceSpec).
 *  - the same table supports BATCH_READ over the full offset range — the
 *    "replay the topic from the beginning" path, bit-identical to what
 *    the stream delivers incrementally.
 */
class EventLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventLogSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new EventLogTable(properties.asScala.toMap)
}

object EventLogSource {
  /** Kafka wire-record analog. */
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false)))

  /** 2024-01-01 00:00:00 UTC in micros; one record per second per partition. */
  val epochStartUs: Long = 1704067200000000L

  def keyBytes(partition: Int, offset: Long): Array[Byte] =
    s"k-$partition-${offset % 100}".getBytes("UTF-8")

  /** Deterministic payload — content derived from (partition, offset). */
  def valueBytes(partition: Int, offset: Long): Array[Byte] = {
    val h = graft.functions.TextHash.mix64(partition * 1000003L + offset)
    s"""{"p": $partition, "o": $offset, "v": ${math.floorMod(h, 1000L)}}""".getBytes("UTF-8")
  }

  def timestampUs(offset: Long): Long = epochStartUs + offset * 1000000L
}

/** Per-partition offsets (index = partition id), JSON-serialized for the
  * checkpoint log. Offsets are a Seq, NOT an Array: the case-class
  * equals a wrapped Array generates is reference equality, which would
  * override the connector Offset base class's deliberate json()-based
  * equals — and the engine compares offsets with Object.equals (e.g.
  * MicroBatchExecution.isNewDataAvailable), so a live offset vs a
  * checkpoint-deserialized twin would spuriously read as "new data". */
case class EventLogOffset(offsets: Seq[Long]) extends Offset {
  override def json(): String = offsets.mkString("[", ",", "]")
}

object EventLogOffset {
  def parse(json: String): EventLogOffset = {
    val body = json.trim.stripPrefix("[").stripSuffix("]")
    EventLogOffset(
      if (body.isEmpty) Seq.empty
      else body.split(",").toIndexedSeq.map(_.trim.toLong))
  }
}

class EventLogTable(props: Map[String, String]) extends Table with SupportsRead {
  private val topic = props.getOrElse("topic", "events")
  private val partitions = props.getOrElse("partitions", "4").toInt
  private val total = props.getOrElse("totalperpartition",
    props.getOrElse("totalPerPartition", "1000")).toLong
  private val batchRows = props.getOrElse("batchrows",
    props.getOrElse("batchRows", "100")).toLong

  override def name(): String = s"event_log($topic)"
  override def schema(): StructType = EventLogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new EventLogScan(topic, partitions, total, batchRows)
    }
}

class EventLogScan(topic: String, partitions: Int, total: Long, batchRows: Long)
    extends Scan {
  override def readSchema(): StructType = EventLogSource.schema
  override def description(): String =
    s"EventLogScan(topic=$topic, partitions=$partitions, total=$total)"

  /** Batch path: the full topic replay [0, total) per partition. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      (0 until partitions).map(p =>
        EventLogInputPartition(topic, p, 0L, total): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new EventLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventLogMicroBatchStream(topic, partitions, total, batchRows)
}

class EventLogMicroBatchStream(
    topic: String, partitions: Int, total: Long, batchRows: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset =
    EventLogOffset(Seq.fill(partitions)(0L))

  override def deserializeOffset(json: String): Offset =
    EventLogOffset.parse(json)

  /** Next batch end derived from the (possibly checkpoint-recovered)
    * start — never from internal driver state, so restarts can't regress
    * or skip offsets. Advances each partition by ≤ batchRows. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EventLogOffset].offsets
    EventLogOffset(s.map(o => math.min(o + batchRows, total)))
  }

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(batchRows * partitions)

  /** True high-watermark (for lag metrics), independent of rate limits. */
  override def reportLatestOffset(): Offset =
    EventLogOffset(Seq.fill(partitions)(total))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventLogOffset].offsets
    val e = end.asInstanceOf[EventLogOffset].offsets
    (0 until partitions).flatMap { p =>
      if (e(p) > s(p)) Some(EventLogInputPartition(topic, p, s(p), e(p)): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class EventLogInputPartition(
    topic: String, partition: Int, startOffset: Long, endOffset: Long)
    extends InputPartition

class EventLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EventLogInputPartition]
    new EventLogReader(p)
  }
}

class EventLogReader(p: EventLogInputPartition) extends PartitionReader[InternalRow] {
  private val topicUtf8 = UTF8String.fromString(p.topic)
  private var offset = p.startOffset - 1

  override def next(): Boolean = {
    offset += 1
    offset < p.endOffset
  }

  override def get(): InternalRow = new GenericInternalRow(Array[Any](
    topicUtf8,
    p.partition,
    offset,
    EventLogSource.keyBytes(p.partition, offset),
    EventLogSource.valueBytes(p.partition, offset),
    EventLogSource.timestampUs(offset)))

  override def close(): Unit = ()
}
