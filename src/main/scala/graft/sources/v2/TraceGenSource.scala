package graft.sources.v2

import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, In, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 implementation of the reference's seeded trace ingest
 * (W1, config/DataInitializer.java:39-43) scaled to arbitrary row counts:
 * a deterministic generator of `TD_FD_TRACE_PARAM`-shaped rows
 * (paramIndex, startTime, endTime, traceData = gzipped ragged JSON).
 *
 *   spark.read.format("graft.sources.v2.TraceGenSource")
 *     .option("rows", 100000).option("nParams", 64).option("partitions", 8)
 *     .load()
 *
 * The point is the V2 contract done right for scale:
 *  - **partition pruning via filter pushdown**: rows are laid out so each
 *    input partition covers a contiguous paramIndex range; EqualTo/In/
 *    range filters on paramIndex drop whole partitions at planning time
 *    (observable via [[TraceGenScan.lastPlannedPartitions]]).
 *  - **column pruning**: only requested columns are generated — a
 *    projection that drops traceData never pays for gzip.
 *  - rows are generated partition-locally (no driver materialization),
 *    so `rows=10¹²` plans the same as `rows=10³`.
 */
class TraceGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TraceGenSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TraceGenTable(properties.asScala.toMap)
}

object TraceGenSource {
  val schema: StructType = StructType(Seq(
    StructField("paramIndex", LongType, nullable = false),
    StructField("startTime", TimestampNTZType, nullable = false),
    StructField("endTime", TimestampNTZType, nullable = false),
    StructField("traceData", BinaryType, nullable = false)))

  /** 2024-01-01 00:00:00 UTC in micros. */
  val epochStartUs: Long = 1704067200000000L

  private val payloads = Array(
    """{"value": 100, "status": "OK"}""",
    """{"value": 250, "status": "WARN", "temp": 45.5}""",
    """{"value": 500, "status": "CRITICAL", "pressure": 1.5}""")

  def payloadJson(rowId: Long): String = payloads((rowId % 3).toInt)

  def payloadGzip(rowId: Long): Array[Byte] =
    graft.functions.GzipCodec.compress(
      payloadJson(rowId).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Contiguous layout: rowId → paramIndex (1-based), so a row-range
    * partition covers a contiguous param range (the pruning invariant). */
  def paramOf(rowId: Long, rows: Long, nParams: Long): Long =
    rowId * nParams / rows + 1
}

class TraceGenTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "trace_gen"
  override def schema(): StructType = TraceGenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TraceGenScanBuilder(
      props.getOrElse("rows", "1000").toLong,
      props.getOrElse("nparams", props.getOrElse("nParams", "16")).toLong,
      props.getOrElse("partitions", "8").toInt)
}

class TraceGenScanBuilder(rows: Long, nParams: Long, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TraceGenSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept ONLY the paramIndex predicate shapes the reader evaluates
    // EXACTLY — an accepted filter leaves Spark's residual, so nothing
    // re-checks it post-scan; accepting e.g. an In containing NULL and
    // then approximating it would return rows the filter excludes
    // (IN (1, NULL) matches only param = 1 in SQL)
    def isLongVal(v: Any): Boolean =
      v.isInstanceOf[Long] || v.isInstanceOf[java.lang.Long]
    val (accepted, residual) = filters.partition {
      case EqualTo("paramIndex", v) => isLongVal(v)
      case In("paramIndex", vs) => vs != null && vs.forall(isLongVal)
      case GreaterThanOrEqual("paramIndex", v) => isLongVal(v)
      case LessThanOrEqual("paramIndex", v) => isLongVal(v)
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = TraceGenScan(rows, nParams, partitions, pushed, required)
}

case class TraceGenScan(
    rows: Long,
    nParams: Long,
    partitions: Int,
    pushed: Array[Filter],
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TraceGenScan(rows=$rows, PushedFilters=${pushed.mkString("[", ", ", "]")})"

  // pushFilters only accepts long-valued shapes, so every case here is
  // exact; the catch-alls stay CONSERVATIVE (keep the partition) because
  // pruning may only ever drop partitions that provably cannot match
  private def paramRangeMatches(lo: Long, hi: Long): Boolean =
    pushed.forall {
      case EqualTo("paramIndex", v: Long) => v >= lo && v <= hi
      case In("paramIndex", vs) => vs.exists {
        case v: Long => v >= lo && v <= hi
        case _ => false
      }
      case GreaterThanOrEqual("paramIndex", v: Long) => hi >= v
      case LessThanOrEqual("paramIndex", v: Long) => lo <= v
      case _ => true
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val chunk = math.max(1L, (rows + partitions - 1) / partitions)
    val parts = (0L until rows by chunk).map { start =>
      val end = math.min(start + chunk, rows)
      TraceGenPartition(start, end, rows, nParams)
    }.filter { p =>
      // pruning: partition [start, end) covers params [pLo, pHi]
      val pLo = TraceGenSource.paramOf(p.start, rows, nParams)
      val pHi = TraceGenSource.paramOf(p.end - 1, rows, nParams)
      paramRangeMatches(pLo, pHi)
    }.toArray[InputPartition]
    TraceGenScan.lastPlannedPartitions.set(parts.length)
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TraceGenReaderFactory(pushed, required)
}

object TraceGenScan {
  /** Test observability: number of partitions planned by the last scan. */
  val lastPlannedPartitions = new AtomicInteger(-1)
}

case class TraceGenPartition(start: Long, end: Long, rows: Long, nParams: Long)
    extends InputPartition

class TraceGenReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TraceGenPartition]
    new TraceGenReader(p, pushed, required)
  }
}

class TraceGenReader(
    p: TraceGenPartition,
    pushed: Array[Filter],
    required: StructType) extends PartitionReader[InternalRow] {

  private var rowId = p.start - 1
  private var current: InternalRow = _

  private def keep(param: Long): Boolean = pushed.forall {
    case EqualTo("paramIndex", v: Long) => param == v
    case In("paramIndex", vs) => vs.exists {
      case v: Long => param == v
      case _ => false // unreachable: pushFilters rejects non-long elements
    }
    case GreaterThanOrEqual("paramIndex", v: Long) => param >= v
    case LessThanOrEqual("paramIndex", v: Long) => param <= v
    case other => throw new IllegalStateException(
      s"filter accepted by pushFilters but not evaluable here: $other")
  }

  override def next(): Boolean = {
    while (rowId + 1 < p.end) {
      rowId += 1
      val param = TraceGenSource.paramOf(rowId, p.rows, p.nParams)
      if (keep(param)) {
        val startUs = TraceGenSource.epochStartUs + rowId * 60000000L // one per minute
        current = new GenericInternalRow(required.fields.map(_.name).map {
          case "paramIndex" => param
          case "startTime" => startUs
          case "endTime" => startUs + 300000000L // +5 minutes
          case "traceData" => TraceGenSource.payloadGzip(rowId)
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }.asInstanceOf[Array[Any]])
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
