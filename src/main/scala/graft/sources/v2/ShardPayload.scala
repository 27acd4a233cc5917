package graft.sources.v2

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.{Binary, RecordConsumer}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/**
 * Payload format abstraction for [[ShardSink]] tables — the columnar
 * increment (r16 verdict's missing #4): the sidecar machinery
 * (manifest / stats / bloom / schema / lock / snapshot) is
 * format-agnostic by design, and this file carries the whole contract
 * onto PARQUET shards. JSONL stays the default (the interchange lingua
 * franca); `format=parquet` buys columnar reads (column pruning inside
 * a shard — a 2-column projection stops parsing whole JSON rows),
 * row-group statistics for filtered scans, and several× fewer bytes at
 * rest — compounding with every shard-level prune the store already
 * has.
 *
 * The format is a TABLE-LEVEL property pinned in `_SCHEMA` (`#format`
 * header — the same meta-pinning discipline the BM25 index uses for its
 * tokenizer mode): mixing formats in one manifest would make every
 * reader guess per file, so a mismatched append is REFUSED loud at plan
 * time and again inside the locked commit, before any rename. A
 * pre-r17 `_SCHEMA` with no `#format` line reads as jsonl — bit-
 * compatible with every existing table.
 *
 * DEFAULT-FORMAT DECISION (r18, deliberate): fresh tables still default
 * to JSONL; parquet is one explicit `format=parquet` at table creation
 * and pinned forever after. Rationale: (1) the default governs what a
 * pipeline gets when it DIDN'T choose — for an interchange-first ingest
 * store, line-JSON debuggability and tool-chain universality are the
 * safer surprise, while a 100 TB ANALYTICAL table is always a
 * deliberate creation whose author should (and, in every oracled
 * lifecycle row here, does) choose parquet for the columnar prunes;
 * (2) flipping the default silently changes the physical payload of
 * every EXISTING pipeline's next fresh table — the pin protects old
 * tables, not old code paths; (3) both formats ride identical sidecar /
 * manifest / tombstone / V2-scan machinery, so the columnar path's
 * coverage does not depend on the default. Revisit if the store ever
 * grows a CREATE TABLE surface where the format is always explicit.
 *
 * The parquet writer is parquet-hadoop's [[ParquetWriter]] under a
 * purpose-built [[WriteSupport]] over Catalyst [[InternalRow]]s —
 * NOT a Spark-internal class (those are private API): the sink's row
 * schema is flat primitives by contract, so the record shape is a
 * dozen lines. Types round-trip exactly: short/byte annotate INT(16)/
 * INT(8) so a schema-driven read restores the written Spark type.
 */
private[graft] object ShardPayload {

  val Jsonl = "jsonl"
  val Parquet = "parquet"

  /** Write option on [[ShardSink]] selecting the payload format. */
  val OptionKey = "format"

  def validate(fmt: String): String = fmt match {
    case Jsonl | Parquet => fmt
    case other => throw new IllegalArgumentException(
      s"unknown shard payload format '$other' — supported: $Jsonl, $Parquet")
  }

  def extensionOf(fmt: String): String = fmt match {
    case Parquet => ".parquet"
    case _ => ".jsonl"
  }

  /** The table's payload format: the `_SCHEMA` pin, jsonl when the
    * table predates `_SCHEMA` or the pin (every pre-r17 table). */
  def of(fs: FileSystem, dir: Path): String =
    ShardSchema.readIfExists(fs, dir).map(_.format).getOrElse(Jsonl)

  /** Read shard files of a known format with the table schema. */
  def read(spark: SparkSession, schema: StructType, fmt: String,
      files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else fmt match {
      case Parquet => spark.read.schema(schema).parquet(files: _*)
      case _ => spark.read.schema(schema).json(files: _*)
    }

  /** One shard file's writer — the task-side strategy behind
    * [[ShardDataWriter]]. */
  trait Writer {
    def write(row: InternalRow): Unit
    def close(): Unit
  }

  def newWriter(
      fmt: String, file: Path, schema: StructType,
      conf: Configuration): Writer = fmt match {
    case Parquet => new ParquetShardWriter(file, schema, conf)
    case _ => new JsonlShardWriter(file, schema, conf)
  }

  private final class JsonlShardWriter(
      file: Path, schema: StructType, conf: Configuration) extends Writer {
    private val out = new BufferedWriter(new OutputStreamWriter(
      file.getFileSystem(conf).create(file, false), StandardCharsets.UTF_8))
    override def write(row: InternalRow): Unit = {
      out.write(ShardSink.jsonLine(schema, row))
      out.write('\n')
    }
    override def close(): Unit = out.close()
  }

  private final class ParquetShardWriter(
      file: Path, schema: StructType, conf: Configuration) extends Writer {
    private val writer = new ParquetWriter[InternalRow](
      file, new InternalRowWriteSupport(schema),
      CompressionCodecName.SNAPPY,
      ParquetWriter.DEFAULT_BLOCK_SIZE, ParquetWriter.DEFAULT_PAGE_SIZE,
      ParquetWriter.DEFAULT_PAGE_SIZE,
      ParquetWriter.DEFAULT_IS_DICTIONARY_ENABLED,
      ParquetWriter.DEFAULT_IS_VALIDATING_ENABLED,
      ParquetWriter.DEFAULT_WRITER_VERSION, conf)
    override def write(row: InternalRow): Unit = writer.write(row)
    override def close(): Unit = writer.close()
  }

  /** Parquet message type for the sink's flat-primitive schema: every
    * field optional (the sink's columns are nullable by evolution),
    * sub-int integrals annotated so the Spark type round-trips. */
  private[v2] def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t: Type = f.dataType match {
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case LongType => Types.optional(PrimitiveTypeName.INT64).named(f.name)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32).named(f.name)
        case ShortType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.intType(16, true)).named(f.name)
        case ByteType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.intType(8, true)).named(f.name)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE).named(f.name)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT).named(f.name)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN).named(f.name)
        case other => throw new IllegalStateException(
          s"ShardSink.validate admits no $other") // guarded at plan time
      }
      b.addField(t)
    }
    b.named("graft_shard")
  }

  private final class InternalRowWriteSupport(schema: StructType)
      extends WriteSupport[InternalRow] {
    private var consumer: RecordConsumer = _
    private val message = messageType(schema)
    override def init(conf: Configuration): WriteSupport.WriteContext =
      new WriteSupport.WriteContext(
        message, java.util.Collections.emptyMap[String, String]())
    override def prepareForWrite(rc: RecordConsumer): Unit = consumer = rc
    override def write(row: InternalRow): Unit = {
      consumer.startMessage()
      var i = 0
      while (i < schema.length) {
        if (!row.isNullAt(i)) {
          val f = schema(i)
          consumer.startField(f.name, i)
          f.dataType match {
            case StringType => consumer.addBinary(
              // fromREUSEDByteArray: getBytes is zero-copy when the
              // UTF8String exactly owns its backing array, and the
              // ParquetWriter retains the Binary until page flush — a
              // "constant" wrapper over a caller-owned buffer would
              // corrupt the page if a producer ever hands over reused
              // non-Unsafe rows. The reused marker makes parquet copy
              // on retention; safe for every row source.
              Binary.fromReusedByteArray(row.getUTF8String(i).getBytes))
            case LongType => consumer.addLong(row.getLong(i))
            case IntegerType => consumer.addInteger(row.getInt(i))
            case ShortType => consumer.addInteger(row.getShort(i).toInt)
            case ByteType => consumer.addInteger(row.getByte(i).toInt)
            case DoubleType => consumer.addDouble(row.getDouble(i))
            case FloatType => consumer.addFloat(row.getFloat(i))
            case BooleanType => consumer.addBoolean(row.getBoolean(i))
            case other => throw new IllegalStateException(s"unreachable: $other")
          }
          consumer.endField(f.name, i)
        }
        i += 1
      }
      consumer.endMessage()
    }
  }
}
