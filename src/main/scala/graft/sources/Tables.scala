package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Fixture-table catalog over the driver-generated parquet directories
 * (/root/repo/TESTDATA.md). One parquet file per table; reads are
 * vectorized, with Catalyst pushing filters/column pruning into the scan.
 *
 * At 100 TB these would be partitioned directories (or an Iceberg/Delta
 * catalog); the API stays `DataFrame`-shaped either way, so callers don't
 * change. The JDBC production source (reference S1,
 * repository/ParameterDataRepository.java:53-78) lives in
 * [[JdbcTraceSource]] behind the same DataFrame contract.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations and TIMESTAMP(MICROS) in others. Normalize both to µs
    * TimestampNTZType — the same naive-wall-clock reading DuckDB applies,
    * so oracle comparisons line up. NANOS is unreadable by Spark's
    * vectorized reader ([PARQUET_TYPE_ILLEGAL]) unless read as raw longs
    * (legacy mode) and truncated ns→µs. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // NANOS fixtures, read as raw nano longs
        raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case TimestampNTZType => raw
      case _ => // TimestampType (reader configured for LTZ): keep the wall clock
        raw.withColumn("ts", expr("cast(ts as timestamp_ntz)"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
