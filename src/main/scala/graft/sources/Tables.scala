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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos (legacy long mode) and
    * truncate to µs TimestampType — the same ns→µs truncation DuckDB
    * applies, so oracle comparisons line up. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NTZ to match the fixtures' naive timestamps (and DuckDB's reading of
    // them); under the pinned-UTC session the wall clock is unchanged.
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
