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

  /** Reads go through the process-level resolved-schema cache (r20,
    * guide §6/§7.3 — [[ParquetSchemaCache]] has the full rationale):
    * every bare `spark.read.parquet` call paid a driver-side
    * footer-inference job, and the 282-query harnesses call `table()`
    * 1-3× per query per pass. Fixture files are immutable for the life
    * of a process, the exact lifecycle the cache contracts for. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    ParquetSchemaCache.read(spark, s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "lineitem"), "l_shipdate")

  /** Fixture regens have changed timestamp physical types between rounds
    * (see [[events]] — the round-6 regen broke 23 queries this way).
    * Normalize a date/time column to µs TimestampNTZType whatever the
    * generation shipped: NTZ passes through, LTZ keeps the wall clock
    * (UTC-pinned sessions), DATE maps to midnight, raw INT64 is treated
    * as legacy nanos. Queries and oracles then see one stable type. */
  private def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType}
    // a regen that drops/renames the column should only break the queries
    // that use it, not every read of the table (same guard as castIfPresent)
    if (!df.columns.contains(colName)) return df
    df.schema(colName).dataType match {
      case TimestampNTZType => df
      case LongType =>
        df.withColumn(colName,
          expr(s"cast(timestamp_micros($colName div 1000) as timestamp_ntz)"))
      case DateType =>
        df.withColumn(colName, col(colName).cast(TimestampNTZType))
      case _ =>
        df.withColumn(colName, expr(s"cast($colName as timestamp_ntz)"))
    }
  }

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations and TIMESTAMP(MICROS) in others. Normalize both to µs
    * TimestampNTZType — the same naive-wall-clock reading DuckDB applies,
    * so oracle comparisons line up. NANOS is unreadable by Spark's
    * vectorized reader ([PARQUET_TYPE_ILLEGAL]) unless read as raw longs
    * (legacy mode) and truncated ns→µs. */
  def events(s: SparkSession, d: String): DataFrame = {
    // session-wide by necessity (the reader consults SQLConf at scan
    // planning, not a per-read option). Deliberate, narrow side effect:
    // the flag only changes behavior for TIMESTAMP(NANOS) parquet, which
    // Spark otherwise refuses to read at all ([PARQUET_TYPE_ILLEGAL]) —
    // it turns a hard error into a long column, never alters a readable
    // file's result.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    castIfPresent(normalizeTs(table(s, d, "events"), "ts"),
      "event_id" -> "bigint", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string")
  }
  /** Documents and embeddings get the same insurance as the time columns:
    * pin the integral/float widths every operator assumes (doc ids and
    * counts as BIGINT, labels as INT, embedding lanes as FLOAT). A regen
    * that ships int32 counts or float64 lanes then costs a no-op cast in
    * the plan (Catalyst folds same-type casts away), not 40 broken
    * queries. Unknown/extra columns pass through untouched. */
  def documents(s: SparkSession, d: String): DataFrame =
    castIfPresent(table(s, d, "documents"),
      "doc_id" -> "bigint", "n_chars" -> "bigint",
      "text" -> "string", "lang" -> "string", "source" -> "string")

  def embeddings(s: SparkSession, d: String): DataFrame = {
    val t = table(s, d, "embeddings")
    // The float pin is the ONE width pin that changes VALUES rather than
    // representation: a regen shipping array<double> would silently
    // truncate lanes to float while the DuckDB oracle reads the raw
    // doubles at full precision — cosine orderings could then diverge
    // near ties with no failing signal anywhere. Fail loudly instead;
    // widening the engine to float64 is a deliberate decision, not a
    // cast default.
    t.schema.find(_.name == "embedding").map(_.dataType).foreach {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => ()
      case other => throw new IllegalArgumentException(
        s"embeddings.embedding shipped as $other but the engine pins array<float>; " +
          "a silent narrowing cast would desync Spark results from the full-precision " +
          "oracle read — regenerate the fixture or widen the engine's lane type deliberately")
    }
    castIfPresent(t,
      "vec_id" -> "bigint", "label" -> "int", "embedding" -> "array<float>")
  }

  private def castIfPresent(df: DataFrame, casts: (String, String)*): DataFrame = {
    import org.apache.spark.sql.functions.col
    val present = df.columns.toSet
    casts.filter { case (c, _) => present(c) }.foldLeft(df) {
      case (acc, (c, t)) => acc.withColumn(c, col(c).cast(t))
    }
  }
}
