package graft.sources

import java.sql.Timestamp
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Production trace source: the reference's S1 scan (Oracle
 * `TD_FD_TRACE_PARAM` via hand-written SQL,
 * repository/ParameterDataRepository.java:53-78) as a Spark JDBC read.
 *
 * The reference pushes projection, IN-list filter, time-range filter and
 * sort into the database by writing them into the SQL string; here the
 * same text is handed to `option("query", …)` so the database still
 * executes them (Spark's JDBC DataSource would also push the filters via
 * its own pushdown, but an explicit query keeps byte-for-byte parity with
 * the reference's plan and avoids depending on dialect capabilities).
 *
 * Scale note: a single JDBC query is one connection = one partition. For
 * bulk backfills use [[readPartitioned]], which splits the scan into
 * `numPartitions` parallel range queries on PARAM_INDEX — the standard
 * Spark JDBC parallel-read shape. The ORDER BY is intentionally absent
 * there (a per-connection sort would be wasted work; Spark re-sorts
 * globally only when the query asks for it).
 *
 * Harness note: no external database is reachable offline, but Derby
 * ships on the Spark classpath — JdbcTraceSourceSpec runs BOTH read
 * paths LIVE against an embedded in-memory Derby seeded with the
 * reference table (DB-side filter + sort asserted on the single-query
 * path, stripe coverage on the parallel path). The only dialect delta
 * is the timestamp-literal spelling, isolated in `tsLiteral`.
 */
object JdbcTraceSource {

  /** SQL-standard timestamp literal (Oracle, the reference's target —
    * ParameterDataRepository.java runs against Oracle). */
  val standardTsLiteral: Timestamp => String = t => s"TIMESTAMP '$t'"

  /** Derby spells the same literal as a function call — the dialect knob
    * the LIVE embedded-database spec exercises. */
  val derbyTsLiteral: Timestamp => String = t => s"TIMESTAMP('$t')"

  /** The reference query text (ParameterDataRepository.java:58-69), with
    * literals bound in place of R2DBC named parameters. `tsLiteral`
    * renders timestamp literals per target dialect (default: the
    * reference's Oracle form). */
  def querySql(ids: Seq[Long], start: Timestamp, end: Timestamp,
      tsLiteral: Timestamp => String = standardTsLiteral): String = {
    require(ids.nonEmpty, "ids must be non-empty (F3 short-circuits earlier)")
    require(!start.after(end), s"startTime must be before endTime: $start > $end")
    s"""SELECT dparam.PARAM_INDEX as paramIndex,
       |       dparam.START_TIME as startTime,
       |       dparam.END_TIME as endTime,
       |       dparam.TRACE_DATA as traceData
       |FROM TD_FD_TRACE_PARAM dparam
       |WHERE dparam.PARAM_INDEX IN (${ids.mkString(", ")})
       |  AND dparam.START_TIME >= ${tsLiteral(start)}
       |  AND dparam.START_TIME <= ${tsLiteral(end)}
       |ORDER BY dparam.PARAM_INDEX, dparam.START_TIME ASC""".stripMargin
  }

  /** Single-connection read with the full reference query pushed down. */
  def read(
      spark: SparkSession,
      url: String,
      ids: Seq[Long],
      start: Timestamp,
      end: Timestamp,
      props: Properties = new Properties,
      tsLiteral: Timestamp => String = standardTsLiteral): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", querySql(ids, start, end, tsLiteral))
      .options(propsMap(props))
      .load()

  /** Parallel read: `numPartitions` concurrent connections, each scanning
    * a PARAM_INDEX stripe (Spark's partitionColumn/lowerBound/upperBound
    * protocol). Filters applied post-scan by Catalyst still push to the
    * DB through the JDBC dialect. */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      numPartitions: Int,
      lowerParamIndex: Long,
      upperParamIndex: Long,
      props: Properties = new Properties): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "TD_FD_TRACE_PARAM")
      .option("partitionColumn", "PARAM_INDEX")
      .option("lowerBound", lowerParamIndex)
      .option("upperBound", upperParamIndex)
      .option("numPartitions", numPartitions)
      .options(propsMap(props))
      .load()

  private def propsMap(p: Properties): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    p.asScala.toMap
  }
}
