package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TraceExport
import graft.sources.Tables

/**
 * Query registry: every operator from SURVEY.md §2 has an entry here, and
 * (where ANSI-SQL-expressible) a DuckDB oracle with IDENTICAL column names.
 *
 * Determinism rules used throughout (SURVEY.md §7.4):
 *  - every query is totally ordered (unique tie-break key in the ORDER BY)
 *    so the driver's hash compare is order-stable;
 *  - double aggregations go through exact DECIMAL(12,2) arithmetic and are
 *    cast to DOUBLE only at the end, so Spark's and DuckDB's summation
 *    order can't produce ulp drift;
 *  - ORDER BY on nullable keys says NULLS FIRST explicitly (Spark's asc
 *    default) since DuckDB defaults to NULLS LAST.
 */
object Queries {

  private val D = DecimalType(12, 2)
  private def dec(c: Column): Column = c.cast(D)
  /** exact decimal sum, exported as double */
  private def sumd(c: Column): Column = sum(dec(c)).cast(DoubleType)

  // ---------------------------------------------------------------------
  // Flagship / reference-pipeline family (SURVEY §2.1)
  // ---------------------------------------------------------------------

  private val traceIds = Seq(1L, 2L, 3L, 5L, 8L, 13L)
  private val traceT0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val traceT1 = Timestamp.valueOf("2024-01-31 23:59:59")

  /** S1→S2→F1∧F2→O1→T1/T2→T4: the whole reference pipeline over a trace
    * table derived from `events` (traceData = gzip(props)), so the oracle
    * can verify the gzip round-trip by projecting `props` directly. */
  def traceExport(spark: SparkSession, dir: String): DataFrame =
    TraceExport.export(TraceExport.fromEvents(spark, dir), traceIds, traceT0, traceT1)

  val traceExportSql: String =
    """SELECT user_id AS paramIndex,
      |       ts AS startTime,
      |       ts + INTERVAL 60 SECOND AS endTime,
      |       props AS traceData
      |FROM events
      |WHERE user_id IN (1, 2, 3, 5, 8, 13)
      |  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
      |  AND ts <= TIMESTAMP '2024-01-31 23:59:59'
      |ORDER BY paramIndex, startTime""".stripMargin

  /** F3: empty IN-list short-circuits to an empty (but correctly-typed)
    * result without scanning. */
  def traceExportEmpty(spark: SparkSession, dir: String): DataFrame =
    TraceExport.export(TraceExport.fromEvents(spark, dir), Seq.empty,
      traceT0, traceT1)

  val traceExportEmptySql: String =
    """SELECT user_id AS paramIndex, ts AS startTime,
      |       ts + INTERVAL 60 SECOND AS endTime, props AS traceData
      |FROM events WHERE 1 = 0""".stripMargin

  /** Golden round-trip on the reference's exact 3 seed rows + README
    * example filter (params {1,2}, January 2024) → exactly 2 rows. */
  def traceSeedGolden(spark: SparkSession, dir: String): DataFrame =
    TraceExport.export(TraceExport.referenceSeed(spark), Seq(1L, 2L),
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-31 23:59:59"))

  val traceSeedGoldenSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), TIMESTAMP '2024-01-10 10:00:00',
      |   TIMESTAMP '2024-01-10 10:05:00',
      |   '{"value": 100, "status": "OK"}'),
      |  (CAST(2 AS BIGINT), TIMESTAMP '2024-01-15 14:30:00',
      |   TIMESTAMP '2024-01-15 14:35:00',
      |   '{"value": 250, "status": "WARN", "temp": 45.5}')
      |) AS t(paramIndex, startTime, endTime, traceData)
      |ORDER BY paramIndex""".stripMargin

  // ---------------------------------------------------------------------
  // Reference operator components, generalized over the star schema
  // ---------------------------------------------------------------------

  /** S2: projection + rename (reference ParameterDataRepository.java:59-64). */
  def s2Projection(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").as("okey"),
        col("o_custkey").as("ckey"),
        col("o_orderdate").as("odate"))
      .orderBy(col("okey"))

  val s2ProjectionSql: String =
    """SELECT o_orderkey AS okey, o_custkey AS ckey, o_orderdate AS odate
      |FROM orders ORDER BY okey""".stripMargin

  /** F1: IN-list filter (semi-join against a literal set). */
  def f1Inlist(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isin("F", "P"))
      .filter(col("o_custkey").isin(1L, 7L, 21L, 42L, 99L))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))

  val f1InlistSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus
      |FROM orders
      |WHERE o_orderstatus IN ('F', 'P') AND o_custkey IN (1, 7, 21, 42, 99)
      |ORDER BY o_orderkey""".stripMargin

  /** F2: closed-interval time-range predicate (inclusive both ends). */
  def f2Timerange(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").between(
        lit(Timestamp.valueOf("1997-01-01 00:00:00")),
        lit(Timestamp.valueOf("1997-12-31 23:59:59"))))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val f2TimerangeSql: String =
    """SELECT l_orderkey, l_linenumber, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <= TIMESTAMP '1997-12-31 23:59:59'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** O1: global two-key sort (range-partitioned exchange + mergesort),
    * made total with the unique o_orderkey tie-break. */
  def o1SortGlobal(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey").asc, col("o_orderdate").asc, col("o_orderkey").asc)

  val o1SortGlobalSql: String =
    """SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // Aggregation family (SURVEY §7.2 step 3)
  // ---------------------------------------------------------------------

  /** TPC-H Q1-shaped pricing summary: multi-measure hash aggregate with
    * exact decimal arithmetic, partial (map-side) aggregation for free. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(D)
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
          * (one + dec(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1) AS avg_qty,
      |  COUNT(1) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "trace_export" -> (traceExport _),
    "trace_export_empty" -> (traceExportEmpty _),
    "trace_seed_golden" -> (traceSeedGolden _),
    "s2_projection" -> (s2Projection _),
    "f1_inlist" -> (f1Inlist _),
    "f2_timerange" -> (f2Timerange _),
    "o1_sort_global" -> (o1SortGlobal _),
    "q1_agg" -> (q1Agg _)
  )

  def oracles: Map[String, String] = Map(
    "trace_export" -> traceExportSql,
    "trace_export_empty" -> traceExportEmptySql,
    "trace_seed_golden" -> traceSeedGoldenSql,
    "s2_projection" -> s2ProjectionSql,
    "f1_inlist" -> f1InlistSql,
    "f2_timerange" -> f2TimerangeSql,
    "o1_sort_global" -> o1SortGlobalSql,
    "q1_agg" -> q1AggSql
  )
}
