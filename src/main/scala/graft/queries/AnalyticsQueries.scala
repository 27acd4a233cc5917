package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/**
 * Aggregation + window-function families (SURVEY §2.2 — absent from the
 * reference, provided by Catalyst built-ins).
 *
 * Scale notes: plain groupBy aggregates get map-side partial aggregation
 * automatically (HashAggregate partial → shuffle on the group key →
 * final). countDistinct expands to a two-phase aggregate. Window functions
 * shuffle once on partitionBy keys; running/moving frames are computed
 * per-partition with no further exchange. Exact decimal arithmetic keeps
 * results bit-stable against the oracle regardless of partitioning.
 */
object AnalyticsQueries extends QueryFamily {

  /** TPC-H Q1-shaped multi-measure hash aggregate. */
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

  /** COUNT(DISTINCT) + grouped measures (two-phase distinct aggregate). */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sumd(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))

  /** ROLLUP over the region→nation hierarchy (customer counts + balance). */
  def aggRollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sumd(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** CUBE over two independent dimensions. */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** GROUPING SETS through the SQL entry point (temp-view + spark.sql). */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Distribution stats from exact sums: mean and (population) variance
    * derived from Σx, Σx² in exact decimal, finished in double — bit-stable
    * across engines and partitionings, unlike native stddev/variance. */
  def aggStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val sx = sum(dec(col("l_quantity"))).cast(DoubleType)
    val sxx = sum(dec(col("l_quantity")) * dec(col("l_quantity"))).cast(DoubleType)
    val n = count(lit(1))
    li.groupBy(col("l_returnflag"))
      .agg(
        n.as("n"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        (sx / n).as("mean_qty"),
        (sxx / n - (sx / n) * (sx / n)).as("var_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Approximate quantiles (GK/KLL-style sketch, mergeable across
    * partitions — the 100 TB path for percentiles; exact percentile would
    * need a global sort). Accuracy 1e6 makes the result exact at test SF,
    * which is what lets DuckDB's quantile_disc serve as the oracle. */
  def aggApproxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      // ONE sketch per group answering all four percentiles — four separate
      // percentile_approx calls would build (and merge, and shuffle) four
      // identical sketches
      .agg(percentile_approx(col("l_quantity"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(1000000)).as("qs"))
      .select(col("l_returnflag"),
        element_at(col("qs"), 1).as("q25"),
        element_at(col("qs"), 2).as("q50"),
        element_at(col("qs"), 3).as("q75"),
        element_at(col("qs"), 4).as("q95"))
      .orderBy(col("l_returnflag"))

  /** HLL++ approximate distinct count (fixed-size mergeable sketch — the
    * 100 TB path for cardinality; exact COUNT(DISTINCT) shuffles every
    * distinct value). Sketch internals differ across engines, so the raw
    * ESTIMATE is not SQL-reproducible — instead the query emits the
    * bounded-check form: the exact side (DuckDB recomputes it) plus a
    * within-5%% verdict that must be constant TRUE (rsd = 2%%, so 5%% has
    * margin). The estimate itself keeps its own bound in AnalyticsSpec. */
  def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        approx_count_distinct(col("o_custkey"), 0.02).as("__approx"),
        countDistinct(col("o_custkey")).as("exact_customers"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderstatus"), col("n_orders"), col("exact_customers"),
        (abs(col("__approx") - col("exact_customers")) <=
          col("exact_customers") * 0.05).as("within_5pct"))
      .orderBy(col("o_orderstatus"))

  /** row_number / rank / dense_rank over a per-customer price ordering;
    * top-3 per customer via the rank≤k pattern (no global sort). */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast(LongType).as("rn"),
        rank().over(w).cast(LongType).as("rnk"),
        dense_rank().over(w).cast(LongType).as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** lag/lead: gap in days between consecutive orders of a customer. */
  def windowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).as("gap_days"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Running (cumulative) total per customer — exact decimal, so the
    * incremental Spark evaluation and DuckDB's segment-tree evaluation
    * agree bitwise. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w).cast(DoubleType).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Moving frame (3-row window): sum + avg via exact decimal. */
  def windowMoving(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(-2, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast(DoubleType).as("moving_sum"),
        count(lit(1)).over(w).as("frame_n"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** RANGE-framed window — the trailing-hour aggregate per user over
    * event time: a VALUE-based frame (rangeBetween on epoch seconds)
    * that row frames cannot express; peers at the same second join the
    * frame on both engines by the SQL standard. Count + integer-exact
    * milli sum keep the oracle differential (unix_timestamp truncates
    * to whole seconds; the oracle floors epoch() to match). */
  def windowRangeHour(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch"))
      .rangeBetween(-3600, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("epoch"),
        floor(col("value") * lit(1000)).cast(LongType).as("v_milli"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("v_milli")).over(w).as("sum_milli_1h"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Apache DataSketches HLL: the sketch itself is the aggregate state —
    * unlike approx_count_distinct (which only yields a number), the
    * binary sketch is storable and union-able later, the building block
    * of incremental 100 TB cardinality pipelines. Estimates differ from
    * DuckDB's sketch library, so the query emits the bounded-check form
    * (exact side + constant-TRUE within-5%% verdict; lgK = 14 puts the
    * relative error near 1%%); raw-estimate bounds live in AnalyticsSpec. */
  def aggHllSketch(spark: SparkSession, dir: String): DataFrame = {
    val perStatus = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"),
        countDistinct(col("o_custkey")).as("exact_customers"))
    perStatus.select(
      col("o_orderstatus"),
      col("exact_customers"),
      (abs(hll_sketch_estimate(col("sk")) - col("exact_customers")) <=
        col("exact_customers") * 0.05).as("within_5pct"))
      .orderBy(col("o_orderstatus"))
  }

  /** Count-Min frequency sketch — the third sketch family next to HLL
    * (distinct) and quantiles: sub-linear heavy-hitter counts. The
    * corpus-sized side is ONE aggregate building the binary sketch
    * (mergeable state, the same incremental contract as the HLL union);
    * probing happens driver-side against the collected sketch — sketch
    * bytes are bounded by (eps, confidence), never data. Probe targets
    * are the exact top-20 tokens so the output carries estimate vs
    * truth side by side; rows-only (sketch internals are not
    * SQL-expressible) + AnalyticsSpec overestimate-bound coverage. */
  def sketchCmsTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // scope-cached: the exploded stream feeds the sketch aggregate AND
    // the exact top-20 probe targets — uncached, the second consumer
    // re-ran the full tokenize + explode + shuffle from scratch
    val toks = graft.CacheScope.scoped(Tables.documents(spark, dir)
      .select(explode(graft.operators.Dedup.tokens(col("text"))).as("token")))
    // ONE pass builds sketch + total (both aggregates over the same
    // exploded stream; the total parameterizes the CMS error bound)
    val row = toks
      .agg(count_min_sketch(col("token"), lit(0.001d), lit(0.99d), lit(42)).as("s"),
        count(lit(1)).as("n"))
      .head
    val (sketchBytes, total) = (row.getAs[Array[Byte]](0), row.getLong(1))
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    // bounded-check form: DuckDB recomputes the exact top-20 and the
    // constant-TRUE verdicts — never-underestimate is the CMS structural
    // guarantee, the overcount bound is 2×eps×N (eps = 0.001; the 2×
    // headroom over the w.p.-0.99 single-probe bound keeps the verdict
    // deterministic-safe). Raw estimates stay spec-covered.
    val slack = math.max(1L, (0.002 * total).toLong)
    // exact top-20 from the SAME cached stream (tokenFrequency's shape,
    // minus its redundant re-tokenize of the corpus)
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(20)
      .as[(String, Long)].collect()
    top.map { case (tok, exact) =>
      val est = cms.estimateCount(tok)
      (tok, exact, est >= exact, est <= exact + slack)
    }.toSeq.toDF("token", "n_exact", "no_underestimate", "within_2eps")
      .orderBy(col("token"))
  }

  /** [[sketchCmsTokens]] under the unicode lexical contract over the
    * mixed-script column — CMS point queries on a multilingual corpus
    * must count CJK tokens, not read zero (the last consumer of the r16
    * ASCII-only telemetry note). Same one-pass sketch + exact-top-20
    * bounded-check shape; the probe targets now carry both scripts. */
  def sketchCmsTokensUnicode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = graft.CacheScope.scoped(
      ExtensionQueries.withMixedText(Tables.documents(spark, dir), full = false)
        .select(explode(
          graft.operators.Dedup.tokensMode(col("mtext"), unicode = true))
          .as("token")))
    val row = toks
      .agg(count_min_sketch(col("token"), lit(0.001d), lit(0.99d), lit(42)).as("s"),
        count(lit(1)).as("n"))
      .head
    val (sketchBytes, total) = (row.getAs[Array[Byte]](0), row.getLong(1))
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val slack = math.max(1L, (0.002 * total).toLong)
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(20)
      .as[(String, Long)].collect()
    top.map { case (tok, exact) =>
      val est = cms.estimateCount(tok)
      (tok, exact, est >= exact, est <= exact + slack)
    }.toSeq.toDF("token", "n_exact", "no_underestimate", "within_2eps")
      .orderBy(col("token"))
  }

  /** The mergeable-state half of the HLL story: per-group binary sketches
    * are UNIONED into a global cardinality without rescanning rows — the
    * incremental 100 TB pattern (store per-day/partition sketches, merge
    * at query time). Bounded-check form: DuckDB recomputes the sketch
    * count and the exact global distinct; the merged estimate must land
    * within 5%% of it (constant-TRUE verdict). */
  def aggHllUnion(spark: SparkSession, dir: String): DataFrame = {
    val merged = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("__merged"),
        count(lit(1)).as("n_sketches"))
    val exact = Tables.orders(spark, dir)
      .agg(countDistinct(col("o_custkey")).as("exact_customers"))
    merged.crossJoin(broadcast(exact))
      .select(col("n_sketches"), col("exact_customers"),
        (abs(col("__merged") - col("exact_customers")) <=
          col("exact_customers") * 0.05).as("within_5pct"))
  }

  /** Sketch-only Bench twins of the three oracled sketch queries. The
    * registered (Verify) forms carry an exact `countDistinct` purely so
    * DuckDB can check the error bound — but timing those forms measures
    * the exact-distinct exchange the sketch path exists to avoid, so
    * bench deltas for the family would track the wrong plan. Bench
    * substitutes these under the same names (`Bench.benchOverrides`);
    * Verify keeps the bounded-check forms. */
  def aggApproxDistinctBench(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  def aggHllSketchBench(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"))
      .select(col("o_orderstatus"),
        hll_sketch_estimate(col("sk")).as("approx_customers"))
      .orderBy(col("o_orderstatus"))

  def aggHllUnionBench(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_customers"),
        count(lit(1)).as("n_sketches"))

  /** Custom TypedImperativeAggregate: per-customer top-3 order values via
    * a k-bounded min-heap buffer — partial aggregation ships ≤3 doubles
    * per (customer, partition) where the window-rank pattern shuffles and
    * sorts every order row. */
  def aggTopkCustom(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(graft.functions.topk_doubles(col("o_totalprice"), 3).as("top"))
      .select(col("o_custkey"),
        try_element_at(col("top"), lit(1)).as("v1"),
        try_element_at(col("top"), lit(2)).as("v2"),
        try_element_at(col("top"), lit(3)).as("v3"))
      .orderBy(col("o_custkey"))

  /** Pivot: per-customer order counts spread across status columns.
    * `pivot(col, values)` with explicit values keeps the plan a single
    * hash aggregate (no extra distinct-values job) — the scale form. */
  def aggPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_custkey"), col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
      .orderBy(col("o_custkey"))

  /** Unpivot (melt): wide per-lineitem rate columns → long (measure,
    * value) pairs — the inverse reshape, one Expand node, no shuffle. */
  def aggUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "rate")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))

  /** ntile / percent_rank / cume_dist / first-last frame values — the
    * distribution-rank window family. */
  def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"),
        first(col("o_orderkey")).over(wFrame).as("cheapest_order"),
        last(col("o_orderkey")).over(wFrame).as("priciest_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q1_agg" -> (q1Agg _),
    "agg_distinct" -> (aggDistinct _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_stats" -> (aggStats _),
    "agg_approx_quantiles" -> (aggApproxQuantiles _),
    "agg_approx_distinct" -> (aggApproxDistinct _),
    "agg_pivot" -> (aggPivot _),
    "agg_unpivot" -> (aggUnpivot _),
    "agg_topk_custom" -> (aggTopkCustom _),
    "agg_hll_sketch" -> (aggHllSketch _),
    "agg_hll_union" -> (aggHllUnion _),
    "window_rank" -> (windowRank _),
    "window_lag_lead" -> (windowLagLead _),
    "window_running" -> (windowRunning _),
    "window_moving" -> (windowMoving _),
    "window_range_hour" -> (windowRangeHour _),
    "sketch_cms_tokens" -> (sketchCmsTokens _),
    "sketch_cms_tokens_unicode" -> (sketchCmsTokensUnicode _),
    "window_ntile" -> (windowNtile _))

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_distinct" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_rollup" ->
      """SELECT r_name, n_name, COUNT(1) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag, COUNT(1) AS n,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1) AS mean_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1)
        |    - (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1))
        |      * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1)) AS var_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // bounded-check oracles for the sketch family: the estimate is not
    // SQL-reproducible, but the exact side is, and the within-bound
    // verdict is constant TRUE — so the oracle verifies both
    "sketch_cms_tokens" ->
      """SELECT token, n AS n_exact,
        |  TRUE AS no_underestimate, TRUE AS within_2eps
        |FROM (
        |  SELECT token, COUNT(1) AS n FROM (
        |    SELECT UNNEST(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> len(x) > 0)) AS token
        |    FROM documents)
        |  GROUP BY token ORDER BY n DESC, token LIMIT 20
        |) ORDER BY token""".stripMargin,
    // the unicode twin: exact top-20 of the RE2-replayed unicode
    // tokenizer over the mixed-script column, same constant-TRUE bounds
    "sketch_cms_tokens_unicode" ->
      s"""SELECT token, n AS n_exact,
        |  TRUE AS no_underestimate, TRUE AS within_2eps
        |FROM (
        |  SELECT token, COUNT(1) AS n FROM (
        |    SELECT UNNEST(${ExtensionQueries.tokensUniSql("mtext")}) AS token
        |    FROM (SELECT doc_id,
        |            ${ExtensionQueries.mixedSqlExpr(full = false)} AS mtext
        |          FROM documents))
        |  GROUP BY token ORDER BY n DESC, token LIMIT 20
        |) ORDER BY token""".stripMargin,
    "agg_approx_distinct" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  COUNT(DISTINCT o_custkey) AS exact_customers,
        |  TRUE AS within_5pct
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_hll_sketch" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS exact_customers,
        |  TRUE AS within_5pct
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_hll_union" ->
      """SELECT CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_sketches,
        |  COUNT(DISTINCT o_custkey) AS exact_customers,
        |  TRUE AS within_5pct
        |FROM orders""".stripMargin,
    "agg_approx_quantiles" ->
      """SELECT l_returnflag,
        |  QUANTILE_DISC(l_quantity, 0.25) AS q25,
        |  QUANTILE_DISC(l_quantity, 0.5) AS q50,
        |  QUANTILE_DISC(l_quantity, 0.75) AS q75,
        |  QUANTILE_DISC(l_quantity, 0.95) AS q95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_topk_custom" ->
      """SELECT o_custkey,
        |  (list_sort(list(o_totalprice), 'DESC'))[1] AS v1,
        |  (list_sort(list(o_totalprice), 'DESC'))[2] AS v2,
        |  (list_sort(list(o_totalprice), 'DESC'))[3] AS v3
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "agg_pivot" ->
      """SELECT o_custkey,
        |  COUNT(1) FILTER (o_orderstatus = 'F') AS n_f,
        |  COUNT(1) FILTER (o_orderstatus = 'O') AS n_o,
        |  COUNT(1) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "agg_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, rate FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_discount' AS measure, l_discount AS rate FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        |) ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "window_ntile" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cdist,
        |  FIRST_VALUE(o_orderkey) OVER wf AS cheapest_order,
        |  LAST_VALUE(o_orderkey) OVER wf AS priciest_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER w AS rn,
        |    RANK() OVER w AS rnk,
        |    DENSE_RANK() OVER w AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  LAG(o_orderkey, 1) OVER w AS prev_order,
        |  LEAD(o_orderkey, 1) OVER w AS next_order,
        |  CAST(DATE_DIFF('day', LAG(o_orderdate, 1) OVER w, o_orderdate) AS INT) AS gap_days
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_moving" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS moving_sum,
        |  COUNT(1) OVER w AS frame_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_range_hour" ->
      """SELECT event_id, user_id,
        |  COUNT(1) OVER w AS n_1h,
        |  CAST(SUM(v_milli) OVER w AS BIGINT) AS sum_milli_1h
        |FROM (SELECT event_id, user_id,
        |        CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch,
        |        CAST(FLOOR(value * 1000) AS BIGINT) AS v_milli
        |      FROM events) e
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin)
}
