package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dataset profiling (SURVEY §2.3 extension surface): the one-pass
 * column-statistics sweep every ingest pipeline runs before anything
 * else touches a new drop — null rates, exact cardinalities, value
 * bounds — the Deequ / great-expectations class of check, expressed as
 * a plain aggregate so it rides the same engine as the queries it
 * guards.
 *
 * Output schema (one row per profiled column, ordered by name):
 * `column_name, n_rows, n_nonnull, n_distinct, min_value, max_value`.
 * Bounds are computed on the NATIVE type (so text min/max is
 * lexicographic, numeric min/max is numeric) and cast to string only
 * for the uniform output schema — both steps ANSI-portable, so the
 * whole profile carries a hash oracle.
 *
 * Scale shape: ONE scan. All per-column aggregates run in a single
 * `agg`; the per-column rows are exploded from the 1-row result,
 * driver-side-free. The exact `countDistinct`s make Catalyst plan an
 * Expand (input × |distinct aggs| before partial aggregation) — the
 * standard multi-distinct cost; at 100 TB swap `countDistinct` for
 * `approx_count_distinct` (HLL, single pass, no Expand) when ±2% is
 * acceptable — the switch is one flag here, and the output contract
 * (exact vs approx) is the only thing that changes.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__rows").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column_name"))
  }
}
