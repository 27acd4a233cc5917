package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /**
   * @param exact `true` = per-value distinct counting; NOTE the count is
   *   over 64-bit `xxhash64` digests of the values, not the values
   *   themselves — "exact" means exact-modulo-2⁻⁶⁴-hash-collisions (the
   *   repo-wide set convention, e.g. shingle sets), in exchange for an
   *   8-byte distinct exchange instead of shuffling raw values (the r9
   *   scale probe measured the raw-string form going 1.7× super-linear).
   *   Callers comparing against a truly exact oracle must replicate the
   *   hash (DuckDB oracles here count raw distincts, which agree unless
   *   a fixture engineers a 64-bit collision). `false` =
   *   `approx_count_distinct` (HLL, ±2%, no Expand) — the 100 TB default.
   */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        // exact distinct counts 64-bit HASHES of the values, not the
        // values: equal modulo 2⁻⁶⁴ collisions (the repo-wide set
        // convention, e.g. shingle sets), while the distinct exchange
        // carries 8 bytes per row instead of the raw value — on a text
        // column that is the difference between shuffling digests and
        // shuffling the corpus, and fixed-width grouping keys keep the
        // hash aggregate out of its sort-based fallback (the r9 scale
        // probe measured the raw-string form going 1.7× super-linear
        // from 5k→50k docs; the hashed form is the one that holds at
        // 100 TB). xxhash64 null-handling: count(col) already excludes
        // nulls from n_nonnull, and countDistinct ignores null inputs,
        // so hashing col directly — where a null maps to the seed — must
        // be guarded: keep nulls null through the hash.
        (if (exact) countDistinct(when(col(c).isNotNull, xxhash64(col(c))))
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

  /**
   * Algebraically mergeable per-group moment statistics (count / sum /
   * sum-of-squares / min / max over an integer metric): every field is a
   * semigroup, so yesterday's stats table plus a new batch's stats MERGE
   * into today's ([[mergeMomentStats]]) without rescanning the standing
   * corpus — the incremental-view-maintenance shape of a nightly stats
   * refresh. At 100 TB the difference is a batch-sized scan versus a
   * corpus-sized one, every day. Variance and mean derive downstream
   * from (n, Σx, Σx²) exactly; no float travels through storage.
   */
  def momentStats(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // widen BEFORE the square: on an int-typed metric the per-row x·x
    // evaluates in int and overflows past x ≈ 46k (ANSI Spark — the 4.x
    // default — aborts the job; non-ANSI wraps silently and the corrupt
    // sum would propagate through every future mergeMomentStats)
    val v = col(valueCol).cast("long")
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(v).as("sum_chars"),
        sum(v * v).as("sum_chars_sq"),
        min(v).as("min_chars"),
        max(v).as("max_chars"))
  }

  /** Merge any number of [[momentStats]] tables (union → re-aggregate
    * with each field's own combine: +, +, +, min, max). Associative and
    * commutative, so batches can merge in any order or tree shape. */
  def mergeMomentStats(groupCol: String, tables: DataFrame*): DataFrame = {
    require(tables.nonEmpty, "need at least one stats table")
    tables.reduce(_ unionByName _)
      .groupBy(col(groupCol))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("sum_chars")).as("sum_chars"),
        sum(col("sum_chars_sq")).as("sum_chars_sq"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"))
  }

  /**
   * EXACT equi-depth histogram boundaries — the value-distribution
   * summary engines keep for cardinality estimation and pipelines keep
   * for drift monitoring. Boundary i (1 ≤ i < buckets) is the smallest
   * value whose cumulative count covers fraction i/buckets, computed by
   * the [[Sampling.percentileBandFilter]] recipe: aggregate a value
   * histogram (|distinct values| rows), cumulative-sum it with the
   * distributed range-partitioned prefix sum ([[Scale.rangeCumsum]] —
   * a continuous value column makes the histogram corpus-sized, where
   * a naive global-window cumsum would serialize on one reducer), and
   * pick boundaries with INTEGER cross-multiplied comparisons
   * (`buckets·cum ≥ i·total`, no float quantiles) — so the result is
   * bit-reproducible and hash-oracled.
   * The corpus itself is touched by one hash aggregate; no global sort
   * of the data, no percentile_approx error bars.
   */
  def equiDepthHistogram(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets: $buckets")
    // NULLs hold no position in the value order: the histogram groupBy
    // would keep a NULL group that sorts FIRST, inflating every
    // cumulative count (shifting all boundaries left) and potentially
    // emitting a NULL boundary row that NPEs the histogramDrift-style
    // collect. Percentiles are over the observed (non-null) values.
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("__cnt"))
    val cum = Scale.rangeCumsum(hist, "v", "__cnt", "__cum", "__total")
    cum.select(col("v"), col("__cum"), col("__cnt"), col("__total"),
        explode(sequence(lit(1), lit(buckets - 1))).as("bucket"))
      .filter(lit(buckets.toLong) * col("__cum") >= col("bucket") * col("__total") &&
        lit(buckets.toLong) * (col("__cum") - col("__cnt")) <
          col("bucket") * col("__total"))
      .select(col("bucket"), col("v").as("boundary"))
  }

  /**
   * Distribution-drift gate between two corpus snapshots over an
   * integer-valued column (lengths, token counts, quality scores) —
   * the nightly "did the new drop change shape?" monitor. The binning
   * comes from [[equiDepthHistogram]] over the REFERENCE snapshot
   * (industry practice: score drift against the baseline's bins), and
   * the statistic is total-variation distance in EXACT fixed point:
   *
   *   p_ppm(bin)  = (10⁶ · c_bin) div n          (per snapshot)
   *   tv_ppm      = (Σ_bins |p_old − p_new|) div 2
   *
   * — all integer floor arithmetic over exact counts, so unlike
   * PSI/chi² (whose `ln`/division make cross-engine bits diverge) the
   * whole report hash-oracles. TV is also the drift measure with a
   * direct reading: the fraction of probability mass that moved.
   *
   * Values outside the reference range land in the edge bins (the
   * standard clamp — new data beyond the old max IS drift, and it
   * counts toward the last bin's mass). Boundaries are collected
   * driver-side (≤ buckets−1 longs — model state, the centroid/CMS
   * precedent), so each snapshot is binned by a codegen'd indicator
   * sum in ONE map-only pass: no join, no sort, two scans total plus
   * the reference's boundary aggregate.
   *
   * @return one row per bin: counts, shares (ppm), |Δ| — plus the
   *         global `tv_ppm` and `drifted` verdict repeated per row
   *         (bins × small constant output; the verdict row-set shape
   *         every gate query here uses)
   */
  def histogramDrift(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      valueCol: String,
      buckets: Int = 10,
      thresholdPpm: Long = 100000L): DataFrame = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000L,
      s"thresholdPpm must be a ppm fraction: $thresholdPpm")
    val spark = oldSnap.sparkSession
    // NULLs carry no distribution mass (they'd otherwise pile into bin 1
    // as fake low-end probability, and a null boundary would NPE the
    // collect below) — gate null RATES with checkConstraints; this
    // operator compares the distributions of the values that exist.
    val o = oldSnap.filter(col(valueCol).isNotNull)
    val n = newSnap.filter(col(valueCol).isNotNull)
    // fail fast on an empty side: 0/0 shares would make every per-bin
    // ppm — and the drifted verdict itself — NULL, and a gate filtering
    // on `drifted` would silently PASS the most drastic drift there is
    // (an ingest that produced nothing)
    require(!o.isEmpty, "reference snapshot has no non-null values to bin")
    require(!n.isEmpty,
      "new snapshot has no non-null values — that is an ingest failure, " +
        "not a measurable distribution")
    val bnds = equiDepthHistogram(o, valueCol, buckets)
      .orderBy(col("bucket"))
      .select(col("boundary").cast("long")).collect().map(_.getLong(0)).toSeq
    // bin = 1 + Σ [v > boundary_i] — identical to the oracle's
    // 1 + COUNT(boundaries < v), repeated-boundary-safe (empty bins
    // between equal boundaries simply stay at count 0)
    def binExpr(v: org.apache.spark.sql.Column) =
      bnds.foldLeft(lit(1L)) { (acc, b) =>
        acc + when(v > lit(b), 1L).otherwise(0L)
      }
    def counts(df: DataFrame, as: String) =
      df.select(binExpr(col(valueCol).cast("long")).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(as))
    val spine = spark.range(1, buckets + 1).select(col("id").as("bin"))
    val perBin = spine
      .join(counts(o, "__c1"), Seq("bin"), "left")
      .join(counts(n, "__c2"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("__c1"), lit(0L)).as("n_old"),
        coalesce(col("__c2"), lit(0L)).as("n_new"))
    // the window spans `buckets` rows — a deliberate tiny
    // single-partition window, same as equiDepthHistogram's
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    perBin
      .withColumn("__t1", sum(col("n_old")).over(wAll))
      .withColumn("__t2", sum(col("n_new")).over(wAll))
      .withColumn("p_old_ppm", expr("(1000000 * n_old) DIV __t1"))
      .withColumn("p_new_ppm", expr("(1000000 * n_new) DIV __t2"))
      .withColumn("delta_ppm", abs(col("p_old_ppm") - col("p_new_ppm")))
      .withColumn("__sd", sum(col("delta_ppm")).over(wAll))
      .withColumn("tv_ppm", expr("__sd DIV 2"))
      .withColumn("drifted", col("tv_ppm") > thresholdPpm)
      .drop("__t1", "__t2", "__sd")
      .orderBy(col("bin"))
  }

  /** Constraint verification (the Deequ / great-expectations gate):
    * evaluate a set of named row-level constraints IN PARALLEL — every
    * row against every rule, unlike [[attrition]]'s sequential
    * first-fail waterfall — plus table-level uniqueness constraints,
    * and report violations per constraint. The contract every ingest
    * gate wants: "which invariants does this drop break, and how
    * often", not just "how many rows died".
    *
    * Scale shape: ONE aggregate over one scan — each row rule is a
    * conditional-sum aggregate, each uniqueness key an exact
    * `countDistinct` (the multi-distinct Expand cost; swap for
    * `approx_count_distinct` at 100 TB when ±2% suffices), and the
    * per-constraint rows are unpivoted from the single 1-row result.
    * A NULL rule evaluation counts as a violation ([[violates]], the
    * same charging rule as the attrition waterfall — an invariant that
    * cannot be evaluated does not hold).
    *
    * @param rowRules (name, predicate-that-must-hold) per row
    * @param uniqueKeys columns under PRIMARY-KEY semantics (duplicate-
    *                   free AND non-null): reported as `unique:<col>`
    *                   with violations = rows − countDistinct, which
    *                   charges every duplicate beyond the first and
    *                   every NULL-keyed row — e.g. (1, 1, NULL, NULL)
    *                   is 3 violations (one dup extra + two NULLs)
    * @return (`constraint_name`, `n_violations`, `passed`) ordered by
    *         name (`constraint` itself is a reserved word downstream)
    */
  def checkConstraints(
      df: DataFrame,
      rowRules: Seq[(String, Column)],
      uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueKeys.nonEmpty, "no constraints given")
    val names = rowRules.map(_._1) ++ uniqueKeys.map(k => s"unique:$k")
    // colliding names would make the orderBy tie-order — and therefore
    // the hash-compared output — nondeterministic
    require(names.distinct.size == names.size,
      s"constraint names must be unique: ${names.diff(names.distinct).distinct}")
    val ruleAggs = rowRules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(violates(pred), lit(1L)).otherwise(lit(0L))).as(s"__v$i")
    }
    val keyAggs = uniqueKeys.zipWithIndex.map { case (k, i) =>
      countDistinct(col(k)).as(s"__u$i")
    }
    val aggs = ruleAggs ++ keyAggs :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val ruleRows = rowRules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("constraint_name"),
        coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
    }
    val keyRows = uniqueKeys.zipWithIndex.map { case (k, i) =>
      struct(lit(s"unique:$k").as("constraint_name"),
        (col("__total") - col(s"__u$i")).as("n_violations"))
    }
    one.select(explode(array(ruleRows ++ keyRows: _*)).as("__c"))
      .select(col("__c.constraint_name"), col("__c.n_violations"),
        (col("__c.n_violations") === 0L).as("passed"))
      .orderBy(col("constraint_name"))
  }

  /**
   * Pipeline attrition waterfall: given an ORDERED list of named filter
   * stages, report per stage how many rows entered, were rejected, and
   * survived — the "where did my corpus go" accounting every cleaning
   * pipeline owes its operators (a stage that silently eats 40% of a
   * source is a bug report, not a filter). Stages short-circuit like
   * the real pipeline: a row is charged to the FIRST stage whose
   * predicate it fails and never evaluated by later ones, so the
   * waterfall telescopes exactly (`n_out(i)` = `n_in(i+1)`).
   *
   * Scale shape: ONE scan of the input computes every row's
   * first-failing stage (a single codegen'd CASE chain — adding stages
   * adds no passes), then one tiny aggregate (≤ stages+1 groups). The
   * per-stage cumulative arithmetic runs on that stage-sized frame; the
   * unpartitioned window is over `|stages|` rows, not data. The grouped
   * counts are [[graft.CacheScope]]-scoped because both the per-stage
   * join and the total consume them — one scan, not two.
   *
   * @param stages (name, predicate) in pipeline order; a row passes a
   *               stage when the predicate is true
   * @return (`stage_no`, `stage`, `n_in`, `n_rejected`, `n_out`)
   */
  def attrition(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "attrition needs at least one stage")
    val counts = graft.CacheScope.scoped(
      df.select(firstFailStage(stages).as("__ff")).groupBy(col("__ff"))
        .agg(count(lit(1)).as("__rej")))
    waterfall(counts, stages.map(_._1))
  }

  /** First-failing-stage index (NULL = survives every stage) — ONE
    * codegen'd CASE chain, shared verbatim by [[attrition]] and its
    * streaming twin [[graft.streaming.AttritionStream]] so the two can
    * never drift on charging semantics. A NULL predicate charges the
    * row to that stage: `df.filter(pred)` keeps only TRUE rows, so a
    * row the real pipeline would drop on NULL (e.g. a schema-drift
    * null-filled column) must not be reported as a survivor. */
  def firstFailStage(stages: Seq[(String, Column)]): Column =
    stages.zipWithIndex.foldRight(lit(null).cast("int")) {
      case (((_, pred), i), rest) => when(violates(pred), lit(i)).otherwise(rest)
    }

  /** THE violation rule — `pred` does not hold, with NULL counting as a
    * violation (`filter(pred)` keeps only TRUE rows). One definition
    * shared by [[firstFailStage]] and [[checkConstraints]] so the
    * waterfall and the constraint gate can never drift on charging. */
  private def violates(pred: Column): Column = !coalesce(pred, lit(false))

  /** Waterfall presentation over per-stage rejection counts
    * (`__ff`, `__rej`). Counts are associative, so the same finisher
    * serves the one-shot batch report and any cumulative snapshot the
    * streaming twin emits — feeding it counts accumulated over n
    * micro-batches yields exactly the batch report over their union. */
  def waterfall(counts: DataFrame, stageNames: Seq[String]): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    // coalesce: an EMPTY input (or a snapshot before the first
    // micro-batch) must report zeros, not a NULL-total waterfall
    val total = counts.agg(coalesce(sum(col("__rej")), lit(0L)).as("__total"))
    val stageDim = stageNames.zipWithIndex
      .map { case (name, i) => (i.toLong, name) }
      .toDF("stage_no", "stage")
    val before = org.apache.spark.sql.expressions.Window
      .orderBy(col("stage_no"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    stageDim
      .join(counts, col("stage_no") === col("__ff"), "left")
      .crossJoin(broadcast(total))
      .select(col("stage_no"), col("stage"),
        coalesce(col("__rej"), lit(0L)).as("n_rejected"), col("__total"))
      .withColumn("__cum_before",
        coalesce(sum(col("n_rejected")).over(before), lit(0L)))
      .select(col("stage_no"), col("stage"),
        (col("__total") - col("__cum_before")).as("n_in"),
        col("n_rejected"),
        (col("__total") - col("__cum_before") - col("n_rejected")).as("n_out"))
      .orderBy(col("stage_no"))
  }
}
