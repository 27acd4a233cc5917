package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling operators for corpus construction (SURVEY §2.3
 * extension surface): stratified sampling and mixture rebalancing, both
 * driven by a content-free integer hash of the row id rather than
 * `rand()` — the property a 100 TB pipeline needs so a re-run, a
 * repartition, or a cluster resize reproduces the exact same sample
 * (and so train/eval membership never flips between builds).
 *
 * The bucket hash is a truncated LCG kept entirely inside BIGINT range
 * (`id % 1000003` first, so the multiply can never overflow even for
 * 2^63-1 ids). That makes it expressible in ANSI SQL with identical
 * results — every operator here carries a DuckDB oracle.
 */
object Sampling {

  /**
   * Deterministic bucket in [0, 1000) for ANY integer id:
   * `((id % 1000003) * 1103515245 + 12345) % 1000000007` wrapped
   * non-negative, then `% 1000`. Plain 64-bit arithmetic with no
   * overflow anywhere (max intermediate ≈ 1.1e15 ≪ 2^63), so Spark and
   * any ANSI SQL engine agree bit-for-bit. The `(x % m + m) % m` wrap
   * guards negative ids — C-style `%` would emit a negative bucket that
   * compares below every threshold (a silent keep-everything bug) in
   * BOTH engines; for non-negative ids the wrap is the identity, so
   * fixture results are unchanged. Row-local, stays in whole-stage
   * codegen.
   */
  def bucket1000(id: Column): Column =
    ((((id % 1000003L) * 1103515245L + 12345L) % 1000000007L) + 1000000007L) %
      1000000007L % 1000L

  /** SQL twin of [[bucket1000]] for oracle construction. */
  def bucket1000Sql(idCol: String): String =
    s"(((($idCol % 1000003) * 1103515245 + 12345) % 1000000007) + 1000000007) % 1000000007 % 1000"

  /**
   * Stratified sample: keep a per-stratum fraction (in permille) of rows,
   * chosen by the deterministic id bucket. A row survives iff
   * `bucket1000(id) < permille(stratum)`. Nested-fraction property: the
   * 100‰ sample is a strict subset of the 500‰ sample, so growing a
   * sample never resamples what was already taken.
   *
   * Row-local filter — no shuffle, and at 100 TB the filter sits directly
   * above the scan (nothing blocks pushdown).
   */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      permille: Map[String, Int],
      defaultPermille: Int): DataFrame = {
    (permille.values.toSeq :+ defaultPermille).foreach { p =>
      require(p >= 0 && p <= 1000, s"permille out of [0,1000]: $p")
    }
    // sort for a deterministic CASE chain (Map order is unspecified)
    val thr = permille.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (k, p)) => when(col(strataCol) === k, lit(p)).otherwise(acc)
    }
    df.filter(bucket1000(col(idCol)) < thr)
  }

  /**
   * Mixture rebalance: downsample every stratum to (approximately) the
   * size of the smallest one, producing a uniform mixture — the
   * "don't let one domain drown the rest" step of pretraining-corpus
   * assembly. Acceptance threshold per stratum is
   * `floor(1000 * min_count / count)` permille, applied through the same
   * deterministic bucket, so the result is reproducible and the output
   * per stratum is within ~0.1% of the target.
   *
   * Scale shape: one small aggregate (|strata| rows) broadcast back onto
   * the corpus — the corpus itself is never shuffled, only scanned and
   * filtered. The second scan of `df` (counts, then join) is the
   * standard aggregate-then-rejoin pattern; at 100 TB the counts pass
   * reads only the strata column (column pruning).
   */
  def rebalanceToSmallest(
      df: DataFrame,
      strataCol: String,
      idCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
      // single-partition window over the |strata|-row aggregate (tiny by
      // construction — this is model state, not data)
      .withColumn("__mn", min(col("__cnt")).over(Window.partitionBy()))
      .withColumn("__thr", floor(lit(1000.0) * col("__mn") / col("__cnt")))
      .select(col(strataCol).as("__s"), col("__thr"))
    // null-SAFE stratum match: a NULL stratum is a stratum like any
    // other. The plain using-join counted it in the min (shrinking every
    // other stratum's target — potentially to zero) while dropping its
    // own rows entirely, because equality joins never match NULL keys.
    df.join(broadcast(counts), df(strataCol) <=> counts("__s"))
      .filter(bucket1000(col(idCol)) < col("__thr"))
      .drop("__s", "__thr")
  }

  /**
   * Temperature-scaled mixture sampling at T = 2 (α = 1/2): downsample
   * each stratum so its share of the output is proportional to
   * `count^α` — the standard low-resource-upweighting resample of
   * multilingual pretraining (keep all of the smallest stratum, shrink
   * big ones toward — but not onto — it). Acceptance permille per
   * stratum is `floor(sqrt(10^6 · c_min / c_i))` = `floor(1000 ·
   * (c_min/c_i)^(1/2))`, applied through the same deterministic id
   * bucket as [[stratifiedSample]], so output size per stratum is
   * `c_i · sqrt(c_min/c_i) = sqrt(c_min · c_i)` — the α = 1/2 geometric
   * interpolation between "keep everything" (α = 1) and
   * [[rebalanceToSmallest]] (α = 0).
   *
   * α is fixed at 1/2 deliberately: the whole chain is then IEEE-exact
   * cross-engine (one double multiply, one divide, one `sqrt` — all
   * correctly-rounded required ops), so the DuckDB oracle reproduces it
   * bit-for-bit. A general-α variant needs `pow`, which is libm-grade
   * (≤ 1 ulp, NOT correctly rounded in Java) and could flip a `floor`
   * boundary between engines — if generalizing, compute the per-stratum
   * permilles as driver-side model state instead of in-plan columns.
   *
   * Scale shape: identical to [[rebalanceToSmallest]] — a |strata|-row
   * aggregate broadcast back onto a scan-and-filter; the corpus is never
   * shuffled.
   */
  def temperatureMix(
      df: DataFrame,
      strataCol: String,
      idCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__mn", min(col("__cnt")).over(Window.partitionBy()))
      .withColumn("__thr",
        floor(sqrt(lit(1000000.0) * col("__mn") / col("__cnt"))))
      .select(col(strataCol).as("__s"), col("__thr"))
    // null-safe stratum match — see rebalanceToSmallest
    df.join(broadcast(counts), df(strataCol) <=> counts("__s"))
      .filter(bucket1000(col(idCol)) < col("__thr"))
      .drop("__s", "__thr")
  }

  /**
   * Deterministic uniform-without-replacement sample of k rows per
   * group: order each group by `md5(seed # id)` — a content-free
   * pseudo-random permutation both Spark and any SQL engine compute
   * identically — and keep the first k. Same-seed re-runs return the
   * same sample on any cluster size; changing the seed draws a fresh
   * one.
   *
   * Scale shape: the rank filter sits directly above the window, so the
   * plan uses WindowGroupLimit — each map task pre-trims its partition
   * to k rows per group BEFORE the exchange, and only ≤ k·|groups| rows
   * per task ever shuffle. No global sort, no full-group
   * materialization.
   */
  def groupSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      k: Int,
      seed: String = "42"): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat_ws("#", lit(seed), col(idCol))).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Greedy selection under a per-group cost budget: order each group
   * best-first (`orderCol` descending, id ascending as the
   * deterministic tie-break) and keep rows while the running sum of
   * `costCol` stays within `budget` — the "fill each domain's token
   * budget with its best documents" step of pretraining-mixture
   * assembly. Emits `cum_cost` (the running total INCLUDING the row) so
   * callers can audit how full each budget ran.
   *
   * One hash exchange on the group key + per-group sort; the running
   * sum is a frame-bounded window, no second pass. Greedy-prefix note:
   * a row too big for the REMAINING budget blocks everything after it
   * (prefix semantics, not knapsack) — that is the contract, matching
   * how token budgets are actually filled (documents are not skipped
   * and revisited).
   */
  def budgetSelect(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      costCol: String,
      idCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the prefix contract ("a row too big blocks everything after it")
    // needs non-null, non-negative costs: sum() SKIPS a null cost (its
    // row would drop while later rows survive — a mid-prefix hole), and
    // a negative cost could re-admit rows after the budget was blown.
    // raise_error is codegen'd and costs one comparison per row.
    val guarded = when(col(costCol).isNull || col(costCol) < 0,
      raise_error(concat(lit(s"budgetSelect: $costCol must be a non-negative, " +
        "non-null cost, got "), coalesce(col(costCol).cast("string"), lit("NULL")))))
      .otherwise(col(costCol))
    df.withColumn("cum_cost", sum(guarded).over(w))
      .filter(col("cum_cost") <= budget)
  }

  /**
   * Token-budget mixture planner: split a training-token budget across
   * sources toward integer target weights, under a per-source epoch cap
   * — the static allocator every mixture-controlled pretraining run
   * starts from ("give me B tokens at these proportions, but never
   * repeat a source more than `maxEpochs` times").
   *
   * Allocation is two rounds of exact integer arithmetic (floor
   * division, so the DuckDB oracle replays it bit-for-bit):
   *
   *   ideal_s  = (B · w_s) div W          (W = Σ weights)
   *   alloc1_s = min(ideal_s, maxEpochs · T_s)
   *   then ONE proportional redistribution of the leftover
   *   D = B − Σ alloc1 over the uncapped sources:
   *   alloc_s  = min(alloc1_s + (D · w_s) div W₂, maxEpochs · T_s)
   *
   * Σ alloc ≤ B always (both rounds floor); full waterfilling would
   * iterate until D = 0, but one round recovers the bulk of the deficit
   * and keeps the arithmetic closed-form — the remainder is reported so
   * a caller can re-run on the residual if they care. `epochs_ppm` =
   * (10⁶ · alloc) div T is the resulting per-source repeat factor.
   *
   * Overflow envelope (documented, not gated — weights live in a frame,
   * not a parameter): B·w_s < 2^63, so with a 100 TB-corpus-sized budget
   * (~1e13 tokens) weights up to ~9e5 are safe; keep weights small
   * integers (they are proportions, not magnitudes).
   *
   * Scale shape: `sourceTokens` is |sources|-sized (the output of a
   * corpus-stats aggregate, not the corpus); everything here is
   * broadcast arithmetic on that small frame. The multi-consumer base
   * (feeds both the totals aggregate and the final projection) is
   * scope-persisted so the upstream corpus aggregate runs once.
   *
   * Empty sources (tokens ≤ 0) and non-positive weights are dropped up
   * front: there is nothing to allocate to the former, the latter hold
   * no share by definition, and together the drops guarantee every
   * divisor below is strictly positive — ANSI Spark (the 4.x default)
   * throws on ÷0, so divisor positivity is a correctness property, not
   * a style choice; it also keeps the oracle replayable.
   */
  def budgetEpochs(
      sourceTokens: DataFrame,
      weights: DataFrame,
      budget: Long,
      maxEpochs: Int = 2): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(maxEpochs >= 1 && maxEpochs <= 100,
      s"maxEpochs must be in [1, 100]: $maxEpochs")
    val base = graft.CacheScope.scoped(
      sourceTokens.join(weights, "source")
        .select(col("source"), col("tokens").cast("long").as("tokens"),
          col("weight").cast("long").as("weight"))
        // tokens ≤ 0: nothing to allocate to (and a 0-divisor in
        // epochs_ppm). weight ≤ 0: no share of the budget by definition —
        // dropping them also guarantees __w > 0 whenever any source
        // survives, so the share division below can never hit ÷0 (ANSI
        // Spark throws on it; non-ANSI nulls it and least(null, cap)
        // would silently hand every source its full cap, breaking the
        // Σ alloc ≤ B invariant)
        .filter(col("tokens") > 0 && col("weight") > 0))
    val totals = base.agg(sum(col("weight")).as("__w"))
    val r1 = base.crossJoin(broadcast(totals))
      .withColumn("cap", expr(s"$maxEpochs * tokens"))
      .withColumn("alloc1", least(expr(s"($budget * weight) DIV __w"), col("cap")))
    // r1 feeds the deficit aggregate AND the final row set — but it is
    // derived from the persisted `base` plus a broadcast, so re-deriving
    // it per consumer re-runs only small-frame arithmetic, never the
    // corpus aggregate.
    val round2 = r1.agg(
      sum(col("alloc1")).as("__a1"),
      sum(when(col("alloc1") < col("cap"), col("weight")).otherwise(0L)).as("__w2"))
    r1.crossJoin(broadcast(round2))
      .withColumn("alloc_tokens",
        when(col("alloc1") < col("cap") && col("__w2") > 0,
          least(col("alloc1") + expr(s"(($budget - __a1) * weight) DIV __w2"),
            col("cap")))
          .otherwise(col("alloc1")))
      // DECIMAL(38,0) widening for the ×1e6 (the targetAffinity
      // pattern): alloc_tokens can approach the full ~1e13 budget, where
      // 1e6·alloc overflows BIGINT — ANSI Spark would throw, non-ANSI
      // would wrap negative
      .withColumn("epochs_ppm",
        expr("cast((cast(alloc_tokens as decimal(38,0)) * 1000000) div tokens as bigint)"))
      .withColumn("capped", col("alloc_tokens") === col("cap"))
      .select(col("source"), col("tokens"), col("weight"),
        col("alloc_tokens"), col("epochs_ppm"), col("capped"))
  }

  /**
   * Percentile-band filter on an integer column (e.g. "keep docs between
   * the 5th and 95th length percentile" — the outlier trim before
   * packing/training), computed EXACTLY but without a global sort of the
   * data: aggregate a value histogram, cumulative-sum it with the
   * distributed range-partitioned prefix sum ([[Scale.rangeCumsum]]),
   * reduce the kept band to its two endpoints, and filter with
   * `between`. The usual `percent_rank()` formulation range-shuffles
   * every row into one ordered partition; this shape touches the corpus
   * only with a hash-agg and a broadcast-bounds filter, and the
   * comparisons are integer-exact (`pLo·cum ≥ total` style, no float
   * thresholds), so a SQL oracle reproduces it bit-for-bit.
   *
   * Keeps value v iff ceil-style: `den·cum(v) ≥ pLoNum·total` and
   * `den·cumBelow(v) ≤ pHiNum·total` with pLo = pLoNum/den, pHi = pHiNum/den.
   */
  def percentileBandFilter(
      df: DataFrame,
      valueCol: String,
      pLoNum: Long,
      pHiNum: Long,
      den: Long): DataFrame = {
    require(den > 0 && pLoNum >= 0 && pHiNum <= den && pLoNum <= pHiNum,
      s"need 0 <= $pLoNum <= $pHiNum <= $den")
    // NULL values hold no percentile position (same policy as
    // equiDepthHistogram): they are excluded from the histogram — and
    // thus from __total — rather than counted as below-minimum mass,
    // and NULL rows never pass the between() filter below
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("__cnt"))
    // distributed prefix sum over the distinct-value histogram: for a
    // continuous value column the histogram is corpus-sized, so the
    // cumsum must not plan the naive single-partition global window
    val band = Scale.rangeCumsum(hist, valueCol, "__cnt", "__cum", "__total")
      .filter(lit(den) * col("__cum") >= lit(pLoNum) * col("__total") &&
        lit(den) * (col("__cum") - col("__cnt")) <= lit(pHiNum) * col("__total"))
      .select(col(valueCol))
    // the cumsum is monotone in the value, so the kept distinct values
    // are a CONTIGUOUS range — reduce the band to its two endpoints (a
    // 1-row aggregate) and filter with between(). Broadcasting the band
    // itself would collect a corpus-sized distinct set to the driver for
    // a continuous column — the exact cliff the distributed cumsum above
    // avoids. An empty band yields NULL bounds and between() keeps
    // nothing, preserving the empty-result contract.
    val bounds = band.agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .filter(col(valueCol).between(col("__lo"), col("__hi")))
      .drop("__lo", "__hi")
  }

  /**
   * Target-affinity data selection (the DSIR/importance-sampling shape:
   * score general-pool documents by how much their token distribution
   * overlaps a small in-domain target set, keep the top of the ranking).
   * Integer-exact scoring so the ranking is engine-reproducible:
   *
   *   affinity(doc)      = Σ_t tf_doc(t) · cnt_target(t)
   *   affinity_micro(doc) = affinity · 1e6 div n_tokens(doc)
   *
   * where `cnt_target` counts token occurrences over the target docs.
   * The length normalization stops long documents from winning on bulk.
   * Ties break on doc id, so top-n is total-ordered.
   *
   * Scale shape: `cnt_target` is an aggregate of the (small) target set,
   * broadcast back; the pool pays one explode + one doc-keyed partial
   * aggregate — no pool-sized join exchange, no all-pairs anything. At
   * 100 TB with a vocabulary too big to broadcast, the same plan runs
   * with the broadcast hint dropped (token-keyed shuffle join), unchanged
   * semantics.
   */
  def targetAffinity(
      pool: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      topN: Int,
      unicode: Boolean = false): DataFrame = {
    require(topN > 0, s"topN must be positive: $topN")
    val targetCnt = target
      .select(explode(Dedup.tokensMode(col(textCol), unicode)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("target_cnt"))
    val tf = pool
      .select(col(idCol),
        explode(Dedup.tokensMode(col(textCol), unicode)).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    // Overflow discipline: affinity = Σ tf·cnt_target is a BIGINT sum of
    // BIGINT products — at 100 TB a hot target token (cnt_target ~ 1e9)
    // times heavy per-doc tf can push affinity past ~9.2e12, where the
    // ×1e6 micro scaling would silently wrap in 64 bits while DuckDB
    // widens to HUGEINT and diverges. The multiply therefore runs in
    // DECIMAL(38,0) (exact to 1e38 — matches DuckDB's HUGEINT range);
    // `div` on decimals is still integral division, and the quotient is
    // ≤ 1e6·max(cnt_target)·max_tf/1, comfortably back inside BIGINT
    // for any physical corpus, so the output column type is unchanged.
    tf.join(broadcast(targetCnt), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * coalesce(col("target_cnt"), lit(0L))).as("affinity"))
      .withColumn("affinity_micro",
        expr("cast((cast(affinity as decimal(38,0)) * 1000000) div n_tokens as bigint)"))
      .orderBy(col("affinity_micro").desc, col(idCol).asc)
      .limit(topN)
  }

  /**
   * Systematic probability-proportional-to-size sampling — the
   * deterministic, single-pass way to draw k documents with inclusion
   * probability ∝ weight (token budget ∝ quality score, balanced epoch
   * slices, audit samples): classic survey-sampling systematic PPS with
   * the midpoint rule. Lay every document's weight on a line in `idCol`
   * order; selection points sit at odd multiples of W/(2k); a document
   * is drawn once per point inside its weight interval:
   *
   *   picks(cum) = ⌊(2k·cum + W − 1) / (2W)⌋   (points strictly below cum)
   *   n_picks(doc) = picks(cum) − picks(cum − w)
   *
   * Σ n_picks = k exactly; a document with w > W/k can be drawn more
   * than once (its multiplicity is the honest PPS answer — callers that
   * need distinct docs cap weights first). All arithmetic is integer —
   * the whole draw replays bit-for-bit in SQL, unlike u^(1/w) priority
   * sampling whose float keys cannot hash-oracle.
   *
   * Scale shape: the cumulative weight runs through the distributed
   * range-partitioned prefix sum ([[graft.operators.Scale.rangeCumsum]]
   * keyed on the unique `idCol`) — one range exchange + a bounded
   * per-partition-offset broadcast, never the single-partition global
   * window `SUM() OVER (ORDER BY …)` plans. Everything after is a
   * row-local projection.
   */
  def systematicSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"sample size must be >= 1: $k")
    // zero-weight rows occupy no line segment and can never be drawn;
    // negative weights would corrupt every later interval — fail loud
    val base = df.select(col(idCol), col(weightCol).cast("long").as("__w"))
      .withColumn("__w", when(col("__w") >= 0, col("__w"))
        .otherwise(expr(s"raise_error('systematicSample: negative weight')")))
    // total column must NOT case-insensitively collide with "__w": Spark's
    // default resolver makes withColumn("__W", …) REPLACE __w (the r12 bug)
    val cum = graft.operators.Scale.rangeCumsum(base, idCol, "__w", "__cum", "__tw")
    // an all-zero-weight corpus has no line to place points on — fail loud
    // rather than let the integer division null out and sample nothing
    val guarded = cum.withColumn("__tw",
      when(col("__tw") > 0, col("__tw"))
        .otherwise(expr("raise_error('systematicSample: total weight is zero')")))
    // 2k·cum can pass 9.2e18 at real corpus weights (1e14 chars × k=1e5)
    // — run the product in DECIMAL(38,0), the targetAffinity overflow
    // discipline: exact to 1e38, matching DuckDB's HUGEINT widening,
    // and the quotient (≤ k) lands back in BIGINT
    def picksExpr(c: String) =
      s"(2 * $k * cast($c as decimal(38,0)) + __tw - 1) div (2 * __tw)"
    guarded
      .withColumn("n_picks", expr(
        s"cast(${picksExpr("__cum")} - ${picksExpr("(__cum - __w)")} as bigint)"))
      .filter(col("n_picks") >= 1)
      .select(col(idCol), col("__w").as("weight"), col("n_picks"))
  }

  /**
   * Deterministic interleaved mixture schedule — the exact global order
   * a trainer consumes a multi-source corpus in, with each source paced
   * proportionally to its weight (the Bresenham / SSTable-merge
   * interleave every data-mixing paper assumes but rarely pins down):
   * source s's k-th document (k = 1-based rank by `idCol` within the
   * source) is scheduled at the rational time (2k−1)/(2·w_s) — the
   * midpoint of its k-th 1/w_s-wide slot — so over any prefix of the
   * schedule each source's share converges to w_s/ΣW and no source ever
   * bursts. The time is materialized as the exact integer
   * `((2k−1)·10^12) div w_s`, with the product run in DECIMAL(38,0)
   * (the systematicSample overflow discipline — a 100 TB source can
   * hold billions of docs, and BIGINT wraps silently at k ≈ 4.6·10^6;
   * exact to 10^38, matching DuckDB's HUGEINT widening) and the
   * quotient landing back in BIGINT (≤ 2·10^12 whenever per-row
   * weights are ≥ 1, since then w_s ≥ k). Spark and any ANSI SQL
   * engine compute the identical order; ties (possible across sources)
   * break by (source, id).
   *
   * Scale shape: one hash exchange per source for the within-source
   * rank (WindowGroupLimit does not apply — every row survives — but
   * the window is partitioned, never global), a |sources|-row weight
   * aggregate broadcast back, then ONE range-partitioned global sort on
   * the schedule key — the same exchange any ordered write pays, and
   * the only global structure the contract (a total order) genuinely
   * requires. No driver-side loops; weights are in-plan columns.
   *
   * @param weightExpr per-row weight contribution; a source's pacing
   *                   weight is the SUM over its rows (e.g.
   *                   `col("n_chars")` = token-proportional pacing,
   *                   `lit(1)` = doc-count-proportional)
   */
  def interleaveSchedule(
      df: DataFrame,
      srcCol: String,
      idCol: String,
      weightExpr: Column): DataFrame = {
    val w = Window.partitionBy(col(srcCol)).orderBy(col(idCol))
    val ranked = df
      .withColumn("__w", weightExpr.cast("long"))
      .withColumn("__k", row_number().over(w))
    val weights = ranked.groupBy(col(srcCol)).agg(sum(col("__w")).as("__sw"))
      .select(col(srcCol).as("__s"),
        // zero/negative total weight has no pace — fail loud, like
        // systematicSample's total-weight guard
        when(col("__sw") > 0, col("__sw"))
          .otherwise(expr("raise_error('interleaveSchedule: source weight <= 0')"))
          .as("__sw"))
    ranked.join(broadcast(weights), ranked(srcCol) <=> weights("__s"))
      // decimal `div` returns bigint and WRAPS silently (non-ANSI) when
      // (2k-1)·10¹² / __sw exceeds Long.MaxValue — reachable when a
      // source's total weight is tiny relative to its row count (e.g.
      // almost-all-zero weights); wrapped-negative keys would sort FIRST
      // and silently corrupt the deterministic global order. Guard in
      // DECIMAL before the conversion: floor(a/b) ≤ M ⟺ a < b·(M+1),
      // failing loud like the zero-weight guard above (b·(M+1) ≤
      // 9.3e18 · 9.3e18 < 10³⁸ never overflows decimal(38,0)).
      .withColumn("sched_key",
        when(
          expr("cast(2 * __k - 1 as decimal(38,0)) * 1000000000000 < " +
            "cast(__sw as decimal(38,0)) * 9223372036854775807 + __sw"),
          expr("cast((cast(2 * __k - 1 as decimal(38,0)) * 1000000000000)" +
            " div __sw as bigint)"))
          .otherwise(expr("raise_error('interleaveSchedule: sched_key " +
            "overflows bigint — source total weight too small for its row " +
            "count')")))
      .select(col(srcCol), col(idCol), col("__k").as("src_seq"), col("sched_key"))
      .orderBy(col("sched_key"), col(srcCol), col(idCol))
  }

  /**
   * Proportional source capping — the RefinedWeb/CCNet-style dominance
   * guard: no single source may exceed `capPermille`/1000 of the TOTAL
   * corpus. An over-cap source keeps exactly
   * `floor(total · capPermille / 1000)` documents, chosen by the
   * deterministic content-free permutation `md5(seed # id)` (the
   * [[groupSample]] ordering) so re-runs, repartitions and cluster
   * resizes keep the identical subset; under-cap sources pass through
   * untouched. All arithmetic integer (cross-multiplied comparison —
   * no floats anywhere), so the draw replays bit-for-bit in SQL.
   *
   * Scale shape: a |sources|-row count aggregate + 1-row total folded
   * into one broadcast; the keep decision is one per-source rank window
   * (hash exchange on source, per-partition sort — the cap is a COLUMN,
   * so WindowGroupLimit's constant-limit rewrite does not apply) and a
   * filter directly above it. The corpus is never globally sorted; a
   * skewed dominant source is exactly the case the operator exists for,
   * and its single-source sort is the honest cost of a deterministic
   * cap (callers with one pathological source can pre-salt on
   * `md5(seed#id)` prefixes and cap per salt-slice).
   */
  def capSourceShare(
      df: DataFrame,
      srcCol: String,
      idCol: String,
      capPermille: Int,
      seed: Int = 42): DataFrame = {
    require(capPermille >= 1 && capPermille <= 1000,
      s"capPermille must be in [1, 1000]: $capPermille")
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__total", sum(col("__n")).over(Window.partitionBy()))
      .withColumn("__cap", expr(s"(__total * $capPermille) div 1000"))
      .select(col(srcCol).as("__s"), col("__cap"))
    val w = Window.partitionBy(col(srcCol))
      .orderBy(md5(concat(lit(s"$seed#"), col(idCol).cast("string"))), col(idCol))
    df.join(broadcast(counts), df(srcCol) <=> counts("__s"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__cap"))
      .drop("__s", "__cap", "__rk")
  }

  /**
   * Salted proportional source capping — [[capSourceShare]]'s hot-source
   * path: the per-source rank window there sorts one source's whole
   * membership in one partition, which is exactly wrong when the capped
   * source IS the pathological one (a 60%-of-corpus crawl dump at
   * 100 TB). Here every source is split into `slices` deterministic
   * id-hash slices ([[bucket1000]] mod slices — the same overflow-free
   * LCG every deterministic sampler uses, so the slicing replays in
   * SQL), the source's cap C = floor(total·cap/1000) is split EXACTLY
   * across slices (slice s gets `C div slices`, +1 for the first
   * `C mod slices` slices — Σ quotas = C), and each slice keeps its own
   * md5-ordered prefix. The window partitions by (source, slice):
   * the dominant source's sort runs `slices`-wide instead of serially.
   *
   * Contract difference vs the unsalted draw, stated honestly: the kept
   * SET is a different (equally deterministic) sample, and a slice with
   * fewer rows than its quota under-fills without rebalancing — exact-C
   * output is guaranteed only when every slice holds ≥ its quota
   * (uniform hashing makes a shortfall vanishingly unlikely whenever
   * n ≥ ~2·C; callers needing exact C at any n use [[capSourceShare]]).
   * All arithmetic integer; re-runs and resizes keep the identical set.
   */
  def capSourceShareSalted(
      df: DataFrame,
      srcCol: String,
      idCol: String,
      capPermille: Int,
      slices: Int = 16,
      seed: Int = 42): DataFrame = {
    require(capPermille >= 1 && capPermille <= 1000,
      s"capPermille must be in [1, 1000]: $capPermille")
    require(slices >= 1 && slices <= 1000,
      s"slices must be in [1, 1000]: $slices")
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__total", sum(col("__n")).over(Window.partitionBy()))
      .withColumn("__cap", expr(s"(__total * $capPermille) div 1000"))
      .select(col(srcCol).as("__s"), col("__cap"))
    val sliced = df.withColumn("__sl", (bucket1000(col(idCol)) % slices).cast("int"))
    val w = Window.partitionBy(col(srcCol), col("__sl"))
      .orderBy(md5(concat(lit(s"$seed#"), col(idCol).cast("string"))), col(idCol))
    sliced.join(broadcast(counts), sliced(srcCol) <=> counts("__s"))
      // slice quota: C div slices, +1 for the first C mod slices slices
      .withColumn("__q",
        expr(s"__cap div $slices + if(__sl < __cap % $slices, 1, 0)"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__q"))
      .drop("__s", "__cap", "__sl", "__q", "__rk")
  }
}
