package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * DSIR-shaped data selection (Xie et al., "Data Selection for Language
 * Models via Importance Resampling", NeurIPS 2023): score every
 * candidate document by how much MORE a target-domain language model
 * likes it than the raw-pool model does, then gate / top-k on that
 * importance signal. The published method estimates
 * `log p_target(x) - log p_raw(x)` with hashed n-gram models and
 * Gumbel-resamples; this engine expresses the same signal with the
 * house integer-exact bigram LM ([[Lm]]): both models score in
 * micro-probability units and the importance weight is the floor ratio
 *
 *   weight_micro = score_target_micro * 1_000_000 DIV max(score_raw_micro, 1)
 *
 * so the whole stage (train both models → score → weight → gate)
 * replays in DuckDB with zero float tolerance. Selection is the
 * deterministic analog of resampling: rank by (weight DESC, id).
 *
 * Shared-vocabulary smoothing — the correctness-critical detail: DSIR's
 * hashed feature space puts both distributions over the SAME support;
 * naively Laplace-smoothing each model over its own vocabulary breaks
 * that (the target slice's vocabulary is smaller, so its uniform floor
 * `1e6/(V_t+1)` exceeds the raw pool's `1e6/(V_r+1)`, and a document
 * fully OOV for BOTH models would score weight > 1e6 — i.e. maximally
 * out-of-domain text reads as target-like). Both models here smooth
 * over the UNION vocabulary, making the floors equal: all-OOV text
 * lands at exactly weight 1_000_000 (neutral), and only genuinely
 * target-frequent bigrams push a document above it.
 *
 * Scale design: the candidate corpus is tokenized ONCE (one HOF
 * expansion, no shuffle), then joined against the two count tables —
 * vocabulary-bounded, not corpus-bounded; no broadcast hint (a 100 TB
 * pool can carry models too large to broadcast, so the planner/AQE
 * decides — at fixture scale it picks broadcast itself). One hash
 * aggregation per model train; driver state = one long (the shared
 * vocab size).
 */
object Dsir {

  /** |vocab(target) ∪ vocab(raw)| — the shared smoothing support.
    * Bounded driver state: one long (vocabulary-, not corpus-sized). */
  def sharedVocab(target: Lm.BigramModel, raw: Lm.BigramModel): Long =
    target.bigrams.select(col("tok"))
      .union(raw.bigrams.select(col("tok")))
      .distinct().count()

  /** Per-document importance weights of `docs` under target vs raw
    * bigram models (both smoothed over the shared vocabulary). Output:
    * (idCol, n_bigrams, score_target_micro, score_raw_micro,
    * weight_micro); zero-token docs carry weight 0. */
  def importanceWeights(docs: DataFrame, target: Lm.BigramModel,
      raw: Lm.BigramModel, idCol: String = "doc_id",
      textCol: String = "text",
      pairsOpt: Option[DataFrame] = None): DataFrame = {
    val v = sharedVocab(target, raw)
    // pairsOpt: the caller's (scope-cached) pre-expanded bigram frame —
    // the shared-expansion path (see Lm.trainBigramFromPairs); None
    // re-expands here, the standalone shape
    val pairs = pairsOpt.getOrElse(Lm.docBigrams(docs, idCol, textCol))
    val bt = target.bigrams.select(col("prev"), col("tok"), col("c").as("c_t"))
    val xt = target.contexts.select(col("prev"), col("ctx_n").as("ctx_t"))
    val br = raw.bigrams.select(col("prev"), col("tok"), col("c").as("c_r"))
    val xr = raw.contexts.select(col("prev"), col("ctx_n").as("ctx_r"))
    val perDoc = pairs
      .join(bt, Seq("prev", "tok"), "left")
      .join(xt, Seq("prev"), "left")
      .join(br, Seq("prev", "tok"), "left")
      .join(xr, Seq("prev"), "left")
      .withColumn("p_t", expr(
        s"(coalesce(c_t, 0L) + 1L) * 1000000L DIV (coalesce(ctx_t, 0L) + ${v}L + 1L)"))
      .withColumn("p_r", expr(
        s"(coalesce(c_r, 0L) + 1L) * 1000000L DIV (coalesce(ctx_r, 0L) + ${v}L + 1L)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_t")).as("sum_t"), sum(col("p_r")).as("sum_r"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("sum_t DIV n_bigrams"), lit(0L)).as("score_target_micro"),
        coalesce(expr("sum_r DIV n_bigrams"), lit(0L)).as("score_raw_micro"))
      .withColumn("weight_micro", expr(
        "score_target_micro * 1000000L DIV greatest(score_raw_micro, 1L)"))
  }

  /** The gate: keep documents whose importance ratio clears
    * `thresholdMicro` (1_000_000 = "the target model likes it at least
    * as much as the raw model does"). */
  def select(docs: DataFrame, target: Lm.BigramModel, raw: Lm.BigramModel,
      thresholdMicro: Long, idCol: String = "doc_id",
      textCol: String = "text",
      pairsOpt: Option[DataFrame] = None): DataFrame =
    importanceWeights(docs, target, raw, idCol, textCol, pairsOpt)
      .withColumn("keep", col("weight_micro") >= lit(thresholdMicro))

  /** Deterministic top-k selection (the rank-by-weight analog of DSIR's
    * resampling step): orderBy+limit plans TakeOrderedAndProject —
    * per-partition heaps, never a single-partition global sort. */
  def topK(docs: DataFrame, target: Lm.BigramModel, raw: Lm.BigramModel,
      k: Int, idCol: String = "doc_id", textCol: String = "text",
      pairsOpt: Option[DataFrame] = None): DataFrame =
    importanceWeights(docs, target, raw, idCol, textCol, pairsOpt)
      .orderBy(col("weight_micro").desc, col(idCol)).limit(k)

  // ------------------------------------------------------------------
  // Hashed-feature variant — the paper's actual memory bound
  // ------------------------------------------------------------------

  /** Hashed bigram model: per-bucket counts (EXACTLY `buckets` rows max —
    * absolutely bounded, unlike the vocabulary-bounded [[Lm.BigramModel]])
    * plus the total bigram count (one long of driver state). */
  case class HashedModel(counts: DataFrame, total: Long, buckets: Int)

  /** Bucket of a bigram: first 8 hex chars of md5("prev tok") mod B.
    * md5 is the one keyed hash both engines spell identically; the space
    * delimiter cannot occur inside a house token ([a-z0-9]+ and the BOS
    * sentinel), so the concatenation is injective. Nonnegative by
    * construction (the 32-bit prefix), so plain % is safe. */
  def bigramBucket(buckets: Int): org.apache.spark.sql.Column =
    expr("cast(conv(substring(md5(concat(prev, ' ', tok)), 1, 8), 16, 10) " +
      s"as bigint) % $buckets")

  /** Train the hashed model on `ref`: ONE hash aggregation to a table of
    * ≤ `buckets` rows. This is DSIR's published feature space — model
    * size is a CONSTANT of the pipeline (buckets), not a function of the
    * corpus, so at 100 TB the two models are always broadcastable. */
  def trainHashed(ref: DataFrame, buckets: Int, idCol: String = "doc_id",
      textCol: String = "text",
      pairsOpt: Option[DataFrame] = None): HashedModel = {
    val pb = pairsOpt.getOrElse(Lm.docBigrams(ref, idCol, textCol))
      .select(bigramBucket(buckets).as("b"))
    // Scope-cached (≤ `buckets` rows — trivially safe): the `total`
    // action below materializes the table once, and the serve join in
    // [[importanceWeightsHashed]] reuses it. Uncached, Catalyst would
    // re-run the full corpus tokenize + per-bigram hash aggregation for
    // each consumer — at 100 TB each redundant pass is the whole corpus.
    // with a caller-cached pairs frame, do NOT cache the bucket table
    // on top of it — stacked pending caches measured as never-reused in
    // the r13 logit-label experiments (see CacheScopeSpec), and a
    // ≤ buckets-row agg over CACHED pairs is cheap per consumer
    val counts =
      if (pairsOpt.isDefined) pb.groupBy(col("b")).agg(count(lit(1)).as("c"))
      else graft.CacheScope.scoped(
        pb.groupBy(col("b")).agg(count(lit(1)).as("c")))
    // bounded driver state: one long (the smoothing denominator)
    val total = counts.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    HashedModel(counts, total, buckets)
  }

  /** Per-document importance weights under hashed target/raw models:
    * `p_micro(bucket) = (c_b + 1) * 1e6 DIV (total + B)` (Laplace over
    * the B-bucket multinomial — supports are identical by construction,
    * so no union-vocab correction is needed), floor-mean per doc, weight
    * as the same floor ratio as [[importanceWeights]]. The two count
    * tables are ≤ B rows: broadcast UNCONDITIONALLY — that is the entire
    * point of the hashed feature space. */
  def importanceWeightsHashed(docs: DataFrame, target: HashedModel,
      raw: HashedModel, idCol: String = "doc_id",
      textCol: String = "text",
      pairsOpt: Option[DataFrame] = None): DataFrame = {
    require(target.buckets == raw.buckets,
      s"bucket mismatch: ${target.buckets} vs ${raw.buckets}")
    val b = target.buckets
    val ct = target.counts.select(col("b"), col("c").as("c_t"))
    val cr = raw.counts.select(col("b"), col("c").as("c_r"))
    val perDoc = pairsOpt.getOrElse(Lm.docBigrams(docs, idCol, textCol))
      .select(col(idCol), bigramBucket(b).as("b"))
      .join(broadcast(ct), Seq("b"), "left")
      .join(broadcast(cr), Seq("b"), "left")
      .withColumn("p_t", expr(
        s"(coalesce(c_t, 0L) + 1L) * 1000000L DIV ${target.total + b}L"))
      .withColumn("p_r", expr(
        s"(coalesce(c_r, 0L) + 1L) * 1000000L DIV ${raw.total + b}L"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_t")).as("sum_t"), sum(col("p_r")).as("sum_r"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("sum_t DIV n_bigrams"), lit(0L)).as("score_target_micro"),
        coalesce(expr("sum_r DIV n_bigrams"), lit(0L)).as("score_raw_micro"))
      .withColumn("weight_micro", expr(
        "score_target_micro * 1000000L DIV greatest(score_raw_micro, 1L)"))
  }

  /** Hashed-model gate, same threshold convention as [[select]]. */
  def selectHashed(docs: DataFrame, target: HashedModel, raw: HashedModel,
      thresholdMicro: Long, idCol: String = "doc_id",
      textCol: String = "text",
      pairsOpt: Option[DataFrame] = None): DataFrame =
    importanceWeightsHashed(docs, target, raw, idCol, textCol, pairsOpt)
      .withColumn("keep", col("weight_micro") >= lit(thresholdMicro))
}
