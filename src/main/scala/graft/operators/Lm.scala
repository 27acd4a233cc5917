package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.CacheScope

/**
 * Statistical language-model quality filtering — the CCNet-shaped stage
 * of an LLM data pipeline (Wenzek et al., "CCNet: Extracting High
 * Quality Monolingual Datasets from Web Crawl Data", 2020): train a
 * small LM on a trusted reference corpus, score every candidate
 * document by how well the model predicts its text, band-filter on the
 * score. The production version scores with a KenLM n-gram model; this
 * engine expresses the same pipeline with a house bigram model whose
 * arithmetic is INTEGER-EXACT, so the whole stage (train → score →
 * gate) replays in the DuckDB oracle with zero float tolerance.
 *
 * Scoring convention: Laplace-smoothed bigram likelihood in micro-units,
 *
 *   p_micro(tok | prev) = (c(prev,tok) + 1) * 1_000_000
 *                           DIV (c(prev,·) + V + 1)
 *
 * (V = reference vocabulary size; +1 holds back mass for the OOV
 * bucket), and a document's score is the floor-mean of its tokens'
 * p_micro. This is the probability domain, not CCNet's log-perplexity
 * domain — deliberately: logs would put cross-engine ulp drift inside
 * the oracle hash, while the micro-probability mean is exact on both
 * engines and orders documents by the same "does the reference LM
 * expect this text" signal (frequent reference bigrams score high,
 * unseen contexts fall to the uniform floor 1e6/(V+1)).
 *
 * Scale design: token→bigram expansion is a per-row HOF (no shuffle,
 * O(tokens) structs — the token array is NOT carried through the
 * explode); model training is two hash aggregations over (prev, tok)
 * digests; scoring is two plain equi-joins against vocabulary-bounded
 * count tables (no broadcast hint — a 100 TB corpus can carry a model
 * too large to broadcast, so the planner/AQE picks; at fixture scale it
 * chooses broadcast itself). The only driver-side values are the vocab
 * size and context total (two longs).
 */
object Lm {

  /** Start-of-document sentinel: `[^a-z0-9]+` tokenization means no real
    * token can collide with it. */
  val Bos = "<s>"

  /** Trained bigram model. `bigrams` and `contexts` are count tables
    * (vocabulary-bounded, NOT corpus-bounded); `vocab` is |V| over the
    * reference slice. */
  case class BigramModel(bigrams: DataFrame, contexts: DataFrame, vocab: Long)

  /** Explode `docs` to (idCol, prev, tok) bigram rows. Zero-token
    * documents contribute no rows (callers left-join them back).
    *
    * One fused generator ([[graft.functions.BigramRows]]) walks the
    * lowercased UTF-8 buffer and emits the BOS-prefixed pairs directly
    * — the prior HOF chain (`split` → `transform` → `explode`) paid
    * java.util.regex plus interpreted lambda evaluation plus an
    * intermediate struct array per row, profiled at >50% of the LM/DSIR
    * family's executor CPU (r19). Token values/order are spec-pinned
    * identical to `Dedup.tokensMode` (UnicodeTokensSpec); BOS stays
    * collision-free under both contracts ('<'/'>' are separators in
    * each, so no real token contains them). */
  def docBigrams(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", unicode: Boolean = false): DataFrame =
    docs.select(col(idCol),
      graft.functions.bigram_rows(col(textCol), unicode, Bos)
        .as(Seq("prev", "tok")))

  /** Train the Laplace-smoothed bigram model on `ref`. The bigram-count
    * aggregation is scope-cached: the context table, the vocab count and
    * the caller's score join all reuse it, and Catalyst would otherwise
    * re-run the corpus scan + shuffle per consumer. */
  def trainBigram(ref: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", unicode: Boolean = false): BigramModel = {
    val pairs = docBigrams(ref, idCol, textCol, unicode)
    val big = CacheScope.scoped(
      pairs.groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("c")))
    val ctx = big.groupBy(col("prev")).agg(sum(col("c")).as("ctx_n"))
    // bounded driver state: one long (|V| is vocabulary-, not corpus-sized)
    val vocab = big.select(col("tok")).distinct().count()
    BigramModel(big, ctx, vocab)
  }

  /** Train from an ALREADY-expanded (id, prev, tok) bigram frame — the
    * shared-expansion path for pipelines that also SCORE the corpus the
    * model is trained on (DSIR trains its raw model on the pool it
    * scores: ONE scope-cached expansion serves train and score, where
    * the two-entry-point form pays two full corpus expansions). The
    * count tables are deliberately NOT cached here: in the r13
    * logit-label experiments, stacking a cache on top of another
    * pending cache measured as if the outer entry was never reused
    * (every consumer re-ran the derivation; minimal nested shapes DO
    * hit, so the trigger is subtle — see CacheScopeSpec), and
    * re-running the count aggregation over CACHED pairs per consumer
    * is cheap, so the single-level structure side-steps the question. */
  def trainBigramFromPairs(pairs: DataFrame): BigramModel = {
    val big = pairs.groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("c"))
    val ctx = big.groupBy(col("prev")).agg(sum(col("c")).as("ctx_n"))
    val vocab = big.select(col("tok")).distinct().count()
    BigramModel(big, ctx, vocab)
  }

  /** Score every document by mean smoothed bigram micro-likelihood under
    * `model`. Output: (idCol, n_bigrams, sum_p_micro, score_micro) with
    * zero-token documents kept at score 0. */
  def scoreDocs(docs: DataFrame, model: BigramModel, idCol: String = "doc_id",
      textCol: String = "text", unicode: Boolean = false): DataFrame = {
    val pairs = docBigrams(docs, idCol, textCol, unicode)
    val perDoc = pairs
      .join(model.bigrams, Seq("prev", "tok"), "left")
      .join(model.contexts, Seq("prev"), "left")
      .withColumn("p_micro",
        expr(s"(coalesce(c, 0L) + 1L) * 1000000L DIV " +
          s"(coalesce(ctx_n, 0L) + ${model.vocab}L + 1L)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_micro")).as("sum_p_micro"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_p_micro"), lit(0L)).as("sum_p_micro"),
        coalesce(expr("sum_p_micro DIV n_bigrams"), lit(0L)).as("score_micro"))
  }

  /** The full CCNet-shaped gate: train on `ref`, score `docs`, keep
    * documents whose mean micro-likelihood clears `thresholdMicro`. */
  def likelihoodFilter(docs: DataFrame, ref: DataFrame, thresholdMicro: Long,
      idCol: String = "doc_id", textCol: String = "text",
      unicode: Boolean = false): DataFrame =
    scoreDocs(docs, trainBigram(ref, idCol, textCol, unicode), idCol, textCol,
      unicode)
      .withColumn("keep", col("score_micro") >= lit(thresholdMicro))

  /**
   * CCNet's head/middle/tail split — the published pipeline's actual
   * OUTPUT shape (Wenzek et al. 2020 §4.4: score every document under
   * the reference LM, then cut the corpus into three perplexity
   * terciles; downstream training recipes mix the bands with different
   * weights rather than hard-dropping). Tercile of a document = tercile
   * of its exact micro-score VALUE: with `cumBelow(v)` = number of docs
   * scoring strictly below v (over the whole scored corpus) the band is
   *
   *   tercile(v) = min(3, 1 + (3 · cumBelow(v)) div n_docs)
   *
   * so equal scores always share a band (no arbitrary within-tie split),
   * the arithmetic is integer-exact, and ascending terciles mean
   * ascending likelihood: 3 = head (most reference-like), 1 = tail.
   *
   * Scale shape: scoring is [[scoreDocs]]; the tercile cut needs a
   * cumulative count over the SCORE HISTOGRAM (distinct score values,
   * not docs), which runs through the distributed range-partitioned
   * prefix sum ([[graft.operators.Scale.rangeCumsum]]) — never the
   * single-partition `ntile()`/`percent_rank()` window a naive
   * formulation plans. The labeled histogram then joins back on the
   * score value (AQE picks the strategy; the histogram is
   * distinct-score-, not corpus-bounded).
   */
  def scoreTerciles(docs: DataFrame, ref: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = CacheScope.scoped(
      scoreDocs(docs, trainBigram(ref, idCol, textCol), idCol, textCol))
    val hist = scored.groupBy(col("score_micro"))
      .agg(count(lit(1)).as("__cnt"))
    val bands = Scale.rangeCumsum(hist, "score_micro", "__cnt", "__cum", "__total")
      .select(col("score_micro"),
        least(lit(3L),
          lit(1L) + expr("(3 * (__cum - __cnt)) div __total")).as("tercile"))
    scored.join(bands, Seq("score_micro"))
      .select(col(idCol), col("n_bigrams"), col("score_micro"), col("tercile"),
        when(col("tercile") === 3, lit("head"))
          .when(col("tercile") === 2, lit("middle"))
          .otherwise(lit("tail")).as("band"))
  }
}
