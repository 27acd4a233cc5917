package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{doc_fingerprint, lang_id_pick, text_stats}

/**
 * Text analysis operators for document corpora (SURVEY §2.3: language ID,
 * quality scoring, token counting, fingerprinting).
 *
 * The per-document metrics run on fused one-pass kernels
 * ([[graft.functions.TextStats]] / [[graft.functions.LangIdPick]]): the
 * HOF formulation (split → filter/aggregate/isin lambdas) they replace is
 * interpreted in Spark and re-allocated the token array per metric —
 * TextAnalysisSpec pins kernel ≡ HOF equivalence on the real fixture. All
 * operators are row-local (no shuffle) except the corpus-level token
 * frequency aggregate, which is one explode + hash-shuffle on token.
 */
object TextAnalysis {

  /** The quality-gate stopword list (also the TextStats kernel's hit set). */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Whitespace token count (the cheap "how long is this doc" measure). */
  def tokenCount(text: Column): Column =
    text_stats(text).getField("ws_tokens")

  /** BPE-ish subword count: alphanumeric runs + punctuation marks each
    * count as one token (approximates tokenizer length much better than
    * whitespace for code/punctuated text). Both terms come from the same
    * text_stats call — codegen subexpression elimination evaluates the
    * kernel once per row even when tokenCount is selected alongside. */
  def subwordCount(text: Column): Column =
    text_stats(text).getField("n_tokens") + text_stats(text).getField("punct_chars")

  /** Quality metrics: doc length, mean word length, punctuation ratio,
    * stopword ratio — the usual pretraining filters. One kernel pass
    * produces every count; the ratios are cheap arithmetic over the
    * struct fields (ratio semantics — incl. the 0.0-on-empty guards —
    * identical to the HOF originals, so the DuckDB oracles still match). */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val st = col("__st")
    df.withColumn("__st", text_stats(col(textCol), stopwords))
      .withColumn("n_chars_m", st.getField("n_chars"))
      .withColumn("n_tokens", st.getField("n_tokens"))
      .withColumn("mean_word_len",
        when(st.getField("n_tokens") > 0,
          st.getField("sum_token_len").cast(DoubleType) / st.getField("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(st.getField("n_chars") > 0,
          st.getField("punct_chars").cast(DoubleType) / st.getField("n_chars"))
          .otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(st.getField("n_tokens") > 0,
          st.getField("stopword_hits").cast(DoubleType) / st.getField("n_tokens"))
          .otherwise(lit(0.0)))
      .drop("__st")
  }

  /** Language ID: n-gram-free stopword-profile heuristic — score each
    * language by its marker-word hit count over the token set; ties break
    * alphabetically, zero hits → "und". Deterministic, SQL-free of UDFs. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "für", "nicht"),
    "es" -> Seq("el", "la", "los", "las", "es", "con", "para", "que"),
    "fr" -> Seq("le", "la", "les", "est", "avec", "pour", "que", "dans"),
    "zh" -> Seq("的", "是", "和", "在", "了", "有", "我", "不"))

  def langId(df: DataFrame, textCol: String): DataFrame =
    // fused kernel: one Unicode-aware pass scores every language at once
    // (the HOF formulation ran an interpreted marker-set filter per
    // language per row); max hits wins, ties take the alphabetically-first
    // language, zero hits → "und" — same pick rule the oracle generates
    df.withColumn("pred_lang",
      lang_id_pick(col(textCol), langMarkers.toSeq.sortBy(_._1)))

  /**
   * Composite Gopher-style quality filter (Rae et al. 2021, §A1.1 —
   * adapted thresholds): per-document rule booleans plus the combined
   * `keep`, so a curation run can both filter AND report per-rule drop
   * counts. Every rule is an INTEGER cross-multiplied comparison over
   * the fused `text_stats` kernel's exact counts (mean-word-length
   * bounds become `3·n_tokens ≤ Σtoken_len ≤ 10·n_tokens`, the punct
   * cap `4·punct ≤ chars`, the top-bigram cap `5·top ≤ bigrams`) — no
   * float ratios, so the whole verdict table hash-oracles.
   *
   * Scale shape: the rule columns are row-local over one kernel pass;
   * only the repetition rule joins the doc-keyed bigram aggregate
   * ([[Ngrams.repetitionStats]], one exchange on the doc id).
   */
  /** The five Gopher gate predicates, ONE definition shared by both
    * gopher shapes ([[gopherFilter]]'s join form and
    * [[withGopherGates]]'s in-scan form) so thresholds cannot drift:
    * inputs are the metric COLUMNS (names differ per shape). */
  private def gopherGateCols(
      nc: Column, nt: Column, stl: Column, pc: Column, sh: Column,
      topCnt: Column, nBigrams: Column): Seq[(String, Column)] = {
    val gates = Seq(
      "keep_tokens" -> (nt >= 10 && nt <= 100000L),
      "keep_word_len" -> (lit(3L) * nt <= stl && stl <= lit(10L) * nt),
      "keep_punct" -> (lit(4L) * pc <= nc),
      "keep_stopwords" -> (sh >= 2),
      "keep_repetition" ->
        (nBigrams === 0 || lit(5L) * topCnt <= nBigrams))
    gates :+ ("keep" -> gates.map(_._2).reduce(_ && _))
  }

  /** `unicode = true` evaluates the SAME five gates over the
    * multilingual lexical contract (`text_stats`/`tokensMode` unicode
    * modes) — the metrics become honest for non-Latin text (ASCII mode
    * counts zero tokens there, auto-rejecting every CJK/Cyrillic doc at
    * `keep_tokens`); the THRESHOLDS stay caller policy. */
  def gopherFilter(
      df: DataFrame, idCol: String, textCol: String,
      unicode: Boolean = false): DataFrame = {
    val st = col("__st")
    val metrics = df.withColumn("__st",
      text_stats(col(textCol), stopwords, unicode))
      .select(col(idCol),
        st.getField("n_chars").as("__nc"),
        st.getField("n_tokens").as("__nt"),
        st.getField("sum_token_len").as("__stl"),
        st.getField("punct_chars").as("__pc"),
        st.getField("stopword_hits").as("__sh"))
    val rep = Ngrams.repetitionStats(df, idCol, textCol, unicode)
    val gates = gopherGateCols(col("__nc"), col("__nt"), col("__stl"),
      col("__pc"), col("__sh"), col("top_cnt"),
      coalesce(col("n_bigrams"), lit(0L)))
    metrics.join(rep, Seq(idCol), "left")
      .select(col(idCol) +: gates.map { case (n, c) => c.as(n) }: _*)
  }

  /**
   * Append the five Gopher gate booleans + composite `keep` to `df` as
   * ONE row-local projection over `textCol`: the fused `text_stats`
   * kernel plus the run-length repetition fold
   * ([[Ngrams.repetitionStats]]'s row-local form) — no join, no
   * exchange, so a composed pipeline (the v9 flagship) evaluates the
   * gate inside the SAME scan that feeds its other stages and no
   * exchange ever carries text. Bit-identical gates to the join-shaped
   * [[gopherFilter]] (the predicates are literally shared): a doc with
   * fewer than two tokens has zero bigrams and passes
   * `keep_repetition`, exactly the LEFT-join + coalesce semantics.
   * Standalone gate queries keep the join shape — its per-branch
   * projections cost less than carrying the repetition fold through a
   * cached frame's every consumer.
   */
  def withGopherGates(
      df: DataFrame, textCol: String, unicode: Boolean = false): DataFrame = {
    val out = Seq("keep_tokens", "keep_word_len", "keep_punct",
      "keep_stopwords", "keep_repetition", "keep")
    out.foreach { c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a '$c' column")
    }
    val st = col("__gg_st")
    val gates = gopherGateCols(
      st.getField("n_chars"), st.getField("n_tokens"),
      st.getField("sum_token_len"), st.getField("punct_chars"),
      st.getField("stopword_hits"), col("__gg_top"), col("__gg_nb"))
    gates.foldLeft(
      df.withColumn("__gg_st", text_stats(col(textCol), stopwords, unicode))
        .withColumn("__gg_t", Dedup.tokensMode(col(textCol), unicode))
        // guard size < 2 BEFORE sequence(): sequence(1, size-1) with
        // size < 2 generates a DESCENDING range, not an empty one
        .withColumn("__gg_top", expr(
          """CASE WHEN size(__gg_t) < 2 THEN CAST(0 AS BIGINT) ELSE
            |aggregate(
            |  array_sort(transform(sequence(1, size(__gg_t) - 1),
            |    i -> concat(element_at(__gg_t, i), ' ', element_at(__gg_t, i + 1)))),
            |  named_struct('prev', CAST(NULL AS STRING),
            |               'run', CAST(0 AS BIGINT), 'mx', CAST(0 AS BIGINT)),
            |  (a, x) -> named_struct(
            |    'prev', x,
            |    'run', CASE WHEN a.prev IS NOT NULL AND x = a.prev
            |                THEN a.run + CAST(1 AS BIGINT)
            |                ELSE CAST(1 AS BIGINT) END,
            |    'mx', greatest(a.mx,
            |      CASE WHEN a.prev IS NOT NULL AND x = a.prev
            |           THEN a.run + CAST(1 AS BIGINT)
            |           ELSE CAST(1 AS BIGINT) END)),
            |  a -> a.mx) END""".stripMargin))
        .withColumn("__gg_nb",
          when(size(col("__gg_t")) < 2, lit(0L))
            .otherwise((size(col("__gg_t")) - 1).cast("long")))
    ) { case (d, (n, c)) => d.withColumn(n, c) }
      .drop("__gg_st", "__gg_t", "__gg_top", "__gg_nb")
  }

  /** 64-bit rolling-hash fingerprint column (custom expression). */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp", doc_fingerprint(col(textCol)))

  /**
   * Mixed-language detection: language-ID each HALF of the document and
   * flag disagreements — the cheap first-pass screen for code-switched
   * pages, wrongly concatenated crawls, and template-wrapped foreign
   * text, all of which poison per-language corpora while looking
   * monolingual to whole-document langid (the dominant language wins the
   * whole-doc vote, so the contaminating half is invisible there).
   * `mixed` requires BOTH halves identified (no "und"): an unidentifiable
   * half is a quality problem, not evidence of a second language.
   *
   * Halves split at the character midpoint (codepoint semantics in both
   * engines), each scored by the same fused `lang_id_pick` kernel as
   * [[langId]] — row-local, no shuffle, and the oracle twin is generated
   * from the same marker table so the two cannot drift.
   */
  def langMixed(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val markers = langMarkers.toSeq.sortBy(_._1)
    val half = floor(length(col(textCol)) / 2).cast("int")
    // input columns ride along so the op composes mid-pipeline
    df.withColumn("lang_a",
        lang_id_pick(substr(col(textCol), lit(1), half), markers))
      .withColumn("lang_b",
        lang_id_pick(substr(col(textCol), half + 1, length(col(textCol))), markers))
      .withColumn("mixed",
        col("lang_a") =!= "und" && col("lang_b") =!= "und" &&
          col("lang_a") =!= col("lang_b"))
  }

  /** Token-rarity quality score — the integer-exact stand-in for
    * perplexity filtering (CCNet-style): documents dominated by globally
    * frequent tokens score high `sum_tok_freq`, rare-token-heavy
    * documents score low, and `min_tok_freq` flags the rarest token
    * (hapax detection). Deliberately NOT a log-prob: `ln` goes through
    * the platform libm, which is not bit-identical across engines, so a
    * log-based score could flip a floor() at an ulp boundary and break
    * the differential oracle; integer sums of integer counts are exact
    * everywhere, and monotone transforms preserve the filter ordering.
    *
    * Scale shape: one corpus explode into a (doc, term) partial-agg
    * shuffle; the term-frequency table derives from that AGGREGATE
    * (vocabulary-sized input, not a second corpus pass) and broadcasts
    * back; the final per-doc aggregate shuffles doc keys only.
    *
    * @return (`<idCol>`, `n_tokens`, `sum_tok_freq`, `min_tok_freq`) */
  def tokenRarity(df: DataFrame, idCol: String, textCol: String,
      unicode: Boolean = false): DataFrame = {
    val tf = df.select(col(idCol),
      explode(Dedup.tokensMode(col(textCol), unicode)).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // no broadcast hint on the vocabulary-sized frequency table: a 100 TB
    // multilingual pool's vocabulary can outgrow any broadcast budget, and
    // a forced hint would OOM the driver there — AQE still broadcasts it
    // when it measures small (the house `Lm` discipline)
    val freq = tf.groupBy(col("term")).agg(sum(col("tf")).as("freq"))
    tf.join(freq, "term")
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("freq")).as("sum_tok_freq"),
        min(col("freq")).as("min_tok_freq"))
  }

  /** Corpus token frequency: top-n tokens by count (explode + hash agg —
    * the one shuffling operator here; partial aggregation makes the
    * exchange carry only (token, count) pairs). `unicode` threads the
    * lexical contract ([[Dedup.tokensMode]]) — the last consumer to join
    * it: without it, token telemetry and the Count-Min sketch row read
    * zero for pure-CJK corpora while every neighboring operator counts
    * them. */
  def tokenFrequency(df: DataFrame, textCol: String, topN: Int = 20,
      unicode: Boolean = false): DataFrame =
    df.select(explode(Dedup.tokensMode(col(textCol), unicode)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topN)

  /** Canonical text normalization (the pre-dedup/pre-fingerprint clean):
    * lowercase, FOLD every non-[a-z0-9] run to a single space (deleting
    * instead would fuse "hello\nworld" into "helloworld", so whitespace-
    * variant duplicates — exactly what this clean exists to catch —
    * would stop colliding), then trim. Row-local regex chain — no
    * shuffle, codegen'd, and regex syntax is kept to the subset Java
    * and RE2 interpret identically (same discipline as
    * [[Corpus.redactPii]]). */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Markup-stripping text extraction — the first step of every
    * web-crawl ingest (HTML → training text): drop `<script>`/`<style>`
    * blocks WITH their contents (their text is code, not prose), strip
    * remaining tags to a space (a space, not deletion — `</p><p>`
    * deleted would fuse the last word of one paragraph into the first
    * of the next), decode the five predefined XML entities plus
    * numeric `&#NN;` for the printable-ASCII range, then collapse
    * whitespace runs and trim.
    *
    * Row-local regex chain — no shuffle, codegen'd; the regex subset is
    * one Java and RE2 interpret identically (house discipline, see
    * [[normalize]]). Entity decode order matters and is pinned:
    * `&amp;` is decoded LAST so `&amp;lt;` yields the literal "&lt;"
    * (the double-escape a correct decoder must not double-decode).
    * This is a cleaning extractor, not an HTML5 parser: malformed nests
    * degrade to extra whitespace, never to dropped prose. */
  def extractHtmlText(html: Column): Column = {
    // (?is): case-insensitive, DOTALL — script blocks span "lines".
    // Two passes, NOT one with a </\1> backreference: the oracle replays
    // this chain in DuckDB's RE2, which has no backreferences (the same
    // Java∩RE2 subset discipline as [[normalize]])
    // explicit whitespace class, NOT \s: Java's \s includes \x0B but
    // RE2's does not — the one place the "identical subset" discipline
    // needs a pinned class instead of a shorthand
    val ws = "[ \\t\\n\\x0B\\f\\r]"
    val noScript = regexp_replace(regexp_replace(html,
      s"(?is)<script\\b[^>]*>.*?</script$ws*>", " "),
      s"(?is)<style\\b[^>]*>.*?</style$ws*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    // numeric entities first (their digits would survive the named
    // pass): decode the ones real nav chrome actually emits (39
    // apostrophe, 34 quote) literally, fold every other numeric
    // entity to a space rather than leak "&#160;" into training
    // text; then the named five, &amp; LAST -- see scaladoc
    val numResolved = regexp_replace(regexp_replace(regexp_replace(
      noTags,
      "&#39;", "'"),
      "&#34;", "\""),
      "&#\\d+;", " ")
    val named = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      numResolved,
      "&lt;", "<"),
      "&gt;", ">"),
      "&quot;", "\""),
      "&apos;", "'")
    val amp = regexp_replace(named, "&amp;", "&")
    trim(regexp_replace(amp, s"$ws+", " "))
  }

  /** Tokenizer-efficiency telemetry per group (usually per source):
    * fertility (subword tokens per whitespace word — the multilingual
    * tokenizer-health metric; a domain whose fertility spikes is one the
    * tokenizer fragments) and compression (chars per subword token, the
    * budget planner's cost basis). Both emitted as exact micro-unit
    * integers over summed counts — all-positive floor division, so
    * Spark `div` and the SQL oracle agree bit-for-bit.
    *
    * Scale shape: one fused `text_stats` pass over the scan, then a
    * group-keyed partial aggregate — the exchange carries |groups| rows
    * of counters, never text. */
  def tokenFertility(
      df: DataFrame, groupCol: String, textCol: String,
      unicode: Boolean = false): DataFrame = {
    val st = col("__st")
    df.withColumn("__st", text_stats(col(textCol), stopwords, unicode))
      .select(col(groupCol),
        (st.getField("n_tokens") + st.getField("punct_chars")).as("__sub"),
        st.getField("ws_tokens").as("__ws"),
        st.getField("n_chars").as("__nc"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__sub")).as("subword_tokens"),
        sum(col("__ws")).as("ws_tokens"),
        sum(col("__nc")).as("n_chars"))
      .withColumn("fertility_micro",
        when(col("ws_tokens") > 0,
          expr("subword_tokens * 1000000L div ws_tokens")).otherwise(lit(0L)))
      .withColumn("chars_per_subword_micro",
        when(col("subword_tokens") > 0,
          expr("n_chars * 1000000L div subword_tokens")).otherwise(lit(0L)))
      .orderBy(col(groupCol))
  }

  /** Weights of the linear quality model evaluated by [[logitQuality]],
    * all in integer micro-units (1e6 = 1.0). This is the shape a
    * distilled quality classifier (fasttext / logistic regression over
    * handcrafted features) has after export: a handful of per-feature
    * weights plus a bias and a decision threshold. Swapping in weights
    * from a real training run is a constructor call, not a code change. */
  final case class LogitWeights(
      wLenFrac: Long = 3000000L, // reward doc length, saturating at lenCap
      wMeanWordLen: Long = -100000L, // long average words ⇒ code/garbage drift
      wPunctRatio: Long = -12000000L, // punctuation-dense docs are boilerplate
      wStopwordRatio: Long = 8000000L, // stopword presence ⇒ natural prose
      biasP12: Long = 0L,
      thresholdP12: Long = 250000000000L, // ~0.25 in p12 units
      lenCap: Int = 2000)

  /** Learned-filter inference: the linear quality model scored in-plan
    * with integer fixed-point arithmetic only. Features are micro-unit
    * ratios derived from the one-pass `text_stats` kernel (saturated
    * length fraction, mean word length, punctuation ratio, stopword
    * ratio); `score_p12 = Σ wᵢ·fᵢ + bias` stays in 10⁻¹² units with no
    * division after the feature step, so the number is exact integer
    * math — bit-reproducible by the SQL oracle under any evaluation
    * order, unlike a float dot product.
    *
    * Scale shape: one codegen'd projection over the scan — no UDF, no
    * shuffle, no model-server round trip. At 100 TB the classifier adds
    * nothing to the corpus pass it rides on; that is the entire point of
    * distilling a quality model to linear weights.
    *
    * @return (`<idCol>`, `len_frac_micro`, `mwl_micro`, `punct_micro`,
    *         `stop_micro`, `score_p12`, `keep`) */
  def logitQuality(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: LogitWeights = LogitWeights()): DataFrame = {
    // a non-positive cap would divide by zero, which non-ANSI Spark
    // folds to NULL — and a NULL keep silently drops every row downstream
    require(w.lenCap > 0, s"lenCap must be positive: ${w.lenCap}")
    val st = col("__st")
    df.withColumn("__st", text_stats(col(textCol), stopwords))
      .select(col(idCol),
        expr(s"least(__st.n_chars, ${w.lenCap}L) * 1000000L div ${w.lenCap}L")
          .as("len_frac_micro"),
        when(st.getField("n_tokens") > 0,
          expr(s"__st.sum_token_len * 1000000L div __st.n_tokens"))
          .otherwise(lit(0L)).as("mwl_micro"),
        when(st.getField("n_chars") > 0,
          expr(s"__st.punct_chars * 1000000L div __st.n_chars"))
          .otherwise(lit(0L)).as("punct_micro"),
        when(st.getField("n_tokens") > 0,
          expr(s"__st.stopword_hits * 1000000L div __st.n_tokens"))
          .otherwise(lit(0L)).as("stop_micro"))
      .withColumn("score_p12",
        col("len_frac_micro") * lit(w.wLenFrac) +
          col("mwl_micro") * lit(w.wMeanWordLen) +
          col("punct_micro") * lit(w.wPunctRatio) +
          col("stop_micro") * lit(w.wStopwordRatio) +
          lit(w.biasP12))
      .withColumn("keep", col("score_p12") >= lit(w.thresholdP12))
  }

  /**
   * Quality-classifier TRAINING — the distillation workflow that
   * produces [[LogitWeights]]-shaped models in the first place: fit a
   * logistic regression over the SAME four `text_stats`-derived features
   * [[logitQuality]] scores, against a caller-supplied 0/1 label column
   * (the registered query uses [[gopherFilter]]'s `keep` — i.e. distill
   * the expensive rule-based gate into the cheap linear filter, the
   * fasttext-classifier workflow every curation pipeline runs).
   *
   * Spark-first shape: full-batch gradient descent where each iteration
   * is ONE aggregate over the scope-cached feature frame — the gradient
   * and the (numerically stable) log-loss fold into a single `agg`, so
   * an iteration costs one pass over cached doubles and ships FIVE
   * numbers to the driver. Model state is 5 doubles; the corpus is never
   * collected, never re-tokenized (features materialize once). At 100 TB
   * the cost is `iters + 2` passes over a 5-column cached projection —
   * the textbook distributed-GD layout (gradient as `treeAggregate`,
   * here expressed declaratively so Catalyst fuses it with codegen).
   *
   * Determinism note: feature values are exact micro-unit integers
   * (scaled into [0,~1.5] doubles), but float SUMMATION order varies across
   * partitionings, so losses/weights carry ulp-level run variance —
   * which is why the registered verdict gates loss MONOTONICITY with an
   * ulp-tolerant slack and a thresholded agreement rate, not exact
   * values (the `embed_kmeans_verdict` convention). Descent itself is
   * guaranteed: training runs on STANDARDIZED features (unit variance +
   * intercept), so the logistic-loss Hessian norm is ≤ 0.25·E‖x‖² =
   * 0.25·5 = 1.25 and the default step size sits safely under 2/L.
   *
   * @param labeled frame carrying `idCol`, `textCol` and `labelCol`
   *                (values 0 or 1)
   * @return (weights of length 5: bias + 4 features, per-iteration
   *         losses of length `iters + 1` — losses(0) is the zero-weight
   *         starting loss)
   */
  def trainLogit(
      labeled: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      iters: Int = 8,
      lr: Double = 0.5): (Seq[Double], Seq[Double]) = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // micro-unit features scaled into ~[0, 1.5]: the three ratios are
    // ≤ 1e6 micro (/1e6), mean word length is ≈3e6–1.5e7 micro (/1e7) —
    // bounding ‖x‖² ≈ 6 keeps the loss Hessian norm L = 0.25·E‖x‖²
    // ≲ 1.6, so the default step 0.5 < 2/L descends unconditionally
    // a NULL label would null-poison its row's loss/gradient terms —
    // sum() then SKIPS them while n still counts the row, silently
    // shrinking every gradient. Fail loud: unlabeled rows are the
    // caller's filter to make, not this function's to guess.
    val feats = graft.CacheScope.scoped(
      logitFeatures(labeled, idCol, textCol, labelCol))
    val counts = feats.agg(count(lit(1)).as("__n"),
      count(col("__y")).as("__ny")).head()
    val n = counts.getLong(0).toDouble
    require(n > 0, "trainLogit needs at least one labeled row")
    require(counts.getLong(1) == counts.getLong(0),
      s"trainLogit: ${counts.getLong(0) - counts.getLong(1)} NULL label(s) " +
        "— filter unlabeled rows before training")
    // STANDARDIZE the non-intercept features (one bounded aggregate over
    // the cached frame): centering decouples the bias from the feature
    // directions, and unit-variance scaling makes the needed weights
    // O(1) — on raw scales a decision boundary over a 0.1-wide feature
    // needs a weight of tens, which first-order GD only reaches after
    // thousands of steps (measured: 30 raw-scale iterations still
    // predicted the majority class everywhere). The affine map folds
    // back into the returned weights, so callers score RAW features.
    val statsRow = feats.agg(
      avg(col("__x1")).as("m1"), avg(col("__x2")).as("m2"),
      avg(col("__x3")).as("m3"), avg(col("__x4")).as("m4"),
      stddev_pop(col("__x1")).as("s1"), stddev_pop(col("__x2")).as("s2"),
      stddev_pop(col("__x3")).as("s3"), stddev_pop(col("__x4")).as("s4")).head()
    val mu = Array(0.0, statsRow.getDouble(0), statsRow.getDouble(1),
      statsRow.getDouble(2), statsRow.getDouble(3))
    // a constant feature has σ = 0 (its centered gradient is 0 anyway):
    // scale by 1 to avoid a division blow-up
    val sd = Array(1.0) ++ (4 to 7).map { j =>
      val v = statsRow.getDouble(j); if (v > 0) v else 1.0
    }
    val xs = (0 to 4).map(j =>
      if (j == 0) col("__x0") else (col(s"__x$j") - lit(mu(j))) / lit(sd(j)))
    // The descent iterates OFF Catalyst (r19, guide §1.2/§7.3): the prior
    // form ran one DataFrame aggregate per iteration, and because each
    // pass embedded that iteration's weight literals the driver paid a
    // full analyze+optimize+AQE+codegen round per step — measured 3.6 s
    // of driver-side gaps for 0.3 s of task time at sf0.1 (JobProfile).
    // Here the standardized feature vectors are materialized ONCE into a
    // cached RDD of primitive arrays (columns produced by the exact xs
    // expressions the aggregate consumed) and each iteration is a single
    // treeAggregate — the classic distributed-GD shape: map-side partial
    // (loss, gradient) per partition, tree-combined, six doubles to the
    // driver. No per-iteration planning, no per-iteration codegen; at
    // scale the per-pass cost is the same one cached-data scan the
    // aggregate form paid. Per-row math is bit-identical (same
    // standardization, same left-fold z, same stable log-loss; Spark's
    // EXP/LOG1P are java.lang.Math); only the cross-partition combine
    // order can differ, which moves loss/weights by ulps — the contract
    // (monotone loss under lr < 2/L, agreement, and the bounded-check
    // oracle) is insensitive to that, and TextAnalysisSpec pins it.
    val stdProj = feats.select((col("__y") +: xs): _*)
    // MEMORY_AND_DISK (r20, guide §5): the bare persist() default is
    // MEMORY_ONLY, under which an evicted partition silently recomputes
    // the full upstream projection once per REMAINING iteration at real
    // scale — spill-to-disk keeps each partition's cost paid once
    val stdRdd = stdProj.queryExecution.toRdd.map { ir =>
      Array(ir.getDouble(0), ir.getDouble(1), ir.getDouble(2),
        ir.getDouble(3), ir.getDouble(4), ir.getDouble(5))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var w = Array.fill(5)(0.0)
    def lossGradOnce(wNow: Array[Double]): (Double, Array[Double]) = {
      val (lSum, gSum) = stdRdd.treeAggregate((0.0, new Array[Double](5)))(
        seqOp = { case ((l, g), a) =>
          var z = 0.0
          var j = 0
          while (j < 5) { z += a(j + 1) * wNow(j); j += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          // stable log-loss: ln(1+e^z) − y·z = max(z,0) + log1p(e^−|z|) − y·z
          val li = math.max(z, 0.0) + math.log1p(math.exp(-math.abs(z))) -
            a(0) * z
          var k = 0
          while (k < 5) { g(k) += (p - a(0)) * a(k + 1); k += 1 }
          (l + li, g)
        },
        combOp = { case ((l1, g1), (l2, g2)) =>
          var k = 0
          while (k < 5) { g1(k) += g2(k); k += 1 }
          (l1 + l2, g1)
        })
      (lSum / n, gSum.map(_ / n))
    }
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 to iters).foreach { it =>
      val (l, g) = lossGradOnce(w)
      losses += l
      if (it < iters) w = Array.tabulate(5)(j => w(j) - lr * g(j))
    }
    stdRdd.unpersist(blocking = false)
    // un-standardize: z = Σⱼ wⱼ(xⱼ−μⱼ)/σⱼ + w0
    //                   = (w0 − Σⱼ (wⱼ/σⱼ)μⱼ) + Σⱼ (wⱼ/σⱼ)xⱼ
    val wRaw = (1 to 4).map(j => w(j) / sd(j))
    val w0 = w(0) - (1 to 4).map(j => wRaw(j - 1) * mu(j)).sum
    (w0 +: wRaw, losses.toSeq)
  }

  /** The ONE labeled-feature projection [[trainLogit]] and
    * [[logitAgreement]] share: (`__y`, `__x0..__x4`) with the scaled
    * feature convention the returned weights score. Identical LOGICAL
    * PLAN on both call paths — when agreement is measured inside
    * trainLogit's cache scope (the registered query), Spark's cache
    * manager substitutes the already-materialized frame and the
    * agreement pass costs zero corpus scans. */
  private def logitFeatures(
      labeled: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String): DataFrame =
    logitQuality(labeled, idCol, textCol)
      .join(labeled.select(col(idCol), col(labelCol).cast("double").as("__y")),
        Seq(idCol))
      .select(col("__y"),
        lit(1.0).as("__x0"),
        (col("len_frac_micro") / 1e6).as("__x1"),
        (col("mwl_micro") / 1e7).as("__x2"),
        (col("punct_micro") / 1e6).as("__x3"),
        (col("stop_micro") / 1e6).as("__x4"))

  /** Agreement rate of a trained [[trainLogit]] model against the label
    * column — the distillation acceptance metric. One aggregate over the
    * shared [[logitFeatures]] plan (a cache hit when trainLogit's scoped
    * frame is still live — the registered query's shape). */
  def logitAgreement(
      labeled: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      w: Seq[Double]): Double = {
    require(w.length == 5, s"expected 5 weights: ${w.length}")
    val z = (0 to 4).map(j => col(s"__x$j") * lit(w(j))).reduce(_ + _)
    val row = logitFeatures(labeled, idCol, textCol, labelCol)
      .agg(
        sum(when((z >= 0) === (col("__y") >= 0.5), 1L).otherwise(0L))
          .as("__hits"),
        count(lit(1)).as("__n")).head()
    row.getLong(0).toDouble / math.max(row.getLong(1), 1L)
  }

  /** Vocabulary frequency histogram on log2 buckets (the Zipf-shape
    * check a corpus build monitors): bucket = ⌊log2(count)⌋ + 1, computed
    * integer-exactly as the binary-digit count of the term frequency
    * (`length(bin(cnt))` — no float log whose ulp could flip a
    * power-of-two boundary between engines). Two hash aggregates; the
    * second input is vocabulary-sized. */
  def vocabZipf(df: DataFrame, textCol: String,
      unicode: Boolean = false): DataFrame =
    df.select(explode(Dedup.tokensMode(col(textCol), unicode)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(length(bin(col("__cnt"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_terms"), sum(col("__cnt")).as("occurrences"))
      .orderBy(col("bucket"))

  /** Compressibility quality signal (the Gopher / RefinedWeb-family
    * "too repetitive / too random" filter): per document, the DEFLATE
    * size of the UTF-8 text vs its raw size, as an integer micro-ratio.
    * Highly repetitive boilerplate compresses far below typical prose;
    * encrypted/binary junk barely compresses at all — both tails are
    * what the band filter cuts. Reuses the engine's codegen'd gzip
    * kernel (reference T1's inverse), so the scan stays in whole-stage
    * codegen: one pass, no shuffle — the groupBy/band is the caller's.
    * `ratioMicro` = compressed_bytes·1e6 DIV utf8_bytes (header overhead
    * means tiny documents can exceed 1e6). */
  def compressionSignal(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      octet_length(col(textCol)).cast("long").as("orig_bytes"),
      octet_length(graft.functions.gzip_string(col(textCol))).cast("long")
        .as("gz_bytes"))
      .withColumn("ratio_micro",
        when(col("orig_bytes") === 0, lit(0L))
          .otherwise(expr("gz_bytes * 1000000L DIV orig_bytes")))
}
