package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Word-n-gram operators over document text (SURVEY §2.3 extension
 * surface): benchmark decontamination, intra-document repetition
 * scoring, and rare-term extraction — the n-gram-shaped trio of a
 * pretraining data pipeline.
 *
 * Tokenization follows the shared lexical contract everywhere
 * ([[Dedup.tokensMode]]: the ASCII rule by default, the multilingual
 * `unicode = true` rule on demand — every operator here threads the
 * mode, so CJK/Cyrillic/Indic corpora get real decontamination and
 * span removal instead of the ASCII mode's silent zero-token no-op),
 * and n-grams are built with `lead()` windows rather than array HOFs:
 * windows are whole-stage codegen'd, while Spark's lambda HOFs are
 * interpreted (the documented round-1 35× lesson). Every operator here
 * is ANSI-SQL-expressible and carries a DuckDB oracle.
 */
object Ngrams {

  /** One row per token with its 1-based in-document position.
    * `carryCols` ride along untouched (e.g. a grouping column). */
  def tokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      carryCols: Seq[String] = Nil,
      unicode: Boolean = false): DataFrame = {
    val keep = (idCol +: carryCols).map(col)
    // graft.functions.token_rows is the fused twin of
    // `posexplode(Dedup.tokensMode(...))` — Dedup.tokensMode stays THE
    // house tokenizer contract and UnicodeTokensSpec pins the generator
    // to it; the fused walk drops the per-row regex + interpreted-HOF
    // cost the composed form paid (r19 profile: >50% of family CPU)
    df.select(keep :+
      graft.functions.token_rows(col(textCol), unicode).as(Seq("pos", "tok")): _*)
  }

  /**
   * Sliding word n-grams: one row per starting position, `ngram` NULL for
   * the incomplete tails (fewer than n tokens left). Built with
   * `concat` (NOT `concat_ws`, which would silently skip the NULL leads
   * and emit shortened tail grams). One hash exchange on the doc key
   * (the window partition); downstream per-doc aggregations reuse that
   * same partitioning, so they add no exchange.
   *
   * The window partitions by (`idCol`, `carryCols`) — so ids only need
   * to be unique WITHIN a carry-column combination (e.g. per-source ids
   * with the source carried, the [[boilerplateNgrams]] shape). Two rows
   * sharing the full key would interleave their token streams into
   * cross-document grams; (idCol ++ carryCols) must uniquely key rows.
   */
  def wordNgrams(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      carryCols: Seq[String] = Nil,
      unicode: Boolean = false): DataFrame = {
    require(n >= 2, s"n-gram size must be >= 2: $n")
    val w = Window.partitionBy((idCol +: carryCols).map(col): _*).orderBy(col("pos"))
    val parts: Seq[Column] =
      col("tok") +: (1 until n).map(i => lead(col("tok"), i).over(w))
    val gram = parts.reduce((a, b) => concat(a, lit(" "), b))
    tokens(df, idCol, textCol, carryCols, unicode).withColumn("ngram", gram)
  }

  /**
   * Benchmark decontamination: flag corpus documents sharing at least one
   * word n-gram with a benchmark subset (the train/test-leakage scrub
   * every published pretraining pipeline runs). `benchmarkPred` selects
   * the benchmark rows; output is one row per contaminated non-benchmark
   * doc with its distinct-shared-n-gram count.
   *
   * Scale shape: the benchmark side is tiny relative to the corpus (a
   * benchmark suite, not a corpus), so its distinct n-gram set is
   * broadcast — the corpus n-gram stream is filtered in place, never
   * shuffled on the n-gram key. The per-doc count then reuses the window
   * stage's doc-id partitioning. The benchmark branch re-reads the
   * source, but with `benchmarkPred` pushed into the scan it touches
   * only the benchmark slice.
   */
  def decontaminate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmarkPred: Column,
      n: Int = 3,
      unicode: Boolean = false): DataFrame = {
    // NULL-pred rows are CORPUS rows (screened): filter(pred) and
    // filter(!pred) both drop a NULL-evaluating row, so without the
    // coalesce a document with e.g. a NULL subset tag would be neither
    // benchmark nor screened — an unreported recall hole in the scrub
    val isBench = coalesce(benchmarkPred, lit(false))
    val bench = wordNgrams(df.filter(isBench), idCol, textCol, n, Nil, unicode)
      .filter(col("ngram").isNotNull)
      .select(col("ngram")).distinct()
    wordNgrams(df.filter(!isBench), idCol, textCol, n, Nil, unicode)
      .filter(col("ngram").isNotNull)
      .join(broadcast(bench), "ngram")
      .groupBy(col(idCol))
      .agg(countDistinct(col("ngram")).as("n_hits"))
  }

  /**
   * Cross-source n-gram contamination matrix (corpus monitoring): for
   * every pair of sources, the number of DISTINCT word n-grams both
   * emit — the early-warning signal for mirrored sites, syndicated
   * boilerplate, and benchmark text leaking in through several feeds at
   * once (per-source dedup never sees it; this does).
   *
   * Scale shape: the corpus reduces to distinct (source, ngram) rows in
   * one exchange; a second groups each ngram's source LIST — bounded by
   * |sources| (dozens), not corpus size — and explodes its pairs
   * map-side. No gram ever joins corpus rows against corpus rows, so
   * the worst case is |distinct grams| × |sources|² with tiny constants,
   * not documents². Output is |sources|²/2 rows of integer counts.
   */
  def sourceNgramOverlap(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      n: Int = 5,
      unicode: Boolean = false): DataFrame = {
    // r19: gram-hash keys (the substringPairs rationale — grams are
    // join/count keys only here; counts move only on a 64-bit collision,
    // which the string-replaying DuckDB oracle would catch loud)
    val sg = df.select(col(groupCol).as("source"),
      graft.functions.gram_hash_rows(col(textCol), n, unicode).as(Seq("pos", "gh")))
      .select(col("source"), col("gh").as("ngram"))
      .distinct()
    // unordered pairs via ONE codegen'd HOF + a single explode (the
    // Assoc.pairRules pattern): the double-posexplode form generated
    // |ss|² intermediate rows each carrying the full source list before
    // the pi<pj filter — for a hub gram syndicated through 30 feeds,
    // 900 rows where 435 pair structs suffice
    sg.groupBy(col("ngram"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(expr(
        "flatten(transform(ss, (x, i) -> " +
          "transform(slice(ss, i + 2, size(ss)), y -> " +
          "struct(x AS source_a, y AS source_b))))")).as("p"))
      .select(col("p.source_a"), col("p.source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /**
   * Collocation mining: token bigrams ranked by lift — the log-free core
   * of PMI, `lift = P(ab) / (P(a)·P(b)) = c_ab·N / (c_a·c_b)` (PMI is
   * `log lift`; log is monotone, so the RANKING is PMI's). Emits the top
   * `topK` bigrams with occurrence counts and lift, `minCount` guarding
   * the low-frequency blow-up every PMI variant suffers (a pair seen
   * once between two hapaxes has sky-high lift and zero signal).
   *
   * Lift stays in plain counts and ONE IEEE multiply/divide chain — no
   * `log`/`pow` (libm-grade, not correctly rounded) — so the double is
   * bit-identical cross-engine and the query carries a full hash oracle.
   *
   * Scale shape: bigram emission is map-only (`explode(sequence)` +
   * `element_at` over the canonical token array — codegen built-ins, no
   * per-doc window exchange, no lambda HOFs); then two hash aggregates
   * (bigram counts, unigram counts) and a vocab-keyed shuffle join of
   * bigrams to their component counts — all partial-agg friendly. The
   * scalar token total is a 1-row broadcast. Top-k is a
   * TakeOrderedAndProject, never a global sort.
   */
  def collocations(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5,
      topK: Int = 50,
      unicode: Boolean = false): DataFrame = {
    val toks = df.select(Dedup.tokensMode(col(textCol), unicode).as("__a"))
    val pairs = toks
      .filter(size(col("__a")) > 1)
      .select(col("__a"),
        explode(sequence(lit(1), size(col("__a")) - 1)).as("__i"))
      .select(element_at(col("__a"), col("__i")).as("t1"),
        element_at(col("__a"), col("__i") + 1).as("t2"))
    val big = pairs.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    // uni feeds three consumers (t1 join, t2 join, corpus total); persist
    // the vocabulary-sized AGGREGATE so the corpus token explode runs
    // once, not three times (plan-audited: 4 scans → 2)
    val uni = graft.CacheScope.scoped(
      toks.select(explode(col("__a")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("__c")))
    val total = uni.agg(sum(col("__c")).as("__total"))
    big
      .join(uni.select(col("tok").as("t1"), col("__c").as("count_a")), "t1")
      .join(uni.select(col("tok").as("t2"), col("__c").as("count_b")), "t2")
      .crossJoin(broadcast(total))
      .withColumn("lift",
        (col("pair_count").cast("double") * col("__total").cast("double")) /
          (col("count_a").cast("double") * col("count_b").cast("double")))
      .select(col("t1"), col("t2"), col("pair_count"),
        col("count_a"), col("count_b"), col("lift"))
      .orderBy(col("lift").desc, col("t1"), col("t2"))
      .limit(topK)
  }

  /**
   * Bloom-filter decontamination — the 100 TB shape of
   * [[decontaminate]]. The exact variant broadcasts the benchmark's
   * distinct n-gram SET for the semi join; at production benchmark
   * sizes (tens of millions of grams × tens of bytes) that broadcast
   * runs to gigabytes per executor. This variant compresses the
   * benchmark side into a Bloom filter (~1.2 bytes per gram at 1% FPP,
   * ~2 at 0.1%): build it with `DataFrame.stat.bloomFilter` over the
   * benchmark grams (bounded model state, the same contract as the IVF
   * coarse quantizer), then probe row-locally on the corpus side with
   * the codegen'd [[graft.functions.BloomMightContain]] — the corpus
   * plan contains NO join at all, just a filter above the scan.
   *
   * Error is one-sided in the safe direction: a truly shared n-gram is
   * NEVER missed (every exactly-contaminated doc is flagged, with
   * `n_hits` ≥ the exact count), while a clean doc may be flagged
   * spuriously at ≈ 1-(1-fpp)^grams — production pipelines accept the
   * over-removal, or re-check the (tiny) flagged set with the exact
   * join.
   */
  def decontaminateBloom(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmarkPred: Column,
      n: Int = 3,
      fpp: Double = 0.001,
      unicode: Boolean = false): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1): $fpp")
    // persisted for the two actions below: the sizing count and the
    // filter build both consume the distinct gram set, and without the
    // cache each action re-runs the tokenize + lead()-window n-gram
    // build (the benchmark side is small relative to the corpus, but it
    // is not free — and the count is exactly the action that
    // materializes the cache the bloom aggregate then reads). Both
    // actions run eagerly HERE — the returned corpus plan carries only
    // the bloom literal — so the cache's lifetime ends at unpersist,
    // no CacheScope registration needed. stat.bloomFilter itself is a
    // treeAggregate over the cached partitions: partial blooms build in
    // parallel and merge in log depth, so the driver never serializes
    // the gram scan.
    // NULL-pred rows are corpus rows — see decontaminate
    val isBench = coalesce(benchmarkPred, lit(false))
    val bench = wordNgrams(df.filter(isBench), idCol, textCol, n, Nil, unicode)
      .filter(col("ngram").isNotNull)
      .select(col("ngram")).distinct().persist()
    // sizing pass on the (small) benchmark side only; never the corpus
    val nGrams = math.max(bench.count(), 1L)
    val bloom = bench.stat.bloomFilter("ngram", nGrams, fpp)
    bench.unpersist()
    wordNgrams(df.filter(!isBench), idCol, textCol, n, Nil, unicode)
      .filter(col("ngram").isNotNull &&
        graft.functions.bloom_might_contain(col("ngram"), bloom))
      .groupBy(col(idCol))
      .agg(countDistinct(col("ngram")).as("n_hits"))
  }

  /**
   * Substring-duplication candidate pairs (the candidate stage of
   * exact-substring dedup à la "Deduplicating Training Data Makes
   * Language Models Better"): documents sharing ≥1 word n-gram, with the
   * count of distinct shared grams. Long n (15–50 tokens) finds real
   * copied substrings at corpus scale; the registered query uses n=4 so
   * the fixture yields a non-trivial result.
   *
   * Scale shape: distinct (doc, gram) pairs hash-shuffle on the gram;
   * pair explosion happens inside gram groups with the same
   * oversized-group guard as minhash banding (a ubiquitous gram would
   * otherwise explode quadratically); the pair aggregate then shuffles
   * only (id_a, id_b) keys.
   */
  def substringPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxDocsPerGram: Int = 1000,
      unicode: Boolean = false): DataFrame = {
    // r19: grams travel as 8-byte [[graft.functions.gram_hash_rows]]
    // keys, not strings — this operator uses grams ONLY as join/count
    // keys, so the lead()-window + string-concat form paid a per-token
    // window sort plus gram-string shuffles for nothing. Counts change
    // only on a 64-bit gram-hash collision — the same contract the
    // shingle-set machinery documents (and the DuckDB oracle replays
    // string grams, so a collision would fail loud, not silently).
    val dg = df.select(col(idCol).as("id"),
      graft.functions.gram_hash_rows(col(textCol), n, unicode).as(Seq("pos", "gh")))
      .select(col("id"), col("gh"))
      .distinct()
    // rows are distinct (id, gram), so the per-gram row count IS the
    // document count; the guard is the house single-pass window
    val guarded = Dedup.dropOversizedBuckets(dg, Seq("gh"), maxDocsPerGram)
    guarded.select(col("gh"), col("id").as("id_a"))
      .join(guarded.select(col("gh"), col("id").as("id_b")), Seq("gh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("gh")).as("n_shared"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /**
   * Exact-substring verification — the stage after [[substringPairs]]:
   * the LONGEST shared token run per document pair, certified exactly.
   * Each shared n-gram occurrence at positions (pa, pb) lies on the
   * diagonal pa − pb; consecutive pa values on one diagonal form an
   * island, and an island of R grams proves a common substring of
   * R + n − 1 tokens (the grams overlap by n − 1). Classic
   * gaps-and-islands — `pa − row_number()` is constant exactly within a
   * consecutive run — so the whole verification is windows + aggregates,
   * no per-pair string alignment.
   *
   * Scale shape: the occurrence join shuffles on the gram (with the
   * oversized-gram guard capping ubiquitous grams), then the island
   * window and both aggregates all share the (id_a, id_b[, diag])
   * prefix, so EnsureRequirements plans ONE pair-keyed exchange for the
   * three of them. At production n (15–50) the join side shrinks
   * drastically; n = 4 keeps the fixture non-trivial.
   */
  def substringRuns(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minTokens: Int,
      maxDocsPerGram: Int = 1000,
      unicode: Boolean = false): DataFrame = {
    require(minTokens >= n, s"minTokens ($minTokens) must be >= n ($n)")
    // r19: gram-hash keys (see substringPairs) — grams here are join
    // keys only; positions, islands, and run lengths are untouched.
    val occ = df.select(col(idCol).as("id"),
      graft.functions.gram_hash_rows(col(textCol), n, unicode).as(Seq("pos", "gh")))
    // oversized-gram guard on DOCUMENT count — the same semantics the
    // parameter name carries in substringPairs. Counting occurrence ROWS
    // here would let a gram repeated many times WITHIN few documents
    // (the exact boilerplate this stage certifies) trip the cap and
    // silently understate max_run_tokens. The oversized-gram set is
    // tiny, so it broadcasts as an anti-join filter.
    val bigGrams = occ.select(col("id"), col("gh")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("__gd"))
      .filter(col("__gd") > maxDocsPerGram).select(col("gh"))
    val guarded = occ.join(broadcast(bigGrams), Seq("gh"), "left_anti")
    val joined = guarded
      .select(col("gh"), col("id").as("id_a"), col("pos").as("pa"))
      .join(guarded.select(col("gh"), col("id").as("id_b"), col("pos").as("pb")),
        Seq("gh"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("diag", col("pa") - col("pb"))
    // within one (pair, diag) each pa appears once (pb is determined),
    // so no occurrence dedup is needed before the island window
    val wD = Window.partitionBy(col("id_a"), col("id_b"), col("diag"))
      .orderBy(col("pa"))
    joined
      .withColumn("__island", col("pa") - row_number().over(wD))
      .groupBy(col("id_a"), col("id_b"), col("diag"), col("__island"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col("id_a"), col("id_b"))
      .agg((max(col("__run")) + lit(n - 1)).as("max_run_tokens"))
      .filter(col("max_run_tokens") >= minTokens)
  }

  /**
   * Exact-substring REMOVAL — the rewrite stage of Lee et al.,
   * "Deduplicating Training Data Makes Language Models Better" (2022):
   * delete duplicated token runs from INSIDE documents, keeping the
   * corpus-first occurrence, where [[substringPairs]]/[[substringRuns]]
   * only detect them. The published pipeline removes any ≥50-token
   * substring that appears more than once in the corpus; this operator
   * expresses the same rule through its seed n-grams:
   *
   *  - every duplicated run of ≥ `n` tokens contains a duplicated
   *    n-gram, and every duplicated n-gram occurrence lies inside a
   *    duplicated run of ≥ `n` tokens — so covering duplicated n-gram
   *    occurrences covers exactly the duplicated-run positions;
   *  - an n-gram occurrence is REMOVED-covered when the gram occurs
   *    more than once in the corpus (cross- or within-document) and
   *    this occurrence is not the gram's global first by (doc, pos)
   *    order — the keep-first contract, per gram;
   *  - a token is deleted iff some removed-covered occurrence covers
   *    its position; the document is rebuilt from the surviving tokens
   *    in position order (normalized to the house token stream —
   *    removal operates on tokens, so the rebuilt text is
   *    space-joined house tokens, the same normalization
   *    [[graft.operators.Corpus.packSequences]] consumes).
   *
   * All arithmetic is integer/string-exact, so the full rewrite replays
   * in DuckDB.
   *
   * Scale shape: gram stats are ONE hash aggregation over 16-byte gram
   * digests filtered to cnt ≥ 2 (partial-agg safe under hot boilerplate
   * grams — no per-gram window, so a million-fold-duplicated gram
   * cannot skew a partition); the occurrence stream joins that
   * duplicated-gram table (AQE picks broadcast vs shuffle — the table
   * is dup-gram-, not corpus-bounded); covered intervals merge with a
   * per-DOC window (bounded partitions) into disjoint spans whose
   * per-doc list joins back onto the corpus for a pure-HOF rebuild —
   * documents never ride a token-exploded exchange. The corpus is
   * scanned twice (stats, probe) plus the rebuild join: the
   * train-then-apply shape, no corpus-sized state anywhere.
   */
  def removeDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      unicode: Boolean = false): DataFrame = {
    val occ = wordNgrams(df, idCol, textCol, n, Nil, unicode)
      .filter(col("ngram").isNotNull)
      .select(col(idCol).as("id"), col("pos"), md5(col("ngram")).as("__g"))
    // duplicated grams only: (count, lexicographic-first occurrence)
    val stats = occ.groupBy(col("__g"))
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col("id"), col("pos"))).as("__first"))
      .filter(col("__cnt") >= 2)
    val dup = occ.join(stats, Seq("__g"))
      .filter(!(col("id") === col("__first.id") &&
        col("pos") === col("__first.pos")))
      .select(col("id"), col("pos").as("s"), (col("pos") + n - 1).as("e"))
    // merge overlapping cover intervals per doc (gaps-and-islands on the
    // running max end) so the explode below emits each position once
    val wPrev = Window.partitionBy(col("id")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("id")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val merged = dup
      .withColumn("__ni",
        when(col("s") > coalesce(max(col("e")).over(wPrev), lit(-1)), 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__ni")).over(wRun))
      .groupBy(col("id"), col("__isl"))
      .agg(min(col("s")).as("s0"), max(col("e")).as("e0"))
    val ivs = merged.groupBy(col("id"))
      .agg(collect_list(struct(col("s0"), col("e0"))).as("__ivs"))
    // rebuild: the fused remove_spans kernel (r19) — one byte-walk +
    // sorted interval sweep per row; the prior HOF chain re-tokenized
    // with java.util.regex and evaluated the interpreted exists() per
    // (token × interval). Output spec-pinned identical (RemoveSpansSpec:
    // kernel == HOF form, overlapping/unordered/empty interval lists).
    df.join(ivs, df(idCol) === ivs("id"), "left")
      .withColumn("__iv", coalesce(col("__ivs"),
        array().cast("array<struct<s0:int,e0:int>>")))
      .withColumn("__rs",
        graft.functions.remove_spans(col(textCol), col("__iv"), unicode))
      .select(col(idCol),
        col("__rs.text_clean").as("text_clean"),
        col("__rs.n_tokens").cast("long").as("n_tokens"),
        (col("__rs.n_tokens") - col("__rs.n_kept")).cast("long").as("n_removed"))
  }

  /**
   * Boilerplate n-gram detection (the RefinedWeb-style "same navigation
   * text on every page of a site" scrub): n-grams appearing in at least
   * `fracNum/fracDen` of a group's documents (and ≥ `minDocs` docs).
   * Integer-ratio threshold, so the oracle reproduces it exactly. The
   * per-group totals are a tiny aggregate broadcast back onto the
   * vocabulary-sized gram counts.
   */
  def boilerplateNgrams(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      n: Int = 2,
      fracNum: Int = 1,
      fracDen: Int = 10,
      minDocs: Int = 3,
      unicode: Boolean = false): DataFrame = {
    require(fracNum > 0 && fracDen > 0, "fraction must be positive")
    val grams = wordNgrams(df, idCol, textCol, n, carryCols = Seq(groupCol),
      unicode = unicode)
      .filter(col("ngram").isNotNull)
      .select(col(groupCol), col(idCol), col("ngram"))
      .distinct()
      .groupBy(col(groupCol), col("ngram"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = df.groupBy(col(groupCol))
      .agg(countDistinct(col(idCol)).as("__total"))
    grams.join(broadcast(totals), groupCol)
      .filter(col("n_docs") * fracDen >= lit(fracNum) * col("__total") &&
        col("n_docs") >= minDocs)
      .select(col(groupCol), col("ngram"), col("n_docs"))
      .orderBy(col(groupCol), col("ngram"))
  }

  /**
   * Intra-document repetition stats (the Gopher-style "most common
   * n-gram fraction" quality rule), kept integer-exact for cross-engine
   * determinism: emits the top bigram's occurrence count and the total
   * bigram count per doc — the caller divides (or thresholds) as needed.
   *
   * ROW-LOCAL since r13: the bigram multiset lives entirely inside one
   * document, so its mode needs no token explosion, no exchange, and no
   * window sort — bigrams are built from the in-row token array, sorted
   * in-row, and the max run length is one `aggregate` fold. The prior
   * `wordNgrams`-window form shuffled every token and measured ~15.5×
   * CPU at the ×10 scale probe (an O(n log n) sort riding a "linear"
   * budget); this form is a pure codegen projection directly above the
   * scan — the shape a 100 TB per-doc statistic must have. Output rows
   * and values are identical (docs with <2 tokens emit nothing, as the
   * window form's null-gram filter did).
   */
  def repetitionStats(
      df: DataFrame, idCol: String, textCol: String,
      unicode: Boolean = false): DataFrame =
    df.select(col(idCol),
      graft.operators.Dedup.tokensMode(col(textCol), unicode).as("__t"))
      .filter(size(col("__t")) >= 2)
      .withColumn("__sb", array_sort(expr(
        "transform(sequence(1, size(__t) - 1), " +
          "i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1)))")))
      .select(col(idCol),
        expr(
          """aggregate(__sb,
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
            |  a -> a.mx)""".stripMargin).as("top_cnt"),
        (size(col("__t")) - 1).cast("long").as("n_bigrams"))

  /**
   * Rare-term extraction: top-k terms per document by an integer-exact
   * tf/df weight, `score = (tf * 1_000_000) div df` — the tf-idf idea
   * with a rational weight instead of a log so Spark and the SQL oracle
   * agree bit-for-bit (log(x) may differ by an ulp across libm
   * implementations; an integer division cannot). Ties break on the term
   * string, so output is fully deterministic.
   *
   * Scale shape: tf is one (doc, term) hash aggregate; df aggregates tf
   * again on term (vocabulary-sized — Zipf keeps this far smaller than
   * the corpus, so AQE broadcasts it when it measures small; no FORCED
   * hint, because a 100 TB multilingual vocabulary can outgrow any
   * broadcast budget — the house `Lm` discipline); the final top-k is a
   * window over the doc-id partitioning tf already has.
   */
  def topTermsByTfDf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): DataFrame = {
    val tf = tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("tok").as("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score", expr("(tf * 1000000) div df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}
