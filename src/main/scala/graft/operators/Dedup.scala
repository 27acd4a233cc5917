package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{doc_fingerprint, hamming_qualifying_pairs, minhash_text, shingle_hash_set, simhash_text, sorted_intersect_ge, sorted_intersect_size}

/**
 * Deduplication operators for document corpora (SURVEY §2.3; the
 * training-data-pipeline extension surface).
 *
 * Scale design (100 TB):
 *  - exact dedup is one hash-shuffle on the dedup key; a fingerprint
 *    (64-bit) is shuffled instead of full text, so exchange volume is
 *    bytes-per-row, not document size.
 *  - minhash LSH shuffles (band, bandHash) pairs — b×rows keys, each a
 *    16-byte tuple; candidate verification joins only within buckets, so
 *    the quadratic blowup is confined to colliding buckets. Oversized
 *    buckets (degenerate content) are capped to bound worst-case skew.
 *  - simhash shuffles one long per (table, row); hamming verification is
 *    banded into maxHamming+1 chunks of the 64-bit signature ⇒ by
 *    pigeonhole, any pair within the hamming budget shares ≥1 exact chunk
 *    (no candidate is silently dropped at the requested distance).
 *  - no driver-side collection anywhere.
 */
object Dedup {

  /** Tokenize: lowercase, split on non-alphanumerics, drop empties.
    * This is the ASCII-Latin lexical contract — non-Latin scripts map to
    * ZERO tokens by design (pinned in DedupSpec); multilingual corpora
    * use [[tokensUnicode]] / the `unicode = true` mode every consumer
    * family exposes.
    *
    * Implementation (r19): the fused `tokens_array` kernel — one
    * byte-walk over the lowercased buffer, no java.util.regex, no
    * interpreted HOF lambda (the composed `filter(split(lower(...)))`
    * form profiled as the dominant per-row cost across every tokenizing
    * family). [[tokensHof]] keeps the definitional HOF form; the two are
    * spec-pinned bit-identical (UnicodeTokensSpec), so the CONTRACT is
    * unchanged — only the evaluation path. */
  def tokens(text: Column): Column =
    graft.functions.tokens_array(text, unicode = false)

  /** The definitional HOF form of [[tokens]] — spec-pinning twin only. */
  private[graft] def tokensHof(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Unicode-mode tokenize — the multilingual lexical contract: space-pad
    * Han/Hiragana/Katakana code points (scriptio continua has no
    * separators; each char becomes its own token — the dictionary-free
    * fallback), lowercase, split on anything outside
    * `[\p{L}\p{M}\p{Nd}]` (marks keep Indic grapheme clusters whole),
    * drop empties. The regex subset is Java∩RE2∩DuckDB-replayable (the
    * langIdPick twin recipe), so oracle rows can recompute these tokens
    * exactly; the fused kernels (`minhash_text(…, unicode = true)`,
    * `text_stats(…, unicode = true)`) implement the IDENTICAL rule over
    * code points, spec-pinned against this HOF form. ASCII-only text
    * tokenizes identically under both contracts. */
  def tokensUnicode(text: Column): Column =
    graft.functions.tokens_array(text, unicode = true)

  /** The definitional HOF form of [[tokensUnicode]] (the
    * Java∩RE2∩DuckDB-replayable recipe) — spec-pinning twin only. */
  private[graft] def tokensUnicodeHof(text: Column): Column =
    filter(split(lower(regexp_replace(text,
      "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}])", " $1 ")),
      "[^\\p{L}\\p{M}\\p{Nd}]+"), t => length(t) > 0)

  /** The mode switch consumers thread: `unicode = false` is the ASCII
    * contract (bit-unchanged), `true` the multilingual one. */
  def tokensMode(text: Column, unicode: Boolean): Column =
    if (unicode) tokensUnicode(text) else tokens(text)

  /** HOF-form mode switch — spec-pinning twin of [[tokensMode]]. */
  private[graft] def tokensModeHof(text: Column, unicode: Boolean): Column =
    if (unicode) tokensUnicodeHof(text) else tokensHof(text)

  /** Driver-side twin of [[tokensMode]] for query-string tokenization
    * (phrase-term validation, quoted-query parsing) — a plain-Scala
    * replica of the SAME two rules, spec-pinned against the HOF forms
    * over the mixed-script fixture (UnicodeTokensSpec) so the three
    * implementations (HOF, fused kernel, local) cannot drift apart.
    * Lowercasing goes through UTF8String.toLowerCase — the EXACT code
    * path Spark's `lower()` runs — not `String.toLowerCase(ROOT)`: on a
    * tr/az-locale JVM the column side falls back to the DEFAULT-locale
    * String.toLowerCase for non-ASCII text (dotted/dotless I), and a
    * ROOT-pinned twin would build query terms the corpus-side token
    * stream never produces. One implementation on both sides instead of
    * two "equivalent" ones. */
  private def lowerLikeSpark(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s).toLowerCase.toString
  def tokensLocal(text: String, unicode: Boolean): Seq[String] =
    if (unicode)
      lowerLikeSpark(
        text.replaceAll("([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}])", " $1 "))
        .split("[^\\p{L}\\p{M}\\p{Nd}]+").toSeq.filter(_.nonEmpty)
    else
      lowerLikeSpark(text)
        .split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  /** Word-order-insensitive content fingerprint: md5 of the SORTED token
    * MULTISET (duplicates kept — "a a b" ≠ "a b b"). Catches the dup
    * class between exact dedup and minhash: same words, permuted order
    * (templated boilerplate with reordered fields, shuffled list items,
    * scraper-mangled paragraphs) collide here while whitespace/case
    * variants are already folded by [[tokens]]. Pure per-row HOF chain
    * (`split→filter→array_sort→array_join→md5`) — codegen, no shuffle;
    * grouping on the 32-hex digest is the caller's one exchange. */
  def bagFingerprint(text: Column): Column =
    md5(array_join(array_sort(tokens(text)), " "))

  /** Word w-shingles of the token array (w consecutive tokens joined). */
  def shingles(toks: Column, w: Int = 3): Column = {
    val idxs = sequence(lit(1), greatest(size(toks) - lit(w - 1), lit(1)))
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(idxs, i => concat_ws(" ", slice(toks, i, lit(w)))))
  }

  /**
   * Exact dedup: deterministic keeper per duplicate group — the minimum id
   * wins (dropDuplicates keeps an arbitrary row; min-id is reproducible
   * and oracle-friendly). Returns the kept rows.
   */
  def exactByKey(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Quality-aware survivor selection: per duplicate group the row
   * MAXIMIZING `better` wins, ties broken by minimum id — "keep the
   * best copy" (longest, highest quality score, most central), the
   * production replacement for [[exactByKey]]'s arbitrary-but-stable
   * min-id rule when copies differ in truncation or cleanliness (the
   * same motivation as [[Components.pageRank]]'s canonical pick, at the
   * per-group rather than per-cluster grain). Same one-exchange window
   * shape as [[exactByKey]]; the `better` expression evaluates inside
   * the window sort, no extra pass.
   */
  def keepBestByKey(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      better: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(better.desc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Remove rows whose bucket key holds more than `maxBucket` members —
   * BEFORE any collect_list/self-join touches them. Implemented as a
   * windowed count over the bucket keys, NOT a count-aggregate + anti-join:
   * the window evaluates `banded` (and so the signature kernel feeding it)
   * exactly ONCE, where the two-branch formulation re-executed the whole
   * signature DAG per branch — in round 1 that doubled minhash cost. The
   * window's sort/exchange on the bucket keys is exactly what the
   * downstream `groupBy(keys)` needs, so EnsureRequirements plans ONE
   * exchange for both. Degenerate buckets pass through the window's
   * spillable row buffer and are filtered out here, so `collect_list`
   * never materializes them in an aggregation buffer (the all-empty-docs
   * hash collision → one multi-GB group failure mode at 100 TB).
   */
  private[operators] def dropOversizedBuckets(
      banded: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    banded
      .withColumn("__bn", count(lit(1)).over(w))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
  }

  /**
   * Incremental admission — the nightly-ingest shape: keep only
   * `incoming` rows whose content digest is absent from
   * `existingDigests` (one `digest` column, typically the persisted
   * digest index of the already-built corpus). A left-anti hash join on
   * content digests — the incoming batch shuffles digests, never text.
   * The digest travels as md5 hex (32 chars) to stay oracle-comparable;
   * a production index stores `unhex(md5(...))` (16-byte binary) and
   * is bucketed on it, so the join co-locates with zero new exchange
   * on the index side and half the key bytes.
   */
  def admitNew(
      incoming: DataFrame,
      textCol: String,
      existingDigests: DataFrame): DataFrame =
    incoming.join(existingDigests.select(col("digest")).distinct(),
      md5(col(textCol)) === col("digest"), "left_anti")

  /** (id, band, bh) LSH band keys of each document — the shared kernel
    * of the band index and incremental admission below. */
  /** The band-hash explode — ONE definition of the banding scheme
    * (slice origin, per-band xxhash64) shared by [[bandKeys]] and
    * [[minhashCandidates]], so the persisted band index
    * ([[buildBandIndex]]/[[admitNewNearDup]]) can never silently drift
    * from the pair scorer's banding. Expects a `sig` column in scope. */
  private def bandExplode(numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    explode(expr(
      s"transform(sequence(0, ${bands - 1}), " +
        s"b -> named_struct('band', b, 'bh', xxhash64(slice(sig, b * $rowsPerBand + 1, $rowsPerBand))))"))
  }

  private[operators] def bandKeys(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      bands: Int,
      unicode: Boolean = false): DataFrame =
    df.select(col(idCol).as("id"),
      minhash_text(col(textCol), w = 3, k = numHashes, unicode = unicode).as("sig"))
      .select(col("id"), bandExplode(numHashes, bands).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))

  /**
   * LSH band index of an existing corpus: the distinct (band, bucket
   * hash) keys its documents occupy — 12 bytes per entry, ≤ `bands`
   * entries per doc. This is what a corpus build PERSISTS so later
   * ingest batches can be near-dup-screened without touching corpus
   * text ([[admitNewNearDup]]); at 100 TB the index is bucketed on
   * (band, bh) so admission joins co-locate exchange-free.
   */
  def buildBandIndex(
      df: DataFrame,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 32,
      unicode: Boolean = false): DataFrame =
    // the synthetic id never reaches the output — only (band, bh) does,
    // and those are pure functions of the text
    bandKeys(df.withColumn("__bid", monotonically_increasing_id()),
      textCol, "__bid", numHashes, bands, unicode)
      .select(col("band"), col("bh")).distinct()

  /**
   * Incremental NEAR-duplicate admission — [[admitNew]]'s recall-raised
   * sibling for the nightly-ingest path: an incoming doc is dropped if
   * ANY of its minhash band buckets already exists in the corpus's
   * [[buildBandIndex]] output, i.e. if the full-corpus LSH would have
   * made it a candidate pair with some existing doc. Same collision
   * probability curve as [[minhashPairs]] at equal (numHashes, bands);
   * the default 32×2 banding is tuned for recall (admission screens
   * want few missed dups, and a false rejection only costs one doc).
   *
   * Scale shape: incoming ships (id, band, bh) — never text — into a
   * left-semi join against the index; survivors anti-join back by id.
   * Both joins key on small fixed-width columns.
   */
  def admitNewNearDup(
      incoming: DataFrame,
      textCol: String,
      idCol: String,
      bandIndex: DataFrame,
      numHashes: Int = 64,
      bands: Int = 32,
      unicode: Boolean = false): DataFrame = {
    val hits = bandKeys(incoming, textCol, idCol, numHashes, bands, unicode)
      .join(bandIndex.select(col("band"), col("bh")), Seq("band", "bh"), "left_semi")
      .select(col("id")).distinct()
    incoming.join(hits, incoming(idCol) === hits("id"), "left_anti")
  }

  /** Exact content dedup via 64-bit fingerprint (case/space-folded) —
    * the scale path: groups by a long, never shuffles document text. */
  def exactByFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = df.withColumn("__fp", doc_fingerprint(col(textCol)))
    exactByKey(fp, Seq("__fp"), idCol).drop("__fp")
  }

  /**
   * MinHash-LSH near-duplicate candidate pairs.
   *
   * signature: k lanes (numHashes), banded into `bands` groups of k/bands
   * rows each; docs sharing any band bucket become candidates; candidates
   * are scored by estimated Jaccard = matching lanes / k. Pairs with
   * estJaccard ≥ threshold are returned as (id_a < id_b, est_jaccard).
   *
   * maxBucket caps degenerate buckets (e.g. empty docs) — a bucket with
   * more members than this is dropped (logged volume, bounded skew).
   */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucket: Int = 1000,
      unicode: Boolean = false): DataFrame =
    minhashCandidates(df, textCol, idCol, numHashes, bands, threshold, maxBucket,
      unicode)
      .orderBy(col("id_a"), col("id_b"))

  /** Qualifying candidate pairs WITHOUT the global sort — already
    * distinct per (id_a, id_b) since r19 (pairs are deduped across
    * bands BEFORE scoring; see the enumerate-then-score note inside).
    * [[minhashPairs]] is the user-facing ordered view. */
  private def minhashCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      maxBucket: Int,
      unicode: Boolean = false): DataFrame = {
    // Enumerate-then-score (r19, guide §2.3 "shuffle keys and metadata
    // instead of payloads"): signatures stay OUT of the banding
    // exchange and the bucket aggregate. The r18 form collect_list'd
    // struct(id, sig) per bucket — 16 copies of each 512-byte signature
    // through one exchange, and the aggregate itself (per-row deep
    // copies of array payloads into grow-as-you-go buffers) measured
    // 5.2 of `dedup_minhash_keep`'s 7.1 CPU-s at sf0.1, dwarfing both
    // the kernel and the scoring. Now:
    //  1. buckets aggregate bare member ids (banded rows are 20 bytes);
    //  2. the in-bucket i<j triangle is enumerated lazily
    //     ([[graft.functions.IdPairs]]) WITHOUT scoring;
    //  3. pairs are deduped across bands BEFORE scoring — a pair
    //     colliding in several bands is scored once, not once per band;
    //  4. signatures are attached to the surviving distinct pairs by
    //     key join against the scoped-persisted signature frame (one
    //     512-byte copy per join side, not 16 through the aggregate)
    //     and scored with the codegen'd lane-match kernel.
    // est_jaccard is the same matches/k double on the same signatures,
    // and pair orientation is the same (min, max) — the output SET is
    // exactly the generator form's post-distinct set (every consumer
    // was already distinct-ing: minhashPairs dropDuplicates, dedup's
    // id_b distinct, CC's edge distinct). DedupSpec's randomized
    // brute-force parity pins it.
    val sigs = graft.CacheScope.scoped(df.select(
      col(idCol).as("id"),
      minhash_text(col(textCol), w = 3, k = numHashes, unicode = unicode).as("sig")))

    // explode into (band, bandHash, id); bandHash = hash of the band's lanes
    val banded = sigs.select(
      col("id"), col("sig"), bandExplode(numHashes, bands).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))

    // Oversized buckets (degenerate content — the skew/OOM guard) are
    // filtered out BEFORE aggregation (see dropOversizedBuckets)
    val idBuckets = dropOversizedBuckets(banded, Seq("band", "bh"), maxBucket)
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) >= 2)

    // Scale trade-off, stated where the r18 comment claimed the
    // opposite (r19 advice): this shape DOES materialize every
    // in-bucket candidate pair — sub-threshold losers included, up to
    // maxBucket²/2 per degenerate bucket — through the pair-dedup
    // exchange, and scope-persists the corpus-sized signature frame
    // (MEMORY_AND_DISK, |docs| × ~520 B), where the pre-r19 in-bucket
    // scorer dropped losers inside the generator and cached nothing.
    // The pair rows are 16 bytes against the ~1 KB-per-pair signature
    // copies the old bucket aggregate shuffled, so the exchange-bytes
    // trade stays favorable until the candidate-pair count approaches
    // the corpus size × 64 — i.e. it inverts only in the low-threshold
    // / large-maxBucket regime (τ well under the banding design point,
    // where in-bucket triangles explode); a consumer living there
    // should score cheaply in-bucket per band and dedupe only winners,
    // as before. At the operator's τ ≥ 0.7 design point, measured:
    // family CPU 51.4 → 10.8 s at sf0.1.
    //
    // Both signature attaches join the IDENTICAL projection of the
    // persisted sigs frame (r20): with one subtree, the second
    // broadcast build canonicalizes equal to the first and runs as a
    // ReusedExchange — one signature broadcast per query instead of
    // two (the r19 shape projected/renamed per side, defeating reuse;
    // PERF_r19 flagged the recall row's wall on exactly these builds).
    val sigAttach = sigs.select(col("id"), col("sig"))
    idBuckets
      .select(graft.functions.id_pairs(col("ids")).as(Seq("id_a", "id_b")))
      .dropDuplicates("id_a", "id_b")
      .join(sigAttach.as("__sa"), col("id_a") === col("__sa.id"))
      .join(sigAttach.as("__sb"), col("id_b") === col("__sb.id"))
      .select(col("id_a"), col("id_b"),
        (graft.functions.lane_match_count(col("__sa.sig"), col("__sb.sig")) /
          lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Connected-component-free dedup from candidate pairs: every doc that
    * appears as the larger id of a qualifying pair is dropped (min-id
    * representative per near-dup set, computed distributively).
    *
    * Plan shape: the signature/banding DAG runs ONCE (the oversized-bucket
    * guard is a window, not a second aggregate branch), producing the tiny
    * loser-id set; the only other work is a second — column-pruned — scan
    * of `df` for the surviving rows' anti-join. Carrying full rows through
    * the banding shuffle instead would replicate every document `bands`
    * times through the exchange, which is the wrong trade at 100 TB. */
  def minhashDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucket: Int = 1000): DataFrame = {
    val losers =
      minhashCandidates(df, textCol, idCol, numHashes, bands, threshold, maxBucket)
        .select(col("id_b").as("__loser")).distinct()
    df.join(losers, df(idCol) === col("__loser"), "left_anti")
  }

  /**
   * Transitive-closure minhash dedup: candidate pairs → connected
   * components → one survivor (min id) per CLUSTER. Differs from
   * [[minhashDedup]] on hub shapes: with pairs (1,5),(2,5) and 1≁2,
   * pairwise loser-dropping keeps {1, 2}; clustering treats {1, 2, 5}
   * as one duplicate set and keeps {1} — the semantics published
   * pretraining pipelines use (a hub document chains clusters
   * together). Costs the O(log diameter) CC iteration on the pair
   * graph, which is candidate-sized, not corpus-sized.
   */
  def minhashDedupCc(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxIter: Int = 20,
      maxBucket: Int = 1000): DataFrame = {
    val edges =
      minhashCandidates(df, textCol, idCol, numHashes, bands, threshold, maxBucket)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
    val losers = Components.connectedComponents(edges, maxIter)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("__loser"))
    df.join(losers, df(idCol) === col("__loser"), "left_anti")
  }

  /**
   * SimHash near-duplicate pairs: 64-bit signature, banded into
   * `maxHamming + 1` chunks; pairs sharing any chunk are verified by exact
   * hamming distance.
   *
   * The chunk count is DERIVED from maxHamming, not fixed: with c chunks,
   * a pair differing in ≤ c-1 bits must (pigeonhole) agree on ≥1 whole
   * chunk, so c = maxHamming+1 guarantees every qualifying pair becomes a
   * candidate. Round 1 hard-coded 4×16-bit chunks, which only covers
   * hamming ≤ 3 — a maxHamming=8 query silently dropped pairs at distance
   * 4–8 whose flips touched all four chunks. Narrower chunks collide more
   * (recall lever costs candidate fan-out), but verification is a single
   * codegen'd bit_count, and the oversized-bucket guard still bounds skew.
   */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash_text(col(textCol)).as("sh"))
    simhashPairsFromHashes(sigs, maxHamming, maxBucket)
  }

  /**
   * The banding/pair stage of [[simhashPairs]] over PRECOMPUTED 64-bit
   * signatures (`id`, `sh`) — shared with asset-level perceptual-hash
   * dedup ([[Multimodal.assetNearDupPairs]]), where the signature comes
   * from bytes rather than text. Same pigeonhole guarantee: banding into
   * maxHamming+1 chunks cannot miss a pair within the radius.
   */
  def simhashPairsFromHashes(
      sigs: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming must be in [0, 32): $maxHamming (chunks need ≥2 bits to prune)")
    val nChunks = maxHamming + 1
    val widths = Array.tabulate(nChunks)(i => 64 / nChunks + (if (i < 64 % nChunks) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    val chunkStructs = (0 until nChunks).map { b =>
      val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1L
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sh"), starts(b)).bitwiseAND(lit(mask)).as("chunk"))
    }
    val banded = sigs.select(col("id"), col("sh"),
      explode(array(chunkStructs: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.chunk").as("chunk"))

    // same guarded single-shuffle bucket shape as minhashPairs; pair
    // enumeration + hamming verification run inside one per-bucket
    // generator eval (only qualifying pairs materialize — see
    // [[graft.functions.HammingQualifyingPairs]])
    val buckets = dropOversizedBuckets(banded, Seq("band", "chunk"), maxBucket)
      .groupBy(col("band"), col("chunk"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("items"))
      .filter(size(col("items")) >= 2)

    buckets
      .select(hamming_qualifying_pairs(col("items"), maxHamming)
        .as(Seq("id_a", "id_b", "hamming")))
      .dropDuplicates("id_a", "id_b")
      .orderBy(col("id_a"), col("id_b"))
  }

  /**
   * EXACT all-pairs token-set similarity self-join: every (id_a < id_b)
   * pair whose distinct-token Jaccard is ≥ `threshold` — no LSH recall
   * loss (the exact counterpart to [[minhashPairs]], for when "probably
   * all near-dups" isn't an acceptable contract, e.g. eval-set
   * decontamination audits).
   *
   * Exact ≠ quadratic: prefix filtering (the SSJoin/PPJoin family —
   * Chaudhuri et al. ICDE'06, Xiao et al. WWW'08) makes it tractable.
   * Under ANY global token order, two sets with |x∩y| ≥ α must share a
   * token inside their first |s|−α+1 tokens; with J ≥ τ forcing
   * α ≥ ⌈τ·|s|⌉, docs only need to collide on their first
   * |s|−⌈τ·|s|⌉+1 tokens. Ordering tokens rarest-first (ascending
   * document frequency) puts the most selective tokens in the prefix,
   * so candidate buckets stay small on natural corpora.
   *
   * Scale shape (100 TB):
   *  - tokens travel as 8-byte hashes from the first projection on
   *    (fused `shingle_hash_set` kernel, w=1); document text is scanned
   *    twice (prefix build + verify) but never shuffled.
   *  - the df count and per-doc prefix rank are two hash exchanges on
   *    8/16-byte keys; the prefix rank is a window `row_number`, not a
   *    per-row array sort.
   *  - candidate generation is an equi-JOIN on the prefix token — a
   *    streaming sort-merge join, NOT a collect_list bucket explosion,
   *    so a degenerate hot token spills/streams instead of
   *    materializing a multi-GB aggregation buffer; AQE's skew split
   *    applies. (The approximate family drops oversized buckets — an
   *    exact join must not, so it gets the join-shaped plan.)
   *  - the length filter τ·max(|x|,|y|) ≤ min(|x|,|y|) discards
   *    impossible pairs before the pair-dedup exchange; verification is
   *    two SHUFFLE joins of the pair list against the token-set table —
   *    deliberately not [[ngramJaccard]]'s broadcast (post-LSH candidate
   *    sets are tiny; an exact join's candidate set is output-sized and
   *    can exceed any broadcast budget on a self-similar corpus).
   *
   * Cost honesty: the output itself is Θ(qualifying pairs). On a corpus
   * where "most docs are ≥ τ similar to most docs" no exact algorithm is
   * sub-quadratic — pick τ in the near-dup band (≥ 0.8) for such data.
   * The cost contract is therefore a THROUGHPUT floor (verified pairs
   * per executor-CPU-second, pinned in DedupSpec), not an absolute CPU
   * bar: r9 measured that the verify intersection itself is noise
   * (≈23-element sorted sets, threshold early exit) by swapping in a
   * dictionary-ranked popcount-block set representation — min-of-N CPU
   * moved less than run-to-run variance while the dictionary assignment
   * and per-doc repacking added a vocab exchange and a corpus-token
   * groupBy the `ts` reuse gets for free, so the experiment was
   * reverted. The remaining CPU is the Θ(collision)+Θ(output) exchange
   * and aggregation machinery, which scales with the answer, not the
   * corpus.
   */
  def jaccardJoin(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.5,
      w: Int = 1,
      unicode: Boolean = false): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    // zero-token docs (punctuation-only) tokenize to an empty set — no
    // Jaccard is defined for them, and the verify kernel's empty-input
    // sentinel must not pair them with each other.
    // base and pref are each consumed by BOTH sides of self-joins below;
    // without persist, Catalyst re-executes the whole branch per side
    // (plan-audited: 4 parquet scans + duplicate window exchanges).
    // Persisting trades spillable executor storage (token-set rows ≈
    // corpus token count × 8 bytes) for scan-once — the ivfPqTopK
    // precedent, and the cheaper side at 100 TB where a re-scan is a
    // second 100 TB read plus a second rank exchange.
    val base = graft.CacheScope.scoped(df
      // token_count: the count-only kernel — the size(tokens(...)) form
      // built the token array just to test emptiness
      .filter(graft.functions.token_count(col(textCol), unicode) > 0)
      .select(col(idCol).as("id"),
        shingle_hash_set(col(textCol), w, unicode).as("ts"))
      .withColumn("len", size(col("ts"))))
    val tok = base.select(col("id"), col("len"), explode(col("ts")).as("th"))
    val dfreq = tok.groupBy(col("th")).agg(count(lit(1)).as("df"))
    // rarest-first global order; (df, th) is a total order so every doc
    // slices a deterministic prefix of length len − ⌈τ·len⌉ + 1
    val byRarity = Window.partitionBy(col("id")).orderBy(col("df"), col("th"))
    // prefix keep-condition rn ≤ len − ⌈τ·len⌉ + 1 is evaluated in its
    // ceil-free form τ·len ≤ len − rn + 1 (⌈x⌉ ≤ m ⟺ x ≤ m for integer
    // m): a correctly-rounded double product of a double and an exact
    // integer can never round ACROSS a representable integer, so unlike
    // ceil(float·len) this comparison cannot shorten the prefix at an
    // exact boundary and drop a qualifying pair — errors, if any, only
    // lengthen the prefix (extra candidates, filtered by verify).
    val pref = graft.CacheScope.scoped(tok.join(dfreq, "th")
      .withColumn("__rn", row_number().over(byRarity))
      .filter(lit(threshold) * col("len") <=
        (col("len") - col("__rn") + 1).cast("double"))
      .select(col("id"), col("len"), col("th"), col("__rn")))
    // ASYMMETRIC prefixes (PPJoin's indexing prefix, Xiao et al. WWW'08
    // §5): for a qualifying pair with |y| ≤ |x|, the required overlap is
    // α ≥ ⌈2τ/(1+τ)·|y|⌉, so the SHORTER doc only needs its first
    // |y| − ⌈2τ/(1+τ)·|y|⌉ + 1 tokens indexed (the probe side keeps the
    // full τ-prefix). At τ = 0.9 that index prefix is ~0.05·len vs the
    // 0.1·len probe prefix — measured 8.76M → 6.28M collision rows on
    // the sf0.1 documents corpus (the fixture's tiny vocabulary keeps
    // "rare" tokens common; natural corpora prune far more — see the
    // cost-honesty note above). nextDown keeps the computed multiplier ≤
    // the real 2τ/(1+τ), so division rounding can only LENGTHEN the
    // index prefix (completeness; same argument as the ceil-free form).
    val beta = Math.nextDown(2 * threshold / (1 + threshold))
    val prefIdx = pref.filter(lit(beta) * col("len") <=
      (col("len") - col("__rn") + 1).cast("double"))
    // One collision row per shared (probe-prefix × index-prefix) token;
    // reduce to one row per pair carrying the FIRST (globally smallest)
    // shared token's positions — the order is total and consistent
    // across docs, so min(rn_a)/min(rn_b) name the SAME token, nothing
    // is shared before the first shared token, and any earlier shared
    // token would itself be a collision row (both positions strictly
    // smaller → still inside both prefixes). That yields PPJoin's
    // positional bound: overlap ≤ ubound = 1 + min(len−pos) over both
    // sides; J ≥ τ needs overlap ≥ τ/(1+τ)·(len_a+len_b), i.e. keep iff
    // ubound ≥ τ·(len_a + len_b − ubound) — ceil-free like the prefix
    // condition (float error can only ADMIT extras, which verify
    // discards). The length filter stays FIRST: it needs no
    // aggregation, so it prunes collision rows map-side before the pair
    // exchange (moving it after the groupBy measured 3× the CPU).
    val ubound = lit(1) +
      least(col("len_a") - col("__pa"), col("len_b") - col("__pb"))
    // The SAME positional bound applied PER COLLISION ROW, map-side,
    // before the pair aggregation (r19): for the first shared token the
    // row test is exactly the pair's post-agg test, and for every later
    // shared token both positions are strictly larger, so the row bound
    // only TIGHTENS — a pair whose first row fails has every row fail
    // (dropped pre-shuffle instead of post-agg: identical survivor set),
    // and a pair whose first row passes keeps that row, so min(__ra)/
    // min(__rb) still name the first shared token. The pair hash
    // aggregation was the profiled top CPU of the whole bench
    // (BytesToBytesMap probe/grow on Θ(collision) rows); this prunes its
    // input to near the qualifying set.
    val rowUbound = lit(1) +
      least(col("len_a") - col("__ra"), col("len_b") - col("__rb"))
    val cand = pref.as("a").join(prefIdx.as("b"), "th")
      // the b side is the SHORTER doc (id-tiebreak on equal length), so
      // each unordered pair joins in exactly one orientation
      .filter(col("b.len") < col("a.len") ||
        (col("b.len") === col("a.len") && col("b.id") < col("a.id")))
      .filter(col("b.len").cast("double") >=
        lit(threshold) * col("a.len"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        col("a.len").as("len_a"), col("b.len").as("len_b"),
        col("a.__rn").as("__ra"), col("b.__rn").as("__rb"))
      .filter(rowUbound.cast("double") >=
        lit(threshold) * (col("len_a") + col("len_b") - rowUbound).cast("double"))
      // (id_a, id_b) alone keys the aggregation — len_a/len_b are
      // constant per pair (one join orientation), so min() carries them
      // and the hash-map key shrinks from 32 to 16 bytes
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("__ra")).as("__pa"), min(col("__rb")).as("__pb"),
        min(col("len_a")).as("len_a"), min(col("len_b")).as("len_b"))
      .filter(ubound.cast("double") >=
        lit(threshold) * (col("len_a") + col("len_b") - ubound).cast("double"))
      .select(col("id_a"), col("id_b"))
    cand
      .join(base.select(col("id").as("id_a"), col("ts").as("__sa"),
        col("len").as("__la")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("ts").as("__sb"),
        col("len").as("__lb")), Seq("id_b"))
      // threshold-bounded merge walk: a failing pair exits after ~5% of
      // the walk at τ = 0.9 instead of scanning both token sets, and
      // failing pairs dominate the candidate set by construction; −1
      // rows drop here, surviving counts are exact so the jaccard
      // filter below stays the precise contract
      .withColumn("__i", sorted_intersect_ge(col("__sa"), col("__sb"), threshold))
      .filter(col("__i") >= 0)
      .withColumn("jaccard",
        col("__i") / (col("__la") + col("__lb") - col("__i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact n-gram Jaccard between candidate pairs (verification-grade
    * similarity, usually applied after LSH candidate generation).
    *
    * @param broadcastPairBound broadcast the candidate side only while it
    *   holds at most this many pairs. Post-LSH candidate sets are
    *   "usually small" but OUTPUT-sized in the worst case (self-similar
    *   corpus, loose banding threshold) — an unconditional broadcast
    *   hint would build that worst case on the driver and fail the job
    *   at exactly the scale the verifier exists for. Above the bound the
    *   join strategy is left to the planner/AQE (the removeCommonLines
    *   guarded-broadcast pattern, Corpus.scala). */
  def ngramJaccard(
      df: DataFrame,
      textCol: String,
      idCol: String,
      pairs: DataFrame, // columns id_a, id_b
      w: Int = 3,
      broadcastPairBound: Long = 1L << 20): DataFrame = {
    // The candidate set is evaluated ONCE (it is typically the output of
    // LSH banding — an expensive DAG; naive double-join would recompute it
    // per reference): scope-cached, so the guard count and the join both
    // read the materialized set instead of re-running the banding DAG.
    // Each pair explodes into two (id_a, id_b, id) rows which are
    // broadcast WHEN PROVABLY BOUNDED — then the corpus-side shingle sets
    // stream map-side with no shuffle. Shingle sets are sorted distinct
    // 64-bit hashes: 8 B/element payload and an O(n+m) merge-walk
    // intersection instead of string-array intersect.
    val cand = graft.CacheScope.scoped(pairs.select(col("id_a"), col("id_b")))
    val side = cand.select(col("id_a"), col("id_b"),
      explode(array(col("id_a"), col("id_b"))).as("id"))
    val hinted = if (cand.count() <= broadcastPairBound) broadcast(side) else side
    val sh = df.select(col(idCol).as("id"),
      shingle_hash_set(col(textCol), w).as("sh"))
    sh.join(hinted, Seq("id"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        first(when(col("id") === col("id_a"), col("sh")), ignoreNulls = true).as("sh_x"),
        first(when(col("id") === col("id_b"), col("sh")), ignoreNulls = true).as("sh_y"))
      .filter(col("sh_x").isNotNull && col("sh_y").isNotNull) // id absent from df ⇒ drop pair (inner-join semantics)
      .withColumn("__inter", sorted_intersect_size(col("sh_x"), col("sh_y")))
      .withColumn("jaccard",
        col("__inter") / (size(col("sh_x")) + size(col("sh_y")) - col("__inter")).cast("double"))
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
