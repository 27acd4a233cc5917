package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.text_stats

/**
 * Corpus-preparation operators — the steps between "clean documents" and
 * "training shards" in a pretraining data pipeline (SURVEY §2.3 extension
 * surface): deterministic splits, reproducible shuffles, token-budget
 * sequence packing, and PII redaction.
 *
 * Everything here is content-deterministic (md5-derived, never
 * partitioning- or time-dependent), so results are reproducible across
 * cluster sizes and each operator carries a DuckDB oracle.
 */
object Corpus {

  /**
   * Deterministic train/validation split by content hash: the first hex
   * digit of md5(text) buckets each doc into 16ths — `valSixteenths = 2`
   * ⇒ a 12.5% validation split. Hash-derived (not random) so the split is
   * stable under re-runs, insertions, and repartitioning — the property
   * that stops train/val leakage when the corpus is rebuilt. Row-local,
   * no shuffle.
   */
  def trainValSplit(
      df: DataFrame,
      textCol: String,
      valSixteenths: Int = 2,
      splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol, splitByMd5(col(textCol), valSixteenths))

  /** The ONE md5 val-sixteenths bucketing rule — first hex digit of
    * md5(key) against the first `valSixteenths` digits — shared by the
    * per-doc and per-cluster split operators so the two can never drift
    * on bucket semantics. */
  private def splitByMd5(key: Column, valSixteenths: Int): Column =
    splitByDigest(md5(key), valSixteenths)

  /** [[splitByMd5]] for callers that ALREADY carry an md5 hex digest
    * column (re-hashing the digest would silently decouple their split
    * from [[trainValSplit]]'s buckets for the same content). Same rule,
    * same digits — one definition. */
  def splitByDigest(digest: Column, valSixteenths: Int): Column = {
    require(valSixteenths >= 0 && valSixteenths <= 16,
      s"valSixteenths must be in [0, 16]: $valSixteenths")
    val valDigits = (0 until valSixteenths).map(i => f"$i%x")
    when(substring(digest, 1, 1).isin(valDigits: _*), lit("val"))
      .otherwise(lit("train"))
  }

  /**
   * Leakage-safe train/val split: the unit of assignment is the
   * DUPLICATE CLUSTER, not the document. [[trainValSplit]] hashes each
   * doc independently, so two near-duplicate docs can land on opposite
   * sides of the split — the classic eval-leakage bug (the val set then
   * "tests" documents the model effectively trained on). Here every doc
   * is first resolved to its cluster representative via
   * [[Components.connectedComponents]] over the caller's near-dup edge
   * list, and the md5 split decision hashes the REPRESENTATIVE's id —
   * so a whole cluster moves together by construction. Docs with no
   * edge are their own singleton cluster.
   *
   * Scale shape: the CC iteration (O(log diameter) rounds of 8-byte-key
   * joins) plus ONE left join of docs against labels; the split decision
   * itself is a scalar md5 — no extra exchange.
   *
   * @param edges near-duplicate pairs (`src`, `dst`) over `idCol` values
   */
  def leakageSafeSplit(
      df: DataFrame,
      edges: DataFrame,
      idCol: String,
      valSixteenths: Int = 2,
      splitCol: String = "split",
      componentCol: String = "component"): DataFrame = {
    // CC columns under reserved names BEFORE the join: a bare
    // drop("id")/col("component") would capture (or collide with) the
    // caller's own columns of those names. Output columns must not
    // silently replace caller data either — a dedup-pipeline input
    // plausibly already carries a 'component' from a prior labeling, so
    // both output names are parameters and clobbering is an error.
    // case-INSENSITIVE guards: withColumn resolves case-insensitively
    // under the default spark.sql.caseSensitive=false, so 'split' vs
    // 'SPLIT' would still clobber
    require(!splitCol.equalsIgnoreCase(componentCol),
      s"splitCol and componentCol must differ ('$splitCol'/'$componentCol'): " +
        "the second withColumn would silently replace the first")
    Seq(splitCol, componentCol).foreach { c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a '$c' column; pass a different output name")
    }
    val comps = Components.connectedComponents(edges)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    df.join(comps, df(idCol) === comps("__cc_id"), "left")
      .withColumn(componentCol, coalesce(col("__cc_comp"), col(idCol)))
      .drop("__cc_id", "__cc_comp")
      .withColumn(splitCol,
        splitByMd5(col(componentCol).cast("string"), valSixteenths))
  }

  /**
   * Reproducible corpus shuffle: global order by md5(seed # id) — the
   * "shuffle the corpus before sharding" step, identical on every run and
   * cluster size (a `rand()` sort is neither). One range exchange (the
   * sort), exactly what a real shuffled-shard write pays.
   */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String = "42"): DataFrame =
    df.orderBy(
      md5(concat_ws("#", lit(seed), col(idCol).cast("string"))),
      col(idCol))

  /**
   * Token-budget sequence packing: order-preserving assignment of docs to
   * chunks by TOKEN OFFSET — chunk id = floor(exclusive-running-token-sum
   * / budget) within each shard, i.e. a document belongs to the chunk
   * where its FIRST token lands. Chunk boundaries sit at exact multiples
   * of the budget in the concatenated token stream, so a document that
   * straddles a boundary makes its chunk overflow by up to (doc length −
   * 1) tokens: the packed-sequence trainer splits the straddler at the
   * boundary (the standard packing contract) or pads. A strict
   * "every chunk ≤ budget" bin assignment is a sequential first-fit
   * recurrence — each decision depends on the previous chunk's fill — and
   * cannot parallelize; the offset-bin form is the scalable equivalent,
   * and `n_tokens` rides along so consumers can measure the overflow.
   * Docs longer than the whole budget should be pre-split with
   * [[chunkWindows]].
   *
   * Packing is per-`shardCol` (window partition), NOT global: a single
   * global running sum would serialize 100 TB through one reducer; with a
   * shard key the windows parallelize and production picks shards ≈
   * output files. Token counts come from the fused text_stats kernel.
   */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Long,
      shardCol: Column): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shardCol)
      .withColumn("n_tokens", text_stats(col(textCol)).getField("n_tokens"))
      .withColumn("chunk_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens"))
          / lit(budgetTokens.toDouble)).cast("long"))
  }

  /**
   * Padding-waste accounting for length-bucketed batch shaping: bucket
   * every document by the power-of-two sequence length its (capped)
   * subword count would pad to — `bucket = min(maxLen, max(minLen,
   * 2^⌈log2 tokens⌉))` — and report per-bucket document counts, token
   * mass, padding waste, and the waste share in permille. This is the
   * telemetry that decides bucketed batching vs packing: a high-waste
   * bucket profile is tokens burned on pad ids.
   *
   * Integer-exact everywhere: the pow2 ceiling is the binary digit count
   * of `tokens − 1` (`shiftleft(1, length(bin(x-1)))` — no float log to
   * drift a boundary), and waste_permille is an all-positive floor
   * division, so the SQL oracle replays bit-for-bit. One fused-kernel
   * pass + a bucket-keyed counter aggregate: the exchange carries
   * O(log maxLen) rows.
   */
  def paddingWaste(
      df: DataFrame,
      textCol: String,
      minLen: Int = 16,
      maxLen: Int = 512): DataFrame = {
    require(minLen > 0 && maxLen >= minLen,
      s"need 0 < minLen <= maxLen: $minLen, $maxLen")
    val st = text_stats(col(textCol))
    df.select((st.getField("n_tokens") + st.getField("punct_chars")).as("__sub"))
      .select(least(col("__sub"), lit(maxLen.toLong)).as("__capped"))
      .select(col("__capped"),
        least(lit(maxLen.toLong), greatest(lit(minLen.toLong),
          when(col("__capped") <= 1, lit(1L))
            .otherwise(expr("shiftleft(1L, cast(length(bin(__capped - 1)) as int))")
              .cast("long")))).as("bucket_len"))
      .groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__capped")).as("sum_tokens"),
        sum(col("bucket_len") - col("__capped")).as("sum_waste"))
      .withColumn("waste_permille",
        expr("sum_waste * 1000L div (sum_tokens + sum_waste)"))
      .orderBy(col("bucket_len"))
  }

  /**
   * Shard preparation for the training-shard write: tag each row with its
   * deterministic shuffle key (md5(seed # id) — same key as
   * [[deterministicShuffle]]), range-partition into `nShards` partitions
   * and sort within each — so shard files hold contiguous, internally
   * sorted key ranges and concatenating shards 0..n-1 reproduces the full
   * deterministic shuffle order. This is the scale-correct global sort: a
   * range exchange into n reducers, each writing one shard, instead of
   * one total-order reducer. `writeShards` is the thin writer over it.
   */
  /**
   * Context-window chunking: split each document into token windows of
   * `window` tokens with `overlap` tokens carried between consecutive
   * chunks (stride = window − overlap) — the standard shaping step
   * before tokenized training or embedding models with a fixed context.
   *
   * Coverage contract: every token lands in ≥ 1 chunk. Chunk starts sit
   * on the stride grid 1, 1+s, 2s+1, …; the last start is the first grid
   * point ≥ n − window + 1, so the final chunk may be shorter than
   * `window` but never empty and never duplicates a full window.
   *
   * Row-local (one projection + one explode; no shuffle): the chunk
   * arithmetic is `sequence`/`slice`/`concat_ws` — all codegen built-ins
   * — over the canonical token array ([[Dedup.tokens]]: lowercase
   * alphanumeric runs, the library-wide tokenizer, which keeps the op
   * SQL-oracle-comparable). At 100 TB this is a map-only stage whose
   * output feeds [[packSequences]] / [[prepareShards]].
   */
  def chunkWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      overlap: Int,
      carryCols: Seq[String] = Nil,
      unicode: Boolean = false): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window): $overlap")
    val s = window - overlap
    val toks = Dedup.tokensMode(col(textCol), unicode)
    val keep = (idCol +: carryCols).map(col)
    // last grid start covering the tail: 1 + s·⌈(n−window)/s⌉ (n > window)
    val lastStart = when(col("__n") <= window, lit(1))
      .otherwise(floor((col("__n") - window + s - 1) / s).cast("long") * s + 1)
    df.select(keep :+ col(textCol): _*)
      .withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(keep ++ Seq(col("__toks"),
        explode(sequence(lit(1L), lastStart, lit(s.toLong))).as("__start")): _*)
      .select(keep ++ Seq(
        ((col("__start") - 1) / s).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__toks"), col("__start").cast("int"), lit(window)))
          .as("chunk_text"),
        least(lit(window), size(col("__toks")) - col("__start") + 1)
          .cast("long").as("chunk_tokens")): _*)
  }

  /**
   * Cross-document repeated-block detection: non-overlapping token
   * blocks ([[chunkWindows]] with `overlap = 0`) that recur across the
   * corpus — the block-granular middle ground between document-level
   * dedup (misses embedded boilerplate) and exact-substring runs
   * ([[Ngrams.substringRuns]], precise but pair-wise): licenses, nav
   * chrome, and templated intros surface here as one aggregate row per
   * repeated block, with no pair explosion at all.
   *
   * Scale shape: map-only chunking, then ONE hash aggregate keyed on the
   * block digest — 16-byte md5 keys through the exchange, never block
   * text (the digest is emitted, not the block, for exactly that
   * reason; join back on digest to inspect offenders). Output is
   * bounded by |repeated blocks|.
   */
  def repeatedBlocks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockTokens: Int = 32,
      minDocs: Int = 2): DataFrame = {
    require(blockTokens >= 1, s"blockTokens must be positive: $blockTokens")
    require(minDocs >= 2, s"minDocs below 2 is not a duplicate: $minDocs")
    chunkWindows(df, idCol, textCol, window = blockTokens, overlap = 0)
      // full blocks only: chunkWindows emits a short tail chunk (down to
      // one token) per document, and common short endings would flood
      // the report with spurious "repeated blocks" that are neither a
      // license nor nav chrome — short shared TEXTS are exact-dedup's
      // job, this operator mines block-sized boilerplate
      .filter(col("chunk_tokens") === blockTokens)
      .select(col(idCol), md5(col("chunk_text")).as("block_digest"))
      .groupBy(col("block_digest"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
  }

  /**
   * WITHIN-document exact line deduplication — the REMOVAL transform the
   * detection family ([[repeatedBlocks]], `Ngrams.boilerplate`) stops
   * short of: repeated lines inside one document (nav chrome, headers,
   * scraper echo) are deleted in place, keeping each line's FIRST
   * occurrence in original order (the standard web-corpus cleaning rule
   * — e.g. the line-level rules in Rae et al., "Scaling Language Models:
   * Methods, Analysis & Insights from Training Gopher", 2021, §A.1.1).
   *
   * Scale shape: pure per-row HOFs (`split` → `array_distinct` →
   * `array_join`) — whole-stage codegen, ZERO shuffle, no state; the
   * 100 TB cost is exactly one scan. `array_distinct` keeps first
   * occurrences in encounter order, which IS the keep-first contract.
   * Telemetry rides along: `n_lines` seen, `n_removed` deleted.
   *
   * Blank-line caveat (documented, not hidden): consecutive blank lines
   * are lines too — all but the first blank in the DOCUMENT survive
   * dedup as one, so paragraph spacing collapses. Callers that need
   * paragraph structure should dedup on a normalized copy and re-map.
   */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n"): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    // split() takes a REGEX; quote the separator so "." or "|" callers
    // split on the literal, not on every character
    val lines = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val kept = array_distinct(lines)
    // long telemetry, matching [[removeCommonLines]] — the two compose
    df.select(col(idCol),
      array_join(kept, sep).as("text_clean"),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(kept)).cast("long").as("n_removed"))
  }

  /**
   * CROSS-corpus boilerplate-line removal — the global twin of
   * [[dedupLines]] (CCNet/RefinedWeb-style line filtering): a line that
   * recurs across at least `permille`/1000 of all documents is chrome
   * (nav, cookie banners, license headers), and every occurrence is
   * deleted from every document. The threshold is a FRACTION, not an
   * absolute count, so the rule means the same thing at sf0.001 and at
   * 100 TB; the comparison is integer cross-multiplied
   * (`1000·n_docs_with_line ≥ permille·n_docs`) — exact in both
   * engines, no float ratio.
   *
   * Scale shape: detection aggregates 16-byte line DIGESTS (documents
   * never ride that exchange), the corpus-wide doc count is a 1-row
   * broadcast, and the common-line set broadcasts back as a FLAG on a
   * left join (at the registered thresholds its size is provably
   * corpus-size-independent — see the inline bound). One doc-keyed
   * exchange then filters, rebuilds in position order, and counts in a
   * single `groupBy` — the one genuinely line-carrying exchange, and
   * inherent: the output IS the cleaned text. Documents whose every
   * line is chrome survive as empty text, not dropped rows (the
   * attrition ledger needs them).
   */
  def removeCommonLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      permille: Int = 500): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    require(permille >= 1 && permille <= 1000,
      s"permille must be in [1, 1000]: $permille")
    val q = java.util.regex.Pattern.quote(sep)
    // scope-cached: the exploded+digested corpus feeds BOTH the
    // detection aggregate and the flag-join probe side — unpersisted,
    // Catalyst re-executes the full scan→split→explode branch once per
    // consumer (the jaccardJoin lesson, Dedup.scala)
    val base = graft.CacheScope.scoped(df.select(col(idCol),
      posexplode(split(col(textCol), q)).as(Seq("pos", "line")))
      .withColumn("__dg", md5(col("line"))))
    // Two bounded driver actions: line count over the cached explode,
    // doc count over df ITSELF — the denominator must count every
    // document, including NULL-text docs that explode to zero lines
    // (counting over `base` would silently shrink the commonness
    // threshold). Driver-side on purpose: the broadcast decision below
    // needs the OBSERVED bound, and the threshold folds to a literal
    // instead of a crossJoin with an aggregate. The df aggregate is a
    // column-pruned id scan — the same scan the lazy crossJoin form
    // always paid.
    val nLines = base.count()
    val nDocs = df.agg(countDistinct(col(idCol))).head().getLong(0)
    // The common set is bounded at any CORPUS size: each common line
    // occurs in ≥ (permille/1000)·n_docs documents, and total line
    // occurrences are avgLinesPerDoc·n_docs, so |common| ≤
    // avgLinesPerDoc·1000/permille — corpus-size-independent (~50
    // digests at the registered permille=780). Broadcast it when that
    // bound is small: the alternative shuffle join sorts the whole
    // exploded corpus by digest (n·log n — the first scale probe
    // measured exactly that super-linearity, exponent 1.12). But the
    // bound is only corpus-size-independent, not ABSOLUTE — very long
    // documents (100k-line docs at permille=100) still imply a
    // multi-million-digest broadcast build. So the forced broadcast is
    // gated on the OBSERVED bound too; outside it (or at tiny permille,
    // where the bound loosens) the join strategy is left to the
    // planner/AQE — the ngramJaccard guarded-broadcast convention.
    val maxBroadcastDigests = 1L << 18 // ~256k MD5s ≈ a few MB build side
    val boundDigests =
      if (nDocs == 0) 0L else nLines * 1000L / (nDocs * permille.toLong)
    val commonPlain = base.groupBy(col("__dg"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") * 1000 >= lit(permille.toLong * nDocs))
      .select(col("__dg"), lit(true).as("__common"))
    val common =
      if (permille >= 100 && boundDigests <= maxBroadcastDigests)
        broadcast(commonPlain)
      else commonPlain
    // flag-then-filter instead of anti-join + totals + rebuild + rejoin:
    // ONE doc-keyed exchange carries every line once with its flag, and
    // a doc whose every line is chrome still groups (empty clean text)
    base.join(common, Seq("__dg"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"), col("line"),
                coalesce(col("__common"), lit(false)).as("c")))),
              x => !x.getField("c")),
            x => x.getField("line")),
          sep).as("text_clean"),
        count(lit(1)).as("n_lines"),
        sum(when(coalesce(col("__common"), lit(false)), 1L).otherwise(0L))
          .as("n_removed"))
      .select(col(idCol), col("text_clean"), col("n_lines"), col("n_removed"))
  }

  /**
   * Quality gate with in-plan accounting: `Dataset.observe` attaches
   * aggregate metrics to the SAME pass that filters, so admission
   * telemetry (rows seen / admitted, chars shipped) costs ZERO extra
   * scans — at 100 TB a separate counting pass is a second 100 TB scan.
   * Metrics surface on the ops plane, not the data plane:
   * `queryExecution.observedMetrics` after any batch action, or
   * `StreamingQueryProgress.observedMetrics` on the streaming twin —
   * the pattern every long-running ingest needs for its dashboards.
   */
  def gatedIngest(df: DataFrame, textCol: String, minChars: Int): DataFrame = {
    require(minChars >= 0, s"minChars must be non-negative: $minChars")
    df.observe("corpus_gate_in",
        count(lit(1)).as("rows_in"),
        sum(length(col(textCol)).cast("long")).as("chars_in"))
      .filter(length(col(textCol)) >= minChars)
      .observe("corpus_gate_out", count(lit(1)).as("rows_out"))
  }

  def prepareShards(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      seed: String = "42"): DataFrame = {
    require(nShards >= 1, s"nShards must be positive: $nShards")
    df.withColumn("__sk",
      md5(concat_ws("#", lit(seed), col(idCol).cast("string"))))
      .repartitionByRange(nShards, col("__sk"), col(idCol))
      .sortWithinPartitions(col("__sk"), col(idCol))
  }

  /** Write the prepared shards as parquet — one file per range shard.
    * The internal `__sk` ordering key is dropped before the write (it is
    * recomputable from seed+id; persisting 32 hex chars per row into
    * 100 TB of shards would be pure waste). Dropping a column after
    * `sortWithinPartitions` does not disturb partitioning or row order. */
  def writeShards(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      path: String,
      seed: String = "42"): Unit =
    prepareShards(df, idCol, nShards, seed)
      .drop("__sk")
      .write.mode("overwrite").parquet(path)

  /** Email-address pattern — kept to syntax both Java regex (Spark) and
    * RE2 (DuckDB oracle) compile identically. */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** US-style phone pattern (NNN-NNN-NNNN with -, . or space). */
  val phonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /**
   * PII redaction: replace emails/phones with typed placeholder tags and
   * count the replacements (the audit trail a compliance pass needs).
   * Row-local regex — no shuffle, stays in whole-stage codegen.
   */
  def redactPii(
      df: DataFrame,
      textCol: String,
      redactedCol: String = "clean_text"): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(emailPattern)))
      .withColumn("__er", regexp_replace(col(textCol), emailPattern, "<EMAIL>"))
      // phones are counted on the email-redacted text, matching the
      // sequential replacement: a digit run INSIDE an address (consumed
      // by the email tag) must not be billed as a phone redaction that
      // never produced a <PHONE> tag — the audit trail counts what was
      // actually replaced
      .withColumn("n_phones", regexp_count(col("__er"), lit(phonePattern)))
      .withColumn(redactedCol, regexp_replace(col("__er"), phonePattern, "<PHONE>"))
      .drop("__er")

  /**
   * Corpus snapshot diff — the audit step between two builds of the same
   * corpus: which ids were `added`, which `removed`, and which kept their
   * id but `changed` content. Unchanged rows are dropped, so the output
   * is the (small) delta, not the corpus.
   *
   * Scale shape: both sides reduce to (id, 32-char content digest)
   * BEFORE the join — a full-outer hash join that shuffles ~40 bytes per
   * row, never text. At 100 TB both snapshots' digest indexes would be
   * bucketed on id, making the join exchange-free; the comparison logic
   * is unchanged.
   */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // presence flags, not digest nullness: md5(NULL text) is NULL, which
    // a digest-only formulation misreads as "row absent" — a present row
    // with NULL text would report added/removed instead of changed/equal
    val o = oldDf.select(col(idCol).as("id"), md5(col(textCol)).as("__od"),
      lit(true).as("__op"))
    val n = newDf.select(col(idCol).as("id"), md5(col(textCol)).as("__nd"),
      lit(true).as("__np"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__op").isNull, lit("added"))
          .when(col("__np").isNull, lit("removed"))
          // null-safe compare: NULL↔NULL text is unchanged, NULL↔text is
          // a change in either direction
          .when(!(col("__od") <=> col("__nd")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("id"), col("status"))
  }
}
