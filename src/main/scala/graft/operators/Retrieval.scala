package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Full-text retrieval over the document corpus: BM25 ranked search,
 * plus a durable parquet inverted-index artifact (build-once /
 * serve-many, the same contract as [[AnnIndex]]). The pipeline uses
 * this for corpus exploration ("show me the docs this query would
 * surface"); the reference's query surface has no retrieval operator,
 * so this is §2.3 extension surface. Per-doc keyword extraction is the
 * separate [[Ngrams.topTermsByTfDf]] — this object is the multi-term
 * ranked-search side.
 *
 * Scoring is INTEGER fixed-point (parts-per-million), the
 * `dedup_pagerank` convention: floats cannot hash-oracle (summation
 * order) and `ln` is not bit-identical across engines, so both scores
 * are defined as exact rational arithmetic with floor division —
 * DuckDB replays them bit-for-bit with `//`.
 *
 * BM25 (k1 = 6/5, b = 3/4, the standard 1.2 / 0.75 as exact rationals),
 * per query term with corpus stats N docs, avgdl = floor(L / N):
 *
 *   tfp       = (22000000·tf·avgdl) div (10·tf·avgdl + 3·avgdl + 9·len)
 *   termScore = (tfp · (2·(N − df) + 1)) div (2·df + 1)
 *
 * which is floor-rational BM25: tfp is ppm of tf·(k1+1) /
 * (tf + k1·(1 − b + b·len/avgdl)) after multiplying through by
 * 10·avgdl, and the second factor is (N − df + ½)/(df + ½) — the
 * +1-free Robertson idf; both floors are part of the operator contract.
 * Per-(query, doc) score = Σ termScore over matched terms — an integer
 * sum, so partial-aggregation order cannot change a bit.
 *
 * Overflow envelope (documented, [[Anomaly]]-style): tfp ≤ 2.2e6, so a
 * single term_score ≤ tfp·(2N+1) < 2^63 up to N ≈ 2e12 docs — but the
 * binding bound is the per-(query, doc) SUM over the m matched query
 * terms: m·2.2e6·(2N+1) < 2^63 needs N ≲ 2.6e11 docs at m = 8 query
 * terms (still comfortably past a 100 TB corpus, ~1e11 docs; for a
 * larger corpus, bound m or drop the ppm scale a decimal). tfp's own
 * numerator 22000000·tf·avgdl needs tf·avgdl < 4.2e11, which holds for
 * any realistic doc (tf ≤ len ≤ ~1e6 tokens, avgdl ≤ ~4e5); `require`s
 * guard nothing here because both are per-doc token counts bounded by
 * the corpus's own doc lengths, not parameters.
 *
 * Scale shape: the query term set is collected (a query workload is
 * user input, bounded — model-state-sized, never data) and pushed as
 * an `isin` filter, so the token/posting stream is term-filtered AT THE
 * SCAN (parquet row-group skip on the index artifact; filter before
 * the first exchange on the raw-text path). Corpus stats (N, L) are a
 * map-only scan + 1-row aggregate, broadcast; df per term is
 * aggregated from the filtered postings (tiny) and broadcast. The only
 * data-sized exchange is the groupBy building tf over the FILTERED
 * token stream.
 */
object Retrieval {

  /** Tokenized base: (`doc_id`, `len`, tokens array) — one map-only
    * projection with the house tokenizer ([[Dedup.tokens]]). The id
    * column must already be integral: a silent `cast("long")` of a
    * string/UUID id would NULL every id and collapse the whole corpus
    * into one doc_id=NULL posting group — garbage scores with no error
    * anywhere downstream. */
  private def base(
      docs: DataFrame, idCol: String, textCol: String,
      unicode: Boolean = false): DataFrame = {
    requireIntegralId(docs, idCol)
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      Dedup.tokensMode(col(textCol), unicode).as("__toks"))
      .withColumn("len", size(col("__toks")).cast("long"))
  }

  /** Guard for the silent-cast trap shared by every id-keyed entry point
    * here: `cast("long")` on a string/UUID id NULLs every id and
    * collapses the corpus into one doc_id=NULL posting group — garbage
    * scores with no error anywhere downstream. */
  private def requireIntegralId(docs: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = docs.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"$idCol must be an integral id column, got $idType — map non-numeric " +
        "ids to longs (e.g. xxhash64) before indexing")
  }

  /** Corpus constants (`n` docs, `l` total tokens) as a 1-row frame.
    * One map-only scan; at 100 TB these are the nightly-maintained
    * stats ([[Profile.momentStats]] pattern), not a per-query cost. */
  private def stats(b: DataFrame): DataFrame =
    b.agg(count(lit(1)).as("n"), sum(col("len")).as("l"))

  /** Posting build shared by the query path (term-filtered: the isin
    * runs before the explode's output is shuffled) and [[writeIndex]]
    * (full vocabulary) — ONE definition of (`doc_id`, `tok`, `tf`,
    * `len`), so the two paths cannot drift apart and break the
    * spec-pinned serve/direct bit-equality. */
  private def postingsFor(b: DataFrame, terms: Option[Seq[String]]): DataFrame = {
    val toks = b.select(col("doc_id"), col("len"), explode(col("__toks")).as("tok"))
    terms.fold(toks)(ts => toks.filter(col("tok").isin(ts: _*)))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
  }

  /** The shared scoring tail: postings (already ⊇ the query terms,
    * shape `doc_id, tok, tf, len`) + 1-row stats + (`query_id`, `term`)
    * queries → (`query_id`, `doc_id`, `score_ppm`, `rank`), top `k`
    * docs per query, ties broken by doc id. Both the in-memory path and
    * the index-served path end here, so RetrievalSpec can pin
    * bit-for-bit parity between them. */
  private[operators] def bm25Serve(
      postings: DataFrame,
      statsRow: DataFrame,
      queries: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // df per term: postings are (doc, term)-unique, so df = row count.
    // Plan-shape note: `postings` feeds both aggregates below — scoped
    // persist so the posting scan runs once (the jaccardJoin precedent).
    val p = graft.CacheScope.scoped(postings)
    val dfT = p.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val a = statsRow.select(col("n"), expr("l DIV n").as("avgdl"))
    val scored = p
      .join(broadcast(dfT), "tok")
      .crossJoin(broadcast(a))
      .withColumn("tfp",
        expr("(22000000 * tf * avgdl) DIV (10 * tf * avgdl + 3 * avgdl + 9 * len)"))
      .withColumn("term_score",
        expr("(tfp * (2 * (n - df) + 1)) DIV (2 * df + 1)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
    scored
      .join(broadcast(queries.select(col("query_id"), col("term"))),
        col("tok") === col("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score_ppm"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score_ppm"), col("rank"))
  }

  /** BM25 top-`k` docs per query, scored directly from the raw corpus
    * (two map-only text scans: one for corpus stats, one for the
    * filtered posting build). `queries` is (`query_id`, `term`) — one
    * row per query term; terms a query repeats count once (the
    * standard bag-of-words query model drops query-side tf). */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      k: Int = 10,
      unicode: Boolean = false): DataFrame = {
    val b = base(docs, idCol, textCol, unicode)
    val terms = queryTerms(queries)
    bm25Serve(postingsFor(b, Some(terms)), stats(b),
      queries.dropDuplicates("query_id", "term"), k)
  }

  /** Collect the distinct query-term set (bounded: a query workload,
    * never corpus data) for scan-level pushdown. Sorted so the pushed
    * `In` filter — and therefore the physical plan — is deterministic
    * regardless of shuffle-partition hashing of the distinct. */
  private def queryTerms(queries: DataFrame): Seq[String] = {
    val terms = queries.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    require(terms.nonEmpty, "queries must carry at least one term")
    require(terms.size <= 10000,
      s"query term set too large to broadcast-push (${terms.size}); " +
        "split the workload")
    terms
  }

  /**
   * Positional phrase search: docs containing the exact consecutive
   * token sequence `phrase`, with occurrence counts — the positional-
   * index intersection every search engine runs for quoted queries
   * (and the retrieval-shaped cousin of [[Ngrams.decontaminate]]'s
   * n-gram matching).
   *
   * Scale shape: the token stream is filtered to the phrase's terms
   * BEFORE anything shuffles (the same collect-and-push contract as
   * [[bm25TopK]]'s query terms), so the m-way positional self-join
   * intersects per-term position lists, not the corpus: each join key
   * is (doc, pos−offset) over pre-filtered streams. The filtered
   * stream is scope-persisted so the text is scanned once, not once
   * per phrase term. No window over the full corpus — the
   * lead()-window alternative ([[Ngrams.wordNgrams]]) shuffles every
   * token; this shape shuffles only positions of the m phrase terms.
   */
  def phraseSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String],
      unicode: Boolean = false): DataFrame = {
    require(phrase.size >= 2 && phrase.size <= 8,
      s"phrase must have 2..8 tokens: $phrase")
    // each term must be exactly ONE token of the ACTIVE lexical contract
    // — under the unicode rule a multi-char Han term would split into
    // per-char tokens and silently never match; reject it here and point
    // at the tokenizer (callers quote a raw CJK phrase through
    // [[phraseSearchText]], which tokenizes it for them)
    phrase.foreach { t =>
      require(Dedup.tokensLocal(t, unicode) == Seq(t),
        s"phrase term '$t' is not a single token of the " +
          s"${if (unicode) "unicode" else "ascii"} lexical contract — " +
          "pass tokens produced by Dedup.tokensLocal/tokensMode " +
          "(phraseSearchText does this for raw text)")
    }
    requireIntegralId(docs, idCol)
    // positional token stream via the house projection (Ngrams.tokens —
    // one definition of (doc, 1-based pos, tok) for every tokenizing
    // operator), filtered to the phrase's terms before any shuffle
    val toks = graft.CacheScope.scoped(
      Ngrams.tokens(docs, idCol, textCol, Nil, unicode)
        .select(col(idCol).cast("long").as("doc_id"), col("pos"), col("tok"))
        .filter(col("tok").isin(phrase.distinct: _*)))
    val anchor = toks.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.drop(1)
      .foldLeft(anchor) { case (acc, (term, i)) =>
        acc.join(
          toks.filter(col("tok") === term)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Quoted-query convenience over [[phraseSearch]]: tokenize the raw
    * phrase with the active lexical contract (driver-side twin
    * [[Dedup.tokensLocal]] — a CJK phrase becomes its per-char token
    * sequence, exactly how the corpus side tokenized) and search it. */
  def phraseSearchText(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rawPhrase: String,
      unicode: Boolean = false): DataFrame =
    phraseSearch(docs, idCol, textCol,
      Dedup.tokensLocal(rawPhrase, unicode), unicode)

  /**
   * Persist the inverted index under `dir` — the Lucene-segment analog
   * as parquet:
   *
   *  - `<dir>/postings/` — (`tok`, `doc_id`, `tf`, `len`), repartitioned
   *    and sorted by term so each term's posting list is contiguous and
   *    parquet min/max stats skip whole row groups for a term-filtered
   *    serve scan. `len` is denormalized onto the posting (the stored
   *    doc-norm, 8 bytes) so serving never joins a corpus-sized length
   *    table.
   *  - `<dir>/norms/` — (`doc_id`, `len`): the corpus-stats source
   *    (N, L) for serving, and the re-join surface if a caller needs
   *    per-doc norms alone.
   */
  def writeIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      numPartitions: Int = 0,
      unicode: Boolean = false): Unit = {
    // writeIndex means THE WHOLE index: clear any prior segment layout
    // first, or a rebuild over an incrementally-maintained (or
    // differently-segmented) index would leave stale segments mixed in
    // — per-segment overwrite only replaces batch=0.
    val spark = docs.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    // tombstones cleared too: a full rebuild indexes exactly what the
    // caller passes — a stale takedown tombstone would silently
    // suppress a doc the rebuild deliberately re-ingested. The
    // tokenizer-mode meta goes with them: a full rebuild re-tokenizes
    // everything, so (unlike an append) it MAY legitimately change mode.
    Seq(s"$dir/postings", s"$dir/norms", s"$dir/tombstones",
        s"$dir/$ModeMetaFile").foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(conf).delete(path, true) // incl. KeyTombstones.clear semantics
    }
    writeIndexSegment(docs, idCol, textCol, dir, "batch=0", numPartitions,
      unicode)
  }

  /** Tokenizer-mode meta for the segmented index. Postings carry no
    * trace of the tokenizer that produced them, so an append tokenized
    * under a DIFFERENT lexical contract than the standing segments
    * would silently merge two incompatible vocabularies (the same
    * cross-banding failure [[NearDupIndex]]'s one-meta design
    * prevents). Same publish discipline as NearDupIndex.writeMeta:
    * EXCLUSIVE CREATE of the final path (fails loud on every
    * filesystem — a temp+rename publish is unsafe on RawLocalFileSystem,
    * whose POSIX rename silently overwrites), existing meta never
    * deleted outside a full [[writeIndex]] rebuild; a writer losing the
    * create race re-reads the winner's mode and applies the same
    * identical/different rule. */
  private[operators] val ModeMetaFile = "_GRAFT_BM25_META"

  /** Pin `unicode` as THE index's tokenizer mode, or fail loud on a
    * mismatch. A meta-less layout with committed segments is a pre-r15
    * index — those were all ASCII-tokenized, so claiming it for unicode
    * appends is refused (ASCII appends adopt it and pin the mode). */
  private def pinMode(
      spark: SparkSession, dir: String, unicode: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    val meta = new Path(s"$dir/$ModeMetaFile")
    val fs = meta.getFileSystem(spark.sessionState.newHadoopConf())
    def checkExisting(): Unit = {
      val existing = readMode(spark, dir)
      require(existing == unicode,
        s"index at $dir was tokenized with unicode=$existing; appending " +
          s"unicode=$unicode segments would merge two incompatible " +
          "vocabularies — rebuild via writeIndex or use a fresh directory")
    }
    if (fs.exists(meta)) { checkExisting(); return }
    if (unicode) {
      val committed = fs.globStatus(
        new Path(s"$dir/norms", s"batch=*/$CommitMarker"))
      require(committed == null || committed.isEmpty,
        s"index at $dir has committed segments but no tokenizer-mode " +
          "meta (a pre-unicode ASCII index) — unicode appends would " +
          "merge incompatible vocabularies; rebuild via writeIndex")
    }
    val out = try fs.create(meta, false) catch {
      // lost the create race — the winner's mode decides, same rule
      case _: java.io.IOException => checkExisting(); return
    }
    scala.util.Using.resource(out) { o =>
      o.write(s"unicode=${if (unicode) 1 else 0}\n".getBytes("UTF-8"))
    }
  }

  /** The pinned tokenizer mode; absent meta = ASCII (pre-r15 layouts). */
  private[operators] def readMode(spark: SparkSession, dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val meta = new Path(s"$dir/$ModeMetaFile")
    val fs = meta.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(meta)) return false
    scala.util.Using.resource(fs.open(meta)) { in =>
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty)
        .exists(_ == "unicode=1")
    }
  }

  /**
   * One index SEGMENT (`<dir>/postings/<segment>/` +
   * `<dir>/norms/<segment>/`) — the unit of incremental maintenance.
   * [[writeIndex]] is the single-segment special case; the streaming
   * twin ([[graft.streaming.CorpusStream.indexDocsStream]]) writes one
   * segment per micro-batch. Because postings are (doc, term)-local and
   * corpus docs are immutable append-only, a new doc's postings never
   * touch an existing segment: maintenance is pure append — no merge,
   * no standing-segment read (the Lucene-segment model, minus merges;
   * when micro-batch segments accumulate, a periodic OFFLINE
   * [[writeIndex]] over the corpus IS the compaction — it clears the
   * segment layout and rebuilds as one segment).
   * Per-term df and corpus stats are deliberately NOT stored — they go
   * stale on every append; [[searchIndex]] derives them at serve time
   * from the segment union. Segment names are hive-style `batch=<id>`
   * so the parent-directory read partition-discovers them, and
   * `overwrite` on the segment path makes a same-id replay idempotent
   * (the [[graft.streaming.CorpusStream.appendShards]] recipe).
   */
  def writeIndexSegment(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      segment: String,
      numPartitions: Int = 0,
      unicode: Boolean = false): Unit = {
    require(segment.matches("batch=\\d+"),
      s"segment must be hive-style batch=<id> for partition discovery: $segment")
    // pin (or validate against) the index's tokenizer mode BEFORE any
    // data write: a mismatched append must fail with the layout intact
    pinMode(docs.sparkSession, dir, unicode)
    // two writes = two jobs; persist the tokenized base across them so
    // the text is scanned once. Index writes are eager, so unlike the
    // query paths they can own the cache lifetime directly.
    //
    // WRITE ORDER IS THE COMMIT PROTOCOL: (0) invalidate any prior
    // commit of this segment — a REPLAY (crash between a completed
    // write and the streaming checkpoint) would otherwise overwrite
    // postings while the stale marker still advertises the segment as
    // committed; (1) postings; (2) norms; (3) an engine-owned
    // `_GRAFT_COMMIT` marker in the norm segment. [[searchIndex]]
    // serves only marked segments, so a serve racing an append or a
    // replay sees either the full segment or none of it — never
    // postings without stats, which would silently shift every BM25
    // score off the scoring contract. The marker is written explicitly
    // (not parquet's `_SUCCESS`) so the protocol survives clusters
    // that disable committer marker files.
    val conf = docs.sparkSession.sessionState.newHadoopConf()
    val normSeg = new org.apache.hadoop.fs.Path(s"$dir/norms/$segment")
    val fs = normSeg.getFileSystem(conf)
    // un-commit by deleting ONLY the marker: the overwrite writes below
    // replace stale data anyway, and keeping the old norm files readable
    // until then means a replay that fails mid-rewrite has merely
    // unmarked the segment, not destroyed its committed data
    fs.delete(new org.apache.hadoop.fs.Path(normSeg, CommitMarker), false)
    val b = base(docs, idCol, textCol, unicode).persist()
    try {
      val full = postingsFor(b, None)
      val parts = if (numPartitions > 0) full.repartition(numPartitions, col("tok"))
                  else full.repartition(col("tok"))
      parts.sortWithinPartitions(col("tok"), col("doc_id"))
        .select(col("tok"), col("doc_id"), col("tf"), col("len"))
        .write.mode("overwrite").parquet(s"$dir/postings/$segment")
      b.select(col("doc_id"), col("len"))
        .write.mode("overwrite").parquet(s"$dir/norms/$segment")
      fs.create(new org.apache.hadoop.fs.Path(normSeg, CommitMarker), true).close()
    } finally b.unpersist()
  }

  /** Engine-owned segment commit marker — deliberately not `_SUCCESS`,
    * which cloud committers are routinely configured not to write.
    * Content contract: EMPTY for an appended segment; a compacted
    * segment's marker instead lists the segment ids it supersedes (one
    * decimal id per line — its direct sources plus any still-on-disk
    * orphans carried forward from earlier compactions), so publishing
    * the marker is ONE atomic rename that simultaneously makes the
    * merged segment visible and its sources invisible. A racing serve
    * is never DOUBLED (old id set or new, decided by the rename), but
    * one that listed just before the publish can lose files to source
    * reclaim mid-scan — see [[compactIndexSegments]]'s
    * `reclaimSources` for the zero-disruption variant. */
  private[operators] val CommitMarker = "_GRAFT_COMMIT"

  /** Compacted segments get ids from a disjoint range so a streaming
    * appender replaying micro-batch ids can never collide with (and
    * silently overwrite) a merged segment: stream batch ids are
    * checkpoint-monotonic from 0 and reach 1e12 only after ~31k years
    * at one batch per millisecond. */
  private[operators] val CompactIdBase = 1000000000000L

  /** Committed segment ids (marker present) and the union of ids named
    * in those markers' contents (superseded by some compaction). One
    * glob + one tiny marker read per compacted segment. */
  private[operators] def committedAndNamed(
      fs: org.apache.hadoop.fs.FileSystem,
      normsPath: org.apache.hadoop.fs.Path): (Seq[Long], Set[Long]) = {
    val markers = fs.globStatus(
      new org.apache.hadoop.fs.Path(normsPath, s"batch=*/$CommitMarker")).toSeq
    val committed = markers.map(
      _.getPath.getParent.getName.stripPrefix("batch=").toLong)
    val named = markers.flatMap { st =>
      if (st.getLen == 0) Nil // append marker — fast path, no read
      else scala.util.Using.resource(fs.open(st.getPath)) { in =>
        scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).map(_.toLong).toList
      }
    }.toSet
    (committed, named)
  }

  /** The segments a serve may read: committed (marker present) minus
    * superseded (named in any committed marker's content). A corpus
    * that accumulates many segments should compact — see
    * [[compactIndexSegments]]. */
  private[operators] def liveSegments(
      fs: org.apache.hadoop.fs.FileSystem,
      normsPath: org.apache.hadoop.fs.Path): Seq[Long] = {
    val (committed, superseded) = committedAndNamed(fs, normsPath)
    committed.filterNot(superseded)
  }

  /**
   * Doc-keyed DELETE on the durable index — the takedown operation
   * ([[graft.sources.v2.ShardDelete]] is the corpus-table half; this is
   * the index half, natural here because postings ARE doc-keyed).
   * Publishes a committed TOMBSTONE segment
   * (`<dir>/tombstones/batch=<n>/` — a parquet of `doc_id` plus the
   * marker-last commit, the same segment discipline as the index
   * itself): [[searchIndex]] anti-joins live tombstones out of BOTH
   * postings and norms, so a deleted doc leaves the results, the
   * per-term df, AND the corpus stats (N, L) in one serve —
   * score-identical to an index that never ingested it.
   * [[compactIndexSegments]] MATERIALIZES the deletes (the merged
   * segment is written without the tombstoned docs) and reclaims the
   * absorbed tombstones.
   *
   * Contract notes: a tombstone suppresses its `doc_id` across ALL
   * segments — re-using a deleted id for new content is undefined until
   * a compaction has materialized and reclaimed the tombstone (same
   * global-key semantics as any keyed table; Lucene's per-segment
   * delete bitmaps don't apply to a key-addressed corpus). The id frame
   * is takedown-sized and is JOINED, never collected. Same
   * single-maintainer discipline as compaction: don't run deletes
   * concurrently with a compaction of the same index.
   */
  def deleteDocsFromIndex(
      spark: SparkSession, dir: String, docIds: DataFrame): Unit =
    KeyTombstones.publish(spark, dir, docIds, "doc_id")

  /** Anti-join `df` against the committed tombstones, if any. */
  private def minusTombstones(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      dir: String,
      df: DataFrame): DataFrame =
    KeyTombstones.minus(spark, fs, dir, df, "doc_id")

  /**
   * Merge all live index segments into ONE — the Lucene-merge analog
   * the continuous-index path ([[graft.streaming.CorpusStream
   * .indexDocsStream]], one segment per micro-batch) needs: without it
   * segment directories grow without bound and file-listing +
   * marker-stat RPCs eventually dominate serving. Unlike the offline
   * [[writeIndex]] rebuild this reads only the INDEX (postings +
   * norms), never the corpus text — at 100 TB the index is the far
   * smaller artifact, and the text may no longer be co-located.
   *
   * Commit protocol (crash-safe at every step, same discipline as
   * [[graft.sources.v2.ShardCompact]]):
   *
   *  1. merged postings + norms are written under a fresh segment id
   *     from [[CompactIdBase]]'s range — unmarked, so invisible;
   *  2. the marker is published by temp-write + ATOMIC RENAME, its
   *     content naming the superseded source ids PLUS, copied forward,
   *     every previously-superseded id whose data directory still
   *     exists (a prior reclaim that failed or crashed mid-loop).
   *     Without the copy-forward, superseding a compacted segment
   *     destroys the only tombstone naming ITS sources, and a surviving
   *     orphan — whose own marker is still on disk — would be served
   *     again next to the merged copy, doubling its tf/df;
   *  3. (`reclaimSources = true`, the default) each source is
   *     UN-COMMITTED first — its marker deleted, failing LOUDLY if the
   *     delete fails while the marker remains — then its data
   *     directories are removed best-effort. A crash here leaves
   *     reclaimable orphans that stay tombstoned (step 2) and
   *     re-running compaction, or [[vacuumIndexSegments]], reclaims
   *     them.
   *
   * Visibility guarantee: a serve never sees a doc twice (old set or
   * new set, decided by the single marker rename). It is NOT a
   * zero-disruption guarantee — a serve that listed markers just
   * before the publish can race the source deletion and fail with
   * FileNotFound (or, with `spark.sql.files.ignoreMissingFiles`,
   * silently read a partial corpus). Serving fleets that cannot retry
   * should pass `reclaimSources = false` and run
   * [[vacuumIndexSegments]] after a grace period longer than their
   * longest query.
   *
   * Single-maintainer discipline is STRUCTURAL: compaction and vacuum
   * take the index directory's [[graft.sources.v2.ShardLock]] (the
   * shard store's lock, keyed here on the index dir), so two
   * compactions — or a compaction racing a vacuum — fail loud instead
   * of both claiming `max(live)+1` / deleting under each other.
   * Appends stay lock-free and race freely — an appended segment
   * simply misses this merge and joins the next one. Returns the
   * live-segment count after compaction (1, or the input count when
   * already compact).
   */
  def compactIndexSegments(
      spark: SparkSession,
      dir: String,
      reclaimSources: Boolean = true,
      leaseMs: Long = graft.sources.v2.ShardLock.DefaultLeaseMs): Int =
    graft.sources.v2.ShardLock.withLock(spark, dir, leaseMs) {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val normsPath = new Path(s"$dir/norms")
    val fs = normsPath.getFileSystem(conf)
    require(fs.exists(normsPath), s"no index under $dir")
    val (committed, priorNamed) = committedAndNamed(fs, normsPath)
    val live = committed.filterNot(priorNamed)
    require(live.nonEmpty, s"no committed index segments under $dir")
    if (live.size <= 1) return live.size

    val newId = math.max(live.max + 1, CompactIdBase)
    val seg = s"batch=$newId"
    // snapshot the tombstones this merge MATERIALIZES (deletes landing
    // after this listing simply miss the merge and keep filtering at
    // serve time until the next compaction — same race contract as a
    // racing append)
    val appliedTombstones = KeyTombstones.committed(fs, dir)
    // (1) merged data, unmarked — postings re-clustered by term so the
    // serve scan's row-group skipping survives the merge; tombstoned
    // docs are dropped here, so the merged segment never carries them
    val postings = minusTombstones(spark, fs, dir,
      graft.sources.ParquetSchemaCache.read(spark, s"$dir/postings")
        .filter(col("batch").isin(live: _*)))
    postings.repartition(col("tok"))
      .sortWithinPartitions(col("tok"), col("doc_id"))
      .select(col("tok"), col("doc_id"), col("tf"), col("len"))
      .write.mode("overwrite").parquet(s"$dir/postings/$seg")
    minusTombstones(spark, fs, dir,
      graft.sources.ParquetSchemaCache.read(spark, s"$dir/norms")
        .filter(col("batch").isin(live: _*)))
      .select(col("doc_id"), col("len"))
      .write.mode("overwrite").parquet(s"$dir/norms/$seg")
    // (2) atomic publish. Tombstones = the sources being merged +
    // previously-superseded ids whose data still exists on disk (the
    // existence probe bounds the carried set to ACTUAL orphans, so the
    // marker doesn't accumulate every id ever compacted). Probing
    // norms alone suffices: a serve admits a segment only via its norm
    // dir's marker, and vacuum removes both dirs of a named id.
    val orphansAlive = priorNamed.toSeq.filter { id =>
      fs.exists(new Path(s"$dir/norms/batch=$id")) ||
        fs.exists(new Path(s"$dir/postings/batch=$id"))
    }
    val tombstones = (live ++ orphansAlive).distinct.sorted
    val markerPath = new Path(s"$dir/norms/$seg/$CommitMarker")
    val tmp = new Path(s"$dir/norms/$seg/.${CommitMarker}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    scala.util.Using.resource(fs.create(tmp, true)) { out =>
      out.write(tombstones.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    if (!fs.rename(tmp, markerPath))
      throw new java.io.IOException(s"compact marker publish failed: $markerPath")
    // (3) reclaim: un-commit each source FIRST (loud on failure — an
    // orphan with a live marker is the resurrection precondition), then
    // drop its data. Data-dir failures are tolerable: the id stays in
    // the new marker's tombstones and the next compact/vacuum retries.
    if (reclaimSources) tombstones.foreach { id =>
      val srcMarker = new Path(s"$dir/norms/batch=$id/$CommitMarker")
      if (!fs.delete(srcMarker, false) && fs.exists(srcMarker))
        throw new java.io.IOException(
          s"compaction could not un-commit superseded segment $id " +
            s"($srcMarker survives); refusing to leave a resurrectable orphan")
      fs.delete(new Path(s"$dir/postings/batch=$id"), true)
      fs.delete(new Path(s"$dir/norms/batch=$id"), true)
    }
    // reclaim the MATERIALIZED tombstones (snapshot from before the
    // merge — ones that landed since keep serving). Best-effort and
    // safe in this direction: a surviving tombstone can only re-filter
    // ids the merged segment no longer contains (a no-op), never
    // resurrect anything.
    KeyTombstones.reclaim(fs, appliedTombstones)
    1
    }

  /** Reclaim superseded index segments deferred by
    * `compactIndexSegments(…, reclaimSources = false)`: deletes the
    * data directories of every id named in a committed marker. Only
    * NAMED ids are touched — an uncommitted, un-named directory may be
    * an in-flight append and is left alone. Run it after a grace
    * period longer than the serving fleet's longest query so no scan
    * started before the compaction's publish still holds the old file
    * list. Takes the index's maintenance lock — a vacuum racing a
    * compaction fails loud with the layout intact. Returns the number
    * of segment ids reclaimed. */
  def vacuumIndexSegments(spark: SparkSession, dir: String,
      leaseMs: Long = graft.sources.v2.ShardLock.DefaultLeaseMs): Int =
    graft.sources.v2.ShardLock.withLock(spark, dir, leaseMs) {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val normsPath = new Path(s"$dir/norms")
    val fs = normsPath.getFileSystem(conf)
    require(fs.exists(normsPath), s"no index under $dir")
    val (_, named) = committedAndNamed(fs, normsPath)
    val dead = named.toSeq.sorted.filter { id =>
      fs.exists(new Path(s"$dir/norms/batch=$id")) ||
        fs.exists(new Path(s"$dir/postings/batch=$id"))
    }
    dead.foreach { id =>
      fs.delete(new Path(s"$dir/postings/batch=$id"), true)
      fs.delete(new Path(s"$dir/norms/batch=$id"), true)
    }
    dead.size
    }

  /** Serve BM25 top-`k` from a persisted index: the term filter lands
    * in `PushedFilters` on the postings scan (RetrievalSpec asserts
    * it), so only the queried posting lists' row groups are read —
    * the corpus text is never touched. Bit-for-bit equal to
    * [[bm25TopK]] over the same corpus.
    *
    * Only COMMITTED segments are served (those whose norm segment
    * carries the engine's own [[CommitMarker]] — enforced here as a
    * partition-pruning filter on `batch`), so a serve racing a
    * streaming append or a crash-replay sees a consistent corpus view:
    * postings, norms and the derived df/avgdl always describe the same
    * doc set. Discovery is one `globStatus` call at the API level;
    * note Hadoop's globber still stats the literal `_GRAFT_COMMIT`
    * component per segment directory internally, so a monitor serving
    * over thousands of accumulated segments should compact
    * (periodic [[writeIndex]] rebuild) for metadata-RPC reasons as
    * well as file-count ones. */
  def searchIndex(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int = 10): DataFrame = {
    val terms = queryTerms(queries)
    val conf = spark.sessionState.newHadoopConf()
    val normsPath = new org.apache.hadoop.fs.Path(s"$dir/norms")
    val fs = normsPath.getFileSystem(conf)
    require(fs.exists(normsPath), s"no index under $dir")
    // committed minus compaction-superseded — see CommitMarker's
    // content contract
    val committed = liveSegments(fs, normsPath)
    require(committed.nonEmpty, s"no committed index segments under $dir")
    // tombstones filter BOTH sides: postings (results + df) and norms
    // (N, L) — a deleted doc must score-vanish exactly as if it had
    // never been indexed, not merely drop out of the hit list
    val postings = minusTombstones(spark, fs, dir,
      graft.sources.ParquetSchemaCache.read(spark, s"$dir/postings")
        .filter(col("batch").isin(committed: _*))
        .filter(col("tok").isin(terms: _*)))
    val norms = minusTombstones(spark, fs, dir,
      graft.sources.ParquetSchemaCache.read(spark, s"$dir/norms")
        .filter(col("batch").isin(committed: _*)))
    bm25Serve(postings, norms.agg(count(lit(1)).as("n"), sum(col("len")).as("l")),
      queries.dropDuplicates("query_id", "term"), k)
  }
}
