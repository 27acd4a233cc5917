package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Retrieval
import graft.sources.Tables

/**
 * Retrieval family (SURVEY §2.3): BM25 ranked search over `documents`,
 * direct and served from the durable inverted-index artifact. Scores
 * are integer fixed-point (ppm) so the DuckDB oracles replay the exact
 * rational arithmetic bit-for-bit — see [[graft.operators.Retrieval]]
 * for the scoring contract.
 *
 * The fixture workload mixes one rare term (`dup`, df ≈ 5% of docs)
 * with common terms (df ≈ 80%) so the idf factor visibly reorders
 * results, not just tf.
 */
object RetrievalQueries extends QueryFamily {

  /** (query_id, term) fixture workload — `dup` is the rare term. */
  private val workload: Seq[(Int, String)] = Seq(
    1 -> "dup", 1 -> "join",
    2 -> "spark", 2 -> "window", 2 -> "agg",
    3 -> "fast", 3 -> "key")

  private def workloadDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    workload.toDF("query_id", "term")
  }

  private def workloadSqlValues: String =
    workload.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  /** BM25 top-10 docs per workload query. */
  def textBm25TopK(spark: SparkSession, dir: String): DataFrame =
    Retrieval.bm25TopK(Tables.documents(spark, dir), "doc_id", "text",
      workloadDf(spark), k = 10)
      .orderBy(col("query_id"), col("rank"))

  /** Same workload served from the durable inverted-index artifact —
    * build + serve in one query so the driver exercises the artifact
    * path end-to-end; bit-equality with `text_bm25_topk` means one
    * oracle covers both. */
  def textBm25Index(spark: SparkSession, dir: String): DataFrame = {
    // fixed per-(fixture, process) location + overwrite mode: repeated
    // runs within a harness (bench passes, multi-SF verification)
    // rebuild in place instead of leaking a corpus-sized index copy per
    // invocation, while the pid suffix keeps two concurrent graft
    // processes on the same fixture from deleting each other's index
    // mid-read
    val idx = graft.TmpCleanup.perProcessDir("graft-bm25-idx", dir)
    // the pid suffix means each JVM leaves its own copy behind — delete
    // it at JVM exit, or repeated bench/verify processes accumulate
    // corpus-sized index dirs in /tmp until the filesystem fills
    graft.TmpCleanup.register(idx)
    Retrieval.writeIndex(Tables.documents(spark, dir), "doc_id", "text", idx)
    Retrieval.searchIndex(spark, idx, workloadDf(spark), k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * Segment compaction round trip — [[textBm25Index]]'s maintenance
   * twin: the index is built as TWO committed segments (even/odd docs —
   * the continuous-ingest shape, one segment per micro-batch), served,
   * compacted to ONE merged segment via the atomic superseding-marker
   * publish ([[Retrieval.compactIndexSegments]]), and served again.
   * The post-compaction serve is hash-checked against the same DuckDB
   * BM25 derivation as the direct query; `served_equal` gates
   * bit-equality of the pre/post serves (the merge must not move a
   * single score or rank) and `compacted_ok` that consolidation
   * actually happened (2 live segments → 1).
   */
  def textBm25SegmentCompact(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.TmpCleanup.perProcessDir("graft-bm25-seg", dir)
    graft.TmpCleanup.register(idx)
    // rebuild per invocation: compaction mutates the layout, so a bench
    // re-entry over last run's single segment would gate compacted_ok
    // vacuously red
    val p = java.nio.file.Paths.get(idx)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
        st.iterator().asScala.toSeq.reverse
      }.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    val docs = Tables.documents(spark, dir)
    Retrieval.writeIndexSegment(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", idx, "batch=0")
    Retrieval.writeIndexSegment(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", idx, "batch=1")
    def serve() = Retrieval.searchIndex(spark, idx, workloadDf(spark), k = 10)
      .orderBy(col("query_id"), col("rank"))
    // materialize BEFORE compacting — the lazy plan would otherwise
    // read the post-compaction layout (or a deleted segment)
    val before = serve().collect().toSeq
    val nAfter = Retrieval.compactIndexSegments(spark, idx)
    val compactedOk = nAfter == 1
    val after = serve()
    val servedEqual = after.collect().toSeq == before
    after
      .withColumn("served_equal", lit(servedEqual))
      .withColumn("compacted_ok", lit(compactedOk))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * Doc-keyed takedown on the durable index
   * ([[Retrieval.deleteDocsFromIndex]]): the index is built as TWO
   * committed segments, every `doc_id % 7 == 0` is tombstoned, and the
   * serve must be score-identical to an index that NEVER ingested those
   * docs (results, df, and corpus stats all forget them — the DuckDB
   * twin recomputes BM25 over the filtered corpus). Then compaction
   * MATERIALIZES the deletes; `served_equal` gates bit-equality of the
   * tombstone-filtered and materialized serves, `tombstones_cleared`
   * that compaction reclaimed the absorbed tombstone segments.
   */
  def textBm25Delete(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.TmpCleanup.perProcessDir("graft-bm25-del", dir)
    graft.TmpCleanup.register(idx)
    // rebuild per invocation: deletes mutate the layout
    val p = java.nio.file.Paths.get(idx)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
        st.iterator().asScala.toSeq.reverse
      }.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    val docs = Tables.documents(spark, dir)
    Retrieval.writeIndexSegment(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", idx, "batch=0")
    Retrieval.writeIndexSegment(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", idx, "batch=1")
    Retrieval.deleteDocsFromIndex(spark, idx,
      docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")))
    def serve() = Retrieval.searchIndex(spark, idx, workloadDf(spark), k = 10)
      .orderBy(col("query_id"), col("rank"))
    val before = serve().collect().toSeq
    Retrieval.compactIndexSegments(spark, idx)
    val after = serve()
    val servedEqual = after.collect().toSeq == before
    val tombstonesCleared = !new java.io.File(s"$idx/tombstones").exists() ||
      new java.io.File(s"$idx/tombstones").listFiles().isEmpty
    after
      .withColumn("served_equal", lit(servedEqual))
      .withColumn("tombstones_cleared", lit(tombstonesCleared))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Quoted-phrase workload: a trigram with hits at ALL three fixture
    * SFs (5 / 1 / 7 occurrences at sf0.001/0.01/0.1), so no SF's
    * verification degenerates to an empty result. Multiplicity within
    * one doc is covered by RetrievalSpec's overlap cases. */
  private val phrase = Seq("order", "fast", "window")

  /** Exact positional phrase search with occurrence counts. */
  def textPhraseSearch(spark: SparkSession, dir: String): DataFrame =
    Retrieval.phraseSearch(Tables.documents(spark, dir), "doc_id", "text", phrase)
      .orderBy(col("doc_id"))

  override def queries: Map[String, QueryFn] = Map(
    "text_bm25_topk" -> (textBm25TopK _),
    "text_bm25_index" -> (textBm25Index _),
    "text_bm25_segment_compact" -> (textBm25SegmentCompact _),
    "text_bm25_delete" -> (textBm25Delete _),
    "text_phrase_search" -> (textPhraseSearch _))

  /** Shared SQL fragments: the house tokenizer twin and the BM25 CTE
    * chain (used by both bm25 oracles — the index query is defined to
    * be bit-equal to the direct one). Note the stats CTE aggregates
    * over `documents` directly, NOT over the unnested token stream:
    * Spark's corpus stats count every doc row, and a zero-token doc
    * would vanish from an unnest-derived count (the lens CTE is only
    * ever joined for docs that carry a query term, so its derivation
    * from toks is safe). */
  private def toksCte(docsRel: String) =
    s"""toks AS (SELECT doc_id,
      |  unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS tok
      |  FROM $docsRel)""".stripMargin

  private def bm25Sql: String = bm25SqlOver("documents")

  /** The BM25 CTE chain over an arbitrary docs relation — `documents`
    * for the standing rows, a filtered subquery for the takedown twin
    * (the oracle's corpus must NEVER have contained the deleted ids). */
  private def bm25SqlOver(docsRel: String): String =
    s"""WITH ${toksCte(docsRel)},
       |lens AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len FROM toks GROUP BY doc_id),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) AS BIGINT) AS l
       |  FROM $docsRel),
       |a AS (SELECT n, l // n AS avgdl FROM stats),
       |q(query_id, term) AS (VALUES $workloadSqlValues),
       |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
       |       WHERE tok IN (SELECT term FROM q) GROUP BY doc_id, tok),
       |dfs AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       |scored AS (SELECT q.query_id, tf.doc_id,
       |    CAST(SUM(
       |      (((22000000 * tf.tf * a.avgdl) // (10 * tf.tf * a.avgdl + 3 * a.avgdl + 9 * l.len))
       |        * (2 * (a.n - d.df) + 1)) // (2 * d.df + 1)
       |    ) AS BIGINT) AS score_ppm
       |  FROM tf
       |  JOIN dfs d ON d.tok = tf.tok
       |  JOIN lens l ON l.doc_id = tf.doc_id
       |  JOIN q ON q.term = tf.tok
       |  CROSS JOIN a
       |  GROUP BY q.query_id, tf.doc_id)
       |SELECT query_id, doc_id, score_ppm, rank FROM (
       |  SELECT query_id, doc_id, score_ppm,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_ppm DESC, doc_id) AS INT) AS rank
       |  FROM scored)
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  override def oracles: Map[String, String] = Map(
    "text_bm25_topk" -> bm25Sql,
    "text_bm25_index" -> bm25Sql,
    // same BM25 derivation + the two constant-TRUE maintenance gates
    "text_bm25_segment_compact" -> bm25Sql
      .replace("SELECT query_id, doc_id, score_ppm, rank FROM (",
        "SELECT query_id, doc_id, score_ppm, rank, " +
          "TRUE AS served_equal, TRUE AS compacted_ok FROM ("),
    // the takedown twin: BM25 recomputed over a corpus that never
    // contained the deleted ids, plus the two constant-TRUE gates
    "text_bm25_delete" -> bm25SqlOver(
      "(SELECT * FROM documents WHERE doc_id % 7 <> 0)")
      .replace("SELECT query_id, doc_id, score_ppm, rank FROM (",
        "SELECT query_id, doc_id, score_ppm, rank, " +
          "TRUE AS served_equal, TRUE AS tombstones_cleared FROM ("),
    "text_phrase_search" -> {
      val joins = phrase.zipWithIndex.drop(1).map { case (t, i) =>
        s"JOIN t t$i ON t$i.doc_id = t0.doc_id AND t$i.pos = t0.pos + $i AND t$i.tok = '$t'"
      }.mkString("\n")
      s"""WITH t AS (SELECT doc_id,
         |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS tok,
         |    unnest(range(1, len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) + 1)) AS pos
         |  FROM documents)
         |SELECT t0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
         |FROM t t0
         |$joins
         |WHERE t0.tok = '${phrase.head}'
         |GROUP BY t0.doc_id ORDER BY t0.doc_id""".stripMargin
    })
}
