package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal Rank
 * Fusion outperforms Condorcet and individual Rank Learning Methods",
 * SIGIR 2009): combine several per-document quality signals by summing
 * `1/(k + rank_i)` over each signal's rank — the standard way to ensemble
 * incommensurable rankers (a learned classifier, a rarity statistic, a
 * length prior) without calibrating their scores onto one scale.
 *
 * House arithmetic: the fused score is computed in exact micro units,
 * `Σ 1_000_000 DIV (k + rank_i)` — ranks are integers, so the whole
 * fusion replays in DuckDB with zero float tolerance.
 *
 * Scale design: ranks are per-PARTITION windows (e.g. per source) — one
 * hash exchange on the partition key, never a single-partition global
 * sort; every window carries the id tie-break, so the fusion is a total
 * order and the downstream top-k rewrites to WindowGroupLimit (no full
 * materialization of per-partition sorts past the limit).
 */
object Fusion {

  /** Add `rank_<name>` (LONG, 1-based) per signal and the fused
    * `rrf_micro` column. `signals` maps output rank-column suffix →
    * (source column, descending?) — descending=true means "bigger is
    * better" for that signal. */
  def rrf(df: DataFrame, partCols: Seq[String], idCol: String,
      signals: Seq[(String, String, Boolean)], k: Int = 60): DataFrame = {
    require(signals.nonEmpty, "rrf needs at least one signal")
    val ranked = signals.foldLeft(df) { case (d, (name, c, desc)) =>
      val ord = if (desc) col(c).desc else col(c).asc
      d.withColumn(s"rank_$name", row_number().over(
        Window.partitionBy(partCols.map(col): _*).orderBy(ord, col(idCol)))
        .cast("long"))
    }
    val fused = signals.map { case (name, _, _) =>
      expr(s"1000000L DIV (${k}L + rank_$name)")
    }.reduce(_ + _)
    ranked.withColumn("rrf_micro", fused)
  }

  /** RRF then keep the top `n` rows per partition by fused score
    * (id tie-break): adds `rank_final` (LONG). The row_number-≤-n filter
    * rewrites to WindowGroupLimit. */
  def rrfTopK(df: DataFrame, partCols: Seq[String], idCol: String,
      signals: Seq[(String, String, Boolean)], n: Int, k: Int = 60): DataFrame =
    rrf(df, partCols, idCol, signals, k)
      .withColumn("rank_final", row_number().over(
        Window.partitionBy(partCols.map(col): _*)
          .orderBy(col("rrf_micro").desc, col(idCol))).cast("long"))
      .filter(col("rank_final") <= n)

  /**
   * Hybrid retrieval fusion — the RRF form every hybrid search stack
   * runs (sparse BM25 list ⊕ dense embedding list; the standard recipe
   * popularized by Elasticsearch/Vespa/Weaviate hybrid modes, same
   * Cormack et al. arithmetic as [[rrf]]): fuse TWO per-query candidate
   * RANKINGS — `sparse` as (`query_id`, `doc_id`, `rank`), `dense` as
   * (`query_id`, `neighbor_id`, `rank`) — into one top-`n` per query.
   *
   * Unlike [[rrf]] (many signals on ONE row set), the two lists here
   * cover DIFFERENT candidate sets: a doc may appear in either or both.
   * RRF's contract for a missing entry is "contributes nothing", so each
   * side's contribution is `1_000_000 DIV (k0 + rank)` when present and
   * 0 when absent — kept as separate `sparse_micro` / `dense_micro`
   * columns (never NULL) so the fused score decomposes exactly and the
   * whole row replays in DuckDB integer arithmetic.
   *
   * Scale design: both inputs are ALREADY per-query top-k lists (≤ k
   * rows per query each — the expensive corpus-sized work lives in the
   * rankers, which carry their own scale contracts), so the full-outer
   * join and the final window touch O(queries × k) rows total; one hash
   * exchange on (`query_id`, `doc_id`), one on `query_id`, and the
   * rank-≤-n filter rewrites to WindowGroupLimit.
   */
  def hybridTopK(
      sparse: DataFrame, dense: DataFrame, n: Int, k0: Int = 60): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(k0 >= 0, s"k0 must be >= 0: $k0")
    val s = sparse.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      expr(s"1000000L DIV (${k0}L + CAST(rank AS BIGINT))").as("sparse_micro"))
    val d = dense.select(
      col("query_id").cast("long").as("query_id"),
      col("neighbor_id").cast("long").as("doc_id"),
      expr(s"1000000L DIV (${k0}L + CAST(rank AS BIGINT))").as("dense_micro"))
    s.join(d, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("sparse_micro"), lit(0L)).as("sparse_micro"),
        coalesce(col("dense_micro"), lit(0L)).as("dense_micro"))
      .withColumn("rrf_micro", col("sparse_micro") + col("dense_micro"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_micro").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= n)
  }
}
