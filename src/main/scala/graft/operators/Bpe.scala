package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge training (Sennrich, Haddow, Birch, "Neural
 * Machine Translation of Rare Words with Subword Units", ACL 2016) —
 * the tokenizer-training step of a pretraining data pipeline, run over
 * the corpus the pipeline just assembled.
 *
 * Word-level BPE: the corpus collapses to (word, count) once — the ONLY
 * corpus-sized shuffle; at 100 TB the vocabulary aggregate is what the
 * exchange carries, not text. Each merge round then (1) counts adjacent
 * symbol pairs weighted by word count, (2) picks the most frequent pair
 * (ties break lexicographically — fully deterministic), (3) rewrites the
 * symbol arrays. Rounds operate on VOCABULARY-sized data kept in a
 * persisted flat plan (the CC loop's materialize discipline — plan trees
 * otherwise grow per round); the argmax collects a single row per round.
 *
 * One honest caveat, documented rather than hidden: production BPE runs
 * tens of thousands of merges; a driver round per merge is fine for the
 * hundreds-of-merges regime, and the standard scale-out (batching
 * non-overlapping merges per round) changes step 3's rewrite rule, not
 * the data layout.
 */
object Bpe {

  /**
   * @return the merge table, in order: (`rank`, `left`, `right`,
   *         `pair_count`) — rank 1 is the first (most frequent) merge.
   */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      unicode: Boolean = false): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    val spark = df.sparkSession
    import spark.implicits._

    def materialize(d: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.CatalystBridge.flattenPlan(d).persist()

    // corpus → (syms: array<string> of characters, cnt) — vocabulary-sized
    var words = materialize(
      df.select(explode(Dedup.tokensMode(col(textCol), unicode)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .select(split(col("w"), "").as("syms"), col("cnt")))

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // adjacent pairs weighted by word count; vocabulary-sized aggregate
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(
          zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((rank, l, r, n))
        // rewrite: fold each symbol array, left-to-right greedy merge of
        // (l, r) — an interpreted HOF, acceptable here because it runs
        // over the vocabulary, not the corpus
        val merged = aggregate(
          col("syms"),
          array().cast("array<string>"),
          (acc, cur) => when(
            size(acc) >= 1 &&
              element_at(acc, -1) === lit(l) && cur === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(concat(lit(l), lit(r))))
          ).otherwise(concat(acc, array(cur))))
        val next = materialize(words.select(merged.as("syms"), col("cnt")))
        words.unpersist()
        words = next
        rank += 1
      }
    }
    words.unpersist()
    merges.result()
      .toDF("rank", "left", "right", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("left"), col("right"),
        col("pair_count"))
  }

  /**
   * The APPLY side: per-document token count under a trained merge
   * table — train once ([[trainMerges]] or a persisted table), encode
   * in ONE corpus pass with the codegen'd `bpe_token_count` kernel
   * (merges ride inside the expression as broadcast model state; no
   * join, no corpus shuffle). This is the pass a pretraining pipeline
   * runs to budget documents in REAL tokenizer tokens instead of
   * whitespace words.
   *
   * @param merges rank-ordered (left, right) pairs
   * @return (`<idCol>`, `n_bpe_tokens`)
   */
  def encodeTokenCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      unicode: Boolean = false): DataFrame =
    df.select(col(idCol),
      graft.functions.bpe_token_count(col(textCol), merges, unicode)
        .as("n_bpe_tokens"))
}
