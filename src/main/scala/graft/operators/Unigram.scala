package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram-LM tokenizer training (Kudo, "Subword Regularization", ACL
 * 2018 — the SentencePiece default) — the multilingual-tokenizer
 * counterpart of [[Bpe]]: instead of growing a vocabulary bottom-up by
 * merges, seed a LARGE candidate set, fit piece probabilities by EM,
 * and prune to the target size; encoding is then a Viterbi min-cost
 * segmentation instead of a merge replay. Having BOTH trainable
 * families is what makes the fertility monitor
 * ([[TextAnalysis.tokenFertility]]) a comparison instrument rather
 * than a single-tokenizer readout.
 *
 * Scale shape (the [[Bpe.trainMerges]] contract): the corpus collapses
 * to (word, count) once — the ONLY corpus-sized shuffle; seeding is a
 * substring explosion of the VOCABULARY (|words| × maxPieceLen²
 * candidates through one hash aggregate); each EM round is one Viterbi
 * pass over the word table with the current model broadcast inside the
 * codegen'd [[graft.functions.UnigramSegment]] kernel, reduced to
 * piece counts. Driver state is the candidate set itself — bounded by
 * `seedMultiplier × vocabSize + |alphabet|`, a parameter, never data.
 *
 * Fixed-point discipline ([[Lm]]): counts stay integers end-to-end;
 * the ONE float step per round is the per-piece quantization
 * cost = −⌊10⁶ · ln(c / total)⌉ computed with `StrictMath.log`
 * (bit-identical on every JVM), after which Viterbi comparisons are
 * pure integer sums — training and encoding are deterministic
 * functions of (corpus content, params) on any cluster layout.
 *
 * EM here is HARD (Viterbi) EM — each round recounts pieces from the
 * current best segmentations, the documented simplification of Kudo's
 * forward-backward E-step: deterministic, integer-exact, and the same
 * fixed point a production trainer converges toward on these corpora.
 * Single-character pieces are never pruned (full coverage — every word
 * always segments), matching SentencePiece's character-coverage floor.
 */
object Unigram {

  /** Cost of an out-of-vocabulary single character (e⁻⁴⁰ ≈ 4·10⁻¹⁸ —
    * below any real piece at any corpus size, so the fallback never
    * outbids trained pieces; it exists so the kernel totally segments
    * unseen text instead of failing). */
  val UnkCostMicro = 40000000L

  /** Trained vocabulary entry: Viterbi-count and quantized micro-cost. */
  final case class Piece(piece: String, count: Long, costMicro: Long)

  private def quantize(counts: Seq[(String, Long)]): Seq[Piece] = {
    val total = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) =>
      // clamp to >= 1: a piece holding the whole mass (degenerate
      // one-token corpus) has ln(1) = 0, and a zero micro-cost would
      // both violate the positive-cost contract (unigram_vocab's
      // model_wellformed gate) and make Viterbi insertion of the piece
      // free; 1 micro-nat keeps it strictly positive and cheapest
      Piece(p, c,
        math.max(1L, -Math.round(1e6 * StrictMath.log(c.toDouble / total))))
    }
  }

  /**
   * Train a unigram vocabulary over the corpus.
   *
   * @return the pruned vocabulary, rank-ordered (count desc, piece asc)
   *         — bounded model state the apply kernels broadcast.
   */
  def trainVocab(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 6,
      emIters: Int = 2,
      seedMultiplier: Int = 4,
      unicode: Boolean = false): Seq[Piece] = {
    require(vocabSize >= 2, s"vocabSize must be >= 2: $vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2: $maxPieceLen")
    require(emIters >= 1, s"emIters must be >= 1: $emIters")
    val words = org.apache.spark.sql.graftbridge.CatalystBridge.flattenPlan(
      df.select(explode(Dedup.tokensMode(col(textCol), unicode)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))).persist()
    try {
      // seed: every substring of every word up to maxPieceLen, frequency-
      // weighted by word count (multiplicity included) — one vocabulary-
      // sized aggregate, collected only AFTER the top-N cut
      val subs = words.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(i, least(i + ${maxPieceLen - 1}, length(w))),
           |    j -> substring(w, i, j - i + 1))))""".stripMargin)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
      val singles = subs.filter(length(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      require(singles.nonEmpty, "empty corpus — nothing to train on")
      val seedMultis = subs.filter(length(col("piece")) > 1)
        // Kudo's seed score: frequency × length (favor long covers)
        .orderBy((col("freq") * length(col("piece"))).desc, col("piece").asc)
        .limit(seedMultiplier * vocabSize)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      var model = quantize(singles ++ seedMultis)

      // hard-EM rounds: Viterbi-recount every piece over the word table
      // (model broadcast inside the kernel), drop multi-char pieces the
      // best segmentations no longer use, requantize
      for (_ <- 1 to emIters) {
        val counted = words.select(col("cnt"),
            explode(graft.functions.unigram_segment(col("w"),
              model.map(p => (p.piece, p.costMicro)), maxPieceLen,
              UnkCostMicro)).as("piece"))
          .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        model = quantize(
          singles.map { case (p, _) => (p, math.max(counted.getOrElse(p, 0L), 1L)) } ++
            model.filter(p => p.piece.length > 1)
              .flatMap(p => counted.get(p.piece).filter(_ > 0).map((p.piece, _))))
      }

      // prune to the target size: singles are the coverage floor, the
      // best-used multis fill the rest; requantize over the keepers
      val (s1, m1) = model.partition(_.piece.length == 1)
      val kept = s1 ++ m1.sortBy(p => (-p.count, p.piece))
        .take(math.max(vocabSize - s1.length, 0))
      quantize(kept.map(p => (p.piece, p.count)))
        .sortBy(p => (-p.count, p.piece))
    } finally { words.unpersist(); () }
  }

  /**
   * The APPLY side — per-document Viterbi token count under a trained
   * vocabulary, ONE corpus pass with the codegen'd
   * [[graft.functions.UnigramTokenCount]] kernel (vocab broadcast
   * inside the expression; no join, no corpus shuffle) — the
   * [[Bpe.encodeTokenCounts]] twin for the unigram family.
   */
  def encodeTokenCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[Piece],
      maxPieceLen: Int = 6,
      unicode: Boolean = false): DataFrame =
    df.select(col(idCol),
      graft.functions.unigram_token_count(col(textCol),
        vocab.map(p => (p.piece, p.costMicro)), maxPieceLen, UnkCostMicro,
        unicode)
        .as("n_unigram_tokens"))
}
