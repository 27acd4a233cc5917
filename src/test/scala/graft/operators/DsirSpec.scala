package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target slice: the "cat" domain; off-domain docs share NO token with
  // it (so target counts/contexts carry over to the raw model unchanged,
  // and the only cross-model difference for in-domain bigrams is the
  // BOS-context dilution — which works in the target model's favor)
  private def corpus = Seq(
    (1L, "the cat sat on the mat", "tgt"),
    (2L, "the cat ate the fish", "tgt"),
    (3L, "quarterly revenue grew nine percent", "web"),
    (4L, "markets rallied after earnings beat estimates", "web"),
    (5L, "senate passed a budget bill yesterday", "web"),
    (6L, "", "web") // zero-token doc
  ).toDF("doc_id", "text", "source")

  private def models = {
    val docs = corpus
    (Lm.trainBigram(docs.filter(col("source") === "tgt")),
      Lm.trainBigram(docs))
  }

  test("in-domain docs clear neutral, off-domain fall below, zero-token is 0") {
    val (t, r) = models
    val w = Dsir.importanceWeights(corpus, t, r)
      .select(col("doc_id"), col("weight_micro"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(w(1L) > 1000000L && w(2L) > 1000000L,
      s"in-domain text must clear the neutral ratio: $w")
    assert(w(3L) < 1000000L && w(4L) < 1000000L && w(5L) < 1000000L,
      s"off-domain text must fall below neutral: $w")
    assert(w(6L) == 0L, s"zero-token doc must carry weight 0: $w")
  }

  test("scores match the hand-computed shared-vocab formula on an OOV doc") {
    val (t, r) = models
    val v = Dsir.sharedVocab(t, r)
    // 4 bigrams: (<s>,zzz) has a SEEN context (every doc contributes a
    // BOS bigram; ctx_t=2 target docs, ctx_r=5 nonzero raw docs), the
    // other 3 have unseen contexts, landing on the shared uniform floor
    // 1e6 DIV (V+1) in BOTH models — equal by construction
    val oov = Seq((9L, "zzz yyy xxx www")).toDF("doc_id", "text")
    val row = Dsir.importanceWeights(oov, t, r)
      .select(col("score_target_micro"), col("score_raw_micro"),
        col("weight_micro")).head()
    val floor = 1000000L / (v + 1L)
    val expT = (1000000L / (2L + v + 1L) + 3L * floor) / 4L
    val expR = (1000000L / (5L + v + 1L) + 3L * floor) / 4L
    assert(row.getLong(0) == expT, s"target score drifted: $row, want $expT")
    assert(row.getLong(1) == expR, s"raw score drifted: $row, want $expR")
    assert(row.getLong(2) == expT * 1000000L / expR,
      s"weight must be the exact floor ratio: $row")
  }

  test("select gates on the threshold; topK is (weight DESC, id)-ordered") {
    val (t, r) = models
    val kept = Dsir.select(corpus, t, r, thresholdMicro = 1000000L)
      .filter(col("keep")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"kept: $kept")
    val top = Dsir.topK(corpus, t, r, k = 3)
      .select(col("doc_id"), col("weight_micro")).collect()
    val ws = top.map(_.getLong(1)).toSeq
    assert(ws == ws.sortBy(-_), s"topK not weight-descending: ${ws.toList}")
    assert(top.length == 3 && top.take(2).map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}
