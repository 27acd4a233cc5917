package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LmSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("trainBigram counts BOS-prefixed bigrams and the reference vocab") {
    val ref = docsDf(1L -> "a b a b", 2L -> "a b")
    val m = Lm.trainBigram(ref)
    val big = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc1: (<s>,a)(a,b)(b,a)(a,b)  doc2: (<s>,a)(a,b)
    assert(big == Map(
      ("<s>", "a") -> 2L, ("a", "b") -> 3L, ("b", "a") -> 1L))
    val ctx = m.contexts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ctx == Map("<s>" -> 2L, "a" -> 3L, "b" -> 1L))
    assert(m.vocab == 2L)
    graft.CacheScope.releaseAll()
  }

  test("scoreDocs: hand-computed micro scores, OOV floor, zero-token doc") {
    val ref = docsDf(1L -> "a b a b", 2L -> "a b")
    val m = Lm.trainBigram(ref)
    // V = 2 → denominators ctx_n + 3
    //   seen doc "a b":   p(<s>,a) = 3*1e6 DIV 5 = 600000
    //                     p(a,b)   = 4*1e6 DIV 6 = 666666  → mean 633333
    //   oov  doc "zz":    p(<s>,zz)= 1*1e6 DIV 5 = 200000
    //   unseen ctx "q q": p(<s>,q) = 200000; p(q,q) = 1e6 DIV 3 = 333333
    val scored = Lm.scoreDocs(
      docsDf(10L -> "a b", 11L -> "zz", 12L -> "q q", 13L -> ""), m)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(scored(10L) == ((2L, 1266666L, 633333L)))
    assert(scored(11L) == ((1L, 200000L, 200000L)))
    assert(scored(12L) == ((2L, 533333L, 266666L)))
    // zero-token docs survive the left join at score 0
    assert(scored(13L) == ((0L, 0L, 0L)))
    graft.CacheScope.releaseAll()
  }

  test("likelihoodFilter separates reference-like text from OOV noise") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val ref = docs.filter(col("source") === "src0")
    val out = Lm.likelihoodFilter(
      docs.select(col("doc_id"), col("text"))
        .unionByName(docsDf(-1L -> "xyzzy plugh qwerty azerty")),
      ref, thresholdMicro = 32000L)
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    // pure-OOV noise lands on the uniform floor 1e6/(V+1) = 31250 — below
    // every in-distribution doc's reach of frequent reference bigrams
    assert(!byId(-1L).getBoolean(4), "OOV noise doc must be filtered")
    val kept = out.filter(col("keep")).count()
    assert(kept > 0 && kept < out.count(), "threshold must separate")
    graft.CacheScope.releaseAll()
  }
}
