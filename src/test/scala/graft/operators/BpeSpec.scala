package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges reproduces the hand-computed merge sequence, stops when exhausted") {
    // words: aaab ×3, ab ×1
    //   round 1: (a,a) 6 beats (a,b) 4            → merge (a,a)
    //   round 2: (a,b) 3+1=4 beats (aa,a) 3       → merge (a,b)
    //   round 3: only (aa,ab) 3 remains           → merge (aa,ab)
    //   round 4: every word is one symbol         → exhausted early
    val df = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(df, "text", numMerges = 5)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "a", 6L),
      (2L, "a", "b", 4L),
      (3L, "aa", "ab", 3L)), s"got $got")
  }

  test("encodeTokenCounts applies merges by rank: hand-computed counts") {
    import graft.functions.BpeKernel
    import graft.functions.BpeModel
    // "banana" with merges [(a,n)]: b a n a n a → b an an a = 4 tokens;
    // adding (an,a): b an an a → b an ana = 3 tokens
    assert(BpeKernel.encodeWordCount("banana", new BpeModel(Seq("a" -> "n"))) == 4)
    assert(BpeKernel.encodeWordCount("banana",
      new BpeModel(Seq("a" -> "n", "an" -> "a"))) == 3)
    // no applicable merge: one token per char
    assert(BpeKernel.encodeWordCount("xyz", new BpeModel(Seq("a" -> "n"))) == 3)
    // column level: tokenization folds case/punct like training's tokens()
    val df = Seq((1L, "Banana, banana!"), (2L, "xy")).toDF("doc_id", "text")
    val out = Bpe.encodeTokenCounts(df, "doc_id", "text", Seq("a" -> "n", "an" -> "a"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 6, 2L -> 2), s"got $out")
  }

  test("train-then-encode: merged tokens never exceed character count, shrink with merges") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(30)
    val merges = Bpe.trainMerges(docs, "text", numMerges = 8)
      .as[(Long, String, String, Long)].collect()
      .map(t => (t._2, t._3)).toSeq
    val withM = Bpe.encodeTokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Int)].collect().toMap
    val noM = Bpe.encodeTokenCounts(docs, "doc_id", "text", Seq.empty)
      .as[(Long, Int)].collect().toMap
    assert(withM.keySet == noM.keySet)
    // zero merges = character count; trained merges strictly help somewhere
    assert(withM.forall { case (id, n) => n <= noM(id) })
    assert(withM.exists { case (id, n) => n < noM(id) })
  }

  test("trainMerges is deterministic on fixture text and ties break lexicographically") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val a = Bpe.trainMerges(docs, "text", numMerges = 5)
      .as[(Long, String, String, Long)].collect().toSeq
    val b = Bpe.trainMerges(docs, "text", numMerges = 5)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(a == b && a.length == 5)
    // counts are non-increasing: a later merge can never beat an earlier one
    assert(a.map(_._4).sliding(2).forall { case Seq(x, y) => x >= y case _ => true })
  }
}
