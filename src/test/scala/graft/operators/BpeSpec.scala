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
