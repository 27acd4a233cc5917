package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NgramsSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: sliding grams, NULL (not shortened) incomplete tails") {
    val df = Seq((1L, "Alpha, beta GAMMA delta")).toDF("doc_id", "text")
    val rows = Ngrams.wordNgrams(df, "doc_id", "text", 3)
      .select("pos", "ngram").as[(Int, String)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq(
      "alpha beta gamma", "beta gamma delta", null, null),
      "tail positions must be NULL — a concat_ws formulation would emit " +
        "shortened grams there instead")
  }

  test("decontaminate: planted shared n-gram is flagged with its hit count") {
    val df = Seq(
      (0L, "the quick brown fox jumps high"),          // benchmark (id % 97 == 0)
      (1L, "look the quick brown fox runs"),           // shares "the quick brown" + "quick brown fox"
      (2L, "completely unrelated words entirely here"),
      (97L, "another benchmark document text")         // benchmark
    ).toDF("doc_id", "text")
    val out = Ngrams.decontaminate(df, "doc_id", "text",
      benchmarkPred = col("doc_id") % 97 === 0, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L),
      s"expected only doc 1 flagged with 2 shared 3-grams, got $out")
  }

  test("repetitionStats: repeated bigram dominates the count") {
    val df = Seq(
      (1L, "spam spam spam spam eggs"),   // bigram "spam spam" ×3, 4 bigrams total
      (2L, "all words differ here")
    ).toDF("doc_id", "text")
    val out = Ngrams.repetitionStats(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((3L, 4L)))
    assert(out(2L) == ((1L, 3L)))
  }

  test("topTermsByTfDf: rare frequent terms outrank common ones, ties on term") {
    val df = Seq(
      (1L, "zebra zebra zebra the the"),  // zebra: tf 3 df 1 → 3e6; the: tf 2 df 2 → 1e6
      (2L, "the lion")                    // lion: tf 1 df 1 → 1e6; the: tf 1 df 2 → 5e5
    ).toDF("doc_id", "text")
    val out = Ngrams.topTermsByTfDf(df, "doc_id", "text", k = 2)
      .select("doc_id", "rnk", "term", "score")
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 1L, "zebra", 3000000L),
      (1L, 2L, "the", 1000000L),
      (2L, 1L, "lion", 1000000L),
      (2L, 2L, "the", 500000L)))
  }
}
