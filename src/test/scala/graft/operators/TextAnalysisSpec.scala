package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and subwordCount on known strings") {
    val df = Seq((1L, "Hello, world! This is four... no, five"), (2L, ""), (3L, "  "))
      .toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.tokenCount(col("text")).as("tc"),
      TextAnalysis.subwordCount(col("text")).as("sc"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == 7) // whitespace tokens
    assert(out(1L)._2 == 7 + 6) // 7 word runs + , ! . . . , punctuation marks
    assert(out(2L)._1 == 0 && out(3L)._1 == 0)
  }

  test("quality metrics: ratios on a constructed doc") {
    val df = Seq((1L, "the cat!!")).toDF("doc_id", "text")
    val m = TextAnalysis.qualityMetrics(df, "text").head()
    assert(m.getAs[Long]("n_chars_m") == 9)
    assert(m.getAs[Long]("n_tokens") == 2)
    assert(m.getAs[Double]("mean_word_len") == 3.0) // (3+3)/2... "the","cat"
    assert(math.abs(m.getAs[Double]("punct_ratio") - 2.0 / 9.0) < 1e-15)
    assert(m.getAs[Double]("stopword_ratio") == 0.5) // "the" of 2
  }

  test("langId identifies obvious languages, und for gibberish") {
    val df = Seq(
      (1L, "the cat and the dog went to the park with friends"),
      (2L, "der Hund und die Katze sind nicht mit der Maus"),
      (3L, "el perro y la casa con los amigos para que"),
      (4L, "xyzzy qwerty plugh")
    ).toDF("doc_id", "text")
    val preds = TextAnalysis.langId(df, "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "de")
    assert(preds(3L) == "es")
    assert(preds(4L) == "und")
  }

  test("fingerprint is case/whitespace invariant, content sensitive") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "hello worlds"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df, "text")
      .select("doc_id", "fp").as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("tokenFrequency top-n with deterministic tie-break") {
    val df = Seq((1L, "b a b c a b")).toDF("doc_id", "text")
    val top = TextAnalysis.tokenFrequency(df, "text", topN = 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }
}
