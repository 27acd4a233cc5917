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

  test("tokenRarity: hand-computed frequencies, sums, and hapax flag") {
    // corpus tokens: the(3), cat(2), sat(1), zz(1)
    val df = Seq(
      (1L, "the cat sat"),
      (2L, "the the cat zz")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenRarity(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 1: n=3, sum = the(3)+cat(2)+sat(1) = 6, min = 1 (sat is hapax)
    assert(out(1L) == ((3L, 6L, 1L)), s"doc1: ${out(1L)}")
    // doc 2: n=4, sum = 3+3+2+1 = 9, min = 1 (zz)
    assert(out(2L) == ((4L, 9L, 1L)), s"doc2: ${out(2L)}")
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

  test("langId classifies continuous Chinese text (Han chars segment as tokens)") {
    // no separators anywhere — without per-character Han segmentation
    // the whole sentence is ONE token that hash-misses every marker and
    // the zh arm is dead on real Chinese input
    val df = Seq(
      (1L, "我的书在这里是不是很有意思"),
      (2L, "mixed 的是和 with english the and of to is with that for")
    ).toDF("doc_id", "text")
    val preds = TextAnalysis.langId(df, "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(preds(1L) == "zh", s"continuous Han text must classify zh: $preds")
    assert(preds(2L) == "en") // 8 en marker hits beat 3 zh hits
  }

  test("fused text_stats/lang_id kernels equal the composed HOF path on the fixture") {
    // the HOF formulations the kernels replaced, re-built inline as the
    // semantic reference — run over the REAL multilingual fixture plus
    // adversarial edge rows, then field-by-field compared
    val stopwords = TextAnalysis.stopwords
    val edge = Seq((9001L, ""), (9002L, "   "), (9003L, "一二三 的 foo!!"),
      (9004L, "Üben FÜR größer"), (9005L, "a\tb\ncd\fe\rf"),
      (9006L, "123 το 456"))
      .toDF("doc_id", "text")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).union(edge)

    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"), x => length(x) > 0)
    val hof = df.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long").as("ws_tokens"),
      size(toks).cast("long").as("n_tokens"),
      aggregate(toks, lit(0L), (acc, x) => acc + length(x)).as("sum_token_len"),
      length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("long").as("punct_chars"),
      size(filter(toks, x => x.isin(stopwords.map(lit(_)): _*))).cast("long").as("stopword_hits"))
    val fused = df.select(col("doc_id"),
      graft.functions.text_stats(col("text"), stopwords).as("st"))
      .select(col("doc_id"), col("st.*"))
    assert(fused.exceptAll(hof).isEmpty && hof.exceptAll(fused).isEmpty,
      fused.exceptAll(hof).limit(3).collect().mkString("; "))

    val ranked = TextAnalysis.langMarkers.keys.toSeq.sorted.zipWithIndex.toMap
    val scoredRanked = TextAnalysis.langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(
        size(filter(col("__ltoks"), x => x.isin(ms.map(lit(_)): _*))).as("hits"),
        lit(-ranked(lang)).as("negrank"),
        lit(lang).as("lang"))
    }
    val hofLang = df
      .withColumn("__ltoks",
        filter(split(lower(col("text")), "[^\\p{L}0-9]+"), x => length(x) > 0))
      .withColumn("__best", array_max(array(scoredRanked: _*)))
      .select(col("doc_id"),
        when(col("__best").getField("hits") <= 0, lit("und"))
          .otherwise(col("__best").getField("lang")).as("pred_lang"))
    val fusedLang = TextAnalysis.langId(df, "text").select("doc_id", "pred_lang")
    assert(fusedLang.exceptAll(hofLang).isEmpty && hofLang.exceptAll(fusedLang).isEmpty,
      fusedLang.exceptAll(hofLang).limit(3).collect().mkString("; "))
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

  test("normalize: lowercases, strips symbols, collapses and trims spaces") {
    val df = Seq(
      (1L, "  Hello,   WORLD!! (x2) "),
      (2L, "already clean"),
      (3L, "...!!!")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.normalize(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "hello world x2")
    assert(out(2L) == "already clean")
    assert(out(3L) == "")
  }

  test("vocabZipf: integer-exact log2 buckets") {
    // term counts: a×1 (bucket 1), b×2, c×3 (bucket 2), d×5 (bucket 3)
    val df = Seq((1L, "a b b c c c d d d d d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabZipf(df, "text")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 1L), (2L, 2L, 5L), (3L, 1L, 5L)))
  }

  test("langMixed: half-split detects code-switching whole-doc langid cannot") {
    val en = "the cat and the dog is with that for the win of it"    // en markers
    val de = "der hund und die katze ist mit der maus nicht da und"  // de markers
    val df = Seq(
      (1L, en + " " + de),      // half en / half de -> mixed
      (2L, en + " " + en),      // pure en -> not mixed
      (3L, "zzz qqq xxx vvv nnn mmm kkk jjj hhh ggg fff ddd")  // no markers -> und halves
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langMixed(df, "doc_id", "text")
      .select("doc_id", "lang_a", "lang_b", "mixed")
      .orderBy("doc_id")
      .as[(Long, String, String, Boolean)].collect()
    assert(out(0)._2 == "en" && out(0)._3 == "de" && out(0)._4, s"doc1: ${out(0)}")
    assert(out(1)._2 == "en" && out(1)._3 == "en" && !out(1)._4)
    assert(out(2)._2 == "und" && out(2)._3 == "und" && !out(2)._4,
      "unidentifiable halves must not count as mixed")
    // whole-doc langid on doc 1 sees a single language — the blind spot
    val whole = TextAnalysis.langId(df.filter($"doc_id" === 1L), "text")
      .select("pred_lang").as[String].head()
    assert(whole != "und", "whole-doc vote picks one dominant language")
  }

  test("gopherFilter: each rule trips on its planted violation, clean doc keeps") {
    val clean = "the quick brown fox jumps over the lazy dog and then it runs " +
      "to the river where it drinks water and rests in the shade of a tree"
    val df = Seq(
      (1L, clean),
      (2L, "too short for the gate"),                       // < 10 tokens
      (3L, "the " + "supercalifragilistic " * 30 + "and it is a"), // mean word len > 10
      (4L, clean + " !!! ??? *** ((( ))) &&& ^^^ %%% $$$ ### @@@ !!! ??? *** ((( )))" * 3), // punct
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"), // no stopwords
      (6L, "the cat sat here " * 20 + "and it is a big one") // repeated bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    assert(out(0) == ((1L, true, true, true, true, true, true)), s"clean: ${out(0)}")
    assert(!out(1)._2, "doc 2 must fail the token-count rule")
    assert(!out(2)._3, s"doc 3 must fail the word-length rule: ${out(2)}")
    assert(!out(3)._4, s"doc 4 must fail the punctuation rule: ${out(3)}")
    assert(!out(4)._5, "doc 5 must fail the stopword rule")
    assert(!out(5)._6, s"doc 6 must fail the repetition rule: ${out(5)}")
    // keep is the conjunction
    assert(out.forall(r => r._7 == (r._2 && r._3 && r._4 && r._5 && r._6)))
  }

  test("logit quality: feature extremes move the score the documented way") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it is a good day in the sun"), // stopword-rich prose
      (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),                // punctuation wall
      (3L, ""),                                                       // empty
      (4L, "a " * 1500)                                               // long, stopword-heavy
    ).toDF("doc_id", "text")
    val out = TextAnalysis.logitQuality(docs, "doc_id", "text")
      .select("doc_id", "score_p12", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 > byId(2L)._2, "prose must outscore punctuation soup")
    assert(byId(2L)._3 == false, "the punctuation wall must be rejected")
    assert(byId(1L)._3, "plain prose must survive the default threshold")
    // empty doc: every ratio guard hits 0, score is exactly the bias
    assert(byId(3L)._2 == 0L, s"empty doc score: ${byId(3L)._2}")
  }

  test("logit quality score is the exact integer dot product of its features") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val w = TextAnalysis.LogitWeights()
    val r = TextAnalysis.logitQuality(docs, "doc_id", "text").head()
    val score = r.getAs[Long]("len_frac_micro") * w.wLenFrac +
      r.getAs[Long]("mwl_micro") * w.wMeanWordLen +
      r.getAs[Long]("punct_micro") * w.wPunctRatio +
      r.getAs[Long]("stop_micro") * w.wStopwordRatio + w.biasP12
    assert(r.getAs[Long]("score_p12") == score)
    assert(r.getAs[Boolean]("keep") == (score >= w.thresholdP12))
  }

  test("logit quality honors custom weights and threshold") {
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val strict = TextAnalysis.LogitWeights(thresholdP12 = Long.MaxValue)
    val out = TextAnalysis.logitQuality(docs, "doc_id", "text", strict)
      .select("keep").as[Boolean].head()
    assert(!out, "nothing passes a MaxValue threshold")
  }

  test("trainLogit: separable labels learned to full agreement, loss strictly decreases") {
    // stopword-rich prose (label 1) vs stopword-free consonant strings
    // (label 0): linearly separable in the stop-ratio feature alone
    val prose = (0L until 40L).map(i =>
      (i, s"the cat and a dog of it is in the house to stay $i", 1))
    val junk = (40L until 80L).map(i =>
      (i, s"xzqv wrtk bbnm ddfg hjkl ppqq rrss ttvv wwxx yyzz $i", 0))
    val df = (prose ++ junk).toDF("doc_id", "text", "label")
    val (w, losses) = TextAnalysis.trainLogit(
      df, "doc_id", "text", "label", iters = 30, lr = 1.0)
    assert(w.length == 5)
    assert((1 until losses.length).forall(i => losses(i) < losses(i - 1)),
      s"loss not strictly decreasing: $losses")
    // stopword ratio must carry positive weight: it IS the signal
    assert(w(4) > 0, s"stop-ratio weight should be positive: $w")
    val agree = TextAnalysis.logitAgreement(df, "doc_id", "text", "label", w)
    assert(agree == 1.0, s"separable fixture should reach full agreement: $agree")
  }

  test("trainLogit rejects NULL labels loudly (sum would silently skip them)") {
    val df = Seq(
      (0L, "the and of to is it", Some(1)),
      (1L, "zzz qqq kkk", None),
      (2L, "the a an of words", Some(1))).toDF("doc_id", "text", "label")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.trainLogit(df, "doc_id", "text", "label", iters = 1)
    }
    assert(e.getMessage.contains("NULL label"))
  }

  test("trainLogit: returned weights score RAW features (standardization folded back)") {
    val df = Seq(
      (0L, "the and of to is it a an or in common words here", 1),
      (1L, "zzz qqq kkk vvv www", 0),
      (2L, "the a an of to in is it and or more prose text", 1),
      (3L, "xxyy zzww ppqq rrtt", 0)).toDF("doc_id", "text", "label")
    val (w, _) = TextAnalysis.trainLogit(df, "doc_id", "text", "label",
      iters = 20, lr = 1.0)
    // recompute z from RAW micro features and compare the decision with
    // logitAgreement's internal scoring: if the affine fold-back were
    // wrong, raw-feature scoring would not reproduce the fitted labels
    val agree = TextAnalysis.logitAgreement(df, "doc_id", "text", "label", w)
    assert(agree == 1.0, s"raw-feature scoring diverged from the fit: $agree")
  }

  test("token fertility: hand-computed counters and micro ratios") {
    val docs = Seq(
      (1L, "ab cd", "s1"),    // 2 ws words, 2 subwords, 5 chars
      (2L, "a,b", "s1"),      // 1 ws word, 2 subwords + 1 punct = 3, 3 chars
      (3L, "", "s2")          // empty: all zero
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.tokenFertility(docs, "source", "text")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    // s1: n_docs 2, subword 2+3=5, ws 2+1=3, chars 5+3=8
    assert(out.head == (("s1", 2L, 5L, 3L, 8L, 5L * 1000000L / 3L, 8L * 1000000L / 5L)), out.head)
    // s2: one empty doc — guarded ratios emit 0, not a divide error
    assert(out(1) == (("s2", 1L, 0L, 0L, 0L, 0L, 0L)), out(1))
  }

  test("extractHtmlText: scripts die with their contents, entities decode once") {
    val page = "<html><head><title>T</title>" +
      "<SCRIPT>var a = 1 < 2 && 3 > 2;</SCRIPT>" +
      "<style media=\"all\">p { x: 1 }</style></head>" +
      "<body><!-- c --><p>Hello &amp; welcome</p>" +
      "<div>A&#39;s &quot;quote&quot; &amp;lt;kept&amp;gt; &#160;x</div>" +
      "</body></html>"
    val got = Seq(page).toDF("h")
      .select(TextAnalysis.extractHtmlText(col("h")).as("t"))
      .as[String].collect().head
    // script/style contents gone (no "var", no "x: 1"); comment gone;
    // &amp;lt; decodes exactly once to the literal "&lt;"
    assert(got == "T Hello & welcome A's \"quote\" &lt;kept&gt; x", got)
  }

  test("extractHtmlText: malformed markup degrades to whitespace, not lost prose") {
    val got = Seq("<p>one<p>two <b attr>three</i> four <unclosed")
      .toDF("h").select(TextAnalysis.extractHtmlText(col("h")).as("t"))
      .as[String].collect().head
    // every prose token survives; the dangling "<unclosed" has no ">" so
    // it stays (a cleaning extractor must not eat text after a stray "<")
    assert(got == "one two three four <unclosed", got)
  }
}
