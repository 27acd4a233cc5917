package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two lexical contracts, pinned against each other:
  *  - ASCII mode (`Dedup.tokens`) maps non-Latin scripts to ZERO tokens —
  *    the documented legacy behavior, now an explicit mode;
  *  - Unicode mode (`Dedup.tokensUnicode` + the `unicode = true` kernel
  *    modes) tokenizes every script, with Han/Hiragana/Katakana as
  *    single-character tokens.
  * The fused kernels must agree bit-for-bit with the HOF column forms —
  * same discipline as the ASCII minhash/text_stats parity specs. */
class UnicodeTokensSpec extends SparkSpec {
  import spark.implicits._

  private val mixed = Seq(
    (1L, "Hello 世界 WORLD 123"),
    (2L, "中文网页的质量很高"),
    (3L, "Русский Текст Москва"),
    (4L, "日本語のテキストです"),
    (5L, "मराठी भाषा देवनागरी १२३"),
    (6L, "مرحبا بالعالم الكبير"),
    (7L, "mixed中文inside한국어"),
    (8L, "Ångström café naïve"),
    (9L, "the quick brown fox and a dog in it"),
    (10L, "")
  ).toDF("doc_id", "text")

  test("ASCII contract pinned: non-Latin scripts tokenize to ZERO tokens") {
    val n = mixed.select(col("doc_id"),
      size(Dedup.tokens(col("text"))).as("n")).as[(Long, Int)].collect().toMap
    // pure CJK / Cyrillic / Devanagari / Arabic: zero ASCII tokens — the
    // documented auto-no-op this mode has on multilingual corpora
    assert(n(2L) == 0 && n(3L) == 0 && n(4L) == 0 && n(6L) == 0, s"got $n")
    assert(n(5L) == 0)
    // mixed docs keep only their Latin runs
    assert(n(1L) == 3) // hello, world, 123
    assert(n(7L) == 2) // mixed, inside
    assert(n(9L) == 9)
  }

  test("tokensUnicode: per-script expectations (the tri-engine-verified set)") {
    val t = mixed.select(col("doc_id"), Dedup.tokensUnicode(col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(t(1L) == Seq("hello", "世", "界", "world", "123"))
    assert(t(2L) == "中文网页的质量很高".map(_.toString))
    assert(t(3L) == Seq("русский", "текст", "москва"))
    assert(t(4L) == Seq("日", "本", "語", "の", "テ", "キ", "ス", "ト", "で", "す"))
    assert(t(5L) == Seq("मराठी", "भाषा", "देवनागरी", "१२३")) // marks + Nd digits
    assert(t(6L) == Seq("مرحبا", "بالعالم", "الكبير"))
    assert(t(7L) == Seq("mixed", "中", "文", "inside한국어")) // Hangul: run, not per-char
    assert(t(8L) == Seq("ångström", "café", "naïve"))
    assert(t(10L) == Seq.empty)
    // ASCII text tokenizes identically under both contracts
    val both = mixed.filter(col("doc_id") === 9L).select(
      Dedup.tokens(col("text")).as("a"), Dedup.tokensUnicode(col("text")).as("u"))
      .as[(Seq[String], Seq[String])].head()
    assert(both._1 == both._2)
  }

  test("fused unicode kernels == HOF forms (minhash, shingle set size, text_stats)") {
    import graft.functions.{minhash_signature, minhash_text, shingle_hash_set, text_stats}
    val rows = mixed.filter(length(col("text")) > 0).select(
      minhash_text(col("text"), 3, 64, 42L, unicode = true).as("fast"),
      minhash_signature(
        Dedup.shingles(Dedup.tokensUnicodeHof(col("text")), 3), 64, 42L).as("slow"),
      size(shingle_hash_set(col("text"), 3, unicode = true)).as("nsh"),
      size(array_distinct(
        Dedup.shingles(Dedup.tokensUnicodeHof(col("text")), 3))).as("nsh_hof"),
      text_stats(col("text"), TextAnalysis.stopwords, unicode = true).as("st"),
      size(Dedup.tokensUnicodeHof(col("text"))).as("nt_hof"),
      aggregate(Dedup.tokensUnicodeHof(col("text")), lit(0L),
        (acc, x) => acc + length(x).cast("long")).as("stl_hof")
    ).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "minhash kernel != HOF")
      assert(r.getInt(2) == r.getInt(3), "shingle set size kernel != HOF")
      val st = r.getStruct(4)
      assert(st.getLong(st.fieldIndex("n_tokens")) == r.getInt(5).toLong,
        "text_stats n_tokens != tokensUnicode size")
      assert(st.getLong(st.fieldIndex("sum_token_len")) == r.getLong(6),
        "text_stats sum_token_len != HOF codepoint sum")
    }
  }

  test("token_rows / bigram_rows generators == HOF forms, both contracts") {
    import graft.functions.{bigram_rows, token_rows}
    // the r19 fused tokenize-and-explode generators must emit exactly
    // the rows of the composed forms they replaced, token for token,
    // under BOTH lexical contracts (incl. the empty doc -> zero rows)
    Seq(false, true).foreach { uni =>
      val viaGen = mixed.select(col("doc_id"),
        token_rows(col("text"), uni).as(Seq("pos", "tok")))
        .as[(Long, Int, String)].collect().toSeq.sorted
      val viaHof = mixed.select((col("doc_id") +:
        Seq(posexplode(Dedup.tokensModeHof(col("text"), uni)))): _*)
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
        .as[(Long, Int, String)].collect().toSeq.sorted
      assert(viaGen == viaHof, s"token_rows(unicode=$uni) drifted from HOF")
      val bgGen = mixed.select(col("doc_id"),
        bigram_rows(col("text"), uni, Lm.Bos).as(Seq("prev", "tok")))
        .as[(Long, String, String)].collect().toSeq.sorted
      val toks = Dedup.tokensModeHof(col("text"), uni)
      val bgHof = mixed.select(col("doc_id"), explode(transform(toks, (t, i) =>
        struct(when(i === 0, lit(Lm.Bos)).otherwise(element_at(toks, i)).as("prev"),
          t.as("tok")))).as("p"))
        .select(col("doc_id"), col("p.prev"), col("p.tok"))
        .as[(Long, String, String)].collect().toSeq.sorted
      assert(bgGen == bgHof, s"bigram_rows(unicode=$uni) drifted from HOF")
    }
  }

  test("tokens_array / token_count kernels == HOF forms, both contracts") {
    import graft.functions.token_count
    // r19: Dedup.tokens/tokensUnicode now EVALUATE through the fused
    // tokens_array kernel; the definitional HOF recipes survive as the
    // *Hof twins. This is the direct bit-for-bit pin between the two,
    // values AND order AND multiplicity, over the mixed-script fixture.
    Seq(false, true).foreach { uni =>
      val rows = mixed.select(col("doc_id"),
        Dedup.tokensMode(col("text"), uni).as("fast"),
        Dedup.tokensModeHof(col("text"), uni).as("slow"),
        token_count(col("text"), uni).as("nc"))
        .as[(Long, Seq[String], Seq[String], Int)].collect()
      rows.foreach { case (id, fast, slow, nc) =>
        assert(fast == slow, s"tokens_array(unicode=$uni) drifted on doc $id")
        assert(nc == slow.size, s"token_count(unicode=$uni) drifted on doc $id")
      }
    }
  }

  test("remove_spans kernel == HOF exists() chain (overlapping/unordered/empty intervals)") {
    // interval lists per doc: unordered, overlapping, touching, empty,
    // out-of-range — the kernel's sorted sweep must keep EXACTLY the
    // tokens the interpreted exists() form kept, and join them the same
    val ivCases: Map[Long, Seq[(Int, Int)]] = Map(
      1L -> Seq((2, 3), (1, 1)),            // unordered, adjacent
      2L -> Seq((3, 6), (5, 8), (1, 2)),    // overlapping
      3L -> Seq((1, 50)),                   // covers everything
      4L -> Seq.empty,                      // no-op
      5L -> Seq((2, 2), (2, 2), (4, 4)),    // duplicates
      6L -> Seq((-3, 2), (3, 3)),           // negative s0: covers 1..2 (r20)
      7L -> Seq((40, 60)),                  // fully out of range
      8L -> Seq((2, -1), (-5, -2)),         // negative e0: both no-ops (r20)
      9L -> Seq((2, 4), (7, 7), (3, 5))
    )
    val ivsDf = ivCases.toSeq.flatMap { case (id, ivs) => ivs.map(iv => (id, iv._1, iv._2)) }
      .toDF("doc_id", "s0", "e0")
      .groupBy("doc_id").agg(collect_list(struct(col("s0"), col("e0"))).as("__ivs"))
    Seq(false, true).foreach { uni =>
      val joined = mixed.join(ivsDf, Seq("doc_id"), "left")
        .withColumn("__iv", coalesce(col("__ivs"),
          array().cast("array<struct<s0:int,e0:int>>")))
      val toks = Dedup.tokensModeHof(col("text"), uni)
      val kept = filter(toks, (t, i) =>
        !exists(col("__iv"), iv =>
          (i + 1) >= iv.getField("s0") && (i + 1) <= iv.getField("e0")))
      val rows = joined.select(col("doc_id"),
        graft.functions.remove_spans(col("text"), col("__iv"), uni).as("rs"),
        array_join(kept, " ").as("clean_hof"),
        size(toks).as("nt_hof"), size(kept).as("nk_hof"))
        .collect()
      rows.foreach { r =>
        val rs = r.getStruct(1)
        assert(rs.getString(0) == r.getString(2),
          s"remove_spans(unicode=$uni) text drifted on doc ${r.getLong(0)}: " +
            s"'${rs.getString(0)}' vs '${r.getString(2)}'")
        assert(rs.getInt(1) == r.getInt(3) && rs.getInt(2) == r.getInt(4),
          s"remove_spans(unicode=$uni) counts drifted on doc ${r.getLong(0)}")
      }
    }
  }

  test("remove_spans: NULL interval element is skipped as a no-op (r20)") {
    // a hand-built array literal can carry a null interval (the
    // collect_list producer never emits one); the kernel skips it
    // instead of throwing — the result equals the same list without it
    val iv = struct(lit(2).as("s0"), lit(3).as("e0"))
    val nullIv = lit(null).cast("struct<s0:int,e0:int>")
    Seq(false, true).foreach { uni =>
      val r = mixed.filter(col("doc_id") === 9L).select(
        graft.functions.remove_spans(col("text"), array(iv, nullIv), uni).as("a"),
        graft.functions.remove_spans(col("text"), array(iv), uni).as("b"))
        .head()
      assert(r.getStruct(0) == r.getStruct(1),
        s"null interval element (unicode=$uni) was not a no-op")
    }
  }

  test("statsRowUnicode counters: CJK is tokens, not punctuation") {
    import graft.functions.text_stats
    val st = Seq(("中文 hello!", 1)).toDF("text", "i")
      .select(text_stats(col("text"), TextAnalysis.stopwords, unicode = true).as("st"))
      .head().getStruct(0)
    assert(st.getLong(st.fieldIndex("n_chars")) == 9L)       // codepoints
    assert(st.getLong(st.fieldIndex("n_tokens")) == 3L)      // 中, 文, hello
    assert(st.getLong(st.fieldIndex("sum_token_len")) == 7L) // 1 + 1 + 5
    assert(st.getLong(st.fieldIndex("punct_chars")) == 1L)   // just '!'
    assert(st.getLong(st.fieldIndex("ws_tokens")) == 2L)
  }

  test("unicode LSH finds a planted CJK near-dup; ASCII mode cannot even tell CJK docs apart") {
    import graft.functions.minhash_text
    // two long CJK docs differing in ONE char (near-dups), plus an
    // unrelated CJK doc
    val a = "机器学习模型的训练数据质量决定了下游任务的表现和泛化能力水平"
    val b = a.dropRight(1) + "极" // last char changed
    val c = "今天天气晴朗适合出门散步晒太阳呼吸新鲜空气放松心情看看风景"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
      numHashes = 64, bands = 16, threshold = 0.5, unicode = true)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted CJK near-dup missed: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated CJK docs collided in unicode mode: $pairs")
    // ASCII mode: every pure-CJK doc tokenizes to zero tokens, so ALL
    // of them share one degenerate signature — unrelated docs included.
    // This is the documented failure unicode mode exists to fix.
    val sigs = docs.select(minhash_text(col("text"), 3, 64, 42L).as("s"))
      .as[Seq[Long]].collect()
    assert(sigs.distinct.size == 1, "expected one degenerate ASCII signature")
  }

  test("BM25 unicode mode retrieves by CJK character terms; ASCII mode returns nothing") {
    val docs = Seq(
      (1L, "机器学习模型训练 machine learning models"),
      (2L, "天气晴朗出门散步 sunny weather walking"),
      (3L, "plain english document about nothing else")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "学"), (1L, "习")).toDF("query_id", "term")
    val uni = Retrieval.bm25TopK(docs, "doc_id", "text", queries, k = 3,
      unicode = true)
      .select("doc_id").as[Long].collect().toSeq
    assert(uni == Seq(1L), s"got $uni") // only doc 1 contains 学/习
    val ascii = Retrieval.bm25TopK(docs, "doc_id", "text", queries, k = 3)
    assert(ascii.isEmpty, "ASCII mode should have no CJK postings at all")
  }

  test("LM gate unicode mode: non-Latin docs score instead of auto-rejecting at 0") {
    // ref slice and scored docs are Cyrillic; under the ASCII contract
    // every doc has zero tokens -> zero bigrams -> score 0 (auto-reject)
    val ref = Seq.tabulate(20)(i =>
      (i.toLong, "русский текст для обучения модели качества"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (100L, "русский текст для обучения модели качества"), // reference-like
      (101L, "совсем другие слова никак не похожие на корпус")
    ).toDF("doc_id", "text")
    val ascii = Lm.scoreDocs(probe, Lm.trainBigram(ref), "doc_id", "text")
      .select("score_micro").as[Long].collect()
    assert(ascii.forall(_ == 0L), "ASCII mode should zero-score Cyrillic")
    val uni = Lm.scoreDocs(probe,
      Lm.trainBigram(ref, unicode = true), "doc_id", "text", unicode = true)
      .select(col("doc_id"), col("score_micro")).as[(Long, Long)].collect().toMap
    assert(uni(100L) > uni(101L) && uni(100L) > 0L,
      s"reference-like doc must outscore the off-corpus one: $uni")
  }

  test("BPE + unigram training and encoding work on Cyrillic under unicode mode") {
    val docs = Seq.tabulate(30)(i => (i.toLong, "привет мир привет спарк"))
      .toDF("doc_id", "text")
    // ASCII contract: zero words -> loud failure or empty model
    assertThrows[Exception](Unigram.trainVocab(docs, "text", vocabSize = 16))
    val vocab = Unigram.trainVocab(docs, "text", vocabSize = 32, unicode = true)
    assert(vocab.map(_.piece).toSet.contains("привет"), s"got ${vocab.map(_.piece)}")
    val n = Unigram.encodeTokenCounts(docs, "doc_id", "text", vocab,
      unicode = true).select("n_unigram_tokens").as[Int].head()
    assert(n == 4, s"4 whole-word tokens expected, got $n")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 12, unicode = true)
      .select("left", "right").as[(String, String)].collect()
    assert(merges.nonEmpty, "no Cyrillic merges learned")
    val bpeN = Bpe.encodeTokenCounts(docs, "doc_id", "text",
      merges.toSeq, unicode = true).select("n_bpe_tokens").as[Int].head()
    // 4 words, 21 chars: merges must compress below per-char count
    assert(bpeN >= 4 && bpeN < 21, s"got $bpeN")
  }

  test("durable near-dup index: unicode banding pinned in meta, CJK copies rejected") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-uni").toString
    val cjk = Seq(
      (1L, "机器学习模型的训练数据质量决定了下游任务的表现和泛化能力水平"),
      (2L, "今天天气晴朗适合出门散步晒太阳呼吸新鲜空气放松心情看看风景")
    ).toDF("doc_id", "text")
    NearDupIndex.writeIndex(cjk.filter($"doc_id" === 1), "text", dir, unicode = true)
    // append bands through the META's unicode flag — no param on the call
    NearDupIndex.appendSegment(cjk.filter($"doc_id" === 2), "text", dir, "batch=1")
    val probe = Seq(
      (101L, "机器学习模型的训练数据质量决定了下游任务的表现和泛化能力水平"), // copy of build seg
      (102L, "今天天气晴朗适合出门散步晒太阳呼吸新鲜空气放松心情看看风景"), // copy of appended seg
      (103L, "完全无关的内容和任何已有文档都没有共同的字符序列片段出现")
    ).toDF("doc_id", "text")
    val admitted = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(103L), s"got $admitted")
    // the unicode flag is a banding param: an ASCII rebuild must refuse
    val e = intercept[IllegalStateException](
      NearDupIndex.writeIndex(cjk, "text", dir))
    assert(e.getMessage.contains("cross-band"))
  }

  test("gopher gates + fertility become meaningful for CJK under unicode mode") {
    // 30 CJK chars + enough latin stopwords to pass keep_stopwords: the
    // point is keep_tokens/keep_punct flip from auto-reject to honest
    val doc = Seq((1L, "机器学习模型的训练数据质量决定了下游任务的表现和泛化能力水平 the of in it is")).toDF("doc_id", "text")
    val ascii = TextAnalysis.gopherFilter(doc, "doc_id", "text")
      .select("keep_tokens", "keep_punct").head()
    val uni = TextAnalysis.gopherFilter(doc, "doc_id", "text", unicode = true)
      .select("keep_tokens", "keep_punct").head()
    assert(!ascii.getBoolean(0), "ascii mode saw >= 10 tokens in CJK?")
    assert(!ascii.getBoolean(1), "ascii mode should count CJK as punct")
    assert(uni.getBoolean(0) && uni.getBoolean(1))
    val fert = TextAnalysis.tokenFertility(doc, "doc_id", "text", unicode = true)
      .select("subword_tokens").as[Long].head()
    assert(fert >= 30L, s"unicode fertility missed CJK tokens: $fert")
  }
  test("tokensLocal (driver-side twin) == HOF forms over the mixed fixture, both modes") {
    val rows = mixed.select(col("doc_id"), col("text"),
      Dedup.tokens(col("text")).as("ta"),
      Dedup.tokensUnicode(col("text")).as("tu"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(1)
      assert(Dedup.tokensLocal(text, unicode = false) ==
        r.getSeq[String](2), s"ascii drift on doc ${r.getLong(0)}")
      assert(Dedup.tokensLocal(text, unicode = true) ==
        r.getSeq[String](3), s"unicode drift on doc ${r.getLong(0)}")
    }
  }

  test("tokensLocal matches lower() on dotted/dotless I regardless of JVM locale") {
    // 'İ' (U+0130) and 'I': String.toLowerCase is locale-sensitive here
    // (tr/az JVMs lower 'I' to dotless 'ı'), while Spark's lower() runs
    // UTF8String.toLowerCase — tokensLocal must follow the UTF8String
    // path so a quoted query builds the same terms the corpus-side token
    // stream produces, whatever the JVM default locale
    val texts = Seq("İstanbul IŞIK TITLE", "İİII ıı")
    val rows = texts.toDF("text")
      .select(col("text"), Dedup.tokensUnicode(col("text")).as("tu"))
      .collect()
    rows.foreach { r =>
      assert(Dedup.tokensLocal(r.getString(0), unicode = true) ==
        r.getSeq[String](1),
        s"dotted-I drift on '${r.getString(0)}': local=" +
          s"${Dedup.tokensLocal(r.getString(0), unicode = true)} hof=${r.getSeq[String](1)}")
    }
  }

  test("decontaminate unicode mode catches planted CJK benchmark leakage; ASCII mode is blind to it") {
    // doc 100 is the benchmark; docs 101/102 copy its CJK phrase, 103 is clean
    val corpus = Seq(
      (100L, "机器学习的基准测试题目在这里"),
      (101L, "前言 机器学习的基准测试题目在这里 结语"),
      (102L, "机器学习的基准测试 不同后缀"),
      (103L, "完全不同的内容没有重叠部分")
    ).toDF("doc_id", "text")
    val uni = graft.operators.Ngrams.decontaminate(
      corpus, "doc_id", "text", col("doc_id") === 100L, n = 3, unicode = true)
      .as[(Long, Long)].collect().toMap
    assert(uni.contains(101L) && uni.contains(102L) && !uni.contains(103L),
      s"got $uni")
    // ASCII mode: zero tokens anywhere -> zero hits -> silent pass-through
    val ascii = graft.operators.Ngrams.decontaminate(
      corpus, "doc_id", "text", col("doc_id") === 100L, n = 3)
      .collect()
    assert(ascii.isEmpty, s"ascii mode should see nothing: ${ascii.toSeq}")
  }

  test("removeDuplicateSpans unicode mode rewrites duplicated CJK runs keep-first; ASCII mode no-ops") {
    val corpus = Seq(
      (1L, "这是重复的模板句子 其余甲"),
      (2L, "这是重复的模板句子 其余乙")
    ).toDF("doc_id", "text")
    val out = graft.operators.Ngrams.removeDuplicateSpans(
      corpus, "doc_id", "text", n = 4, unicode = true)
      .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L, s"first occurrence must be kept: $out")
    assert(out(2L) >= 9L, s"doc 2's duplicated 9-char run must be removed: $out")
    val ascii = graft.operators.Ngrams.removeDuplicateSpans(
      corpus, "doc_id", "text", n = 4)
      .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().toMap
    assert(ascii.values.forall(_ == 0L), s"ascii mode must no-op here: $ascii")
  }

  test("phraseSearch: unicode terms accepted per-char, raw quotes tokenized, wrong-mode terms rejected loud") {
    val docs = Seq(
      (1L, "网页的质量很高值得收录"),
      (2L, "质量一般 很高的山"),
      (3L, "无关内容")
    ).toDF("doc_id", "text")
    val hits = graft.operators.Retrieval.phraseSearchText(
      docs, "doc_id", "text", "质量很高", unicode = true)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L), s"got $hits")
    // a multi-char Han term is NOT one unicode token - fail loud, not no-match
    val e = intercept[IllegalArgumentException] {
      graft.operators.Retrieval.phraseSearch(
        docs, "doc_id", "text", Seq("质量", "很高"), unicode = true)
    }
    assert(e.getMessage.contains("not a single token"), e.getMessage)
    graft.CacheScope.releaseAll()
  }

  test("unicode mode threads through affinity/rarity/zipf/chunking (nonzero where ASCII reads zero)") {
    val docs = Seq(
      (1L, "目标领域的专业文本内容"),
      (2L, "目标领域的相关文章材料"),
      (3L, "完全无关的随机句子")
    ).toDF("doc_id", "text")
    val aff = graft.operators.Sampling.targetAffinity(
      docs, docs.filter(col("doc_id") === 1L), "doc_id", "text",
      topN = 3, unicode = true)
      .select(col("doc_id"), col("affinity_micro")).as[(Long, Long)]
      .collect().toMap
    assert(aff(2L) > aff(3L), s"in-domain doc must outrank: $aff")
    val rar = graft.operators.TextAnalysis.tokenRarity(
      docs, "doc_id", "text", unicode = true).count()
    assert(rar == 3L)
    val zipf = graft.operators.TextAnalysis.vocabZipf(
      docs, "text", unicode = true)
      .agg(sum(col("n_terms"))).as[Long].collect().head
    assert(zipf > 0L)
    val chunks = graft.operators.Corpus.chunkWindows(
      docs, "doc_id", "text", window = 4, overlap = 0, unicode = true)
    assert(chunks.count() >= 6L) // ~10 single-char tokens per doc / 4
    // ASCII mode on the same corpus: zero tokens, zero chunks
    assert(graft.operators.Corpus.chunkWindows(
      docs, "doc_id", "text", window = 4, overlap = 0).count() == 0L)
    graft.CacheScope.releaseAll()
  }
}
