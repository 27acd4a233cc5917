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

  test("decontaminateBloom: superset of exact hits, per-doc counts never below exact") {
    // fixture-scale check: no false negatives (guaranteed), few extras
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pred = col("doc_id") % 97 === 0
    val exact = Ngrams.decontaminate(docs, "doc_id", "text", pred, n = 3)
      .as[(Long, Long)].collect().toMap
    val bloom = Ngrams.decontaminateBloom(docs, "doc_id", "text", pred, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(exact.keySet.subsetOf(bloom.keySet),
      s"bloom missed exactly-contaminated docs: ${exact.keySet -- bloom.keySet}")
    exact.foreach { case (id, hits) =>
      assert(bloom(id) >= hits, s"doc $id: bloom ${bloom(id)} < exact $hits")
    }
    // deterministic: same build, same flags
    val again = Ngrams.decontaminateBloom(docs, "doc_id", "text", pred, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(again == bloom)
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

  test("substringPairs: shared long grams found, oversized-gram groups guarded") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "start alpha beta gamma delta end"),   // shares 2 distinct 4-grams... (alpha beta gamma delta) and (beta gamma delta ...) differs
      (3L, "nothing in common with the others")
    ).toDF("doc_id", "text")
    val pairs = Ngrams.substringPairs(df, "doc_id", "text", n = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1L)),
      s"docs 1,2 share exactly the 4-gram 'alpha beta gamma delta': $pairs")
    // guard: a gram present in every doc is dropped when over the cap
    val many = (1L to 6L).map(i => (i, s"common gram here always plus unique$i"))
      .toDF("doc_id", "text")
    val capped = Ngrams.substringPairs(many, "doc_id", "text", n = 4, maxDocsPerGram = 5)
      .as[(Long, Long, Long)].collect()
    assert(capped.isEmpty, s"oversized gram group must be guarded out: ${capped.toSeq}")
  }

  test("substringRuns: certifies the longest shared token run, prunes below minTokens") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      // shares the 6-token run "beta gamma delta epsilon zeta eta" with 1
      (2L, "XX beta gamma delta epsilon zeta eta YY"),
      // shares only the 4-token run "alpha beta gamma delta" with 1 — below minTokens=5
      (3L, "alpha beta gamma delta QQ RR SS TT"),
      (4L, "totally different content with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Ngrams.substringRuns(df, "doc_id", "text", n = 4, minTokens = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 6L)), s"got $out")
    // at minTokens=4 the (1,3) pair appears with its exact 4-token run
    val loose = Ngrams.substringRuns(df, "doc_id", "text", n = 4, minTokens = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(loose == Set((1L, 2L, 6L), (1L, 3L, 4L)), s"got $loose")
  }

  test("substringRuns equals brute-force longest common token run on random docs") {
    // tiny vocabulary forces overlaps; deterministic LCG
    var s = 7L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    val docs = (1L to 12L).map { id =>
      val len = 12 + math.floorMod(nxt(), 9L).toInt
      id -> Vector.fill(len)(vocab(math.floorMod(nxt(), vocab.length.toLong).toInt))
    }
    val df = docs.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
    val n = 3
    val got = Ngrams.substringRuns(df, "doc_id", "text", n = n, minTokens = n)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // brute force: longest common contiguous token run per pair (O(L²) DP)
    def lcs(a: Vector[String], b: Vector[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          best = math.max(best, dp(i)(j))
        }
      best
    }
    val want = (for {
      (ia, wa) <- docs; (ib, wb) <- docs if ia < ib
      l = lcs(wa, wb) if l >= n
    } yield (ia, ib) -> l.toLong).toMap
    assert(got == want, s"operator ${got.size} pairs vs brute ${want.size}")
  }

  test("boilerplateNgrams: grams above the group-fraction threshold only") {
    val df = Seq(
      (1L, "copyright acme corp page one", "s1"),
      (2L, "copyright acme corp page two", "s1"),
      (3L, "copyright acme corp page three", "s1"),
      (4L, "totally original content here", "s1"),
      (5L, "copyright acme corp but other source", "s2")
    ).toDF("doc_id", "text", "source")
    val out = Ngrams.boilerplateNgrams(df, "doc_id", "text", "source",
      n = 2, fracNum = 1, fracDen = 2, minDocs = 3)
      .as[(String, String, Long)].collect().toSeq
    // only s1 has grams in >=50% of 4 docs AND >=3 docs: the copyright chain
    assert(out.nonEmpty && out.forall(_._1 == "s1"), s"got $out")
    assert(out.contains(("s1", "copyright acme", 3L)) &&
      out.contains(("s1", "acme corp", 3L)) &&
      out.contains(("s1", "corp page", 3L)), s"got $out")
    // one-doc grams ("page one", s2's variants) stay out
    assert(out.forall(_._3 >= 3L), s"sub-threshold gram leaked: $out")
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

  test("collocations: always-adjacent pair tops the lift ranking; counts are exact") {
    // "new york" always adjacent; "the" everywhere (high count, low lift)
    val docs = (1 to 10).map(i => (i.toLong, "the new york trip " + i)) ++
      (11 to 20).map(i => (i.toLong, "the boring filler text " + i))
    val out = Ngrams.collocations(docs.toDF("doc_id", "text"), "text",
      minCount = 5, topK = 10)
      .select("t1", "t2", "pair_count", "count_a", "count_b", "lift")
      .as[(String, String, Long, Long, Long, Double)].collect()
    val ny = out.find(r => r._1 == "new" && r._2 == "york").get
    assert(ny._3 == 10 && ny._4 == 10 && ny._5 == 10)
    // N = 20 docs x 5 tokens = 100; lift = 10*100/(10*10) = 10.0 exactly
    assert(ny._6 == 10.0)
    // ranking: every always-adjacent pair (lift 10) beats the
    // "the"-anchored pairs (the: 20 occurrences -> lift 5); equal lifts
    // tie-break alphabetically, so "boring filler" heads the list
    assert(out.head == (("boring", "filler", 10L, 10L, 10L, 10.0)))
    val theNew = out.find(r => r._1 == "the" && r._2 == "new").get
    assert(theNew._6 == 5.0)
    assert(out.map(_._6).toSeq == out.map(_._6).sortBy(-_).toSeq, "sorted by lift desc")
    // min-count guard: nothing below 5 occurrences leaks in
    assert(out.forall(_._3 >= 5))
  }

  test("wordNgrams: per-group ids don't interleave into cross-document grams") {
    // two documents share id=1 but live in different carry groups (the
    // boilerplateNgrams shape); the lead() window must partition by the
    // FULL (id, carry) key or tokens from both docs interleave
    val df = Seq(
      (1L, "A", "the quick fox"),
      (1L, "B", "lazy dog sleeps")
    ).toDF("id", "site", "text")
    val grams = Ngrams.wordNgrams(df, "id", "text", n = 2, carryCols = Seq("site"))
      .filter($"ngram".isNotNull).select("site", "ngram")
      .as[(String, String)].collect().toSet
    assert(grams == Set(
      ("A", "the quick"), ("A", "quick fox"),
      ("B", "lazy dog"), ("B", "dog sleeps")), s"got $grams")
  }

  test("removeDuplicateSpans: keep-first by (doc, pos), clean docs untouched") {
    // doc 1 carries the span first (by doc order); docs 2 and 3 repeat it
    // inside distinct surroundings; doc 4 is clean
    val span = "alpha beta gamma delta eps"
    val df = Seq(
      (1L, s"one two $span three"),
      (2L, s"uno $span dos tres cuatro"),
      (3L, s"$span x y z"),
      (4L, "entirely clean text here")).toDF("doc_id", "text")
    val out = Ngrams.removeDuplicateSpans(df, "doc_id", "text", n = 4)
      .orderBy("doc_id")
      .select("text_clean", "n_tokens", "n_removed")
      .as[(String, Long, Long)].collect()
    // first occurrence survives verbatim (normalized to token join)
    assert(out(0) == (s"one two $span three", 8L, 0L))
    // later occurrences lose exactly the span, surroundings survive
    assert(out(1) == ("uno dos tres cuatro", 9L, 5L))
    assert(out(2) == ("x y z", 8L, 5L))
    assert(out(3) == ("entirely clean text here", 4L, 0L))
  }

  test("removeDuplicateSpans: overlapping covers merge — each position deleted once") {
    // two duplicated 4-gram families overlap inside doc 20 (positions
    // 1..5 and 4..8 share 4..5); n_removed must count positions, not
    // gram covers, and within-doc repetition (doc 30) also dedups
    val a = "p q r s t" // grams "p q r s","q r s t" dup'd via doc 10
    val df = Seq(
      (10L, s"$a u v w"), // first: kept
      (20L, s"$a u v w"), // exact repeat: all 8 tokens covered, merged
      (30L, "m n o k m n o k m n o k")) // self-repeat: keep first 4-gram run
      .toDF("doc_id", "text")
    val out = Ngrams.removeDuplicateSpans(df, "doc_id", "text", n = 4)
      .orderBy("doc_id")
      .select("text_clean", "n_tokens", "n_removed")
      .as[(String, Long, Long)].collect()
    assert(out(0) == (s"$a u v w", 8L, 0L))
    assert(out(1) == ("", 8L, 8L), s"merged covers should delete all: ${out(1)}")
    // doc 30: "m n o k" ×3 = 12 tokens; grams at pos 1..9 all duplicated
    // (of the cyclic family), first of each gram string is kept — the
    // surviving prefix is the first 4 tokens' worth not covered by a
    // non-first occurrence
    assert(out(2)._2 == 12L)
    assert(out(2)._3 > 0L && out(2)._3 < 12L,
      s"self-repeat must remove a proper subset: ${out(2)}")
    // keep-first global contract: re-running with doc order flipped keeps
    // the span in the NEW first doc
    val flipped = Seq((1L, s"$a u v w"), (2L, s"$a u v w"))
      .toDF("doc_id", "text")
    val f = Ngrams.removeDuplicateSpans(flipped, "doc_id", "text", n = 4)
      .orderBy("doc_id").select("n_removed").as[Long].collect()
    assert(f.toSeq == Seq(0L, 8L))
  }

  test("substringRuns: maxDocsPerGram counts documents, not occurrences") {
    // one gram repeated 30 times inside each of TWO docs = 60 occurrence
    // rows; a row-count guard at 50 would drop it even though only 2
    // docs carry it — the pair's shared run must still be certified
    val rep = Array.fill(30)("alpha beta gamma delta").mkString(" ")
    val df = Seq((1L, rep), (2L, rep)).toDF("doc_id", "text")
    val out = Ngrams.substringRuns(df, "doc_id", "text", n = 4,
        minTokens = 4, maxDocsPerGram = 50)
      .select("id_a", "id_b", "max_run_tokens")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 1 && out.head._1 == 1L && out.head._2 == 2L)
    assert(out.head._3 == 120L, s"expected the full 120-token run: ${out.head}")
  }
}
