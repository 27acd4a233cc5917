package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Retrieval family: BM25 fixed-point scoring vs a direct Scala
  * re-implementation of the documented rational-arithmetic contract,
  * index round-trip parity, and the pushdown plan shape. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "rare", "unique")

  private def randomCorpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nDocs).map { i =>
      val len = 3 + rnd.nextInt(20)
      // skew: 'rare'/'unique' only in a few docs, common words elsewhere
      val words = (0 until len).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 2) vocab(10 + rnd.nextInt(2)) else vocab(rnd.nextInt(10))
      }
      (i.toLong, words.mkString(" "))
    }
  }

  /** Direct transcription of the scoring contract in [[Retrieval]]'s
    * scaladoc — floor-rational BM25 in ppm, integer arithmetic only. */
  private def bruteBm25(
      corpus: Seq[(Long, String)],
      queries: Seq[(Int, String)],
      k: Int): Seq[(Int, Long, Long, Int)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = corpus.size.toLong
    val l = toks.valuesIterator.map(_.size.toLong).sum
    val avgdl = l / n
    val dfOf = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    def termScore(tf: Long, len: Long, df: Long): Long = {
      val tfp = (22000000L * tf * avgdl) / (10 * tf * avgdl + 3 * avgdl + 9 * len)
      (tfp * (2 * (n - df) + 1)) / (2 * df + 1)
    }
    queries.groupBy(_._1).toSeq.flatMap { case (qid, terms) =>
      val scored = corpus.flatMap { case (id, _) =>
        val ts = toks(id)
        val s = terms.map(_._2).distinct.map { term =>
          val tf = ts.count(_ == term).toLong
          if (tf == 0) 0L else termScore(tf, ts.size.toLong, dfOf(term))
        }.sum
        if (s > 0) Some((id, s)) else None
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, i + 1) }
    }.sortBy(r => (r._1, r._4))
  }

  test("bm25TopK equals the rational-arithmetic brute force on random corpora") {
    val queries = Seq(1 -> "rare", 1 -> "alpha", 2 -> "beta", 2 -> "gamma", 2 -> "unique")
    for (seed <- Seq(1, 7, 20260813)) {
      val corpus = randomCorpus(seed, 60)
      val got = Retrieval.bm25TopK(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        queries.toDF("query_id", "term"), k = 8)
        .as[(Int, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
      val want = bruteBm25(corpus, queries, 8)
      assert(got == want,
        s"seed $seed: bm25 diverged from brute force\n got=$got\nwant=$want")
    }
    graft.CacheScope.releaseAll()
  }

  test("a doc scoring on zero query terms is absent, not zero-ranked") {
    // one doc with no query term at all: inner posting join drops it
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma gamma"), (3L, "delta"))
    val out = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      Seq(1 -> "alpha", 1 -> "gamma").toDF("query_id", "term"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
    graft.CacheScope.releaseAll()
  }

  test("searchIndex over the written artifact is bit-equal to bm25TopK") {
    val corpus = randomCorpus(99, 80)
    val df = corpus.toDF("doc_id", "text")
    val queries = Seq(1 -> "rare", 2 -> "alpha", 2 -> "kappa").toDF("query_id", "term")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Retrieval.writeIndex(df, "doc_id", "text", dir, numPartitions = 2)
    val direct = Retrieval.bm25TopK(df, "doc_id", "text", queries, k = 12)
      .orderBy("query_id", "rank").collect().toSeq
    val served = Retrieval.searchIndex(spark, dir, queries, k = 12)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served == direct)
    graft.CacheScope.releaseAll()
  }

  test("unicode index: serve bit-equal to direct unicode bm25; CJK terms retrievable") {
    val corpus = Seq(
      (1L, "中文网页的质量很高"), (2L, "日本語のテキスト 中文"),
      (3L, "alpha beta gamma"), (4L, "Русский Текст alpha"))
      .toDF("doc_id", "text")
    // per-char CJK fallback: '中' and '文' are single-char tokens
    val queries = Seq(1 -> "中", 1 -> "文", 2 -> "alpha").toDF("query_id", "term")
    val dir = java.nio.file.Files.createTempDirectory("bm25uni").toString
    Retrieval.writeIndex(corpus, "doc_id", "text", dir, unicode = true)
    val direct = Retrieval.bm25TopK(corpus, "doc_id", "text", queries,
      k = 10, unicode = true).orderBy("query_id", "rank").collect().toSeq
    val served = Retrieval.searchIndex(spark, dir, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served == direct)
    assert(direct.exists(_.getLong(1) == 1L),
      s"CJK doc not retrieved under unicode mode: $direct")
    graft.CacheScope.releaseAll()
  }

  test("tokenizer-mode meta: mismatched append fails loud, layout intact; rebuild may change mode") {
    val a = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25mode").toString
    Retrieval.writeIndexSegment(a, "doc_id", "text", dir, "batch=0",
      unicode = true)
    val q = Seq(1 -> "alpha").toDF("query_id", "term")
    val before = Retrieval.searchIndex(spark, dir, q, k = 5).collect().toSeq
    val e = intercept[IllegalArgumentException] {
      Retrieval.writeIndexSegment(a, "doc_id", "text", dir, "batch=1")
    }
    assert(e.getMessage.contains("unicode"), e.getMessage)
    // the refused append must not have touched the standing layout
    val after = Retrieval.searchIndex(spark, dir, q, k = 5).collect().toSeq
    assert(after == before)
    // a full rebuild re-tokenizes everything — mode change is legal there
    Retrieval.writeIndex(a, "doc_id", "text", dir)
    assert(!Retrieval.readMode(spark, dir))
    Retrieval.writeIndexSegment(a, "doc_id", "text", dir, "batch=1")
    graft.CacheScope.releaseAll()
  }

  test("pre-meta ASCII layout: unicode append refused, ASCII append adopts and pins") {
    val a = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25premeta").toString
    Retrieval.writeIndexSegment(a, "doc_id", "text", dir, "batch=0")
    // simulate a pre-r15 index: committed segments, no mode meta
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, Retrieval.ModeMetaFile))
    val e = intercept[IllegalArgumentException] {
      Retrieval.writeIndexSegment(a, "doc_id", "text", dir, "batch=1",
        unicode = true)
    }
    assert(e.getMessage.contains("pre-unicode"), e.getMessage)
    Retrieval.writeIndexSegment(a, "doc_id", "text", dir, "batch=1")
    assert(!Retrieval.readMode(spark, dir))
    graft.CacheScope.releaseAll()
  }

  test("serve ignores uncommitted segments (postings written, norms marker absent)") {
    val corpus = randomCorpus(11, 40)
    val df = corpus.toDF("doc_id", "text")
    val queries = Seq(1 -> "alpha", 1 -> "beta").toDF("query_id", "term")
    val dir = java.nio.file.Files.createTempDirectory("bm25torn").toString
    Retrieval.writeIndex(df, "doc_id", "text", dir)
    val before = Retrieval.searchIndex(spark, dir, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq

    // simulate a crash mid-append: segment batch=9's postings landed but
    // its norm marker did not — the serve must see the PRE-append corpus
    val extra = Seq((900L, "alpha alpha beta alpha"), (901L, "beta beta"))
      .toDF("doc_id", "text")
    Retrieval.writeIndexSegment(extra, "doc_id", "text", dir, "batch=9")
    val fs = new java.io.File(s"$dir/norms/batch=9")
    assert(fs.exists)
    assert(new java.io.File(fs, "_GRAFT_COMMIT").delete(),
      "expected the engine-owned commit marker in the norm segment")
    val torn = Retrieval.searchIndex(spark, dir, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(torn == before,
      "serve exposed a segment whose commit marker is missing")
    graft.CacheScope.releaseAll()
  }

  test("compactIndexSegments merges N segments into 1 with bit-equal serving") {
    val corpus = randomCorpus(7, 90)
    val df = corpus.toDF("doc_id", "text")
    val queries = Seq(1 -> "rare", 2 -> "alpha", 2 -> "kappa").toDF("query_id", "term")
    val dir = java.nio.file.Files.createTempDirectory("bm25cp").toString
    // three micro-batch-shaped segments
    (0 until 3).foreach { b =>
      Retrieval.writeIndexSegment(df.filter(col("doc_id") % 3 === b),
        "doc_id", "text", dir, s"batch=$b")
    }
    val before = Retrieval.searchIndex(spark, dir, queries, k = 12)
      .orderBy("query_id", "rank").collect().toSeq
    assert(Retrieval.compactIndexSegments(spark, dir) == 1)
    val after = Retrieval.searchIndex(spark, dir, queries, k = 12)
      .orderBy("query_id", "rank").collect().toSeq
    assert(after == before, "compaction changed a served score or rank")
    // sources physically reclaimed; one live segment remains
    assert(!new java.io.File(s"$dir/norms/batch=0").exists)
    assert(!new java.io.File(s"$dir/postings/batch=0").exists)
    // re-compacting a compact index is a no-op
    assert(Retrieval.compactIndexSegments(spark, dir) == 1)
    // equal to a from-scratch single-segment build
    val direct = Retrieval.bm25TopK(df, "doc_id", "text", queries, k = 12)
      .orderBy("query_id", "rank").collect().toSeq
    assert(after == direct)
    graft.CacheScope.releaseAll()
  }

  test("a serve racing compaction sees the old set until the marker publish") {
    val corpus = randomCorpus(23, 50)
    val df = corpus.toDF("doc_id", "text")
    val queries = Seq(1 -> "alpha", 1 -> "beta").toDF("query_id", "term")
    val dir = java.nio.file.Files.createTempDirectory("bm25race").toString
    (0 until 2).foreach { b =>
      Retrieval.writeIndexSegment(df.filter(col("doc_id") % 2 === b),
        "doc_id", "text", dir, s"batch=$b")
    }
    val before = Retrieval.searchIndex(spark, dir, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    Retrieval.compactIndexSegments(spark, dir)
    // reconstruct the pre-publish instant: merged data present but its
    // marker gone — a crash between write and rename. The serve must
    // fall back to... nothing here (sources were reclaimed), so instead
    // pin the complement: marker present + sources gone serves the
    // merged set; marker REMOVED must fail closed (no committed
    // segments), never silently serve an unmarked merge.
    val merged = new java.io.File(s"$dir/norms")
      .listFiles().filter(_.getName.startsWith("batch=")).head
    assert(new java.io.File(merged, "_GRAFT_COMMIT").delete())
    val ex = intercept[IllegalArgumentException] {
      Retrieval.searchIndex(spark, dir, queries, k = 10).collect()
    }
    assert(ex.getMessage.contains("no committed index segments"))
    // appends after compaction join the next merge: add a segment, serve
    // sees it (restore the merged marker first — content must again name
    // the superseded sources, but they're deleted, so empty is correct)
    new java.io.FileOutputStream(
      new java.io.File(merged, "_GRAFT_COMMIT")).close()
    val extra = Seq((900L, "alpha alpha beta"), (901L, "beta kappa"))
      .toDF("doc_id", "text")
    Retrieval.writeIndexSegment(extra, "doc_id", "text", dir, "batch=7")
    val withExtra = Retrieval.searchIndex(spark, dir, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(withExtra != before, "appended segment invisible after compaction")
    assert(Retrieval.compactIndexSegments(spark, dir) == 1)
    val recompacted = Retrieval.searchIndex(spark, dir, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(recompacted == withExtra)
    graft.CacheScope.releaseAll()
  }

  test("superseded segments cannot resurrect across compactions; vacuum reclaims them") {
    val df = randomCorpus(31, 60).toDF("doc_id", "text")
    val queries = Seq(1 -> "alpha", 1 -> "beta", 2 -> "kappa")
      .toDF("query_id", "term")
    val dir = java.nio.file.Files.createTempDirectory("bm25resur").toString
    (0 until 2).foreach { b =>
      Retrieval.writeIndexSegment(df.filter(col("doc_id") % 2 === b),
        "doc_id", "text", dir, s"batch=$b")
    }
    // first compaction defers reclaim: sources 0/1 stay on disk WITH
    // their own markers, tombstoned only by the merged segment's marker
    assert(Retrieval.compactIndexSegments(spark, dir, reclaimSources = false) == 1)
    assert(new java.io.File(s"$dir/norms/batch=0/_GRAFT_COMMIT").exists)
    val extra = Seq((900L, "alpha beta beta"), (901L, "kappa alpha"))
      .toDF("doc_id", "text")
    Retrieval.writeIndexSegment(extra, "doc_id", "text", dir, "batch=5")
    // second compaction supersedes the FIRST merged segment — the one
    // whose marker named {0,1}. Its marker must copy those tombstones
    // forward (their dirs still exist)
    assert(Retrieval.compactIndexSegments(spark, dir, reclaimSources = false) == 1)
    // simulate the partial reclaim the advice describes: the first
    // merged segment's dirs (and with them its marker = the only
    // non-transitive tombstone for 0/1) are destroyed; orphans 0/1
    // survive with their own markers intact
    val firstMergedId = 1000000000000L
    def rmrf(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rmrf)); p.delete(); ()
    }
    rmrf(new java.io.File(s"$dir/norms/batch=$firstMergedId"))
    rmrf(new java.io.File(s"$dir/postings/batch=$firstMergedId"))
    assert(new java.io.File(s"$dir/norms/batch=0/_GRAFT_COMMIT").exists)
    // the orphans must NOT be served again next to their merged copy —
    // the serve equals a from-scratch build over the full corpus
    val expect = Retrieval.bm25TopK(df.union(extra), "doc_id", "text", queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    val got = Retrieval.searchIndex(spark, dir, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got == expect, "superseded segment resurrected — tf/df doubled")
    // vacuum reclaims exactly the named-and-still-present ids (0, 1, 5)
    assert(Retrieval.vacuumIndexSegments(spark, dir) == 3)
    assert(!new java.io.File(s"$dir/norms/batch=0").exists)
    assert(!new java.io.File(s"$dir/postings/batch=1").exists)
    val afterVacuum = Retrieval.searchIndex(spark, dir, queries, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(afterVacuum == expect)
    // idempotent: nothing left to reclaim
    assert(Retrieval.vacuumIndexSegments(spark, dir) == 0)
    graft.CacheScope.releaseAll()
  }

  test("index serve pushes the term filter into the postings parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx2").toString
    Retrieval.writeIndex(randomCorpus(5, 30).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val plan = Retrieval.searchIndex(spark, dir,
      Seq(1 -> "alpha", 1 -> "beta").toDF("query_id", "term"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(tok, [alpha,beta])]")
      || plan.contains("In(tok, [alpha,beta])"), plan)
    graft.CacheScope.releaseAll()
  }

  test("phraseSearch counts consecutive-token matches, including overlaps") {
    val corpus = Seq(
      (1L, "alpha beta gamma alpha beta gamma"), // 2 occurrences
      (2L, "alpha beta"),                        // prefix only, no gamma
      (3L, "beta gamma alpha"),                  // wrong order
      (4L, "alpha alpha alpha"),                 // overlap case for 'alpha alpha'
      (5L, "x alpha beta gamma y"))              // 1, mid-doc
    val got = Retrieval.phraseSearch(corpus.toDF("doc_id", "text"),
      "doc_id", "text", Seq("alpha", "beta", "gamma"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 5L -> 1L))
    val overlap = Retrieval.phraseSearch(corpus.toDF("doc_id", "text"),
      "doc_id", "text", Seq("alpha", "alpha"))
      .as[(Long, Long)].collect().toMap
    assert(overlap == Map(4L -> 2L))
    graft.CacheScope.releaseAll()
  }

  test("phraseSearch equals a brute-force sliding-window count on random corpora") {
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 80).map { i =>
      // tiny vocab → phrases actually recur
      val words = (0 until 5 + rnd.nextInt(25)).map(_ => vocab(rnd.nextInt(4)))
      (i.toLong, words.mkString(" "))
    }
    val phrase = Seq("alpha", "beta")
    val want = corpus.flatMap { case (id, t) =>
      val ts = t.split(" ").toSeq
      val n = ts.sliding(2).count(_ == phrase)
      if (n > 0) Some(id -> n.toLong) else None
    }.toMap
    val got = Retrieval.phraseSearch(corpus.toDF("doc_id", "text"),
      "doc_id", "text", phrase)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    graft.CacheScope.releaseAll()
  }

  test("repeated query terms count once (bag-of-words query model)") {
    val corpus = Seq((1L, "alpha alpha beta"), (2L, "alpha gamma"))
    val once = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      Seq(1 -> "alpha").toDF("query_id", "term"), k = 5).collect().toSeq
    val twice = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      Seq(1 -> "alpha", 1 -> "alpha").toDF("query_id", "term"), k = 5).collect().toSeq
    assert(once == twice)
    graft.CacheScope.releaseAll()
  }

  test("deleteDocsFromIndex: tombstoned docs score-vanish; compaction materializes and reclaims") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-del").toString
    val corpus = randomCorpus(77, 40)
    val docs = corpus.toDF("doc_id", "text")
    // two segments, deletes spanning both
    Retrieval.writeIndexSegment(docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", dir, "batch=0")
    Retrieval.writeIndexSegment(docs.filter($"doc_id" % 2 === 1),
      "doc_id", "text", dir, "batch=1")
    val queries = Seq(1 -> "rare", 1 -> "alpha", 2 -> "beta").toDF("query_id", "term")
    val dead = Set(0L, 1L, 7L, 18L)
    Retrieval.deleteDocsFromIndex(spark, dir, dead.toSeq.toDF("doc_id"))

    def collectServe() = Retrieval.searchIndex(spark, dir, queries, k = 10)
      .orderBy($"query_id", $"rank").collect().toSeq
    val served = collectServe()
    // score-identical to an index that NEVER ingested the deleted docs
    // (df and corpus stats must forget them, not just the hit list)
    val expect = Retrieval.bm25TopK(
      docs.filter(!$"doc_id".isin(dead.toSeq: _*)), "doc_id", "text", queries, k = 10)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(served == expect, s"tombstoned serve != never-ingested:\n$served\nvs\n$expect")
    assert(!served.exists(r => dead.contains(r.getLong(1))))

    // compaction materializes the deletes and reclaims the tombstones
    assert(Retrieval.compactIndexSegments(spark, dir) == 1)
    assert(collectServe() == served, "materialized serve moved a score")
    val tombDir = new java.io.File(s"$dir/tombstones")
    assert(!tombDir.exists() || tombDir.listFiles().isEmpty,
      "compaction left absorbed tombstones behind")
    // the merged segment physically lacks the deleted docs
    val normIds = spark.read.parquet(s"$dir/norms")
      .select("doc_id").as[Long].collect().toSet
    assert(dead.forall(!normIds.contains(_)), "deleted doc survived the merge")

    // a delete AFTER compaction keeps serving through the filter path
    Retrieval.deleteDocsFromIndex(spark, dir, Seq(2L).toDF("doc_id"))
    val expect2 = Retrieval.bm25TopK(
      docs.filter(!$"doc_id".isin((dead + 2L).toSeq: _*)), "doc_id", "text", queries, k = 10)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(collectServe() == expect2)
    // full rebuild clears tombstones: doc 2 is deliberately back
    Retrieval.writeIndex(docs, "doc_id", "text", dir)
    val rebuilt = Retrieval.searchIndex(spark, dir, queries, k = 10)
      .orderBy($"query_id", $"rank").collect().toSeq
    val expectAll = Retrieval.bm25TopK(docs, "doc_id", "text", queries, k = 10)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(rebuilt == expectAll, "rebuild did not clear stale tombstones")
  }
  test("index maintenance lock: compaction/vacuum fail fast under a held lock; expired lease breaks") {
    import graft.sources.v2.ShardLock
    val a = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25lock").toString
    Retrieval.writeIndexSegment(a.filter($"doc_id" === 1), "doc_id", "text", dir, "batch=0")
    Retrieval.writeIndexSegment(a.filter($"doc_id" === 2), "doc_id", "text", dir, "batch=1")
    val q = Seq(1 -> "beta").toDF("query_id", "term")
    val before = Retrieval.searchIndex(spark, dir, q, k = 5).collect().toSeq

    // a held foreign lock: both maintenance paths fail LOUD, layout intact
    val lockFile = new java.io.File(dir, ShardLock.FileName)
    val w = new java.io.PrintWriter(lockFile)
    w.println(s"other-writer\t${System.currentTimeMillis()}"); w.close()
    intercept[ShardLock.LockHeldException] {
      Retrieval.compactIndexSegments(spark, dir)
    }
    intercept[ShardLock.LockHeldException] {
      Retrieval.vacuumIndexSegments(spark, dir)
    }
    assert(Retrieval.searchIndex(spark, dir, q, k = 5).collect().toSeq == before,
      "a refused maintenance run must leave the index untouched")
    assert(lockFile.exists())

    // an EXPIRED lease (crashed holder) is broken and compaction proceeds
    assert(lockFile.setLastModified(System.currentTimeMillis() - 3600000L))
    assert(Retrieval.compactIndexSegments(spark, dir) == 1)
    assert(!lockFile.exists(), "lock must be released after the run")
    assert(Retrieval.searchIndex(spark, dir, q, k = 5).collect().toSeq == before,
      "compaction under a broken stale lock must preserve served results")
    graft.CacheScope.releaseAll()
  }
}
