package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("trainValSplit: deterministic, content-keyed, near the target fraction") {
    val split = Corpus.trainValSplit(docs, "text", valSixteenths = 2)
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(total == docs.count())
    // 2/16 = 12.5% expected; allow generous sampling slack at fixture size
    val valFrac = counts.getOrElse("val", 0L).toDouble / total
    assert(valFrac > 0.02 && valFrac < 0.30, s"val fraction $valFrac")
    // identical text ⇒ identical split (content-keyed, not row-keyed)
    val again = Corpus.trainValSplit(docs, "text", valSixteenths = 2)
    assert(split.exceptAll(again).isEmpty)
    // duplicate content lands on the same side regardless of id
    val dup = Seq((1L, "same words"), (999L, "same words")).toDF("doc_id", "text")
    val sides = Corpus.trainValSplit(dup, "text")
      .select("split").as[String].collect().toSet
    assert(sides.size == 1)
  }

  test("deterministicShuffle: a permutation, stable across runs, seed-sensitive") {
    val s1 = Corpus.deterministicShuffle(docs, "doc_id", "42")
      .select("doc_id").as[Long].collect().toSeq
    val s2 = Corpus.deterministicShuffle(docs, "doc_id", "42")
      .select("doc_id").as[Long].collect().toSeq
    val s3 = Corpus.deterministicShuffle(docs, "doc_id", "43")
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2, "same seed must reproduce the same order")
    assert(s1.sorted == s3.sorted && s1 != s3, "different seed must permute differently")
    assert(s1 != s1.sorted, "shuffle left the corpus in id order")
  }

  test("packSequences: chunks respect the token budget, ids stay ordered per chunk") {
    val packed = Corpus.packSequences(docs, "doc_id", "text",
      budgetTokens = 500L, shardCol = pmod(col("doc_id"), lit(2)))
      .select("doc_id", "shard", "n_tokens", "chunk_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(packed.length == docs.count())
    // each (shard, chunk) fits the budget unless a single doc overflows it
    packed.groupBy(r => (r._2, r._4)).foreach { case ((shard, chunk), rows) =>
      val tokens = rows.map(_._3).sum
      assert(tokens <= 500L + rows.map(_._3).max,
        s"shard $shard chunk $chunk over budget: $tokens")
    }
    // greedy in id order: chunk ids are non-decreasing per shard
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val byId = rows.sortBy(_._1).map(_._4)
      assert(byId.zip(byId.tail).forall { case (a, b) => a <= b })
    }
  }

  test("writeShards: n range-shard files whose concatenation is the deterministic shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Corpus.writeShards(docs, "doc_id", nShards = 4, path = dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(files.length == 4, s"expected 4 shard files, got ${files.map(_.getName).toSeq}")
    // within each shard the shuffle key is sorted; across shards (in
    // part-index order) the key ranges are contiguous and increasing.
    // __sk is (deliberately) not persisted — recompute it here.
    def sk(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"42#$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val perShard = files.map { f =>
      spark.read.parquet(f.getAbsolutePath).select("doc_id")
        .as[Long].collect().toSeq.map(id => (sk(id), id))
    }
    perShard.foreach { rows =>
      assert(rows == rows.sortBy(r => (r._1, r._2)), "shard not internally sorted")
    }
    perShard.toSeq.sliding(2).foreach {
      case Seq(a, b) if a.nonEmpty && b.nonEmpty =>
        assert(a.last._1 <= b.head._1, "shard key ranges out of order")
      case _ =>
    }
    // concatenation in shard order = the deterministic shuffle order
    val concat = perShard.flatten.map(_._2).toSeq
    val expected = Corpus.deterministicShuffle(docs, "doc_id", "42")
      .select("doc_id").as[Long].collect().toSeq
    assert(concat == expected)
  }

  test("chunkWindows: full coverage, overlap stitching, short docs, tails") {
    import spark.implicits._
    val doc = (1 to 100).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, doc),             // 100 tokens → starts 1, 49 (w=64, s=48)
      (2L, "only three tokens"),
      (3L, "! ? ."),          // zero tokens → no chunks
      (4L, (1 to 64).map(i => s"t$i").mkString(" ")) // exactly one window
    ).toDF("doc_id", "text")
    val out = Corpus.chunkWindows(df, "doc_id", "text", window = 64, overlap = 16)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect()

    val d1 = out.filter(_._1 == 1L)
    // starts on the 48-grid: 1, then 49 (⌈(100−64)/48⌉ = 1) — covers to 100
    assert(d1.map(_._2).toSeq == Seq(0L, 1L))
    assert(d1.map(_._4).toSeq == Seq(64L, 52L))
    // consecutive chunks overlap by exactly `overlap` tokens on the grid
    val c0 = d1(0)._3.split(" "); val c1 = d1(1)._3.split(" ")
    assert(c0.takeRight(16).toSeq == c1.take(16).toSeq)
    // every source token appears in order when overlaps are dropped
    val stitched = d1.zipWithIndex.flatMap { case ((_, _, txt, _), i) =>
      val t = txt.split(" "); if (i == 0) t else t.drop(16)
    }
    assert(stitched.toSeq == (1 to 100).map(i => s"t$i"))
    assert(out.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((0L, "only three tokens", 3L)))
    assert(!out.exists(_._1 == 3L))
    assert(out.filter(_._1 == 4L).map(_._4).toSeq == Seq(64L))
  }

  test("snapshotDiff: added/removed/changed classified, unchanged dropped") {
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val v2 = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val got = Corpus.snapshotDiff(v1, v2, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "removed"), (3L, "changed"), (4L, "added")))
    // identical snapshots → empty diff
    assert(Corpus.snapshotDiff(v1, v1, "doc_id", "text").isEmpty)
  }

  test("redactPii: planted emails and phones are tagged and counted") {
    val df = Seq(
      (1L, "contact alice@example.com or bob.smith@corp.co.uk today"),
      (2L, "call 555-123-4567 or 555 987 6543 now"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = Corpus.redactPii(df, "text")
      .select("doc_id", "n_emails", "n_phones", "clean_text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L)._1 == 2 && out(1L)._3 ==
      "contact <EMAIL> or <EMAIL> today")
    assert(out(2L)._2 == 2 && out(2L)._3 == "call <PHONE> or <PHONE> now")
    assert(out(3L) == ((0, 0, "no pii here at all")))
  }

  test("repeatedBlocks: aligned cross-doc blocks found once each, no pair explosion") {
    val block = (1 to 8).map(i => s"w$i").mkString(" ") // one 8-token block
    val df = Seq(
      (1L, block + " " + (1 to 8).map(i => s"x$i").mkString(" ")), // block at grid 1
      (2L, block),                                                  // same block alone
      (3L, block),                                                  // third copy
      (4L, (1 to 8).map(i => s"y$i").mkString(" "))                 // unique
    ).toDF("doc_id", "text")
    val out = Corpus.repeatedBlocks(df, "doc_id", "text", blockTokens = 8)
      .as[(String, Long, Long)].collect()
    // exactly one repeated block: w1..w8, in 3 docs, 3 occurrences
    assert(out.length == 1)
    assert(out.head._2 == 3L && out.head._3 == 3L)
    // a doc repeating the block TWICE counts once in n_docs, twice in occurrences
    val rep = Seq((1L, block + " " + block), (2L, block)).toDF("doc_id", "text")
    val out2 = Corpus.repeatedBlocks(rep, "doc_id", "text", blockTokens = 8)
      .as[(String, Long, Long)].collect()
    assert(out2.length == 1 && out2.head._2 == 2L && out2.head._3 == 3L)
  }

  test("gatedIngest: observe() accounts the gate in the same pass (no second scan)") {
    val df = Seq(
      (1L, "long enough to pass the thirty character gate easily"),
      (2L, "too short"),
      (3L, "another sufficiently long document that clears the bar")
    ).toDF("doc_id", "text")
    val gated = Corpus.gatedIngest(df, "text", minChars = 30)
    val kept = gated.collect()
    assert(kept.map(_.getLong(0)).toSet == Set(1L, 3L))
    val m = gated.queryExecution.observedMetrics
    val in = m("corpus_gate_in"); val out = m("corpus_gate_out")
    assert(in.getAs[Long]("rows_in") == 3L)
    assert(in.getAs[Long]("chars_in") ==
      df.collect().map(_.getString(1).length.toLong).sum)
    assert(out.getAs[Long]("rows_out") == 2L)
  }

  test("leakageSafeSplit: a whole near-dup cluster lands on one side") {
    import org.apache.spark.sql.functions.{col, md5, substring}
    // 40 docs; edges chain them into clusters of 4 ⇒ 10 clusters
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val edges = (0L until 40L).filter(_ % 4 != 0)
      .map(i => (i - 1, i)).toDF("src", "dst")
    val got = Corpus.leakageSafeSplit(docs, edges, "doc_id", valSixteenths = 8)
      .select("doc_id", "component", "split")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    // every member carries its cluster min as component and the SAME split
    got.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.map(_._1).min == comp)
      assert(members.map(_._3).distinct.size == 1,
        s"cluster $comp straddles the split: $members")
      assert(members.size == 4)
    }
    // the split rule is the documented md5-of-representative hash — and
    // with 8/16 val-sixteenths both sides must actually occur here
    val expected = docs.sparkSession.range(0, 40, 4)
      .select(col("id"),
        substring(md5(col("id").cast("string")), 1, 1).as("h"))
      .as[(Long, String)].collect().toMap
    got.foreach { case (_, comp, split) =>
      val digit = Integer.parseInt(expected(comp), 16)
      assert((digit < 8) == (split == "val"), s"hash rule diverged at $comp")
    }
    assert(got.map(_._3).distinct.size == 2, "fixture should hit both splits")
  }

  test("leakageSafeSplit: docs without an edge split as their own singleton cluster") {
    val docs = Seq((1L, "a"), (2L, "b"), (9L, "lonely")).toDF("doc_id", "text")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Corpus.leakageSafeSplit(docs, edges, "doc_id")
      .select("doc_id", "component").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
  }

  test("leakageSafeSplit: caller columns named 'id' survive, and idCol = 'id' works") {
    // a bare drop("id") after the CC join would delete the caller's own
    // 'id' column (and break entirely when the key column IS 'id')
    val docs = Seq((1L, "payload-1"), (2L, "payload-2"), (9L, "payload-9"))
      .toDF("id", "text")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = Corpus.leakageSafeSplit(docs, edges, "id")
    assert(out.columns.toSeq == Seq("id", "text", "component", "split"),
      s"caller schema mangled: ${out.columns.toSeq}")
    val got = out.select("id", "component", "text")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 1L, "payload-1"), (2L, 1L, "payload-2"),
      (9L, 9L, "payload-9")))
  }

  test("padding waste: pow2 buckets, caps, floors, and exact waste accounting") {
    val docs = Seq(
      (1L, "a b c"),                      // 3 subwords -> bucket 16, waste 13
      (2L, ("w " * 20).trim),             // 20 subwords -> bucket 32, waste 12
      (3L, ""),                           // 0 -> floor bucket 16, waste 16
      (4L, ("x " * 600).trim)             // 600 -> capped 512, bucket 512, waste 0
    ).toDF("doc_id", "text")
    val out = Corpus.paddingWaste(docs, "text")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // bucket 16: docs 1+3 — tokens 3+0, waste 13+16
    assert(out.head == ((16L, 2L, 3L, 29L, 29L * 1000L / 32L)), out.head)
    assert(out(1) == ((32L, 1L, 20L, 12L, 12L * 1000L / 32L)), out(1))
    assert(out(2) == ((512L, 1L, 512L, 0L, 0L)), out(2))
  }

  test("dedupLines: keep-first order, telemetry, literal separator quoting") {
    val docs = Seq(
      (1L, "nav\nbody one\nnav\nbody two\nnav"), // 3x nav -> 1
      (2L, "only line"),                          // nothing to remove
      (3L, ""),                                   // empty doc: one empty line
      (4L, "a\n\nb\n\na")                         // blanks are lines too
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out(1L) == (("nav\nbody one\nbody two", 5, 2)))
    assert(out(2L) == (("only line", 1, 0)))
    assert(out(3L) == (("", 1, 0)))
    // blanks: first blank kept in place, second removed
    assert(out(4L) == (("a\n\nb", 5, 2)))
    // a regex-special separator must split on the LITERAL, not on
    // every character ("." unquoted matches everything)
    val dot = Seq((1L, "x.y.x")).toDF("doc_id", "text")
    val d = Corpus.dedupLines(dot, "doc_id", "text", sep = ".")
      .as[(Long, String, Long, Long)].collect().head
    assert(d == ((1L, "x.y", 3L, 1L)))
  }

  test("removeCommonLines: fraction threshold, order rebuild, emptied docs survive") {
    // 4 docs; "nav" in 4/4 (1000 permille), "foot" in 3/4 (750), rest rarer
    val docs = Seq(
      (1L, "nav\nalpha\nfoot"),
      (2L, "nav\nbeta\nfoot\nalpha"),
      (3L, "nav\nfoot"),          // everything chrome at 700 -> emptied
      (4L, "nav\ngamma")
    ).toDF("doc_id", "text")
    def run(permille: Int) =
      Corpus.removeCommonLines(docs, "doc_id", "text", permille = permille)
        .as[(Long, String, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // at 800: only nav (4/4) is chrome; foot (750) survives
    val loose = run(800)
    assert(loose(1L) == (("alpha\nfoot", 3L, 1L)))
    assert(loose(3L) == (("foot", 2L, 1L)))
    // at 700: nav AND foot go; doc 3 empties but STAYS a row
    val tight = run(700)
    assert(tight(1L) == (("alpha", 3L, 2L)))
    assert(tight(2L) == (("beta\nalpha", 4L, 2L)), "original order, not sorted")
    assert(tight(3L) == (("", 2L, 2L)))
    assert(tight(4L) == (("gamma", 2L, 1L)))
  }
}
