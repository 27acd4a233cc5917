package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
  private def docs = Seq(
    (1L, base),
    (2L, base + " extra"), // near-dup of 1 (one token appended)
    (3L, base.replace("quick", "slow")), // near-dup of 1 (one token changed)
    (4L, "completely different content about database engines and query optimizers running at scale"),
    (5L, "another unrelated document mentioning spark catalyst tungsten and whole stage code generation"),
    (6L, base) // exact dup of 1
  ).toDF("doc_id", "text")

  test("exactByFingerprint: case/whitespace variants collapse, min id kept") {
    val df = Seq(
      (10L, "Hello  World"),
      (11L, "hello world"), // same after case/space folding
      (12L, "HELLO\tWORLD\n"), // same
      (13L, "goodbye world")
    ).toDF("doc_id", "text")
    val kept = Dedup.exactByFingerprint(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(10L, 13L))
  }

  test("minhashPairs finds planted near-dups and not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
      numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "append-one-token near-dup missed")
    assert(pairs.contains((1L, 6L)), "exact dup missed")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L && p._1 != 5L),
      "unrelated doc matched")
  }

  test("minhashDedup keeps the min-id representative of each dup set") {
    val kept = Dedup.minhashDedup(docs, "text", "doc_id",
      numHashes = 64, bands = 16, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(6L))
    assert(kept.contains(4L) && kept.contains(5L))
  }

  test("keepBestByKey: longest copy wins its group, ties fall back to min id") {
    val fixture = Seq(
      (1L, "a b"),            // group A, len 3
      (2L, "a  b"),           // group A, len 4  <- longest, wins
      (3L, "A B "),           // group A, len 4  — tie with 2, higher id loses
      (4L, "other doc")       // singleton survives
    ).toDF("doc_id", "text")
    val kept = Dedup.keepBestByKey(
      graft.operators.TextAnalysis.fingerprint(fixture, "text"),
      Seq("fp"), "doc_id", better = length($"text"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 4L),
      s"expected longest-then-min-id survivors, got ${kept.toSeq}")
  }

  test("admitNew: incoming rows with an already-known digest are rejected") {
    val existing = Seq((100L, "known document one"), (101L, "known document two"))
      .toDF("doc_id", "text")
      .select(md5(col("text")).as("digest"))
    val incoming = Seq(
      (200L, "known document one"),   // dup of existing — rejected
      (201L, "a genuinely new document"),
      (202L, "known document two"),   // dup — rejected
      (203L, "another new one")
    ).toDF("doc_id", "text")
    val admitted = Dedup.admitNew(incoming, "text", existing)
      .select("doc_id").as[Long].collect().sorted
    assert(admitted.toSeq == Seq(201L, 203L))
  }

  test("admitNewNearDup: near-dups of indexed docs rejected, novel docs admitted") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "entirely different content about distributed query engines and planning")
    ).toDF("doc_id", "text")
    val index = Dedup.buildBandIndex(corpus, "text")
    val incoming = Seq(
      // near-dup of doc 1: one word changed — shares almost all shingles
      (10L, "the quick brown fox leaps over the lazy dog again and again today"),
      // exact dup of doc 2
      (11L, "entirely different content about distributed query engines and planning"),
      // genuinely novel
      (12L, "completely unrelated musings on sourdough hydration ratios and ovens")
    ).toDF("doc_id", "text")
    val admitted = Dedup.admitNewNearDup(incoming, "text", "doc_id", index)
      .select("doc_id").as[Long].collect().sorted
    assert(admitted.toSeq == Seq(12L), s"got ${admitted.toSeq}")
    // index build is deterministic (pure function of the text)
    val again = Dedup.buildBandIndex(corpus, "text")
    assert(index.exceptAll(again).isEmpty && again.exceptAll(index).isEmpty)
  }

  test("minhashDedupCc collapses hub-linked clusters that pairwise dropping keeps") {
    // hub doc 5 is half doc-1 content, half doc-2 content: 5~1 and 5~2
    // qualify at the low threshold but 1~2 share nothing. Pairwise
    // loser-dropping keeps {1, 2}; transitive clustering must keep only
    // the cluster minimum {1} (plus the unrelated 9).
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val hub = Seq(
      (1L, a),
      (2L, b),
      // 9 of 12 words from each side: J(5,1) ≈ J(5,2) ≈ 0.37, J(1,2) = 0.
      // 32 bands × 2 rows makes the banding catch J ≈ 0.37 with
      // probability ≈ 1 (1-(1-J²)³² ≈ .99) while J = 0 stays out.
      (5L, a.split(' ').take(9).mkString(" ") + " " + b.split(' ').take(9).mkString(" ")),
      (9L, "totally separate words about compilers registers allocators and instruction scheduling")
    ).toDF("doc_id", "text")
    // sanity: the candidate graph really is the hub shape (1-5, 2-5, no 1-2)
    val pairs = Dedup.minhashPairs(hub, "text", "doc_id",
      numHashes = 64, bands = 32, threshold = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)) && pairs.contains((2L, 5L)), s"hub edges missing: $pairs")
    assert(!pairs.contains((1L, 2L)), s"1~2 must not be candidates: $pairs")
    val keptCc = Dedup.minhashDedupCc(hub, "text", "doc_id",
      numHashes = 64, bands = 32, threshold = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(keptCc == Set(1L, 9L), s"CC dedup kept $keptCc")
    val keptPairwise = Dedup.minhashDedup(hub, "text", "doc_id",
      numHashes = 64, bands = 32, threshold = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(keptPairwise == Set(1L, 2L, 9L),
      s"pairwise dedup semantics changed: $keptPairwise")
  }

  test("simhashPairs: hamming distance small for near-dups, large for unrelated") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 8)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((1L, 6L)).contains(0), "exact dup should have hamming 0")
    assert(m.contains((1L, 2L)), "near-dup should be within hamming 8")
    assert(!m.contains((4L, 5L)), "unrelated docs should exceed hamming 8")
  }

  test("simhash banding covers the full requested hamming radius (pigeonhole)") {
    import org.apache.spark.unsafe.types.UTF8String
    // deterministic token-substitution variants of the base sentence; the
    // interesting pairs are hamming 4..8 with flips touching ALL FOUR
    // 16-bit chunks — exactly what round 1's fixed 4×16 banding silently
    // dropped at maxHamming=8
    val baseToks = base.split(" ")
    val variants = (for {
      p <- baseToks.indices; k <- 0 until 6
    } yield baseToks.updated(p, s"w$k$p").mkString(" ")).distinct
    val sigs = variants.map(t => graft.functions.TextHash.simhashText(UTF8String.fromString(t)))
    val want = (for {
      i <- sigs.indices.iterator
      j <- ((i + 1) until sigs.length).iterator
      x = sigs(i) ^ sigs(j)
      hd = java.lang.Long.bitCount(x)
      if hd >= 4 && hd <= 8
      if (0 until 4).forall(c => ((x >>> (c * 16)) & 0xffffL) != 0L)
    } yield (i.toLong, j.toLong)).toSeq
    assert(want.nonEmpty, "fixture search found no qualifying pair — widen the variant generator")
    val df = variants.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val found = Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    want.foreach { p =>
      assert(found.contains(p), s"pair $p within hamming 8 missed by the banding")
    }
  }

  test("lane_match_count equals the interpreted zip_with/filter HOF") {
    import graft.functions.{lane_match_count, minhash_text}
    val df = docs.select(
      minhash_text(col("text"), 3, 64).as("a"),
      minhash_text(reverse(col("text")), 3, 64).as("b"))
    val cmp = df.select(
      lane_match_count(col("a"), col("b")).as("fast"),
      expr("size(filter(zip_with(a, b, (x, y) -> x = y), m -> m))").as("slow"),
      lane_match_count(col("a"), col("a")).as("self")).collect()
    cmp.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "kernel disagrees with HOF reference")
      assert(r.getInt(2) == 64)
    }
  }

  test("ngramJaccard: exact dup = 1.0, near-dup high, ordering deterministic") {
    val cands = Seq((1L, 2L), (1L, 6L), (4L, 5L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(docs, "text", "doc_id", cands)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(j((1L, 6L)) == 1.0)
    assert(j((1L, 2L)) > 0.8)
    assert(j((4L, 5L)) == 0.0)
  }

  test("ngramJaccard: over-bound candidate set plans a shuffle join, identical rows") {
    val cands = Seq((1L, 2L), (1L, 6L), (4L, 5L)).toDF("id_a", "id_b")
    val hintedRows = Dedup.ngramJaccard(docs, "text", "doc_id", cands)
      .as[(Long, Long, Double)].collect().toSeq
    // bound 1 < 3 candidates → the broadcast hint must NOT be applied:
    // the planner is free to pick (and here picks) a non-broadcast join
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val guarded = Dedup.ngramJaccard(docs, "text", "doc_id", cands,
        broadcastPairBound = 1L)
      val plan = guarded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"over-bound candidates still broadcast:\n$plan")
      assert(guarded.as[(Long, Long, Double)].collect().toSeq == hintedRows,
        "shuffle-join path returned different rows than the broadcast path")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
  }

  test("jaccardJoin equals brute-force all-pairs (exact; no LSH recall loss)") {
    val fixture = docs.union(Seq(
      (7L, "!!! ... ???"), // zero-token doc: no Jaccard defined, excluded
      (8L, null.asInstanceOf[String]), // null text: dropped, not crashed on
      (9L, base + " extra") // exact dup of 2
    ).toDF("doc_id", "text"))
    val got = Dedup.jaccardJoin(fixture, "text", "doc_id", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq

    val sets = fixture.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")
        .toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet))
      .filter(_._2.nonEmpty)
    val expect = for {
      (ia, sa) <- sets.toSeq; (ib, sb) <- sets.toSeq if ia < ib
      j = (sa & sb).size.toDouble / (sa | sb).size if j >= 0.5
    } yield (ia, ib, j)
    assert(got.toSet == expect.toSet,
      s"exact join diverged from brute force: got ${got.toSet}, want ${expect.toSet}")
    assert(got == got.sortBy(p => (p._1, p._2)), "output must be pair-ordered")
    assert(got.exists(p => p._1 == 2L && p._2 == 9L && p._3 == 1.0))
  }

  test("jaccardJoin output-bound cost budget: verified-pair throughput stays above the pinned floor") {
    // The exact join's cost is Θ(qualifying pairs) — r8 measured ~40 µs
    // of machinery (candidate exchange + pair aggregation + verify join)
    // per OUTPUT pair at sf0.1, and the r9 bitset-block experiment
    // confirmed the intersection walk itself is noise (≈23-element sets,
    // early exit): repacking sets as popcount blocks moved min-of-N CPU
    // by less than run variance while ADDING a corpus-token groupBy and
    // a dictionary exchange, so it was dropped. This spec pins the
    // output-bound contract as a throughput floor instead of an absolute
    // CPU bar: ≥ 100 verified pairs per executor-CPU-second at sf0.01.
    // Idle-box measurements run 5–35k pairs/s; the floor is deliberately
    // 50×+ below that, because this is a CORRECTNESS suite running on
    // arbitrary hosts — the assert exists to catch an algorithmic
    // regression (a quadratic shape would cut throughput ~100×, sailing
    // far under any floor), not to re-litigate the bench numbers here.
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = Dedup.jaccardJoin(
        graft.sources.Tables.documents(spark, "/root/testdata/sf0.01"),
        "text", "doc_id", threshold = 0.9)
      val pairs = out.count()
      // listener delivery is async — wait for the metric to settle
      var last = -1L
      var spins = 0
      while (cpuNs.get != last && spins < 40) {
        last = cpuNs.get; Thread.sleep(50); spins += 1
      }
      val cpuSec = cpuNs.get / 1e9
      assert(pairs > 1000, s"fixture degenerated: only $pairs pairs")
      val throughput = pairs / math.max(cpuSec, 1e-9)
      assert(throughput >= 100.0,
        f"output-bound budget broken: $pairs pairs in $cpuSec%.1f CPU-s = " +
          f"$throughput%.0f pairs/s (floor 100)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("shingles/tokens behave on short and empty inputs") {
    val df = Seq((1L, "one two"), (2L, ""), (3L, "single")).toDF("id", "text")
    val out = df.select(col("id"),
      Dedup.shingles(Dedup.tokens(col("text")), 3).as("sh")).collect()
    assert(out.length == 3) // no crash on degenerate docs
  }

  test("oversized buckets are dropped whole (degenerate-content skew guard)") {
    // 50 empty docs hash identically → every band bucket exceeds
    // maxBucket=10 and is dropped; the planted real dup still pairs
    val degenerate = (1 to 50).map(i => (i.toLong, ""))
    val df = (degenerate ++ Seq((100L, base), (101L, base))).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(df, "text", "doc_id",
      numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)), s"got $pairs")
  }

  test("null text rows are dropped from pair generation, not crashed on") {
    val withNull = docs.union(Seq((100L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val pairs = Dedup.minhashPairs(withNull, "text", "doc_id", 64, 16, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 6L))) // real dups still found
    assert(!pairs.exists(p => p._1 == 100L || p._2 == 100L))
    val sim = Dedup.simhashPairs(withNull, "text", "doc_id", 8)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(!sim.exists(p => p._1 == 100L || p._2 == 100L))
  }

  test("fused kernels equal the composed HOF path (minhash + simhash)") {
    import graft.functions.{minhash_signature, minhash_text, simhash64, simhash_text}
    val df = docs.union(Seq((7L, ""), (8L, "one two"), (9L, "Tabs\tAnd  SPACES!! 42"))
      .toDF("doc_id", "text"))
    val cmp = df.select(
      minhash_signature(Dedup.shingles(Dedup.tokens(col("text")), 3), 64).as("slow_mh"),
      minhash_text(col("text"), 3, 64).as("fast_mh"),
      simhash64(Dedup.tokens(col("text"))).as("slow_sh"),
      simhash_text(col("text")).as("fast_sh")).collect()
    cmp.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "minhash mismatch")
      assert(r.getLong(2) == r.getLong(3), "simhash mismatch")
    }
  }

  test("minhashPairs equals signature-level brute force on random mutated corpora") {
    // randomized cross-check of the BANDING + SCORING machinery: a pair
    // must appear iff (a) some band's lane slice agrees exactly AND
    // (b) lane-agreement / k >= threshold — recomputed here by brute
    // force over the collected signatures. Fixed seed => deterministic.
    import graft.functions.{minhash_text, shingle_hash_set}
    val rnd = new scala.util.Random(20260813)
    val vocab = Vector.tabulate(30)(i => s"tok$i")
    val numHashes = 64; val bands = 16; val rpb = numHashes / bands; val th = 0.5
    for (trial <- 1 to 2) {
      val docs: Seq[(Long, String)] = (0 until 15).flatMap { i =>
        val toks = Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        val mut = toks.updated(rnd.nextInt(toks.size), vocab(rnd.nextInt(vocab.size)))
        Seq((i * 2L, toks.mkString(" ")), (i * 2L + 1, mut.mkString(" ")))
      }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.minhashPairs(df, "text", "doc_id",
        numHashes, bands, th, maxBucket = 100000)
        .as[(Long, Long, Double)].collect().toSet
      val sigs = df.select(col("doc_id"),
        minhash_text(col("text"), 3, numHashes).as("sig"))
        .as[(Long, Seq[Long])].collect()
      val want = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / numHashes
        if est >= th
        if (0 until bands).exists(b =>
          sa.slice(b * rpb, (b + 1) * rpb) == sb.slice(b * rpb, (b + 1) * rpb))
      } yield (ia, ib, est)).toSet
      assert(got == want, s"trial $trial: banding/scoring diverged from brute " +
        s"force — missing=${want -- got} extra=${got -- want}")
      // every returned estimate tracks TRUE shingle Jaccard (k=64 lanes:
      // >5 sigma; deterministic under the fixed seed, so never flaky)
      val shingleSets = df.select(col("doc_id"),
        shingle_hash_set(col("text"), 3).as("ss"))
        .as[(Long, Seq[Long])].collect().map { case (id, s) => id -> s.toSet }.toMap
      got.foreach { case (ia, ib, est) =>
        val (sa, sb) = (shingleSets(ia), shingleSets(ib))
        val trueJ = (sa & sb).size.toDouble / (sa | sb).size
        assert(math.abs(est - trueJ) <= 0.35,
          s"pair ($ia,$ib): est $est far from true Jaccard $trueJ")
      }
    }
  }

  test("simhashPairs equals all-pairs hamming brute force on random mutated corpora") {
    // the pigeonhole banding is COMPLETE within maxHamming, so (with the
    // bucket cap out of the way) the output must EQUAL the brute-force
    // all-pairs hamming filter over the collected signatures.
    import graft.functions.simhash_text
    val rnd = new scala.util.Random(42)
    val vocab = Vector.tabulate(25)(i => s"word$i")
    val maxH = 8
    for (trial <- 1 to 2) {
      val docs: Seq[(Long, String)] = (0 until 15).flatMap { i =>
        val toks = Seq.fill(10 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        val mut = toks.updated(rnd.nextInt(toks.size), vocab(rnd.nextInt(vocab.size)))
        Seq((i * 2L, toks.mkString(" ")), (i * 2L + 1, mut.mkString(" ")))
      }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.simhashPairs(df, "text", "doc_id", maxH, maxBucket = 100000)
        .as[(Long, Long, Int)].collect().toSet
      val sigs = df.select(col("doc_id"), simhash_text(col("text")).as("sh"))
        .as[(Long, Long)].collect()
      val want = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
      } yield (ia, ib, h)).toSet
      assert(got == want, s"trial $trial: banding diverged from brute force — " +
        s"missing=${want -- got} extra=${got -- want}")
    }
  }

  test("jaccardJoin equals brute force on random high-collision corpora") {
    val rnd = new scala.util.Random(20260813)
    val vocab = Vector.tabulate(12)(i => s"w$i") // tiny vocab -> dense overlaps
    for (trial <- 1 to 3) {
      val docs = (1L to 40L).map { id =>
        val n = 3 + rnd.nextInt(8)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = Dedup.jaccardJoin(docs.toDF("doc_id", "text"), "text", "doc_id",
        threshold = 0.4).as[(Long, Long, Double)].collect().toSet
      val sets = docs.map { case (id, t) =>
        (id, t.split(" ").filter(_.nonEmpty).toSet) }
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        j = (sa & sb).size.toDouble / (sa | sb).size if j >= 0.4
      } yield (ia, ib, j)).toSet
      assert(got == want, s"trial $trial: prefix filter lost/invented pairs — " +
        s"missing=${want -- got} extra=${got -- want}")
    }
  }

  test("bagFingerprint: permutation-invariant, multiset-exact, case/punct folded") {
    val fps = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),   // permutation of 1 -> same bag
      (3L, "Alpha, beta; GAMMA"), // case/punct variant -> same bag
      (4L, "alpha alpha beta"),   // multiset differs from 5
      (5L, "alpha beta beta"),
      (6L, "alpha beta")          // subset, not equal
    ).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.bagFingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) == fps(3L))
    assert(fps(4L) != fps(5L), "token multiplicities must distinguish bags")
    assert(fps(1L) != fps(6L))
  }
}
