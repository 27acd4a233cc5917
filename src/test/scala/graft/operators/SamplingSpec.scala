package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("lang"))

  test("bucket1000: in range, deterministic, roughly uniform") {
    val buckets = docs.select(Sampling.bucket1000(col("doc_id")).as("b"))
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 1000))
    // deterministic: same expression, same values
    val again = docs.select(Sampling.bucket1000(col("doc_id")).as("b"))
      .as[Long].collect()
    assert(buckets.toSeq == again.toSeq)
    // roughly uniform: halves of the range split the corpus ~evenly
    val low = buckets.count(_ < 500).toDouble / buckets.length
    assert(low > 0.35 && low < 0.65, s"lower-half fraction $low")
    // negative ids stay in range too (C-style % would go negative and
    // make every threshold comparison silently keep the row)
    val edge = Seq(-1L, -999L, Long.MinValue + 7, 0L, Long.MaxValue)
      .toDF("id").select(Sampling.bucket1000(col("id")).as("b"))
      .as[Long].collect()
    assert(edge.forall(b => b >= 0 && b < 1000), s"out of range: ${edge.toSeq}")
  }

  test("stratifiedSample: near-target fractions, nested-subset property") {
    val n = docs.count().toDouble
    val half = Sampling.stratifiedSample(docs, "lang", "doc_id",
      permille = Map.empty, defaultPermille = 500)
    val frac = half.count() / n
    assert(frac > 0.35 && frac < 0.65, s"500‰ sample fraction $frac")
    // growing the rate only ADDS rows (nested samples — no resampling)
    val tenth = Sampling.stratifiedSample(docs, "lang", "doc_id",
      permille = Map.empty, defaultPermille = 100)
    assert(tenth.exceptAll(half).isEmpty,
      "100‰ sample must be a subset of the 500‰ sample")
    // per-stratum override applies to that stratum only
    val mixed = Sampling.stratifiedSample(docs, "lang", "doc_id",
      permille = Map("en" -> 1000), defaultPermille = 0)
    val langs = mixed.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"))
    assert(mixed.count() == docs.filter(col("lang") === "en").count())
  }

  test("percentileBandFilter: trims exact value tails, keeps the band") {
    val df = (1L to 100L).map(i => (i, i)).toDF("doc_id", "v")
    // p10–p90 on values 1..100: cum(v) = v, total = 100 →
    // keep 10·v ≥ 100 (v ≥ 10) and 10·(v-1) ≤ 9·100 (v ≤ 91)
    val kept = Sampling.percentileBandFilter(df, "v", 1, 9, 10)
      .select("v").as[Long].collect().sorted
    assert(kept.toSeq == (10L to 91L))
    // duplicated values move the band edges with their mass
    val dup = ((1L to 10L).map(i => (i, 1L)) ++ Seq((11L, 2L))).toDF("doc_id", "v")
    // v=1: cum 10/11 — covers the whole p0–p90 band; v=2 starts above p90
    val kept2 = Sampling.percentileBandFilter(dup, "v", 0, 9, 10)
      .select("v").as[Long].collect()
    assert(kept2.forall(_ == 1L) && kept2.length == 10)
  }

  test("rebalanceToSmallest: every stratum lands near the smallest count") {
    val counts = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val mn = counts.values.min
    val out = Sampling.rebalanceToSmallest(docs, "lang", "doc_id")
    val outCounts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(outCounts.keySet == counts.keySet, "no stratum may vanish")
    outCounts.foreach { case (lang, c) =>
      // hash acceptance is binomial around the floor()'d permille target;
      // fixture strata are small, so allow wide-but-bounded slack
      assert(c <= counts(lang), s"$lang grew")
      assert(math.abs(c - mn) <= math.max(6L, mn / 2),
        s"$lang kept $c, expected ≈ $mn")
    }
    // deterministic end to end
    val again = Sampling.rebalanceToSmallest(docs, "lang", "doc_id")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("groupSample: exactly k per group, reproducible, seed-sensitive, WindowGroupLimit plan") {
    val full = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Sampling.groupSample(full, "source", "doc_id", k = 5)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 5L), s"not 5 per source: $counts")
    val again = Sampling.groupSample(full, "source", "doc_id", k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet == again)
    val other = Sampling.groupSample(full, "source", "doc_id", k = 5, seed = "7")
      .select("doc_id").as[Long].collect().toSet
    assert(again != other, "different seed must draw a different sample")
    // nested property of k: the 3-sample is a strict subset of the 5-sample
    val three = Sampling.groupSample(full, "source", "doc_id", k = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(three.subsetOf(again))
    // rank pushdown: map tasks trim per-group rows BEFORE the exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("budgetSelect: best-first prefix per group within the budget") {
    val rows = Seq(
      ("a", 1L, 100L), ("a", 2L, 900L), ("a", 3L, 600L), ("a", 4L, 500L),
      ("b", 5L, 2000L), ("b", 6L, 1L)
    ).toDF("g", "id", "cost")
    val out = Sampling.budgetSelect(rows, "g", "cost", "cost", "id", budget = 1500L)
      .select("g", "id", "cum_cost").as[(String, Long, Long)].collect().toSet
    // a: order 900, 600, 500, 100 → cum 900, 1500, 2000✗ (500 blocks 100
    // even though 100 would fit — prefix semantics, not knapsack)
    // b: 2000 overflows immediately and blocks the 1-char doc behind it
    assert(out == Set(("a", 2L, 900L), ("a", 3L, 1500L)))
  }

  test("budgetEpochs: matches an integer brute-force replay; never overspends") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813)
    for (trial <- 1 to 5) {
      val n = 3 + rnd.nextInt(8)
      val tokens = (0 until n).map(i => (s"s$i", 100L + rnd.nextInt(5000)))
      val weights = (0 until n).map(i => (s"s$i", 1L + rnd.nextInt(30)))
      val budget = 50L + rnd.nextInt(20000)
      val maxEpochs = 1 + rnd.nextInt(3)
      // direct transcription of the documented two-round allocation
      val w = weights.toMap
      val totW = weights.map(_._2).sum
      val r1 = tokens.map { case (s, t) =>
        val cap = maxEpochs * t
        (s, t, math.min(budget * w(s) / totW, cap), cap)
      }
      val a1 = r1.map(_._3).sum
      val w2 = r1.collect { case (s, _, al, cap) if al < cap => w(s) }.sum
      val want = r1.map { case (s, t, al, cap) =>
        val fin = if (al < cap && w2 > 0)
          math.min(al + (budget - a1) * w(s) / w2, cap) else al
        (s, t, w(s), fin, 1000000L * fin / t, fin == cap)
      }.sortBy(_._1)
      val got = Sampling.budgetEpochs(
        tokens.toDF("source", "tokens"), weights.toDF("source", "weight"),
        budget, maxEpochs)
        .as[(String, Long, Long, Long, Long, Boolean)]
        .collect().sortBy(_._1).toSeq
      assert(got == want, s"trial $trial: $got vs $want")
      assert(got.map(_._4).sum <= budget, s"trial $trial overspent the budget")
      assert(got.forall(r => r._4 <= maxEpochs * r._2),
        s"trial $trial violated the epoch cap")
    }
    graft.CacheScope.releaseAll()
  }

  test("budgetEpochs: empty sources are dropped, not divided by") {
    import spark.implicits._
    val out = Sampling.budgetEpochs(
      Seq(("a", 100L), ("b", 0L)).toDF("source", "tokens"),
      Seq(("a", 1L), ("b", 5L)).toDF("source", "weight"),
      budget = 1000L, maxEpochs = 2)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    // 'b' is gone; 'a' takes its cap (its own weight is the whole pool)
    assert(out == Seq(("a", 100L, 1L, 200L, 2000000L, true)))
    graft.CacheScope.releaseAll()
  }

  test("temperatureMix: per-stratum keep rate is floor(1000*sqrt(cmin/ci)) permille") {
    // planted strata: A=400 docs, B=100, C=25 -> cmin=25
    // thr_A = floor(1000*sqrt(25/400)) = 250, thr_B = 500, thr_C = 1000
    val rows = (0L until 400L).map(i => (i, "A")) ++
      (400L until 500L).map(i => (i, "B")) ++
      (500L until 525L).map(i => (i, "C"))
    val df = rows.toDF("doc_id", "lang")
    val kept = Sampling.temperatureMix(df, "lang", "doc_id")
      .select("doc_id", "lang").as[(Long, String)].collect()

    // the smallest stratum is kept whole (thr = 1000 admits every bucket)
    assert(kept.count(_._2 == "C") == 25)
    // every kept row satisfies the bucket threshold, and every dropped
    // row fails it -- cross-checked against the same thresholds applied
    // through stratifiedSample (shared kernel, independent path)
    val viaStratified = Sampling.stratifiedSample(
      df, "lang", "doc_id",
      permille = Map("A" -> 250, "B" -> 500, "C" -> 1000),
      defaultPermille = 0)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(kept.toSet == viaStratified.toSet)
    // alpha = 1/2 interpolation: strictly more than uniform-rebalance
    // would keep, strictly less than keep-all (for the big stratum)
    val nA = kept.count(_._2 == "A")
    assert(nA > 25 && nA < 400, s"A kept $nA")
    // deterministic re-run
    val again = Sampling.temperatureMix(df, "lang", "doc_id")
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(kept.toSet == again.toSet)
  }

  test("target affinity ranks in-domain docs above disjoint-vocabulary docs") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "tgt"),
      (2L, "alpha beta gamma delta", "pool"),   // shares the target vocab
      (3L, "zebra xylophone quartz", "pool"),   // disjoint
      (4L, "alpha alpha alpha alpha", "pool")   // pure overlap, high tf
    ).toDF("doc_id", "text", "source")
    val ranked = Sampling.targetAffinity(docs,
      docs.filter($"source" === "tgt"), "doc_id", "text", topN = 10)
      .select("doc_id", "affinity", "affinity_micro")
      .as[(Long, Long, Long)].collect()
    val order = ranked.map(_._1).toSeq
    assert(order.head == 4L || order.head == 1L,
      s"a pure-overlap doc must rank top: $order")
    assert(order.last == 3L, s"the disjoint doc must rank last: $order")
    val byId = ranked.map(r => r._1 -> r).toMap
    assert(byId(3L)._2 == 0L, "disjoint vocabulary ⇒ zero affinity")
    // affinity: doc 4 = 4 tokens × target_cnt(alpha)=2 ⇒ 8
    assert(byId(4L)._2 == 8L, s"tf × target_cnt must multiply: ${byId(4L)}")
    // length normalization: affinity_micro is per-token
    assert(byId(4L)._3 == 8L * 1000000L / 4L)
  }

  test("target affinity is deterministic and honors topN") {
    val docs = (1L to 30L).map(i => (i, s"tok${i % 7} tok${i % 5} common", "p"))
      .toDF("doc_id", "text", "source")
    val target = Seq((100L, "common common tok1", "t")).toDF("doc_id", "text", "source")
    val a = Sampling.targetAffinity(docs, target, "doc_id", "text", topN = 5)
      .select("doc_id").as[Long].collect().toSeq
    val b = Sampling.targetAffinity(docs, target, "doc_id", "text", topN = 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b && a.size == 5)
  }

  test("rebalanceToSmallest: a NULL stratum is rebalanced, not dropped-yet-counted") {
    val df = ((0 until 1000).map(i => (i.toLong, Some("en"))) ++
      (0 until 300).map(i => (1000L + i, Some("fr"))) ++
      (0 until 200).map(i => (2000L + i, Option.empty[String])))
      .toDF("id", "lang")
    val kept = Sampling.rebalanceToSmallest(df, "lang", "id")
    val byStratum = kept.groupBy("lang").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // the NULL stratum (200, the smallest) is the target size; the old
    // equality join dropped every NULL row AND let its count shrink the
    // other strata — with a tiny null group the output went EMPTY
    assert(byStratum.getOrElse(None, 0L) > 150L,
      s"null stratum must survive rebalancing: $byStratum")
    assert(byStratum.keySet == Set(Some("en"), Some("fr"), None))
    byStratum.foreach { case (s, n) =>
      assert(n >= 150 && n <= 250, s"stratum $s not near the smallest (200): $n")
    }
  }

  test("budgetSelect fails loud on NULL costs instead of punching prefix holes") {
    val df = Seq(
      (1L, "g", 9.0, Option(5L)),
      (2L, "g", 8.0, Option.empty[Long]), // null cost mid-prefix
      (3L, "g", 7.0, Option(5L))
    ).toDF("id", "grp", "quality", "cost")
    val e = intercept[Exception] {
      Sampling.budgetSelect(df, "grp", "quality", "cost", "id", budget = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-negative")), s"unexpected error: $e")
  }

  test("budgetEpochs: zero/negative-weight sources get nothing (no cap fallback)") {
    val st = Seq(("a", 100L), ("b", 100L), ("c", 100L)).toDF("source", "tokens")
    val w = Seq(("a", 1L), ("b", 0L), ("c", -5L)).toDF("source", "weight")
    val out = Sampling.budgetEpochs(st, w, budget = 100, maxEpochs = 2)
      .select("source", "alloc_tokens").as[(String, Long)].collect().toMap
    // only 'a' holds a share; b/c must NOT fall back to their full caps
    // (the pre-fix ÷0 path allocated every source maxEpochs·tokens)
    assert(out == Map("a" -> 100L), s"got $out")
    graft.CacheScope.releaseAll()
  }

  test("systematicSample: sum(n_picks) == k, rows <= k, weights pass through") {
    // weights chosen so one heavy doc (w > W/k) must be drawn twice —
    // the multiplicity contract — while zero-weight docs never appear
    val df = Seq(
      (1L, 10L), (2L, 0L), (3L, 5L), (4L, 50L), (5L, 5L),
      (6L, 10L), (7L, 0L), (8L, 20L)
    ).toDF("doc_id", "n_chars")
    val k = 5
    val got = Sampling.systematicSample(df, "doc_id", "n_chars", k)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val inWeights = Map(1L -> 10L, 3L -> 5L, 4L -> 50L, 5L -> 5L,
      6L -> 10L, 8L -> 20L)
    // Σ n_picks = k EXACTLY — the invariant the r12 __w/__W column
    // clobber violated (all 8 docs came back, picks summing to 5×-wrong)
    assert(got.map(_._3).sum == k, s"sum(n_picks) != $k: ${got.toSeq}")
    assert(got.length <= k, s"more rows than k: ${got.toSeq}")
    // weight column must be the DOC's weight, not the grand total
    got.foreach { case (id, w, n) =>
      assert(inWeights(id) == w, s"doc $id weight clobbered: $w")
      assert(n >= 1)
      // multiplicity >1 only legal when w > W/k (W=100, W/k=20)
      if (n > 1) assert(w > 100L / k, s"doc $id drawn $n× at weight $w")
    }
    // zero-weight docs occupy no interval — never drawn
    assert(!got.exists(r => r._1 == 2L || r._1 == 7L))
    // the heavy doc (w=50 > 20) must carry multiplicity ≥ 2
    assert(got.find(_._1 == 4L).exists(_._3 >= 2), s"got ${got.toSeq}")
    graft.CacheScope.releaseAll()
  }

  test("interleaveSchedule: exact keys, no-burst pacing, loud zero-weight") {
    // two sources, weights 3:1 (by per-row weight sum) — a must appear
    // ~3× as often as b in any prefix
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L),
      ("a", 4L, 1L), ("a", 5L, 1L), ("a", 6L, 1L),
      ("b", 7L, 1L), ("b", 8L, 1L)
    ).toDF("source", "doc_id", "wt")
    // pacing weights: a = 6, b = 2
    val got = Sampling.interleaveSchedule(df, "source", "doc_id", col("wt"))
      .as[(String, Long, Int, Long)].collect()
    // exact key formula: source a k-th doc -> ((2k-1)*1e12) div 6
    got.foreach { case (s, _, k, key) =>
      val sw = if (s == "a") 6L else 2L
      assert(key == (2L * k - 1) * 1000000000000L / sw,
        s"key formula broken at ($s, $k): $key")
    }
    // the global order interleaves at slot midpoints — a: 1/12, 3/12,
    // 5/12, 7/12, 9/12, 11/12; b: 3/12, 9/12 — with a-before-b on the
    // 3/12 and 9/12 ties (source tie-break)
    val order = got.map(_._1).toSeq
    assert(order == Seq("a", "a", "b", "a", "a", "a", "b", "a"),
      s"unexpected interleave: $order")
    // per-source sequence is id order
    assert(got.filter(_._1 == "a").map(_._2).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val zero = Seq(("a", 1L, 0L)).toDF("source", "doc_id", "wt")
    val e = intercept[Exception] {
      Sampling.interleaveSchedule(zero, "source", "doc_id", col("wt")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("weight")), s"unexpected: $e")
  }

  test("interleaveSchedule: bigint sched_key overflow fails loud, never NULL-sorts") {
    // one source, ~5M rows, total weight 1 (all but one row weigh zero):
    // the last slots' (2k-1)·10¹² / 1 exceeds Long.MaxValue — the non-ANSI
    // cast would yield NULL keys that sort FIRST and corrupt the order
    val big = spark.range(4700000L)
      .select(lit("a").as("source"), col("id").as("doc_id"),
        when(col("id") === 0L, 1L).otherwise(0L).as("wt"))
    val e = intercept[Exception] {
      Sampling.interleaveSchedule(big, "source", "doc_id", col("wt"))
        .orderBy(col("sched_key").desc).limit(1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("overflows bigint")), s"unexpected: $e")
  }

  test("capSourceShare: binding cap exact, under-cap passthrough, deterministic") {
    // big = 12 of 16 docs (75%); cap at 500‰ -> keep 8; small (4 docs,
    // 25%) passes untouched
    val df = ((1L to 12L).map(i => ("big", i)) ++ (13L to 16L).map(i => ("small", i)))
      .toDF("source", "doc_id")
    val got = Sampling.capSourceShare(df, "source", "doc_id", capPermille = 500)
      .as[(String, Long)].collect().toSet
    assert(got.count(_._1 == "big") == 8, s"cap not exact: $got")
    assert(got.filter(_._1 == "small").map(_._2) == Set(13L, 14L, 15L, 16L))
    // deterministic: the same call returns the identical subset
    val again = Sampling.capSourceShare(df, "source", "doc_id", capPermille = 500)
      .as[(String, Long)].collect().toSet
    assert(again == got)
    // a different seed draws a different (but equally sized) subset
    val other = Sampling.capSourceShare(df, "source", "doc_id",
      capPermille = 500, seed = 7).as[(String, Long)].collect().toSet
    assert(other.count(_._1 == "big") == 8)
    assert(other != got, "seed change did not move the draw (16-doc fluke?)")
    intercept[IllegalArgumentException] {
      Sampling.capSourceShare(df, "source", "doc_id", capPermille = 0)
    }
  }

  test("capSourceShareSalted: exact C via slice quotas, deterministic, honest shortfall") {
    // big = 160 of 200 docs; cap 500‰ -> C = 100, 4 slices -> quotas 25 each
    val df = ((1L to 160L).map(i => ("big", i)) ++ (161L to 200L).map(i => ("small", i)))
      .toDF("source", "doc_id")
    val got = Sampling.capSourceShareSalted(df, "source", "doc_id",
      capPermille = 500, slices = 4).as[(String, Long)].collect().toSet
    // quotas sum to EXACTLY C when every slice holds >= its quota
    assert(got.count(_._1 == "big") == 100, s"big kept ${got.count(_._1 == "big")}")
    // under-cap source passes through whole
    assert(got.count(_._1 == "small") == 40)
    // deterministic re-draw
    val again = Sampling.capSourceShareSalted(df, "source", "doc_id",
      capPermille = 500, slices = 4).as[(String, Long)].collect().toSet
    assert(again == got)
    // a DIFFERENT (equally deterministic) sample than the unsalted draw
    val unsalted = Sampling.capSourceShare(df, "source", "doc_id", capPermille = 500)
      .as[(String, Long)].collect().toSet
    assert(unsalted.count(_._1 == "big") == 100)
    assert(unsalted != got, "salted draw coincided with unsalted (fixture fluke?)")
    // honest shortfall: with more slices than big docs per slice can fill,
    // a starved slice under-fills without rebalancing
    val tiny = (1L to 6L).map(i => ("big", i)).toDF("source", "doc_id")
    val short = Sampling.capSourceShareSalted(tiny, "source", "doc_id",
      capPermille = 1000, slices = 4).count()
    assert(short <= 6)
    intercept[IllegalArgumentException] {
      Sampling.capSourceShareSalted(df, "source", "doc_id", 500, slices = 0)
    }
  }

  test("systematicSample fails loud on all-zero total weight") {
    val df = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "n_chars")
    val e = intercept[Exception] {
      Sampling.systematicSample(df, "doc_id", "n_chars", 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("total weight")), s"unexpected: $e")
    graft.CacheScope.releaseAll()
  }
}
