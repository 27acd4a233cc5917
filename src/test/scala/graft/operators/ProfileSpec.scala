package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one row per column; nulls, cardinality, native-type bounds") {
    val df = Seq(
      (Some(3L), "bb"),
      (Some(1L), "a"),
      (None, "bb"),
      (Some(10L), null.asInstanceOf[String])
    ).toDF("id", "name")
    val out = Profile.profile(df, Seq("id", "name"))
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(out.map(_._1).toSeq == Seq("id", "name"), "ordered by column name")
    val id = out(0); val name = out(1)
    assert(id == (("id", 4L, 3L, 3L, "1", "10")),
      "numeric bounds are NUMERIC (min 1 < 10), not lexicographic")
    assert(name == (("name", 4L, 3L, 2L, "a", "bb")))
  }

  test("profile: approx mode stays within HLL tolerance of exact") {
    val df = (1L to 1000L).map(i => (i, s"v${i % 97}")).toDF("id", "name")
    val exact = Profile.profile(df, Seq("id", "name"))
      .as[(String, Long, Long, Long, String, String)].collect()
    val approx = Profile.profile(df, Seq("id", "name"), exact = false)
      .as[(String, Long, Long, Long, String, String)].collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e._4 - a._4).toDouble / e._4 < 0.1,
        s"${e._1}: approx ${a._4} vs exact ${e._4}")
      assert(e.copy(_4 = 0L) == a.copy(_4 = 0L), "non-distinct fields identical")
    }
  }

  test("momentStats merge equals full recompute in any merge order") {
    val a = Seq(("s1", 10L), ("s1", 20L), ("s2", 5L)).toDF("source", "n_chars")
    val b = Seq(("s1", 30L), ("s3", 7L)).toDF("source", "n_chars")
    val c = Seq(("s2", 50L)).toDF("source", "n_chars")
    val full = Profile.momentStats(a.union(b).union(c), "source", "n_chars")
      .orderBy("source").collect().map(_.toSeq)
    val mergedLeft = Profile.mergeMomentStats("source",
      Profile.momentStats(a, "source", "n_chars"),
      Profile.momentStats(b, "source", "n_chars"),
      Profile.momentStats(c, "source", "n_chars"))
      .orderBy("source").collect().map(_.toSeq)
    val mergedTree = Profile.mergeMomentStats("source",
      Profile.mergeMomentStats("source",
        Profile.momentStats(c, "source", "n_chars"),
        Profile.momentStats(a, "source", "n_chars")),
      Profile.momentStats(b, "source", "n_chars"))
      .orderBy("source").collect().map(_.toSeq)
    assert(mergedLeft.toSeq == full.toSeq)
    assert(mergedTree.toSeq == full.toSeq, "merge must be order/shape-free")
  }

  test("equiDepthHistogram: boundaries split exact quarters; skew lands on the heavy value") {
    // 100 rows of value 1..100 -> quartile boundaries 25, 50, 75
    val uniform = (1L to 100L).map(v => Tuple1(v)).toDF("v")
    val q = Profile.equiDepthHistogram(uniform, "v", buckets = 4)
      .orderBy("bucket").as[(Int, Long)].collect()
    assert(q.toSeq == Seq((1, 25L), (2, 50L), (3, 75L)))
    // 97 copies of 7 plus 3 outliers: every boundary is the heavy value
    val skew = (Seq.fill(97)(7L) ++ Seq(1L, 9L, 10L)).map(Tuple1(_)).toDF("v")
    val s = Profile.equiDepthHistogram(skew, "v", buckets = 4)
      .orderBy("bucket").as[(Int, Long)].collect()
    assert(s.map(_._2).toSeq == Seq(7L, 7L, 7L))
  }

  test("attrition: telescoping waterfall, first-fail charging, total conservation") {
    import org.apache.spark.sql.functions.col
    // values chosen so some rows fail MULTIPLE stages — they must be
    // charged only to the first
    val df = Seq(1, 5, 10, 15, 20, 25, 30, 35).map(Tuple1(_)).toDF("v")
    val got = Profile.attrition(df, Seq(
      "ge10" -> (col("v") >= 10), // rejects 1, 5
      "le30" -> (col("v") <= 30), // rejects 35 (not 1, 5 — already gone)
      "even" -> (col("v") % 2 === 0) // rejects 15, 25
    )).as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, "ge10", 8L, 2L, 6L),
      (1L, "le30", 6L, 1L, 5L),
      (2L, "even", 5L, 2L, 3L)))
    // structural invariants any stage list must satisfy
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._5 == b._3, s"waterfall must telescope: $got")
    }
    assert(got.head._3 == 8L && got.map(_._4).sum + got.last._5 == 8L)
  }

  test("checkConstraints: parallel rule verdicts, NULL = violation, uniqueness both ways") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some(10), "a"),
      (2L, Some(-1), "a"), // fails positive — and 'a' duplicates
      (3L, None, "b")      // NULL rule evaluation = violation
    ).toDF("id", "v", "k")
    val got = Profile.checkConstraints(df,
      rowRules = Seq("v_positive" -> (col("v") > 0)),
      uniqueKeys = Seq("id", "k"))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("unique:id", 0L, true),
      ("unique:k", 1L, false),
      ("v_positive", 2L, false)))
  }

  test("checkConstraints: unique keys use PK semantics (NULLs and dup-extras both charge)") {
    import org.apache.spark.sql.functions.col
    val df = Seq(Some(1), Some(1), None, None).map(Tuple1(_)).toDF("k")
    val got = Profile.checkConstraints(df,
      rowRules = Seq("always" -> col("k").isNotNull.or(col("k").isNull)),
      uniqueKeys = Seq("k"))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got.find(_._1 == "unique:k").get._2 == 3L,
      s"one dup extra + two NULL keys must charge 3: $got")
  }

  test("checkConstraints: colliding constraint names are rejected") {
    import org.apache.spark.sql.functions.col
    val df = Seq(1).map(Tuple1(_)).toDF("k")
    intercept[IllegalArgumentException] {
      Profile.checkConstraints(df,
        rowRules = Seq("unique:k" -> (col("k") > 0)), uniqueKeys = Seq("k"))
    }
  }

  test("checkConstraints: empty input passes every rule with zero violations") {
    import org.apache.spark.sql.functions.col
    val empty = Seq.empty[(Long, Int)].toDF("id", "v")
    val got = Profile.checkConstraints(empty,
      rowRules = Seq("v_positive" -> (col("v") > 0)), uniqueKeys = Seq("id"))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(("unique:id", 0L, true), ("v_positive", 0L, true)))
  }

  test("histogramDrift: identical snapshots report zero TV, not drifted") {
    import spark.implicits._
    val snap = (1 to 200).map(i => i.toLong % 37 + 10).toDF("v")
    val out = Profile.histogramDrift(snap, snap, "v", buckets = 4,
      thresholdPpm = 1000L).collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("delta_ppm") == 0L))
    assert(out.forall(_.getAs[Long]("tv_ppm") == 0L))
    assert(out.forall(!_.getAs[Boolean]("drifted")))
  }

  test("histogramDrift: disjoint ranges clamp into the edge bin and max out TV") {
    import spark.implicits._
    val old = (1 to 100).map(_.toLong).toDF("v")
    val nw = (1000 to 1099).map(_.toLong).toDF("v") // all beyond old max
    val out = Profile.histogramDrift(old, nw, "v", buckets = 5,
      thresholdPpm = 100000L).collect().sortBy(_.getAs[Long]("bin"))
    // every new value lands in the last (clamp) bin
    assert(out.last.getAs[Long]("n_new") == 100L)
    assert(out.init.forall(_.getAs[Long]("n_new") == 0L))
    // TV = 1 − shareOld(lastBin): total mass moved into the edge bin
    val pOldLast = out.last.getAs[Long]("p_old_ppm")
    assert(out.head.getAs[Long]("tv_ppm") == 1000000L - pOldLast,
      out.map(_.toString).mkString("\n"))
    assert(out.forall(_.getAs[Boolean]("drifted")))
  }

  test("histogramDrift: matches a direct fixed-point replay on a shifted snapshot") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val old = (1 to 300).map(_ => 20L + rnd.nextInt(200)).toSeq
    val nw = old.map(v => if (v % 3 == 0) v + 77 else v)
    val got = Profile.histogramDrift(old.toDF("v"), nw.toDF("v"), "v",
      buckets = 6, thresholdPpm = 50000L).collect().sortBy(_.getAs[Long]("bin"))
    // replay: boundaries from the oracled equi-depth operator, then
    // integer TV per the scaladoc formulas
    val bnds = Profile.equiDepthHistogram(old.toDF("v"), "v", 6)
      .orderBy("bucket").select("boundary").as[Long].collect().toSeq
    def bin(v: Long) = 1 + bnds.count(_ < v)
    def shares(xs: Seq[Long]) = (1 to 6).map { b =>
      val c = xs.count(bin(_) == b).toLong
      (c, 1000000L * c / xs.size)
    }
    val (o, n) = (shares(old), shares(nw))
    val tv = o.zip(n).map { case ((_, p1), (_, p2)) => math.abs(p1 - p2) }.sum / 2
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_old") == o(i)._1 && r.getAs[Long]("n_new") == n(i)._1)
      assert(r.getAs[Long]("p_old_ppm") == o(i)._2 && r.getAs[Long]("p_new_ppm") == n(i)._2)
      assert(r.getAs[Long]("tv_ppm") == tv)
    }
  }

  test("attrition: NULL predicates charge the row like the filter pipeline drops it") {
    import org.apache.spark.sql.functions.col
    // filter(v >= 10) DROPS a NULL row — attrition must charge it to
    // that stage, not report it as surviving every stage
    val df = Seq(Some(5), None, Some(20)).map(Tuple1(_)).toDF("v")
    val got = Profile.attrition(df, Seq("ge10" -> (col("v") >= 10)))
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, "ge10", 3L, 2L, 1L)),
      s"NULL row escaped its stage: $got")
    assert(got.head._5 == df.filter(col("v") >= 10).count(),
      "n_out must equal the real pipeline's surviving rows")
  }

  test("attrition: empty input reports a zero waterfall, not NULLs") {
    import org.apache.spark.sql.functions.col
    val empty = Seq.empty[Int].map(Tuple1(_)).toDF("v")
    val got = Profile.attrition(empty, Seq(
      "pos" -> (col("v") > 0), "even" -> (col("v") % 2 === 0)))
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, "pos", 0L, 0L, 0L), (1L, "even", 0L, 0L, 0L)))
  }

  test("attrition: a stage rejecting nothing still appears with zero counts") {
    import org.apache.spark.sql.functions.col
    val df = Seq(2, 4, 6).map(Tuple1(_)).toDF("v")
    val got = Profile.attrition(df, Seq(
      "pos" -> (col("v") > 0),
      "even" -> (col("v") % 2 === 0)
    )).as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, "pos", 3L, 0L, 3L), (1L, "even", 3L, 0L, 3L)))
  }
}
