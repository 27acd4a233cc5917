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
}
