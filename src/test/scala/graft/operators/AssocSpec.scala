package graft.operators

import graft.SparkSpec

class AssocSpec extends SparkSpec {
  import spark.implicits._

  test("pairRules: exact supports, confidence/lift, duplicate events collapse") {
    // baskets: u1{a,b} u2{a,b} u3{a} u4{b,c} u5{a,b,c}; u1's duplicate
    // (a) row must not inflate any count
    val events = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "b"), (4L, "c"),
      (5L, "a"), (5L, "b"), (5L, "c")
    ).toDF("user_id", "event_type")
    val out = Assoc.pairRules(events, "user_id", "event_type")
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect()
    // pairs: (a,b)=3 [u1,u2,u5], (a,c)=1 [u5], (b,c)=2 [u4,u5]
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L)))
    val ab = out(0)
    assert(ab._4 == 4 && ab._5 == 4 && ab._6 == 5) // n_a, n_b, N
    assert(ab._7 == 3.0 / 5.0) // support
    assert(ab._8 == 3.0 / 4.0 && ab._9 == 3.0 / 4.0) // confidences
    assert(ab._10 == (3.0 * 5.0) / (4.0 * 4.0)) // lift
  }

  test("pairRules: minSupport prunes, single-item baskets emit nothing") {
    val events = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "c")
    ).toDF("user_id", "event_type")
    val out = Assoc.pairRules(events, "user_id", "event_type", minSupport = 2)
      .select("item_a", "item_b").as[(String, String)].collect()
    assert(out.toSeq == Seq(("a", "b")), "only the pair with support >= 2")
  }
}
