package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  // one partition "a" with fully-determined signal orders:
  //   s1 desc ranks: id1=1, id2=2, id3=3
  //   s2 asc  ranks: id3=1, id2=2, id1=3
  //   (so fusion is symmetric between id1 and id3; doc_id breaks the tie)
  private def frame = Seq(
    ("a", 1L, 30L, 9L),
    ("a", 2L, 20L, 5L),
    ("a", 3L, 10L, 2L),
    ("b", 4L, 5L, 5L)
  ).toDF("part", "id", "s1", "s2")

  test("rrf matches the hand-computed micro formula with both directions") {
    val out = Fusion.rrf(frame, Seq("part"), "id",
      Seq(("one", "s1", true), ("two", "s2", false)), k = 60)
      .select(col("id"), col("rank_one"), col("rank_two"), col("rrf_micro"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def f(r: Long) = 1000000L / (60L + r)
    assert(out(1L) == ((1L, 3L, f(1) + f(3))), s"$out")
    assert(out(2L) == ((2L, 2L, f(2) + f(2))), s"$out")
    assert(out(3L) == ((3L, 1L, f(3) + f(1))), s"$out")
    assert(out(4L) == ((1L, 1L, f(1) + f(1))), s"singleton partition: $out")
  }

  test("equal fused scores break by id; topK bounds per partition; plan prunes") {
    val out = Fusion.rrfTopK(frame, Seq("part"), "id",
      Seq(("one", "s1", true), ("two", "s2", false)), n = 2)
    val a = out.filter(col("part") === "a")
      .select(col("id"), col("rank_final")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id1 and id3 fuse to the same score (symmetric ranks) — id order wins
    assert(a == Map(1L -> 1L, 3L -> 2L), s"tie must break by id: $a")
    val counts = out.groupBy("part").count().as[(String, Long)].collect().toMap
    assert(counts("a") == 2L && counts("b") == 1L, s"$counts")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }
}
