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

  test("hybridTopK fuses two candidate lists with absent-side zero contribution") {
    // query 1: sparse list (10,20,30), dense list (20,40) — doc 20 in both
    val sparse = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 20L, 1L), (1L, 40L, 2L))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Fusion.hybridTopK(sparse, dense, n = 10)
      .select(col("doc_id"), col("sparse_micro"), col("dense_micro"),
        col("rrf_micro"), col("rank"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def f(r: Long) = 1000000L / (60L + r)
    // doc 20 fuses both lists (sparse rank 2 + dense rank 1) and wins
    assert(out(20L) == ((f(2), f(1), f(2) + f(1), 1L)), s"$out")
    assert(out(10L) == ((f(1), 0L, f(1), 2L)), s"$out")
    assert(out(40L) == ((0L, f(2), f(2), 3L)), s"$out")
    assert(out(30L) == ((f(3), 0L, f(3), 4L)), s"$out")
  }

  test("hybridTopK ties break by doc_id and n bounds each query") {
    // both docs get identical single-side rank-1 contributions
    val sparse = Seq((1L, 7L, 1L)).toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 3L, 1L), (2L, 9L, 1L))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Fusion.hybridTopK(sparse, dense, n = 1)
      .select(col("query_id"), col("doc_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // query 1: docs 3 and 7 tie at f(1) — lower doc_id takes rank 1, n=1 cuts 7
    assert(out == Set((1L, 3L, 1L), (2L, 9L, 1L)), s"$out")
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
