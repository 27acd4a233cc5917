package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join (same rows, spread across salts)") {
    val large = (1 to 10000).map(i => (if (i % 2 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot: half the table
    val small = Seq((1L, "hot"), (7L, "cold")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(large, small, "k", saltFactor = 8,
      saltExpr = hash(col("v")))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 5002) // 5001 hot (even i, plus i=1) + 1 cold
  }

  test("bucketed tables join with zero Exchange in the physical plan") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Scale.writeBucketed(a, "bucketed_a", "k", buckets = 8)
    Scale.writeBucketed(b, "bucketed_b", "k", buckets = 8)
    // disable auto-broadcast: at real scale both sides are too big to
    // broadcast — the point is the shuffle-free sort-merge join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), Seq("k"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join should not shuffle:\n$physical")
      assert(physical.contains("SortMergeJoin"))
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
