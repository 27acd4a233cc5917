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

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // production thresholds (256 MB) scaled down so fixture-size skew
      // is visible to the optimizer
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val payload = "x" * 100
      // one pathological key holds half the rows; the rest are uniform
      val left = (1 to 100000).map(i => (if (i % 2 == 0) 0L else i.toLong, payload))
        .toDF("k", "pad")
      val right = (0 to 200).map(i => (i.toLong, s"r$i")).toDF("k", "name")
      val joined = left.join(right, Seq("k"))
      // execute THIS dataset so its own AdaptiveSparkPlan finalizes
      // (count() would build a different query execution)
      assert(joined.collect().length == 50000 + 100) // hot key + odd keys 1..199
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skewed"),
        s"AQE did not mark/split the skewed partition:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // Spark's InjectRuntimeFilter: a selective filter on the build side of
    // a shuffle join becomes a bloom filter applied to the probe side's
    // scan — at 100 TB this skips most of the big table's rows before the
    // exchange. Thresholds are production-scale (10 GB probe side), so
    // they're lowered to make the fixture eligible; the assertion is the
    // injected might_contain, plus result parity with the filter disabled.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def run() = {
      val orders = graft.sources.Tables.orders(spark, sfDir)
        .filter(col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_totalprice")
      val li = graft.sources.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity")
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = run()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      val withFilter = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(run().count() == withFilter, "bloom filter changed the result")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("zorder layout prunes a non-leading-column box that a linear sort layout cannot") {
    import org.apache.spark.sql.expressions.Window
    // 64×64 planted grid, one row per cell; 16 simulated files of 256 rows
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("zkey", Scale.zorderKey(col("x"), col("y")))
    val zFiles = grid.withColumn("f", ntile(16).over(Window.orderBy("zkey")))
    val linFiles = grid.withColumn("f", ntile(16).over(Window.orderBy("x", "y")))
    // parquet row-group pruning model: a file is read iff its min/max
    // y-range overlaps the predicate's box — y is the NON-leading column
    def filesRead(files: org.apache.spark.sql.DataFrame): Long =
      files.groupBy("f").agg(min("y").as("mn"), max("y").as("mx"))
        .filter(!(col("mx") < 8 || col("mn") > 15)).count()
    val zRead = filesRead(zFiles)
    val linRead = filesRead(linFiles)
    assert(linRead == 16, s"x-major layout should read every file, got $linRead")
    assert(zRead <= 8, s"zorder layout should prune most files, got $zRead")
    // the interleave itself round-trips: keys are unique and order-stable
    assert(grid.select("zkey").distinct().count() == 64 * 64)
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

  test("writePartitioned: a partition-column predicate prunes to one directory's files") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    // 4 date partitions x 100 rows
    val df = (1 to 400).map(i => (i.toLong, f"2024-01-${i % 4 + 1}%02d"))
      .toDF("id", "d")
    Scale.writePartitioned(df, "d", dir)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val back = spark.read.parquet(dir).filter(col("d") === "2024-01-02")
      assert(back.count() == 100)
      val scan = back.queryExecution.executedPlan
        .collectFirst { case s: FileSourceScanExec => s }.get
      assert(scan.selectedPartitions.partitionCount == 1,
        s"expected 1 pruned partition, got ${scan.selectedPartitions.partitionCount}")
      assert(scan.metadata("PartitionFilters").contains("2024-01-02"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("rangeCumsum equals the single-window cumsum and spans partitions") {
    import spark.implicits._
    // distinct unordered values with varied counts, enough rows to land
    // in several range partitions under the session's 32 shuffle parts
    val hist = (0 until 500).map(i => ((i * 37) % 500, (i % 7 + 1).toLong))
      .toDF("v", "cnt").repartition(8)
    val got = Scale.rangeCumsum(hist, "v", "cnt", "cum", "total")
      .select("v", "cnt", "cum", "total").orderBy("v")
      .as[(Int, Long, Long, Long)].collect()
    // reference: plain Scala scan over the value-sorted histogram
    val ref = (0 until 500).map(i => (i * 37) % 500 -> ((i % 7 + 1).toLong))
      .sortBy(_._1)
    var acc = 0L
    val expTotal = ref.map(_._2).sum
    ref.zip(got).foreach { case ((v, c), (gv, gc, gcum, gtot)) =>
      acc += c
      assert(gv == v && gc == c, s"row mismatch at $v")
      assert(gcum == acc, s"cum at $v: got $gcum want $acc")
      assert(gtot == expTotal, s"total: got $gtot want $expTotal")
    }
    // the physical plan must NOT contain a single-partition global sort
    // window — the whole point; the window is partitioned by __pid
    val plan = Scale.rangeCumsum(hist, "v", "cnt", "cum", "total")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"rangeCumsum planned a single-partition exchange:\n$plan")
    graft.CacheScope.releaseAll()
  }

  test("rangeCumsum preserves every input column bit-for-bit") {
    import spark.implicits._
    // extra payload columns must ride through untouched — the property
    // the r12 systematicSample clobber violated (its weight column was
    // silently replaced by the grand total)
    val df = Seq((1, 2L, "a", 10L), (2, 3L, "b", 20L), (3, 5L, "c", 30L))
      .toDF("v", "cnt", "tag", "payload")
    val out = Scale.rangeCumsum(df, "v", "cnt", "cum", "total")
      .select("v", "cnt", "tag", "payload").orderBy("v")
      .as[(Int, Long, String, Long)].collect().toSeq
    assert(out == Seq((1, 2L, "a", 10L), (2, 3L, "b", 20L), (3, 5L, "c", 30L)),
      s"input columns mutated: $out")
    graft.CacheScope.releaseAll()
  }

  test("rangeCumsum rejects case-insensitive output-column collisions") {
    import spark.implicits._
    val df = Seq((1, 2L)).toDF("v", "__w")
    // "__W" differs from input "__w" only by case — Spark's default
    // case-insensitive resolver would make withColumn REPLACE __w
    val e = intercept[IllegalArgumentException] {
      Scale.rangeCumsum(df, "v", "__w", "__cum", "__W")
    }
    assert(e.getMessage.contains("collides"), s"unexpected: $e")
    val e2 = intercept[IllegalArgumentException] {
      Scale.rangeCumsum(df, "v", "__w", "CUM", "cum")
    }
    assert(e2.getMessage.contains("collide"), s"unexpected: $e2")
  }
}
