package graft.operators

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  test("write/load/search round-trip matches the in-memory IVF-PQ result exactly") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-index").toString

    AnnIndex.writeIvfPq(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, codebookSize = 16, trainSampleN = 512)
    val served = AnnIndex.searchIvfPq(spark, dir, queries, "vec_id", "embedding",
      k = 10, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSeq

    // the same training parameters in memory — identical deterministic
    // sampling + Lloyd ⇒ identical model ⇒ identical serving result
    val inMemory = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 10, nCells = 8, nProbe = 4, m = 8, codebookSize = 16, trainSampleN = 512)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSeq
    assert(served == inMemory, s"served != in-memory:\n$served\nvs\n$inMemory")

    // the model artifact is parameter-sized: 8 cells + 8×16 codebook rows
    val model = spark.read.parquet(s"$dir/model")
    assert(model.count() == 8 + 8 * 16)
    // codes artifact carries (8 + m) small columns, never the vectors
    val codesSchema = spark.read.parquet(s"$dir/codes").schema.fieldNames.toSet
    assert(codesSchema == Set("vec_id", "cell", "codes"))
  }

  test("serve prunes the codes scan to the probed cells' partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-prune").toString
    AnnIndex.writeIvfPq(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, codebookSize = 16, trainSampleN = 512)
    // a single-cell probe per query: ≤ 3 distinct probed cells of the 8.
    // AQE off while inspecting — AdaptiveSparkPlanExec hides the scan
    // node until execution (the ScaleSpec writePartitioned pattern)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val served = AnnIndex.searchIvfPq(spark, dir, queries, "vec_id", "embedding",
        k = 5, nProbe = 1)
      assert(served.count() > 0)
      val scan = served.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
        .find(_.output.exists(_.name == "codes"))
        .getOrElse(fail("no codes FileSourceScanExec in the serve plan"))
      val touched = scan.selectedPartitions.partitionCount
      assert(touched <= 3 && touched < 8,
        s"expected ≤ 3 probed-cell partitions of 8, scan touched $touched")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("appendIvfPq: frozen-model append ≡ rebuild encoding; served copy found") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.filter($"vec_id" % 2 === 0)
    val batch = emb.filter($"vec_id" % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-append").toString
    AnnIndex.writeIvfPq(base, "vec_id", "embedding", dir,
      nCells = 8, m = 8, codebookSize = 16, trainSampleN = 512)
    val before = spark.read.parquet(s"$dir/codes").count()
    AnnIndex.appendIvfPq(spark, dir, batch, "vec_id", "embedding")
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == before + batch.count())
    // rebuild equality on the FROZEN model: copy the model artifact to a
    // fresh dir and encode the WHOLE corpus through appendIvfPq — build
    // (base) + append (batch) must equal the one-shot frozen-model encode
    // row for row, or build and append encoders have drifted
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ann-rebuild").toString
    spark.read.parquet(s"$dir/model").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir2/model")
    AnnIndex.appendIvfPq(spark, dir2, base.unionByName(batch), "vec_id", "embedding")
    def codeMap(d: String) = spark.read.parquet(s"$d/codes")
      .select($"vec_id", $"cell", $"codes").as[(Long, Int, Seq[Int])]
      .collect().map { case (id, c, cs) => id -> ((c, cs)) }.toMap
    assert(codeMap(dir) == codeMap(dir2),
      "build+append codes differ from one-shot frozen-model encoding")
    // a batch vector identical to a query must now be served: plant the
    // query itself in the appended half and demand its copy back
    val q = base.filter($"vec_id" === 0L)
    val planted = q.withColumn("vec_id", lit(10000000L))
    AnnIndex.appendIvfPq(spark, dir, planted, "vec_id", "embedding")
    val got = AnnIndex.searchIvfPq(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 8)
    assert(got.filter($"neighbor_id" === 10000000L).count() == 1,
      "appended exact copy not served back")
  }

  test("occupancyDrift: same-distribution batch ≈ 0, single-cell batch high") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-drift").toString
    AnnIndex.writeIvfPq(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, codebookSize = 16, trainSampleN = 512)
    val same = AnnIndex.occupancyDrift(spark, dir, emb, "vec_id", "embedding")
      .head().getDouble(0)
    assert(same < 1e-9, s"identical corpus should have TV 0, got $same")
    // batch = the members of the fullest cell only → mass concentrated
    val codes = spark.read.parquet(s"$dir/codes")
    val top = codes.groupBy($"cell").count().orderBy($"count".desc)
      .head().getInt(0)
    val skewIds = codes.filter($"cell" === top).select($"vec_id")
    val skewed = AnnIndex.occupancyDrift(spark, dir,
      emb.join(skewIds, Seq("vec_id")).select("vec_id", "embedding"),
      "vec_id", "embedding").head().getDouble(0)
    assert(skewed > 0.5, s"single-cell batch should drift hard, got $skewed")
  }

  test("IVF-flat: durable serve ≡ in-memory ivfTopK exactly, scan pruned to probed cells") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-flat").toString
    AnnIndex.writeIvf(emb, "vec_id", "embedding", dir,
      nCells = 8, trainSampleN = 512)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val served = AnnIndex.searchIvf(spark, dir, queries, "vec_id", "embedding",
        k = 10, nProbe = 2)
      val inMem = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 10, nCells = 8, nProbe = 2, trainSampleN = 512)
      val a = served.select("query_id", "rank", "neighbor_id")
        .as[(Long, Long, Long)].collect().toSeq
      val b = inMem.select("query_id", "rank", "neighbor_id")
        .as[(Long, Long, Long)].collect().toSeq
      assert(a == b, s"flat serve != in-memory ivfTopK:\n$a\nvs\n$b")
      val scan = served.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
        .find(_.output.exists(_.name == "v"))
        .getOrElse(fail("no vectors FileSourceScanExec in the serve plan"))
      val touched = scan.selectedPartitions.partitionCount
      assert(touched <= 6 && touched < 8,
        s"expected ≤ 3×2 probed-cell partitions of 8, scan touched $touched")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("appendIvf: frozen-cell flat admission; appended copy served; drift reads vectors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.filter($"vec_id" % 2 === 0)
    val batch = emb.filter($"vec_id" % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-flat-append").toString
    AnnIndex.writeIvf(base, "vec_id", "embedding", dir, nCells = 8, trainSampleN = 512)
    AnnIndex.appendIvf(spark, dir, batch, "vec_id", "embedding")
    assert(spark.read.parquet(s"$dir/vectors").count() == emb.count())
    // an appended exact copy of the query must come back rank-1
    val q = base.filter($"vec_id" === 0L)
    AnnIndex.appendIvf(spark, dir, q.withColumn("vec_id", lit(10000000L)),
      "vec_id", "embedding")
    val got = AnnIndex.searchIvf(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 8)
    assert(got.filter($"neighbor_id" === 10000000L && $"rank" === 1L).count() == 1,
      "appended exact copy should serve at rank 1 under exact cosine")
    // occupancyDrift sniffs the FLAT artifact (vectors, not codes)
    val tv = AnnIndex.occupancyDrift(spark, dir, emb, "vec_id", "embedding")
      .head().getDouble(0)
    assert(tv < 0.2, s"same-distribution drift over the flat artifact: $tv")
  }

  test("occupancyDrift fails loud on an empty batch (no silent NULL drift)") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 2f, 0f)), (1L, Seq(0f, 1f, 0f, 2f)),
      (2L, Seq(3f, 0f, 1f, 0f)), (3L, Seq(0f, 3f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-empty").toString
    AnnIndex.writeIvfPq(emb, "vec_id", "embedding", dir,
      nCells = 2, m = 2, codebookSize = 2, trainSampleN = 4)
    val e = intercept[Exception] {
      AnnIndex.occupancyDrift(spark, dir,
        emb.filter(lit(false)), "vec_id", "embedding").head()
    }
    assert(e.getMessage != null && e.getMessage.contains("empty"),
      s"expected the named precondition error, got: $e")
  }

  test("loadModel reconstructs cells and codebooks in rank order") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 2f, 0f)),
      (1L, Seq(0f, 1f, 0f, 2f)),
      (2L, Seq(3f, 0f, 1f, 0f)),
      (3L, Seq(0f, 3f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-model").toString
    AnnIndex.writeIvfPq(emb, "vec_id", "embedding", dir,
      nCells = 2, m = 2, codebookSize = 2, trainSampleN = 4)
    val (cells, books) = AnnIndex.loadModel(spark, dir)
    assert(cells.length == 2 && cells.forall(_.length == 4))
    assert(books.length == 2 && books.forall(b => b.length == 2 && b.forall(_.length == 2)))
    // served result is well-formed on the tiny fixture
    val out = AnnIndex.searchIvfPq(spark, dir, emb.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 2, nProbe = 2).collect()
    assert(out.nonEmpty && out.forall(_.getLong(2) != 0L))
  }

  test("deleteVecs: tombstoned vectors stop serving immediately; rebuild clears") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-del").toString
    AnnIndex.writeIvfPq(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, codebookSize = 16, trainSampleN = 512)
    def serve() = AnnIndex.searchIvfPq(spark, dir, queries, "vec_id", "embedding",
      k = 5, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)]
      .collect().toSeq
    val expect = serve()
    // append exact copies, then tombstone them: the appended FILES stay
    // on disk, so restored equality proves the anti-join, not a rewrite
    val copies = queries.withColumn("vec_id", $"vec_id" + lit(10000000L))
    AnnIndex.appendIvfPq(spark, dir, copies, "vec_id", "embedding")
    val withCopies = serve()
    assert(withCopies != expect, "appended copies did not surface at all")
    AnnIndex.deleteVecs(spark, dir, copies.select($"vec_id"))
    assert(serve() == expect, "tombstoned vectors still serving (or over-deleted)")
    // drift now reads the standing (filtered) occupancy without error
    val tv = AnnIndex.occupancyDrift(spark, dir, emb, "vec_id", "embedding")
      .as[Double].head()
    assert(tv >= 0.0 && tv <= 1.0)
    // flat artifact honors the same tombstones
    val flat = java.nio.file.Files.createTempDirectory("graft-ivf-del").toString
    AnnIndex.writeIvf(emb, "vec_id", "embedding", flat, nCells = 8, trainSampleN = 512)
    val flatExpect = AnnIndex.searchIvf(spark, flat, queries, "vec_id", "embedding",
      k = 5, nProbe = 4).select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq
    AnnIndex.appendIvf(spark, flat, copies, "vec_id", "embedding")
    AnnIndex.deleteVecs(spark, flat, copies.select($"vec_id"))
    val flatAfter = AnnIndex.searchIvf(spark, flat, queries, "vec_id", "embedding",
      k = 5, nProbe = 4).select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(flatAfter == flatExpect, "flat artifact ignored the tombstones")
    // rebuild = this artifact's compaction: tombstone layout cleared
    AnnIndex.writeIvfPq(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, codebookSize = 16, trainSampleN = 512)
    val t = new java.io.File(s"$dir/tombstones")
    assert(!t.exists() || t.listFiles().isEmpty, "rebuild left tombstones")
  }
}
