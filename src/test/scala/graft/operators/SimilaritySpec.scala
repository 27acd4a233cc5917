package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{argmax_dot, argmin_l2, centroid_residual, cosine_similarity,
  dot_product, hyperplane_bucket, l2_distance, min_l2}
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine/dot/l2 expressions match hand-computed values") {
    val df = Seq((Seq(1f, 2f, 0f), Seq(2f, 3f, 0f))).toDF("a", "b")
    val row = df.select(
      cosine_similarity(col("a"), col("b")),
      dot_product(col("a"), col("b")),
      l2_distance(col("a"), col("b"))).head()
    assert(math.abs(row.getDouble(0) - 8.0 / (math.sqrt(5) * math.sqrt(13))) < 1e-15)
    assert(row.getDouble(1) == 8.0)
    assert(math.abs(row.getDouble(2) - math.sqrt(2.0)) < 1e-15)
  }

  test("model kernels (argmin/argmax/min_l2/bucket/residual) match hand-computed values") {
    // model: three 2-d centroids; vec (1, 0) is nearest c0 by L2, and its
    // max inner product is c2; ties must take the LOWEST index
    val df = Seq((Seq(1f, 0f),
      Seq(Seq(1f, 1f), Seq(1f, 1f), Seq(3f, 0f)))).toDF("v", "m")
    val row = df.select(
      argmin_l2(col("v"), col("m")),           // d² = 1, 1, 4 → tie 0/1 → 0
      argmax_dot(col("v"), col("m")),          // dots = 1, 1, 3 → 2
      min_l2(col("v"), col("m")),              // √1
      centroid_residual(col("v"), col("m"), lit(2))).head()
    assert(row.getInt(0) == 0)
    assert(row.getInt(1) == 2)
    assert(row.getDouble(2) == 1.0)
    assert(row.getSeq[Float](3) == Seq(-2f, 0f))
    // hyperplane bucket: planes (1,0) and (0,-1); vec (1, 2) → signs (+, −)
    // → bit 0 set only
    val b = Seq((Seq(1f, 2f), Seq(Seq(1f, 0f), Seq(0f, -1f))))
      .toDF("v", "p")
      .select(hyperplane_bucket(col("v"), col("p"))).head().getLong(0)
    assert(b == 1L)
  }

  test("identical vector is every query's nearest neighbor (brute force)") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f, 0f)), // identical to 0
      (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0.9f, 0.1f, 0f, 0f)),
      (4L, Seq(-1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 0), "vec_id", "embedding", k = 3)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(top(1L) == 1L) // identical vector first
    assert(top(2L) == 3L) // then the 0.9 one
    assert(top(3L) == 2L) // orthogonal before antipodal
  }

  test("LSH top-k achieves high recall vs brute force on the fixture") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5, nBits = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH recall too low: $recall") // 16 buckets ⇒ ~6% random baseline
  }

  test("IVF top-k achieves high recall vs brute force on the fixture") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall too low: $recall") // 4/16 cells probed ⇒ 25% random baseline
  }

  test("recallAtK reports per-query hits/k and pins the fixture recall floor") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
    // exact vs itself: recall is exactly 1.0 for every query
    val self = Similarity.recallAtK(exact, exact)
      .select("recall").as[Double].collect()
    assert(self.length == 10 && self.forall(_ == 1.0))
    // LSH vs exact: mean recall must clear the same floor the set-based
    // test pins (16 buckets ⇒ ~6% random baseline)
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5, nBits = 4)
    val r = Similarity.recallAtK(lsh, exact)
    val rows = r.collect()
    assert(rows.map(_.getLong(2)).forall(_ == 5L)) // k_exact = k for every query
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    assert(mean >= 0.3, s"LSH mean recall too low: $mean")
  }

  test("semanticDedup: transitive paraphrase chain collapses to its min id, distinct rows survive") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.999f, 0.001f, 0f, 0f)), // near-dup of 0
      (2L, Seq(0.998f, 0.002f, 0f, 0f)), // near-dup of 1 → chain {0,1,2}
      (3L, Seq(0f, 1f, 0f, 0f)),
      (4L, Seq(0f, 0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      k = 2, threshold = 0.999, trainSampleN = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(out == Set(0L, 3L, 4L), s"survivors: $out")
  }

  test("admitNewEmbeddings rejects a planted near-dup of the corpus, admits novel vectors") {
    val existing = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val incoming = Seq(
      (10L, Seq(0.999f, 0.001f, 0f, 0f)), // near-dup of existing 0 → rejected
      (11L, Seq(0f, 0f, 1f, 0f))          // novel → admitted
    ).toDF("vec_id", "embedding")
    val admitted = Similarity.admitNewEmbeddings(
      incoming, existing, "vec_id", "embedding",
      threshold = 0.99, nBits = 2, dim = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(admitted == Set(11L), s"admitted: $admitted")
  }

  test("near-dup pairs: planted duplicate vector found at high threshold") {
    val emb = Seq(
      (0L, Seq(1f, 0.5f, 0.25f, 0f)),
      (1L, Seq(1f, 0.5f, 0.25f, 0f)), // exact dup
      (2L, Seq(0f, -1f, 0.7f, 0.1f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.99, nBits = 2, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("hard negatives never share the query's label and rank by cosine") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 1),
      (1L, Seq(1f, 0f, 0f, 0f), 1),   // same label as query — excluded
      (2L, Seq(0.99f, 0.1f, 0f, 0f), 2), // closest wrong-label
      (3L, Seq(0.5f, 0.5f, 0f, 0f), 2),
      (4L, Seq(-1f, 0f, 0f, 0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val negs = Similarity.hardNegatives(emb, emb.filter($"vec_id" === 0),
      "vec_id", "embedding", "label", k = 3)
      .select("rank", "neighbor_id", "neighbor_label")
      .as[(Long, Long, Int)].collect()
    assert(negs.map(_._2).toSeq == Seq(2L, 3L, 4L), s"order: ${negs.toSeq}")
    assert(negs.forall(_._3 != 1), "a hard negative carried the query's own label")
  }

  test("hard negatives equal label-filtered brute force on random vectors") {
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 40L).map { i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2f - 1f), (i % 4).toInt)
    }
    val df = corpus.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, df.filter($"vec_id" < 3),
      "vec_id", "embedding", "label", k = 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val want = corpus.filter(_._1 < 3).flatMap { case (qid, qv, ql) =>
      corpus.filter(c => c._1 != qid && c._3 != ql)
        .map(c => (c._1, cos(qv, c._2)))
        .sortBy { case (nid, s) => (-s, nid) }
        .take(5).zipWithIndex
        .map { case ((nid, _), r) => (qid, (r + 1).toLong, nid) }
    }.toSet
    assert(got == want, s"diff: ${(got diff want) ++ (want diff got)}")
  }

  test("IVF hard negatives: high recall vs the exact miner, labels always differ") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.hardNegatives(emb, queries,
      "vec_id", "embedding", "label", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.hardNegativesIvf(emb, queries,
      "vec_id", "embedding", "label", k = 5, nCells = 8, nProbe = 4, overfetch = 4)
    val ivfRows = ivf.select("query_id", "neighbor_id", "neighbor_label")
      .as[(Long, Long, Int)].collect()
    val qLabels = queries.select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(ivfRows.forall { case (q, _, nl) => nl != qLabels(q) },
      "an IVF hard negative carried the query's own label")
    val got = ivfRows.map { case (q, n, _) => (q, n) }.toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF hard-negative recall too low: $recall")
  }
}
