package graft.operators

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated planted clusters in 8-d: center c has coordinate
    * 10·(c+1) in dimension c; members perturb deterministically. */
  private def planted = {
    val rows = for {
      c <- 0 until 3
      m <- 0 until 20
    } yield {
      val vec = Array.fill(8)(0.0f)
      vec(c) = 10.0f * (c + 1)
      // small deterministic jitter, far below the inter-center distance
      vec((c + m) % 8) += (m % 5) * 0.1f
      (c * 100L + m, vec.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeans recovers planted well-separated clusters") {
    val out = Clustering.kmeans(planted, "vec_id", "embedding", k = 3, iters = 5)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 60)
    // every planted group lands in exactly one k-means cluster, and the
    // three groups get three distinct clusters
    val byGroup = out.groupBy(_._1 / 100).view.mapValues(_.map(_._2).toSet).toMap
    byGroup.foreach { case (g, cs) =>
      assert(cs.size == 1, s"planted group $g split across clusters $cs")
    }
    assert(byGroup.values.flatten.toSet.size == 3, s"clusters collapsed: $byGroup")
    // distances to own centroid are small relative to the separation
    assert(out.forall(_._3 < 5.0), "point far from its centroid")
  }

  test("kmeans is reproducible run to run") {
    val a = Clustering.kmeans(planted, "vec_id", "embedding", k = 3, iters = 3)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = Clustering.kmeans(planted, "vec_id", "embedding", k = 3, iters = 3)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("kmeans|| init recovers planted clusters and is reproducible") {
    val run = () => Clustering.kmeans(planted, "vec_id", "embedding",
      k = 3, iters = 5, init = "parallel")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val out = run()
    assert(out.length == 60)
    val byGroup = out.groupBy(_._1 / 100).view.mapValues(_.map(_._2).toSet).toMap
    byGroup.foreach { case (g, cs) =>
      assert(cs.size == 1, s"planted group $g split across clusters $cs")
    }
    assert(byGroup.values.flatten.toSet.size == 3, s"clusters collapsed: $byGroup")
    assert(out.forall(_._3 < 5.0), "point far from its centroid")
    assert(run() == out, "parallel init not reproducible")
  }

  test("kmeans|| init seeds at most the distinct-point count") {
    val tiny = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(5f, 5f))
    ).toDF("vec_id", "embedding")
    val seeds = Clustering.kmeansParInit(tiny, "vec_id", "embedding", k = 5)
    assert(seeds.length == 2, s"expected the 2 distinct points, got $seeds")
    assert(seeds.toSet == Set(Seq(0f, 0f), Seq(5f, 5f)))
  }

  test("kmeans with k larger than distinct points keeps empty clusters stable") {
    val tiny = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(5f, 5f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kmeans(tiny, "vec_id", "embedding", k = 3, iters = 2)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 3)
    // the two coincident points share a cluster; the far point is alone
    val m = out.map(r => r._1 -> r._2).toMap
    assert(m(1L) == m(2L) && m(1L) != m(3L))
  }
}
