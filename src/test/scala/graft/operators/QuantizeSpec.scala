package graft.operators

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("scalarQuantize: codes span [0,255], extremes map to the ends") {
    val df = Seq(
      (1L, Seq(0.0f, 10.0f)),
      (2L, Seq(5.0f, 20.0f)),
      (3L, Seq(10.0f, 30.0f))
    ).toDF("vec_id", "embedding")
    val out = Quantize.scalarQuantize(df, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // dim 0: range [0,10] → 0 → 0, 5 → 127, 10 → 255 (clamped)
    assert(out((1L, 0L)) == 0L)
    assert(out((2L, 0L)) == 127L)
    assert(out((3L, 0L)) == 255L)
    // dim 1: range [10,30] → ends map to 0 / 255
    assert(out((1L, 1L)) == 0L && out((3L, 1L)) == 255L)
    assert(out.values.forall(q => q >= 0L && q <= 255L))
  }

  test("scalarQuantize: constant dimension quantizes to 0, not NaN") {
    val df = Seq((1L, Seq(7.0f, 1.0f)), (2L, Seq(7.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Quantize.scalarQuantize(df, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 0L)) == 0L && out((2L, 0L)) == 0L)
    assert(out((1L, 1L)) == 0L && out((2L, 1L)) == 255L)
  }

  test("productQuantize + pqTopK: codes in range, ADC finds the planted cluster") {
    // 3 well-separated planted clusters in 8-d (same shape as ClusteringSpec)
    val rows = for { c <- 0 until 3; m <- 0 until 20 } yield {
      val vec = Array.fill(8)(0.0f)
      vec(c) = 10.0f * (c + 1)
      vec((c + m) % 8) += (m % 5) * 0.1f
      (c * 100L + m, vec.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (codebooks, encoded) =
      Quantize.productQuantize(df, "vec_id", "embedding", m = 2, codebookSize = 4, iters = 3)
    assert(codebooks.length == 2 && codebooks.forall(_.forall(_.length == 4)))
    val codes = encoded.as[(Long, Seq[Int])].collect().toMap
    assert(codes.size == 60)
    assert(codes.values.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < 4)))
    // deterministic encode
    val (_, again) = Quantize.productQuantize(df, "vec_id", "embedding", m = 2, codebookSize = 4, iters = 3)
    assert(again.as[(Long, Seq[Int])].collect().toMap == codes)
    // ADC: each query's top neighbors come from its own planted cluster
    val queries = df.filter($"vec_id".isin(0L, 100L, 200L))
    val top = Similarity.pqTopK(encoded, queries, codebooks, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long, Double)].collect()
    top.foreach { case (q, _, n, _) =>
      assert(q / 100 == n / 100, s"query $q pulled neighbor $n from another cluster")
    }
  }

  test("ivfPqTopK: probed-cell ADC keeps queries inside their planted cluster") {
    val rows = for { c <- 0 until 3; m <- 0 until 20 } yield {
      val vec = Array.fill(8)(0.0f)
      vec(c) = 10.0f * (c + 1)
      vec((c + m) % 8) += (m % 5) * 0.1f
      (c * 100L + m, vec.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id".isin(0L, 100L, 200L))
    val top = Similarity.ivfPqTopK(df, queries, "vec_id", "embedding",
      k = 5, nCells = 3, nProbe = 1, m = 2, codebookSize = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.nonEmpty)
    top.foreach { case (q, _, n, _) =>
      assert(q / 100 == n / 100, s"query $q pulled neighbor $n from another cluster")
    }
    // with every cell probed, each query still ranks 5 in-cluster rows
    val all = Similarity.ivfPqTopK(df, queries, "vec_id", "embedding",
      k = 5, nCells = 3, nProbe = 3, m = 2, codebookSize = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(all.groupBy(_._1).forall(_._2.length == 5))
  }

  test("sample-trained codebooks (trainSampleN) recover planted clusters deterministically") {
    val rows = for { c <- 0 until 3; m <- 0 until 20 } yield {
      val vec = Array.fill(8)(0.0f)
      vec(c) = 10.0f * (c + 1)
      vec((c + m) % 8) += (m % 5) * 0.1f
      (c * 100L + m, vec.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    // sample smaller than the corpus: training must still see all 3 modes
    val (books, encoded) = Quantize.productQuantize(
      df, "vec_id", "embedding", m = 2, codebookSize = 4, iters = 3, trainSampleN = 40)
    assert(books.length == 2 && books.forall(_.forall(_.length == 4)))
    val codes = encoded.as[(Long, Seq[Int])].collect().toMap
    assert(codes.size == 60)
    assert(codes.values.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < 4)))
    val (again, _) = Quantize.productQuantize(
      df, "vec_id", "embedding", m = 2, codebookSize = 4, iters = 3, trainSampleN = 40)
    assert(again == books) // hash-ordered sample ⇒ deterministic training
    // ADC over sample-trained codebooks still keeps queries in-cluster
    val queries = df.filter($"vec_id".isin(0L, 100L, 200L))
    val top = Similarity.pqTopK(encoded, queries, books, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long, Double)].collect()
    top.foreach { case (q, _, n, _) =>
      assert(q / 100 == n / 100, s"query $q pulled neighbor $n from another cluster")
    }
    // sampled coarse quantizer: members of each planted cluster land in
    // one cell, distinct across clusters
    val cents = Clustering.kmeansCentroidsSampled(
      df, "vec_id", "embedding", k = 3, iters = 5, sampleN = 40)
    assert(cents.length == 3)
    import org.apache.spark.sql.functions.{col, typedLit}
    val assigned = df
      .withColumn("cell", graft.functions.argmin_l2(col("embedding"), typedLit(cents)))
      .select($"vec_id", $"cell").as[(Long, Int)].collect()
    val byCluster = assigned.groupBy(_._1 / 100).view.mapValues(_.map(_._2).toSet).toMap
    assert(byCluster.values.forall(_.size == 1), s"cluster split across cells: $byCluster")
    assert(byCluster.values.flatten.toSet.size == 3)
  }

  test("quantization preserves per-dimension order") {
    val df = (1L to 30L).map(i => (i, Seq(i * 0.37f, 100.0f - i)))
      .toDF("vec_id", "embedding")
    val out = Quantize.scalarQuantize(df, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
    val dim0 = out.filter(_._2 == 0L).sortBy(_._1).map(_._3)
    assert(dim0.zip(dim0.tail).forall { case (a, b) => a <= b },
      "monotone input must stay monotone after quantization")
  }
}
