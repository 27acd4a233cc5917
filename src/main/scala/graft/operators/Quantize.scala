package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding compression (SURVEY §2.3 extension surface): per-dimension
 * scalar quantization of an `array<float>` column to 8-bit codes — the
 * 4× storage/bandwidth reduction step an ANN index applies before
 * sharding vectors at 100 TB.
 *
 * code = floor((x - min_d) · 255 / (max_d - min_d)), clamped to 255 (the
 * max element itself can round either side of 255.0 in IEEE arithmetic).
 * Every operation is double-precision IEEE with a fixed evaluation
 * order, so a SQL engine replays it bit-for-bit — this operator is
 * deliberately the float counterexample to the "keep oracles
 * integer-exact" rule: float arithmetic IS reproducible across engines
 * when the expression tree is identical; only reduction ORDER (sums) is
 * not. Min/max are order-free reductions, which is why they are safe
 * where a mean would not be.
 *
 * Scale shape: one posexplode pass → per-dim min/max aggregate (dim-count
 * rows — model state), broadcast back onto the element stream; no
 * corpus shuffle beyond the (dim) aggregate's partial-combine exchange.
 */
object Quantize {

  /** @return (`vec_id`, `dim`, `q`) — one row per vector element. */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = df.select(col(idCol).as("vec_id"),
      posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("x"))
    val stats = e.groupBy(col("dim")).agg(
      min(col("x")).cast("double").as("mn"),
      max(col("x")).cast("double").as("mx"))
    e.join(broadcast(stats), "dim")
      .withColumn("q",
        when(col("mx") === col("mn"), lit(0L)) // degenerate constant dim
          .otherwise(least(
            floor(((col("x").cast("double") - col("mn")) * lit(255.0))
              / (col("mx") - col("mn"))),
            lit(255L))))
      .select(col("vec_id"), col("dim"), col("q"))
  }

  /**
   * Product quantization (Jégou, Douze, Schmid, "Product Quantization
   * for Nearest Neighbor Search", IEEE TPAMI 2011) — the vector
   * compression behind billion-scale ANN indexes: split each d-dim
   * vector into `m` subvectors, k-means each subspace to
   * `codebookSize` centroids, and store every vector as its m nearest
   * centroid indices. At d=64, m=8, 16 centroids that is 8 codes vs
   * 256 float bytes (32×); codebooks are m × codebookSize × d/m floats
   * of bounded driver-side model state (the same contract as the IVF
   * coarse quantizer and the k-means seeds).
   *
   * Training is deliberately NOT m independent k-means runs (m ×
   * O(iters) corpus passes — at 100 TB, m=8 separate trainings read
   * the corpus 8× per iteration for no reason). Instead: ONE
   * hash-ordered sample collects a few hundred vectors, driver-side
   * farthest-first picks every subspace's spread-out seeds from it,
   * and then each Lloyd iteration updates ALL m codebooks in a single
   * fused pass — per row, m codegen'd argmin assignments explode to
   * (subspace, cluster, dim, x) partials whose aggregate is
   * m·codebookSize·(d/m) = codebookSize·d rows of model state. Total:
   * 1 + iters corpus passes regardless of m, plus the one-pass encode.
   *
   * `trainSampleN > 0` switches to SAMPLE-TRAINED codebooks — the
   * 100 TB index-training contract (see
   * [[Clustering.kmeansCentroidsSampled]]): one hash-ordered TakeOrdered
   * pass collects `trainSampleN` vectors, every subspace's Lloyd runs on
   * the driver, and the only other corpus touch is the one-pass encode.
   * Corpus passes: 2, independent of m AND iters. Full-corpus training
   * (`trainSampleN = 0`, the default) remains for callers whose corpus
   * is itself sample-sized.
   *
   * @return (codebooks, encoded) — codebooks(j)(c) is subspace j's
   *         centroid c; encoded is (`vec_id`, `codes` array<int>)
   */
  def productQuantize(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      codebookSize: Int = 16,
      iters: Int = 3,
      trainSampleN: Int = 0,
      knownN: Long = -1L): (Seq[Seq[Seq[Float]]], DataFrame) = {
    require(m >= 1, s"m must be positive: $m")
    require(codebookSize >= 2, s"codebookSize must be >= 2: $codebookSize")
    require(iters >= 1, s"iters must be positive: $iters")

    if (trainSampleN > 0) {
      val sample = Clustering.hashSample(df, idCol, vecCol, trainSampleN, knownN)
      require(sample.nonEmpty, "input is empty — nothing to quantize")
      val dim = sample.head.length
      require(dim % m == 0, s"m ($m) must divide the vector dim ($dim)")
      val sub = dim / m
      val books: Seq[Seq[Seq[Float]]] = (0 until m).map { j =>
        Clustering.lloydOnPoints(
          sample.map(_.slice(j * sub, (j + 1) * sub)), codebookSize, iters)
      }
      val codes = (0 until m).map { j =>
        Clustering.assignCol(
          slice(col(vecCol), j * sub + 1, sub), typedLit(books(j)))
      }
      return (books, df.select(col(idCol).cast("long").as("vec_id"),
        array(codes: _*).as("codes")))
    }

    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")).persist()
    try {
      val dim = v.select(size(col("v"))).head.getInt(0)
      require(dim % m == 0, s"m ($m) must divide the vector dim ($dim)")
      val sub = dim / m

      // one sample pass seeds every subspace: hash-ordered (deterministic,
      // content-independent), then farthest-first per subspace ON THE
      // SAMPLE (driver-side, a few hundred tiny vectors — free)
      val sampleN = math.max(codebookSize * 8, 64)
      val sample = v.orderBy(xxhash64(col("id")).asc, col("id").asc)
        .limit(sampleN).select(col("v")).collect()
        .map(_.getSeq[Float](0).toIndexedSeq)
      require(sample.nonEmpty, "input is empty — nothing to quantize")
      def d2(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
        s
      }
      def farthestSeeds(pts: Array[IndexedSeq[Float]], k: Int): Seq[Seq[Float]] = {
        var seeds = Vector(pts.head)
        while (seeds.length < k) {
          // argmax of distance-to-seed-set; ties (incl. exhausted distinct
          // points → duplicate centroids) resolve to the first, which is
          // deterministic and harmless: argmin assignment ties to the
          // lower index, so a duplicate centroid just sits empty
          seeds = seeds :+ pts.maxBy(p => seeds.iterator.map(s => d2(p, s)).min)
        }
        seeds.map(_.toSeq)
      }
      var books: Seq[Seq[Seq[Float]]] = (0 until m).map { j =>
        farthestSeeds(sample.map(_.slice(j * sub, (j + 1) * sub)), codebookSize)
      }

      // fused Lloyd: all m subspaces assigned + aggregated in one pass
      for (_ <- 1 to iters) {
        val parts = (0 until m).map { j =>
          val sv = slice(col("v"), j * sub + 1, sub)
          struct(lit(j).as("subspace"),
            Clustering.assignCol(sv, typedLit(books(j))).as("cluster"),
            sv.as("sv"))
        }
        val sums = v.select(explode(array(parts: _*)).as("p"))
          .select(col("p.subspace").as("subspace"), col("p.cluster").as("cluster"),
            posexplode(col("p.sv")).as(Seq("dim", "x")))
          .groupBy(col("subspace"), col("cluster"), col("dim"))
          .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
          .collect()
        val byKey = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
        books = books.zipWithIndex.map { case (book, j) =>
          book.zipWithIndex.map { case (old, ci) =>
            byKey.get((j, ci)) match {
              case Some(rows) =>
                val dims = rows.map(r => r.getInt(2) -> (r.getDouble(3) / r.getLong(4))).toMap
                old.indices.map(d => dims(d).toFloat)
              case None => old // empty cluster keeps its centroid
            }
          }
        }
      }

      val codes = (0 until m).map { j =>
        Clustering.assignCol(
          slice(col(vecCol), j * sub + 1, sub),
          typedLit(books(j)))
      }
      // encoded builds on `df` (not the persisted projection), so it stays
      // valid after the training cache is released
      val encoded = df.select(col(idCol).cast("long").as("vec_id"),
        array(codes: _*).as("codes"))
      (books, encoded)
    } finally v.unpersist()
  }
}
