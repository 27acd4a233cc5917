package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigSym solves a hand-checkable symmetric system") {
    // eigenvalues of [[2,1],[1,2]] are 3 (along (1,1)) and 1 (along (1,-1))
    val (vals, vecs) = Pca.jacobiEigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val pairs = vals.zip(vecs).sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-12)
    assert(math.abs(pairs(1)._1 - 1.0) < 1e-12)
    val top = pairs(0)._2
    assert(math.abs(math.abs(top(0)) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(top(0) - top(1)) < 1e-9, "top eigvec along (1,1)")
  }

  test("fit recovers planted anisotropic axes in order") {
    // variance 9 along dim 2, 4 along dim 0, ~0 along dim 1 (+ constant
    // shift so the mean path is exercised)
    val rows = (0 until 401).map { i =>
      val t = (i - 200) / 200.0 // in [-1, 1], mean 0
      (i.toLong, Array((2 * t + 5).toFloat, 0.5f, (3 * t - 1).toFloat))
    }
    val df = rows.toDF("id", "v")
    val m = Pca.fit(df, "v", k = 2)
    assert(m.n == 401)
    assert(math.abs(m.mean(0) - 5.0) < 1e-6)
    assert(math.abs(m.mean(1) - 0.5) < 1e-6)
    // planted: Var(2t)=4·Var(t), Var(3t)=9·Var(t), perfectly correlated →
    // ONE nonzero eigenvalue 13·Var(t); direction ∝ (2,0,3)/√13
    assert(m.eigenvalues(1) < 1e-9 && m.eigenvalues(2) < 1e-9)
    val w = m.components(0)
    assert(math.abs(w(0) / w(2) - 2.0 / 3.0) < 1e-6, "axis direction")
    assert(math.abs(w(1)) < 1e-9)
    // sign convention: largest-|coordinate| entry positive
    assert(w(2) > 0)
    assert(math.abs(m.capturedVariance - m.totalVariance) < 1e-9)
  }

  test("fixture embeddings: orthonormal components, energy split, projection parity") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val m = Pca.fit(emb, "embedding", k = 8)
    // orthonormality of the returned rows
    for (i <- 0 until 8; j <- i until 8) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"w${i}.w${j}")
    }
    // eigensystem identities: non-increasing, PSD, Σλ = trace
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(m.eigenvalues.forall(_ >= -1e-9))
    assert(math.abs(m.eigenvalues.sum - m.totalVariance) < 1e-6 * m.totalVariance)
    // Parseval split per row: Σ proj² ≤ ‖x−μ‖², with equality at k=d;
    // and mean residual equals (total − captured) variance
    val stats = Pca.centeredEnergy(Pca.project(emb, m, "embedding"), m, "embedding")
      .select(
        sum(expr("aggregate(pca, 0D, (acc, p) -> acc + p * p)")).as("cap"),
        sum(col("energy2")).as("tot"), count(lit(1)).as("n"))
      .head()
    val (cap, tot, n) = (stats.getDouble(0), stats.getDouble(1), stats.getLong(2))
    assert(cap <= tot * (1 + 1e-9))
    assert(math.abs(cap / n - m.capturedVariance) < 1e-6 * m.totalVariance,
      "mean Σproj² must equal the captured eigenvalue mass")
    assert(math.abs(tot / n - m.totalVariance) < 1e-6 * m.totalVariance)
  }
}
