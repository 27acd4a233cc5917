package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{centered_norm2, gram_moments, pca_project}

/**
 * Principal-component dimensionality reduction over an `array<float>`
 * embedding column — the "shrink the vectors before the expensive
 * stage" step of embedding pipelines (ANN index build on reduced
 * vectors, Matryoshka-style truncation with an actual optimality
 * guarantee, visualization/diagnostics of corpus geometry).
 *
 * Spark-first split, same contract as the PQ/IVF trainers
 * ([[Quantize]], [[Clustering]]): the DISTRIBUTED part is one
 * [[graft.functions.GramMoments]] pass (O(d²) buffer per partition,
 * map-side merged — never a per-row d² explode) and one codegen'd
 * [[graft.functions.PcaProject]] corpus scan; the DRIVER part is the
 * d×d eigendecomposition (cyclic Jacobi — d=64 → trivial), which is
 * model state bounded by the PARAMETER d, never by data. The corpus is
 * touched exactly twice: moments, then encode — the
 * "train on bounded state, stream the corpus" shape that survives
 * 100 TB.
 *
 * Eigenvector sign is fixed deterministically (largest-|coordinate|
 * component made positive) so reruns and engines agree up to float
 * noise; eigenvalues are returned in non-increasing order.
 */
object Pca {

  /** Fitted model: population covariance eigensystem. All fields are
    * O(d²) driver state. */
  case class PcaModel(
      n: Long,
      mean: Array[Double],
      eigenvalues: Array[Double], // all d, non-increasing
      components: Array[Array[Double]], // top-k rows, orthonormal
      totalVariance: Double) {
    def k: Int = components.length
    def capturedVariance: Double = eigenvalues.take(k).sum
  }

  /** One-pass fit: moments aggregate → driver covariance → Jacobi. */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    // bounded driver state: 2 + d + d(d+1)/2 doubles (d=64 → ~17 KB)
    val flat = df.select(gram_moments(col(vecCol)).as("g"))
      .head().getSeq[Double](0).toArray
    require(flat.length > 2, "pca: empty input — no moments to fit")
    val d = flat(0).toInt
    val n = flat(1).toLong
    require(n > 1, s"pca: need at least 2 vectors, got $n")
    require(k >= 1 && k <= d, s"pca: k=$k out of range 1..$d")
    val mean = new Array[Double](d)
    var i = 0
    while (i < d) { mean(i) = flat(2 + i) / n; i += 1 }
    // population covariance from the raw moments
    val cov = Array.ofDim[Double](d, d)
    var t = 2 + d
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = flat(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (eigvals, eigvecs) = jacobiEigSym(cov)
    // order non-increasing, deterministic tie-break by original index
    val order = eigvals.indices.sortBy(idx => (-eigvals(idx), idx))
    val sortedVals = order.map(eigvals(_)).toArray
    val comps = order.take(k).map { idx =>
      val v = eigvecs(idx)
      // deterministic sign: the largest-|coordinate| entry is positive
      var best = 0
      var j = 1
      while (j < d) { if (math.abs(v(j)) > math.abs(v(best))) best = j; j += 1 }
      if (v(best) < 0) v.map(-_) else v
    }.toArray
    var trace = 0.0
    i = 0
    while (i < d) { trace += cov(i)(i); i += 1 }
    PcaModel(n, mean, sortedVals, comps, trace)
  }

  /** Encode: append `outCol` = the k centered projections (the reduced
    * representation). One codegen'd kernel call per row; the model rides
    * the plan as a literal, exactly like the k-means centroids. */
  def project(df: DataFrame, model: PcaModel, vecCol: String,
      outCol: String = "pca"): DataFrame =
    df.withColumn(outCol,
      pca_project(col(vecCol), typedLit(model.mean.toSeq),
        typedLit(model.components.map(_.toSeq).toSeq)))

  /** Append `outCol` = ‖x − μ‖² (total centered energy per row). */
  def centeredEnergy(df: DataFrame, model: PcaModel, vecCol: String,
      outCol: String = "energy2"): DataFrame =
    df.withColumn(outCol, centered_norm2(col(vecCol), typedLit(model.mean.toSeq)))

  /**
   * Cyclic Jacobi eigendecomposition of a symmetric matrix — the
   * classical O(d³)-per-sweep rotation scheme (Golub & Van Loan,
   * "Matrix Computations", §8.5). Deterministic: fixed (p,q) sweep
   * order, fixed convergence threshold, no pivoting by magnitude.
   * Returns (eigenvalues, row eigenvectors), unordered.
   */
  private[operators] def jacobiEigSym(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    val tol = 1e-12 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // 2×2 symmetric Schur rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val tTan = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(p)(i); val viq = v(q)(i)
              v(p)(i) = c * vip - s * viq
              v(q)(i) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
