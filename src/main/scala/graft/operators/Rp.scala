package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.pca_project

/**
 * Johnson–Lindenstrauss random projection — the data-INDEPENDENT
 * sibling of [[Pca]]: reduce `array<float>` embeddings to k dimensions
 * with a deterministic ±1/√k sign matrix (Achlioptas, "Database-friendly
 * random projections", JACM 2003 — sign matrices satisfy the JL lemma
 * with the same distortion bounds as Gaussians). Where PCA needs one
 * moments pass over the corpus before it can encode, RP needs ZERO
 * passes: the matrix is a pure function of (seed, k, d), so the same
 * projection applies to tomorrow's ingest batch, a different cluster,
 * or a stream — nothing to train, store, or version beyond three ints.
 *
 * The signs derive from the engine-wide splitmix64 finalizer
 * ([[graft.functions.TextHash.mix64]]) on (seed, row, col) — fully
 * deterministic, no RNG state. Projection reuses the codegen'd
 * [[graft.functions.PcaProject]] kernel with a zero mean, so the corpus
 * scan is identical to PCA's encode: one kernel call per row, the
 * matrix a k×d plan literal.
 */
object Rp {

  /** The k×d sign matrix, rows scaled by 1/√k — parameter-sized driver
    * state (k·d doubles), never data-derived. */
  def signMatrix(k: Int, d: Int, seed: Long = 42L): Array[Array[Double]] = {
    require(k >= 1 && d >= 1, s"rp: bad shape k=$k d=$d")
    val inv = 1.0 / math.sqrt(k.toDouble)
    Array.tabulate(k, d) { (j, i) =>
      val h = graft.functions.TextHash.mix64(seed + j.toLong * d + i)
      if ((h & 1L) == 0L) inv else -inv
    }
  }

  /** Append `outCol` = the k projections. Zero training passes; the
    * scan is one codegen'd kernel call per row. Probes the input
    * dimension with one `size()` action — pipelines that already know
    * `d` should pass it to the overload below and skip the scan. */
  def project(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      outCol: String = "rp"): DataFrame =
    project(df, vecCol, k,
      d = df.select(size(col(vecCol))).head().getInt(0), seed, outCol)

  /** [[project]] with a caller-supplied input dimension `d` — zero
    * actions, zero scans beyond the projection itself, so composing RP
    * inside a pipeline costs no probe job. Identical output to the
    * probing overload for matching `d`. */
  def project(df: DataFrame, vecCol: String, k: Int, d: Int, seed: Long,
      outCol: String): DataFrame = {
    val m = signMatrix(k, d, seed)
    df.withColumn(outCol,
      pca_project(col(vecCol), typedLit(Seq.fill(d)(0.0)),
        typedLit(m.map(_.toSeq).toSeq)))
  }
}
