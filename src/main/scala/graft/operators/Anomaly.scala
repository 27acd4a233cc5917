package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Trailing-window z-score anomaly detection over a metric stream —
 * "flag any value more than `k` standard deviations from its own
 * trailing mean" — the standard ops-telemetry outlier sweep, run here
 * per series key over the last `windowRows` observations.
 *
 * EXACT integer arithmetic throughout: the metric is fixed-point (cents,
 * `round(value·100)` — the fixtures are 2-decimal), and the z-score
 * test `|x − μ| > k·σ` is evaluated in its cross-multiplied square form
 *
 *   (n·x − S)² > k² · (n·Q − S²)
 *
 * (μ = S/n, σ² = (Q − S²/n)/n, both sides × n²) — S = Σx, Q = Σx² over
 * the window, all BIGINT. No division, no sqrt, no float accumulation
 * order — a SQL engine reproduces the flag set bit-for-bit, which is
 * why this carries a full hash oracle where textbook
 * `(x − avg) / stddev` formulations cannot (float window sums are
 * order-sensitive). Overflow audit: cents ≤ 10⁶ ⇒ per-row x² ≤ 10¹²,
 * n ≤ 10³ windows keep n·Q ≤ 10¹⁸, and the validated k ≤ 3 keeps
 * k²·(n·Q − S²) ≤ 9·10¹⁸ < 2⁶³ ≈ 9.22·10¹⁸ — the k bound is part of
 * the overflow envelope, not a tuning preference, which is why the
 * `require` enforces it rather than the scaladoc merely documenting it
 * (k = 4 would wrap silently under non-ANSI semantics and could invert
 * flag decisions).
 *
 * Variance-zero windows flag only genuine deviations: if all n values
 * are equal, both sides are 0 and strict `>` stays quiet.
 *
 * Scale shape: ONE hash exchange on the series key; the trailing frame
 * is a per-partition running computation. `minObs` suppresses the
 * cold-start rows whose window is too short to estimate σ.
 */
object Anomaly {

  def zscoreFlags(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      windowRows: Int = 50,
      k: Int = 3,
      minObs: Int = 20): DataFrame = {
    require(windowRows >= 2 && windowRows <= 1000 &&
        minObs >= 2 && minObs <= windowRows,
      s"need 2 <= minObs ($minObs) <= windowRows ($windowRows) <= 1000 " +
        "(the n term of the BIGINT overflow envelope below)")
    require(k >= 1 && k <= 3,
      s"k must be in [1, 3] (k² must keep k²·(n·Q − S²) within BIGINT " +
        s"under the cents ≤ 1e6, window ≤ 1e3 operating envelope): $k")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(-(windowRows - 1), Window.currentRow)
    val x = round(col(valueCol) * 100).cast("long")
    // the third leg of the overflow envelope — |cents| ≤ 1e6 — is a
    // property of the DATA, so it cannot be a constructor require:
    // enforce it in-plan (one codegen'd comparison per row). Without it
    // a ~$1M-cent series inside the validated windowRows/k bounds still
    // pushes n·Q past 2⁶³ — ANSI aborts mid-sweep, non-ANSI silently
    // inverts flag decisions, the exact failure the k require exists
    // to prevent.
    val xg = when(abs(x) > 1000000L,
      raise_error(concat(
        lit(s"zscoreFlags: |$valueCol|·100 exceeds the 1e6-cent overflow " +
          "envelope (see scaladoc); rescale the metric, got "),
        x.cast("string")))).otherwise(x)
    df.withColumn("__x", xg)
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__x")).over(w))
      .withColumn("__q", sum(col("__x") * col("__x")).over(w))
      .filter(col("__n") >= minObs)
      .withColumn("__d", col("__n") * col("__x") - col("__s"))
      .filter(col("__d") * col("__d") >
        lit(k.toLong * k) * (col("__n") * col("__q") - col("__s") * col("__s")))
      .drop("__x", "__n", "__s", "__q", "__d")
  }
}
