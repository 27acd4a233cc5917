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
}
