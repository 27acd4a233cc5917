package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Association-rule mining over (basket, item) events — the market-basket
 * co-occurrence sweep ("users who trigger X also trigger Y"), the same
 * analysis a data pipeline runs over (document, tag) or (session, tool)
 * pairs to find coupled behaviors. Emits every unordered item pair with
 * its exact support counts and the derived rule metrics:
 * `support = n_ab/N`, `confidence(a→b) = n_ab/n_a` (and the reverse),
 * `lift = n_ab·N / (n_a·n_b)`.
 *
 * Metrics are each ONE IEEE divide (or multiply-then-divide) over exact
 * BIGINT counts — no `log`/`pow` — so the doubles are bit-identical
 * cross-engine and the query carries a full hash oracle.
 *
 * Scale shape (the [[Ngrams.sourceNgramOverlap]] pattern): the event
 * stream reduces to distinct (basket, item) in one exchange; pair
 * emission groups each basket's ITEM LIST — bounded by the item-domain
 * size (event types, tags: dozens), never by basket count — and
 * explodes its pairs map-side. Item supports and the basket total are
 * tiny aggregates broadcast onto the pair counts. Worst case is
 * |baskets| × |items|² with small constants, never baskets².
 */
object Assoc {

  def pairRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 1): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    // bi feeds three consumers (pairs, item supports, basket total);
    // persist the REDUCED distinct set so the raw event stream is
    // scanned and distinct-exchanged once, not three times
    val bi = graft.CacheScope.scoped(
      df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct())
    // unordered pairs built by ONE codegen'd HOF then a single explode —
    // a double posexplode would generate |items|² rows carrying the full
    // items array through both generators before the pi<pj filter; here
    // only the |items|·(|items|−1)/2 qualifying 2-string structs ever
    // materialize as rows
    val pairs = bi.groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("items"))
      .filter(size(col("items")) >= 2)
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items)), y -> " +
          "struct(x AS item_a, y AS item_b))))")).as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val itemCounts = bi.groupBy(col("i")).agg(count(lit(1)).as("n"))
    val totals = bi.agg(countDistinct(col("b")).as("n_baskets"))
    pairs
      .join(broadcast(itemCounts.select(col("i").as("item_a"), col("n").as("n_a"))), "item_a")
      .join(broadcast(itemCounts.select(col("i").as("item_b"), col("n").as("n_b"))), "item_b")
      .crossJoin(broadcast(totals))
      .withColumn("support",
        col("n_ab").cast("double") / col("n_baskets").cast("double"))
      .withColumn("conf_a_b",
        col("n_ab").cast("double") / col("n_a").cast("double"))
      .withColumn("conf_b_a",
        col("n_ab").cast("double") / col("n_b").cast("double"))
      .withColumn("lift",
        (col("n_ab").cast("double") * col("n_baskets").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double")))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets"), col("support"), col("conf_a_b"),
        col("conf_b_a"), col("lift"))
  }
}
