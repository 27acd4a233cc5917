package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scale-out join helpers: the two standard answers to the problems a
 * 100 TB shuffle join hits that a 60 k-row test never shows.
 *
 *  - **Skew**: one hot key (a null-ish default id, a celebrity user…)
 *    lands every matching row on one reducer. [[saltedJoin]] spreads the
 *    hot keys over `saltFactor` sub-keys by salting the large side
 *    randomly-but-deterministically and replicating the small side once
 *    per salt. (Spark's AQE skew-join split handles moderate skew
 *    automatically; explicit salting is for the pathological keys you
 *    know about, and composes with AQE for the rest.)
 *
 *  - **Repeated co-located joins**: two fact tables joined on the same
 *    key in every run should not re-shuffle every run. [[writeBucketed]]
 *    persists a table hash-bucketed (and sorted) by the join key; joins
 *    between two tables bucketed the same way plan with ZERO Exchange
 *    (verified in ScaleSpec by inspecting the physical plan).
 */
object Scale {

  /**
   * Shuffle-join `large ⋈ small` on `key`, spreading each key of the
   * large side across `saltFactor` shuffle partitions.
   *
   * large gets salt = pmod(hash(whole row id-ish salt source), factor) —
   * here a deterministic per-row salt from `spark_partition_id` +
   * monotonic id is avoided on purpose (not stable across retries);
   * instead the salt hashes the row's own columns via `saltExpr`.
   * small is replicated once per salt value (explode over 0..factor-1).
   */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      saltExpr: Column): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = large.withColumn("__salt", pmod(saltExpr, lit(saltFactor)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<int>")))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Persist `df` hash-bucketed (and sorted) by `key` into the session
    * catalog as `tableName`. Joins between tables bucketed identically on
    * the join key need no Exchange (and no Sort, for sort-merge). */
  def writeBucketed(df: DataFrame, tableName: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)
}
