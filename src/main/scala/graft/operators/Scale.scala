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
    // coalesce: a NULL-evaluating saltExpr would give a NULL salt, and
    // the equi-join on (key, __salt) would silently DROP those large-side
    // rows even when their key matches — salt bucket 0 keeps them, with
    // identical join semantics to the unsalted form
    val l = large.withColumn("__salt",
      coalesce(pmod(saltExpr, lit(saltFactor)).cast("int"), lit(0)))
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

  /**
   * Hive-style partitioned parquet layout: one directory per distinct
   * `partCol` value. The complement of [[writeBucketed]] (hash layout
   * for JOIN locality) and the Z-order key (multi-dim range locality):
   * a LIST-level layout, so an equality/range predicate on the
   * partition column prunes whole directories during file listing —
   * before any footer is read. At 100 TB this is the first line of
   * defense for time-sliced scans; ScaleSpec asserts the pruned scan
   * touches only the matching partition's files.
   *
   * Cardinality contract is the caller's: partition by DAYS or sources
   * (10²–10⁴ dirs), never by user-grade keys — a million tiny
   * directories destroys listing and small-file behavior (that's what
   * bucketing is for).
   */
  def writePartitioned(df: DataFrame, partCol: String, path: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").parquet(path)

  /** Bit-spread: the low 32 bits of `v` moved to the even bit positions
    * of a long (0b…abc → 0b…0a0b0c) — the classic mask-shift cascade.
    * Plain column arithmetic on purpose: it stays inside whole-stage
    * codegen AND the identical `&`/`|`/`<<` expression runs on any other
    * engine (two's-complement 64-bit on both sides), so layout keys are
    * portable across the stack. */
  /** (shift, mask) cascade shared by the column kernel and the SQL twin
    * the oracle generates — one source of truth, the two can't drift. */
  val spreadMasks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  private def spreadBits(v: Column): Column =
    spreadMasks.foldLeft(v.bitwiseAND(lit(0xFFFFFFFFL))) { case (acc, (s, m)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(m))
    }

  /** ANSI-SQL twin of [[spreadBits]] over column expression `c`. */
  def spreadBitsSql(c: String): String =
    spreadMasks.foldLeft(s"($c & 4294967295)") { case (acc, (s, m)) =>
      s"((($acc) | (($acc) << $s)) & $m)"
    }

  /**
   * Z-order (Morton) key of two non-negative dimension values: bits of
   * `x` and `y` interleaved (x even positions, y odd). Writing a table
   * sorted by this key makes BOTH dimensions locally clustered, so
   * parquet min/max row-group stats prune a 2-D box predicate — where a
   * plain `sortBy(x, y)` layout prunes only the leading column. At
   * 100 TB this is the difference between a full scan and reading
   * ~O(√files) for a (user, time-range) slice; no custom physical
   * operator is needed, the layout alone does the work (ScaleSpec
   * measures the file-level pruning win on a planted grid).
   *
   * Dimensions must already be bucketed to non-negative ints (caller
   * picks the resolution, e.g. `user_id & 4095`); values above 2³²−1
   * wrap (masked), negative inputs are the caller's bug.
   */
  def zorderKey(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /**
   * Distributed prefix sum — running total of `cntCol` in ascending
   * `orderCol` order, WITHOUT the single-partition global window the
   * naive `Window.orderBy(v)` cumsum plans (Spark moves EVERY row to one
   * reducer for it — fine for a histogram over distinct small-int
   * values, a scale cliff when the frame is distinct values of a
   * continuous column and therefore corpus-sized). Classic two-phase
   * parallel scan over range partitions:
   *
   *   1. `repartitionByRange(orderCol)` — partition i holds strictly
   *      lower values than partition i+1 (range boundaries may vary with
   *      sampling, but the prefix sum is boundary-invariant, so results
   *      are bit-stable);
   *   2. per-partition window cumsum (parallel — partitioned by
   *      `spark_partition_id`);
   *   3. per-partition totals (≤ `spark.sql.shuffle.partitions` longs —
   *      bounded driver-side model state, the centroid/CMS precedent)
   *      prefix-summed on the driver into offsets, broadcast-joined
   *      back, added to the local cumsum.
   *
   * The grand total rides along as `totalCol` for free (last offset +
   * last partial), saving the second global window a naive
   * `sum over ()` would plan. The frame is scope-cached: phases 2 and 3
   * both read it, and without the cache each would re-execute the
   * upstream aggregate.
   *
   * Precondition: `orderCol` values are UNIQUE in `df` (the histogram
   * frames this serves are post-`groupBy(value)` — one row per distinct
   * value); duplicate order keys could straddle a range boundary where
   * the per-partition window cannot see them jointly.
   *
   * @return `df` plus `cumCol` (inclusive running total) and `totalCol`
   */
  def rangeCumsum(
      df: DataFrame,
      orderCol: String,
      cntCol: String,
      cumCol: String,
      totalCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Spark's default resolver is case-INSENSITIVE: withColumn(totalCol, …)
    // silently REPLACES any input column differing only in case (the r12
    // systematicSample "__W" vs "__w" wrong-answer bug). Reject the
    // collision here so no caller can repeat it.
    val inputLower = df.columns.map(_.toLowerCase).toSet
    for (c <- Seq(cumCol, totalCol) ++ Seq("__pid", "__lcum", "__off")) {
      require(!inputLower.contains(c.toLowerCase),
        s"rangeCumsum: output/internal column '$c' case-insensitively " +
          s"collides with an input column — rename it (inputs: ${df.columns.mkString(", ")})")
    }
    require(cumCol.toLowerCase != totalCol.toLowerCase,
      s"rangeCumsum: cumCol '$cumCol' and totalCol '$totalCol' collide")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = graft.CacheScope.scoped(
      df.repartitionByRange(parts, col(orderCol))
        .withColumn("__pid", spark_partition_id()))
    val wIn = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ≤ `parts` rows — bounded driver-side state, not a data-path collect
    val partTotals = parted.groupBy(col("__pid"))
      .agg(sum(col(cntCol)).as("__pt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = partTotals.map { case (pid, t) => val o = acc; acc += t; (pid, o) }
    val total = acc
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    parted
      .withColumn("__lcum", sum(col(cntCol)).over(wIn))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(cumCol, col("__lcum") + col("__off"))
      .withColumn(totalCol, lit(total))
      .drop("__pid", "__lcum", "__off")
  }
}
