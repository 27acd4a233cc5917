package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * Temporal joins for time-series tables (the natural operator family for
 * the reference's sensor-trace domain: "what was the last reading at the
 * time of each event").
 *
 * [[asofJoin]] is the union-and-sweep formulation: tag both inputs, union
 * them with each side's exclusive columns null on the other side, sort
 * per key by (ts, side), and carry the most recent right-side READING —
 * one struct of (its ts, all value columns), so the match is row-atomic
 * even when individual values are NULL — forward with
 * `last(_, ignoreNulls)` over an unbounded-preceding frame.
 * ONE shuffle (the per-key sort), no join node at all — the classic
 * merge-free as-of that scales linearly in rows, where a naive
 * `l.ts >= r.ts` range join explodes to O(|L|·|R|) per key. Spark has no
 * native ASOF JOIN; DuckDB does, which makes it a perfect oracle.
 */
object Temporal {

  /**
   * For every left row, attach the latest right-side `valueCols` with
   * `right.ts <= left.ts` on the same key (at-or-before match: a reading
   * at exactly left.ts is visible). No match → nulls; left rows always
   * survive. Left columns pass through unchanged; `valueCols` must not
   * collide with left column names.
   *
   * `toleranceSeconds` bounds the lookback (pandas `merge_asof`
   * semantics): a reading older than the tolerance yields nulls instead.
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame =
    asofJoinKeys(left, right, Seq(keyCol), tsCol, valueCols, toleranceSeconds)

  /**
   * Forward (look-ahead) as-of join: each left row takes the EARLIEST
   * right row with `right.ts >= left.ts` on the same key — the
   * "next purchase after this click" / "first reading after the fault"
   * direction. Mirror image of [[asofJoin]]: same one-exchange
   * union-and-sweep, swept from latest to earliest; `toleranceSeconds`
   * bounds the look-AHEAD.
   */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame =
    asofJoinKeys(left, right, Seq(keyCol), tsCol, valueCols, toleranceSeconds,
      forward = true)

  /**
   * Hot-key-safe variant: [[asofJoin]] puts a key's ENTIRE row set on one
   * reducer (the per-key window sort) — a pathological key (one sensor
   * producing half the events) serializes on a single task. Salting splits
   * each key into `salts` window partitions: every LEFT row gets one
   * deterministic salt (content hash), the RIGHT side replicates to ALL
   * salts, so each (key, salt) partition holds the key's full right-side
   * history plus ~1/salts of its left rows — per-left-row results are
   * identical to the unsalted join, wall clock divides by ~salts, and the
   * cost is a bounded ×salts replication of the (usually much smaller)
   * right side.
   */
  def asofJoinSalted(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      salts: Int = 8,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(salts >= 1, s"salts must be positive: $salts")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "__salt column name is reserved")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    asofJoinKeys(l, r, Seq(keyCol, "__salt"), tsCol, valueCols, toleranceSeconds)
      .drop("__salt")
  }

  private def asofJoinKeys(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      toleranceSeconds: Option[Long],
      forward: Boolean = false): DataFrame = {
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"valueCols collide with left columns: $collisions")
    val passthrough = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == tsCol)

    // side 0 = right, 1 = left: at equal ts the right row sorts first.
    // The matched reading travels as ONE struct (__rts + every value
    // column) so the sweep attaches a whole right ROW atomically: a
    // per-column `last(_, ignoreNulls)` would skip a reading whose value
    // IS null and resurrect an older one — wrong value, and with several
    // value columns a chimera row stitched from different readings.
    // ignoreNulls then only skips LEFT rows (whole-struct null); a right
    // row with null fields still registers as the latest reading.
    val rStructType = StructType(
      StructField("__rts", right.schema(tsCol).dataType) +:
        valueCols.map(c => StructField(c, right.schema(c).dataType)))
    val taggedRight = right.select(
      keyCols.map(col) ++ (col(tsCol) +: lit(0).as("__side") +:
        struct(col(tsCol).as("__rts") +: valueCols.map(c => col(c).as(c)): _*)
          .as("__r") +:
        passthrough.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++ (col(tsCol) +: lit(1).as("__side") +:
        lit(null).cast(rStructType).as("__r") +:
        passthrough.map(col)): _*)

    // forward flips only the sweep direction: latest→earliest, so the
    // running `last` carries the NEXT reading backwards. Right rows
    // still sort before left at equal ts (side asc) — at-or-after
    // includes an exactly-simultaneous reading, mirroring at-or-before.
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val swept = taggedRight.unionByName(taggedLeft)
      .select(
        keyCols.map(col) ++ (col(tsCol) +: col("__side") +:
          last(col("__r"), ignoreNulls = true).over(w).as("__r") +:
          passthrough.map(col)): _*)
      .filter(col("__side") === 1)
      .select(
        (keyCols.map(col) ++ (col(tsCol) +: col("__side") +:
          col("__r.__rts").as("__rts") +:
          passthrough.map(col))) ++
          valueCols.map(c => col(s"__r.$c").as(c)): _*)

    val bounded = toleranceSeconds match {
      case None => swept
      case Some(tol) =>
        val gap =
          if (forward)
            col("__rts").cast("timestamp").cast("long") -
              col(tsCol).cast("timestamp").cast("long")
          else
            col(tsCol).cast("timestamp").cast("long") -
              col("__rts").cast("timestamp").cast("long")
        val stale = col("__rts").isNull || gap > tol
        valueCols.foldLeft(swept) { (df, c) =>
          df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
        }
    }
    bounded.drop("__side", "__rts")
  }

  /**
   * Interval-containment join WITHOUT an equi-key: every (interval, point)
   * pair with `start <= ts <= end`, via time-grid bucketing.
   *
   * Naively this is a pure theta join — Spark plans it as a broadcast
   * nested loop (O(|I|·|P|)), which dies at scale. Bucketing the time axis
   * into `cellSeconds` cells makes it an equi-join on the cell id:
   * intervals replicate to each cell they overlap (≤ len/cellSeconds + 1
   * copies), points land in exactly one cell — so each qualifying pair
   * meets in exactly one cell and needs no post-dedup. Pick `cellSeconds`
   * ≈ the typical interval length: replication stays ~2× and each cell's
   * candidate set stays local.
   *
   * Column names of the two inputs must be disjoint.
   */
  def intervalJoin(
      intervals: DataFrame,
      points: DataFrame,
      startCol: String,
      endCol: String,
      tsCol: String,
      cellSeconds: Long): DataFrame = {
    require(cellSeconds > 0, "cellSeconds must be positive")
    val collisions = intervals.columns.toSet.intersect(points.columns.toSet)
    require(collisions.isEmpty, s"input column names collide: $collisions")
    val cellUs = cellSeconds * 1000000L
    // cast NTZ→LTZ first (UTC session ⇒ same wall clock); unix_micros
    // accepts only TimestampType
    def cellOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / cellUs)

    // malformed intervals (end < start) match nothing by definition —
    // and must be dropped BEFORE the explode: Spark's sequence(a, b)
    // with b < a generates a DESCENDING range, so a single corrupt
    // interval spanning "now → epoch" would otherwise explode into
    // millions of wrong-cell rows (the ts-bounds filter below keeps the
    // RESULT correct either way; this guard keeps the COST bounded)
    val i = intervals.filter(col(endCol) >= col(startCol))
      .withColumn("__cell",
        explode(sequence(cellOf(col(startCol)), cellOf(col(endCol)))))
    val p = points.withColumn("__cell", cellOf(col(tsCol)))
    i.join(p, Seq("__cell"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__cell")
  }

  /**
   * Gap-fill resample: bucket each key's observations into fixed
   * `stepSeconds` slots (slot value = MAX in the slot — deterministic,
   * order-free), generate the key's FULL slot grid from first to last
   * observation, and forward-fill empty slots with the most recent
   * observed value. The standard time-series densification every
   * monitoring/feature pipeline needs (a sensor that reports
   * sporadically becomes a regular series).
   *
   * Scale shape: the slot aggregate is a map-side-combined shuffle on
   * (key, slot) — the only corpus-sized exchange; the per-key span is a
   * tiny aggregate; the grid explodes to span/step rows per key (the
   * OUTPUT size — inherent); the fill is one `last(_, ignoreNulls)`
   * window over the per-key slot order, no self-join. Slot values are
   * integer micro-units so a SQL oracle replays the whole pipeline
   * exactly.
   *
   * @return (`<keyCol>`, `slot`, `v_ffill`, `observed`) — slot is epoch
   *         seconds / stepSeconds; first slot per key is always observed
   */
  def resampleForwardFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      stepSeconds: Long = 86400L): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds must be positive: $stepSeconds")
    val obs = df.select(
      col(keyCol),
      (unix_timestamp(col(tsCol)) / stepSeconds).cast("long").as("slot"),
      floor(col(valueCol) * lit(1000)).cast("long").as("__v"))
    val bySlot = obs.groupBy(col(keyCol), col("slot")).agg(max(col("__v")).as("__slot_max"))
    val span = obs.groupBy(col(keyCol))
      .agg(min(col("slot")).as("__s0"), max(col("slot")).as("__s1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__s0"), col("__s1"))).as("slot"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bySlot, Seq(keyCol, "slot"), "left")
      .select(col(keyCol), col("slot"),
        last(col("__slot_max"), ignoreNulls = true).over(w).as("v_ffill"),
        col("__slot_max").isNotNull.as("observed"))
  }

  /**
   * Time-weighted average (TWAP) per series: each observation holds its
   * value until the NEXT observation, so the mean weights each value by
   * its holding interval — the standard telemetry/finance aggregate
   * where a plain `avg` over-counts burst periods. The last observation
   * per key has no interval and is excluded (standard open-ended
   * convention; pass a synthetic end-of-period row to close it).
   *
   * Integer-exact accumulation: weights are whole SECONDS (epoch diff),
   * values fixed-point cents, so `Σ(value·dt)` is a BIGINT sum — no
   * float summation order anywhere; the single final division is one
   * IEEE op. Overflow audit: cents ≤ 10⁶ × dt ≤ 10⁷ s ⇒ ≤ 10¹³ per
   * row, 10⁵ rows per key ⇒ ≤ 10¹⁸ < 2⁶³.
   *
   * One hash exchange on the key (the `lead` window), aggregation reuses
   * its partitioning.
   */
  def timeWeightedAvg(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    df
      .withColumn("__cents", round(col(valueCol) * 100).cast("long"))
      .withColumn("__dt",
        unix_timestamp(lead(col(tsCol), 1).over(w)) - unix_timestamp(col(tsCol)))
      .filter(col("__dt").isNotNull)
      .groupBy(col(keyCol))
      .agg(
        sum(col("__cents") * col("__dt")).as("sum_value_seconds"),
        sum(col("__dt")).as("sum_seconds"))
      // a key whose retained intervals span zero seconds (all readings
      // share one timestamp) has no time axis to weight over: emit NULL
      // explicitly — the raw division would produce 0.0/0.0 = NaN, and
      // engines disagree on NaN (DuckDB NULLs a 0/0) so the choice must
      // be pinned, not inherited from IEEE defaults
      .withColumn("twap",
        when(col("sum_seconds") > 0,
          col("sum_value_seconds").cast("double") /
            (lit(100.0) * col("sum_seconds").cast("double"))))
  }

  /**
   * EXACT rolling-window distinct actors ("7-day rolling DAU"): for every
   * day in the observed span, the number of DISTINCT `actorCol` values
   * active in the trailing `windowDays` window. A rolling distinct is NOT
   * a rolling sum of dailies (an actor active twice in a window counts
   * once), and windowed `COUNT(DISTINCT)` frames don't exist in either
   * engine — so this uses the contribution expansion: each distinct
   * (actor, day) pair contributes to the `windowDays` window-end days
   * `[day, day + windowDays − 1]`, a second distinct collapses
   * multi-day actors per window, and a plain count per window-end
   * finishes. Window ends past the last observed day are clamped.
   *
   * Scale shape: the event stream reduces to distinct (actor, day) in
   * one exchange — per-actor-per-day volume (billions of raw events)
   * never re-shuffles. The ×`windowDays` explode is map-side on the
   * REDUCED pair set, and both distincts partial-aggregate. Cost is
   * Θ(|actor-days| · windowDays) — the standard exact shape; swap in
   * [[rollingActiveHll]] when ±2% suffices at 100 TB.
   */
  def rollingActive(
      df: DataFrame,
      actorCol: String,
      tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive: $windowDays")
    // ad feeds both the span max and the contribution explode; persist
    // the reduced pair set so raw events distinct-reduce once
    val ad = graft.CacheScope.scoped(
      df.select(col(actorCol).as("actor"), to_date(col(tsCol)).as("d"))
        .distinct())
    val span = ad.agg(min(col("d")).as("__dmin"), max(col("d")).as("__dmax"))
    val counts = ad.select(col("actor"),
        explode(sequence(col("d"), date_add(col("d"), windowDays - 1)))
          .as("window_end"))
      .distinct()
      .groupBy(col("window_end"))
      .agg(count(lit(1)).as("__n"))
    // dense day spine (1-row span aggregate → explode; bounded by the
    // calendar, not the data): the contract is one row for EVERY day of
    // the observed span — a day whose trailing window holds no actors
    // must report n_active = 0, not silently vanish from the series.
    // The spine ends at the last observed day, which also clamps
    // window ends past the span (they drop in the join).
    span.select(explode(sequence(col("__dmin"), col("__dmax"))).as("window_end"))
      .join(counts, Seq("window_end"), "left")
      .select(col("window_end"), coalesce(col("__n"), lit(0L)).as("n_active"))
  }

  /**
   * APPROXIMATE rolling-window distinct actors — [[rollingActive]]'s
   * 100 TB path. One HLL sketch per day (DataSketches `hll_sketch_agg`,
   * mergeable state), then each day's sketch is exploded to its
   * `windowDays` window ends and UNION-merged per window — distinctness
   * across days falls out of the sketch union, no second corpus-sized
   * distinct.
   *
   * Scale shape vs the exact form: the exact contribution expansion
   * exchanges Θ(|actor-days| · windowDays) rows and re-distincts them;
   * here the event stream reduces to |days| sketches in ONE day-keyed
   * aggregate (partial-merged map-side), and everything after is
   * calendar-bounded — Θ(|days| · windowDays) sketch rows of ≤ 2^lgK
   * bytes each, regardless of actor cardinality. At lgK = 12 the
   * standard error is ~1.6%; at small cardinalities the sketch is in
   * sparse mode and exact, which is what lets the bounded-check oracle
   * hold at fixture scale.
   */
  def rollingActiveHll(
      df: DataFrame,
      actorCol: String,
      tsCol: String,
      windowDays: Int = 7,
      lgK: Int = 12): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive: $windowDays")
    // daily feeds both the span and the window contributions — persist
    // the |days|-row sketch table so events aggregate once
    val daily = graft.CacheScope.scoped(df
      .select(to_date(col(tsCol)).as("d"), col(actorCol).as("actor"))
      .groupBy(col("d"))
      .agg(hll_sketch_agg(col("actor"), lit(lgK)).as("sk")))
    val span = daily.agg(min(col("d")).as("__dmin"), max(col("d")).as("__dmax"))
    val unioned = daily
      .select(explode(sequence(col("d"), date_add(col("d"), windowDays - 1)))
        .as("window_end"), col("sk"))
      .groupBy(col("window_end"))
      .agg(hll_union_agg(col("sk")).as("sk"))
    // dense spine, clamped to the observed span like the exact form; a
    // window with no sketch (impossible inside the span, but the
    // contract mirrors the exact operator) reports 0
    span.select(explode(sequence(col("__dmin"), col("__dmax"))).as("window_end"))
      .join(unioned, Seq("window_end"), "left")
      .select(col("window_end"),
        coalesce(hll_sketch_estimate(col("sk")), lit(0L)).as("n_active_approx"))
  }
}
