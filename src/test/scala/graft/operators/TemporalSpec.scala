package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleForwardFill: full grid, slot max, forward fill, observed flags") {
    // user 1: days 0, 2 observed (slot max 2000 on day 0: two obs) → day 1 filled
    // user 2: single day → single observed slot
    val df = Seq(
      (1L, ts("1970-01-01 01:00:00"), 1.5),  // day 0
      (1L, ts("1970-01-01 02:00:00"), 2.0),  // day 0 (max → 2000)
      (1L, ts("1970-01-03 05:00:00"), 0.25), // day 2
      (2L, ts("1970-01-02 00:00:00"), 7.0)   // day 1
    ).toDF("user_id", "ts", "value")
    val out = Temporal.resampleForwardFill(df, "user_id", "ts", "value", 86400L)
      .orderBy($"user_id", $"slot")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 2000L, true),
      (1L, 1L, 2000L, false), // gap: carried forward
      (1L, 2L, 250L, true),
      (2L, 1L, 7000L, true)), s"got $out")
  }

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (1L, ts("2024-01-01 09:00:00"), "early"), // before any reading
      (2L, ts("2024-01-01 11:00:00"), "other-key")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 20.0), // exactly simultaneous with 'a'
      (1L, ts("2024-01-01 11:30:00"), 30.0),
      (3L, ts("2024-01-01 00:00:00"), 99.0) // key absent from left
    ).toDF("k", "ts", "reading")

    val out = Temporal.asofJoin(left, right, "k", "ts", Seq("reading"))
      .select("k", "tag", "reading").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

    assert(out((1L, "a")).contains(20.0)) // simultaneous reading visible
    assert(out((1L, "b")).contains(30.0))
    assert(out((1L, "early")).isEmpty)    // no reading yet → null
    assert(out((2L, "other-key")).isEmpty)
    assert(out.size == 4)                 // every left row survives
  }

  test("asofJoin attaches the matched right ROW atomically, incl. NULL values") {
    val left = Seq(
      (1L, ts("2024-01-01 10:06:00"), "x")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5.0), Some(1.0)),
      (1L, ts("2024-01-01 10:05:00"), None, Some(2.0)) // latest reading, v1 NULL
    ).toDF("k", "ts", "v1", "v2")
    // the latest at-or-before reading is 10:05 with v1=NULL: a per-column
    // ignoreNulls sweep would resurrect 10:00's v1=5.0 (a chimera row
    // mixing two readings); the atomic sweep must report (NULL, 2.0)
    val out = Temporal.asofJoin(left, right, "k", "ts", Seq("v1", "v2"),
      toleranceSeconds = Some(120))
      .select("v1", "v2").head()
    assert(out.isNullAt(0), s"v1 must be the 10:05 reading's NULL, got $out")
    assert(out.getDouble(1) == 2.0)
    // and the tolerance judges the 10:05 reading (1 min gap), not 10:00
    val outTight = Temporal.asofJoin(left, right, "k", "ts", Seq("v1", "v2"),
      toleranceSeconds = Some(30)).select("v1", "v2").head()
    assert(outTight.isNullAt(0) && outTight.isNullAt(1),
      "a 60s-old reading must be stale under a 30s tolerance")
  }

  test("asofJoinForward picks the earliest right row at-or-after each left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),     // simultaneous reading visible
      (1L, ts("2024-01-01 10:30:00"), "b"),     // next reading is 11:30
      (1L, ts("2024-01-01 12:00:00"), "late"),  // nothing after → null
      (2L, ts("2024-01-01 11:00:00"), "other-key")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 20.0),
      (1L, ts("2024-01-01 11:30:00"), 30.0),
      (3L, ts("2024-01-01 00:00:00"), 99.0)
    ).toDF("k", "ts", "reading")
    val out = Temporal.asofJoinForward(left, right, "k", "ts", Seq("reading"))
      .select("k", "tag", "reading").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out((1L, "a")).contains(20.0))
    assert(out((1L, "b")).contains(30.0))
    assert(out((1L, "late")).isEmpty)
    assert(out((2L, "other-key")).isEmpty)
    assert(out.size == 4)
    // look-AHEAD tolerance: the 11:30 reading is > 30 min after 10:30
    val bounded = Temporal.asofJoinForward(left, right, "k", "ts", Seq("reading"),
      toleranceSeconds = Some(1800L))
      .select("tag", "reading").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(bounded("a").contains(20.0) && bounded("b").isEmpty)
  }

  test("asofJoin tolerance: stale readings beyond the lookback become null") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "fresh"),  // 30 min after reading
      (1L, ts("2024-01-01 13:00:00"), "stale")   // 3.5 h after reading
    ).toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 09:30:00"), 10.0)).toDF("k", "ts", "reading")
    val out = Temporal.asofJoin(left, right, "k", "ts", Seq("reading"),
      toleranceSeconds = Some(3600L))
      .select("tag", "reading").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("fresh").contains(10.0))
    assert(out("stale").isEmpty)
  }

  test("asofJoinSalted equals asofJoin on a pathologically hot key") {
    import org.apache.spark.sql.functions.col
    // one key carries 2000 of 2010 rows — the unsalted window serializes it
    // on one reducer; the salted variant must split it WITHOUT changing any
    // per-row result (incl. tolerance nulls and the at-equal-ts match)
    val left = ((0 until 2000).map(i =>
      (1L, ts(f"2024-01-01 ${i / 120}%02d:${(i / 2) % 60}%02d:${(i * 7) % 60}%02d"), i.toLong)) ++
      (0 until 10).map(i => (100L + i, ts(s"2024-01-01 12:00:0$i"), 9000L + i)))
      .toDF("k", "ts", "row_id")
    val right = ((0 until 48).map(i =>
      (1L, ts(f"2024-01-01 ${i / 2}%02d:${(i % 2) * 30}%02d:00"), i.toDouble)) ++
      Seq((105L, ts("2024-01-01 11:00:00"), 500.0)))
      .toDF("k", "ts", "reading")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "row_id", "reading").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

    val plain = canon(Temporal.asofJoin(left, right, "k", "ts", Seq("reading")))
    val salted = canon(Temporal.asofJoinSalted(left, right, "k", "ts", Seq("reading"), salts = 7))
    assert(salted.size == 2010 && salted == plain)

    val plainTol = canon(Temporal.asofJoin(left, right, "k", "ts", Seq("reading"),
      toleranceSeconds = Some(900L)))
    val saltedTol = canon(Temporal.asofJoinSalted(left, right, "k", "ts", Seq("reading"),
      salts = 7, toleranceSeconds = Some(900L)))
    assert(saltedTol == plainTol)
    assert(!Temporal.asofJoinSalted(left, right, "k", "ts", Seq("reading"), salts = 7)
      .columns.contains("__salt"))
  }

  test("intervalJoin equals the naive theta join, incl. cell-boundary spans") {
    val intervals = Seq(
      (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00")), // spans 3 cells at 600s
      (20L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:06:00")),
      (30L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:01:00")), // no points
      // malformed (end < start): matches nothing, and must be dropped
      // BEFORE the cell explode — sequence() would otherwise generate a
      // 4-year DESCENDING cell range from this one row
      (40L, ts("2024-01-01 10:00:00"), ts("2020-01-01 10:00:00"))
    ).toDF("interval_id", "s", "e")
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start boundary
      (2L, ts("2024-01-01 10:05:30")),
      (3L, ts("2024-01-01 10:20:00")), // == end boundary
      (4L, ts("2024-01-01 11:00:00"))  // outside everything
    ).toDF("point_id", "p")
    val grid = Temporal.intervalJoin(intervals, points, "s", "e", "p", cellSeconds = 600L)
      .select("interval_id", "point_id").as[(Long, Long)].collect().toSet
    val naive = intervals.join(points, $"p" >= $"s" && $"p" <= $"e")
      .select("interval_id", "point_id").as[(Long, Long)].collect().toSet
    assert(grid == naive)
    assert(grid == Set((10L, 1L), (10L, 2L), (10L, 3L), (20L, 2L)))
  }

  test("rollingActive: distinct (not summed) actors per trailing window; ends clamped") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")), // u1 day1
      (1L, ts("2024-01-01 18:00:00")), // u1 day1 again — one contribution
      (1L, ts("2024-01-02 09:00:00")), // u1 day2 — still ONE per window
      (2L, ts("2024-01-01 09:00:00")), // u2 day1
      (3L, ts("2024-01-03 09:00:00")), // u3 day3
      (4L, ts("2024-01-03 10:00:00"))  // u4 day3
    ).toDF("user_id", "ts")
    val out = Temporal.rollingActive(events, "user_id", "ts", windowDays = 2)
      .orderBy("window_end")
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, n) => (d.toString, n) }
    // window {d1}: u1,u2 = 2; {d1,d2}: u1 once, u2 = 2; {d2,d3}: u1,u3,u4 = 3
    // d4 (= d3 + 1) is past the last observed day -> clamped away
    assert(out.toSeq == Seq(
      ("2024-01-01", 2L), ("2024-01-02", 2L), ("2024-01-03", 3L)))
  }

  test("rollingActive reports zero-actor days inside the span (dense series)") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")),
      (2L, ts("2024-01-06 09:00:00")) // 4-day gap between activity
    ).toDF("user_id", "ts")
    val out = Temporal.rollingActive(events, "user_id", "ts", windowDays = 2)
      .orderBy("window_end")
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, n) => (d.toString, n) }
    // windows ending d3..d4 hold nobody — they must appear as 0, not vanish
    assert(out.toSeq == Seq(
      ("2024-01-01", 1L), ("2024-01-02", 1L), ("2024-01-03", 0L),
      ("2024-01-04", 0L), ("2024-01-05", 0L), ("2024-01-06", 1L)))
  }

  test("rollingActiveHll: sparse-mode sketches match the exact rolling distinct, dense spine kept") {
    // at hand-fixture cardinality the HLL is in sparse mode and EXACT,
    // so the sketch-union path must reproduce rollingActive bit-for-bit
    // (including the zero-actor day inside the span) — what the
    // rolling_active_hll bounded oracle relies on at fixture scale
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")),
      (1L, ts("2024-01-02 09:00:00")), // multi-day actor: once per window
      (2L, ts("2024-01-01 09:00:00")),
      (3L, ts("2024-01-04 09:00:00"))  // d3 window {d2,d3} holds only u1
    ).toDF("user_id", "ts")
    val exact = Temporal.rollingActive(events, "user_id", "ts", windowDays = 2)
      .orderBy("window_end")
      .as[(java.sql.Date, Long)].collect().map { case (d, n) => (d.toString, n) }
    val approx = Temporal.rollingActiveHll(events, "user_id", "ts", windowDays = 2)
      .orderBy("window_end")
      .as[(java.sql.Date, Long)].collect().map { case (d, n) => (d.toString, n) }
    assert(exact.toSeq == Seq(
      ("2024-01-01", 2L), ("2024-01-02", 2L), ("2024-01-03", 1L),
      ("2024-01-04", 1L)))
    assert(approx.toSeq == exact.toSeq,
      s"sparse-mode HLL diverged from exact: ${approx.toSeq} vs ${exact.toSeq}")
  }

  test("timeWeightedAvg: zero-span keys emit NULL, not NaN") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "z", 10.0),
      (2L, ts("2024-01-01 10:00:00"), "z", 20.0), // same instant: 0s span
      (3L, ts("2024-01-01 10:00:00"), "z", 30.0)
    ).toDF("event_id", "ts", "key", "value")
    val out = Temporal.timeWeightedAvg(events, "key", "ts", "event_id", "value")
      .select("key", "sum_seconds", "twap").collect()
    assert(out.length == 1 && out.head.getLong(1) == 0L)
    assert(out.head.isNullAt(2),
      "0-second span has no time axis — twap must be NULL, never NaN")
  }

  test("timeWeightedAvg: holding intervals weight values; last observation open-ended") {
    val events = Seq(
      // key m: 10.0 held 60s, 20.0 held 30s, 50.0 open-ended (excluded)
      (1L, ts("2024-01-01 10:00:00"), "m", 10.0),
      (2L, ts("2024-01-01 10:01:00"), "m", 20.0),
      (3L, ts("2024-01-01 10:01:30"), "m", 50.0),
      // key n: single observation -> no interval -> no output row
      (4L, ts("2024-01-01 10:00:00"), "n", 99.0)
    ).toDF("event_id", "ts", "key", "value")
    val out = Temporal.timeWeightedAvg(events, "key", "ts", "event_id", "value")
      .as[(String, Long, Long, Double)].collect()
    assert(out.length == 1 && out.head._1 == "m")
    // cents*s: 1000*60 + 2000*30 = 120000; seconds 90; twap = 1200/90 = 13.33..
    assert(out.head._2 == 120000L && out.head._3 == 90L)
    assert(out.head._4 == 120000.0 / (100.0 * 90.0))
    // plain avg would say 26.67 — the burst 50.0 never held, TWAP ignores it
    assert(math.abs(out.head._4 - 13.3333) < 0.001)
  }
}
