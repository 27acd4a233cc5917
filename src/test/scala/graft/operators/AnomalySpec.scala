package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$i%02d")

  test("zscoreFlags: spike flagged; single-outlier z-square boundary is EXACT") {
    // 11 steady values then a spike: at the spike row n = 12 and the
    // single-outlier identity z^2 = n - 1 = 11 > 9 flags it at k = 3
    val rows = (1 to 11).map(i => (i.toLong, ts(i), "m", 10.0)) :+
      (12L, ts(12), "m", 100.0)
    val out = Anomaly.zscoreFlags(rows.toDF("event_id", "ts", "key", "value"),
      "key", "ts", "event_id", "value", windowRows = 50, k = 3, minObs = 5)
      .select("event_id").as[Long].collect()
    assert(out.toSeq == Seq(12L), "only the spike row is anomalous")

    // boundary exactness: with 9 steady + 1 spike, z^2 = n - 1 = 9 is NOT
    // > k^2 = 9 — float arithmetic could land either side of this; the
    // integer form cannot
    val boundary = (1 to 9).map(i => (i.toLong, ts(i), "m", 10.0)) :+
      (10L, ts(10), "m", 100.0)
    val flagged = Anomaly.zscoreFlags(boundary.toDF("event_id", "ts", "key", "value"),
      "key", "ts", "event_id", "value", windowRows = 50, k = 3, minObs = 5)
      .count()
    assert(flagged == 0, "z^2 == k^2 exactly must stay below the strict >")
  }

  test("zscoreFlags: minObs suppresses cold starts; constant series never flags") {
    val rows = Seq(
      (1L, ts(1), "m", 999.0), // wild first value — but n < minObs
      (2L, ts(2), "m", 10.0),
      (3L, ts(3), "m", 10.0)
    ) ++ (4 to 30).map(i => (i.toLong, ts(i), "m", 10.0))
    val out = Anomaly.zscoreFlags(rows.toDF("event_id", "ts", "key", "value"),
      "key", "ts", "event_id", "value", windowRows = 10, k = 3, minObs = 5)
      .count()
    // the 999 leaves the trailing window before n reaches minObs at row 5?
    // No: at row 5 the window still holds it (rows 1-5), but 999 is not the
    // CURRENT row there — and the current 10.0 sits close to the mean.
    // Constant windows later give 0 > 0 = false. Nothing flags.
    assert(out == 0)
  }

  test("zscoreFlags equals a brute-force sliding-window check on random series") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 300).map { i =>
      val v = if (rnd.nextInt(20) == 0) 500.0 + rnd.nextInt(100) // occasional spike
              else 10.0 + rnd.nextInt(5)
      (i.toLong, ts(i % 60), if (i % 2 == 0) "a" else "b", v)
    }
    val got = Anomaly.zscoreFlags(rows.toDF("event_id", "ts", "key", "value"),
      "key", "ts", "event_id", "value", windowRows = 30, k = 3, minObs = 10)
      .select("event_id").as[Long].collect().toSet
    // brute force with the same integer-cents arithmetic
    val want = rows.groupBy(_._3).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2.getTime, e._1))
      sorted.indices.flatMap { i =>
        val win = sorted.slice(math.max(0, i - 29), i + 1)
          .map(e => Math.round(e._4 * 100))
        val n = win.length.toLong
        val x = win.last
        val s = win.sum; val q = win.map(c => c * c).sum
        val d = n * x - s
        if (n >= 10 && d * d > 9L * (n * q - s * s)) Some(sorted(i)._1) else None
      }
    }.toSet
    assert(want.nonEmpty, "fixture should plant at least one anomaly")
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }
}
