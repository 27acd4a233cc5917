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
}
