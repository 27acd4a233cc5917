package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap > 30min starts a new session; ids are per-user ordinals") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
      (2L, ts("2024-01-01 10:10:00"), 100L, 2.0), // same session (10m)
      (3L, ts("2024-01-01 11:00:00"), 100L, 3.0), // new session (50m gap)
      (4L, ts("2024-01-01 10:05:00"), 200L, 4.0), // other user
      (5L, ts("2024-01-01 10:34:59"), 200L, 5.0), // 29m59s → same session
      (6L, ts("2024-01-01 11:05:00"), 200L, 6.0) // 30m01s → new session
    ).toDF("event_id", "ts", "user_id", "value")

    val assigned = Sessionize.assign(events)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(assigned(1L) == 1 && assigned(2L) == 1 && assigned(3L) == 2)
    assert(assigned(4L) == 1 && assigned(5L) == 1 && assigned(6L) == 2)

    val stats = Sessionize.sessionStats(events).collect()
    assert(stats.length == 4)
    val s1 = stats.find(r => r.getLong(0) == 100L && r.getLong(1) == 1L).get
    assert(s1.getAs[Long]("n_events") == 2)
    assert(s1.getAs[Double]("sum_value") == 3.0)
  }

  test("exactly-30min gap does NOT split (strict > semantics)") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 0.0),
      (2L, ts("2024-01-01 10:30:00"), 1L, 0.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val n = Sessionize.sessionStats(events).count()
    assert(n == 1)
  }
}
