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

  test("stateRuns: consecutive equal states collapse; valid_to chains to the next run") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "up"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "up"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "down"),
      (4L, ts("2024-01-01 10:15:00"), 1L, "down"),
      (5L, ts("2024-01-01 10:20:00"), 1L, "up"), // state returns -> NEW run
      (6L, ts("2024-01-01 09:00:00"), 2L, "up") // other user, single run
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessionize.stateRuns(events)
      .select("user_id", "run_seq", "state", "start_ts", "end_ts", "n_events", "valid_to")
      .as[(Long, Long, String, Timestamp, Timestamp, Long, Option[Timestamp])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2, r._3, r._6)).toSeq == Seq(
      (1L, 1L, "up", 2L), (1L, 2L, "down", 2L), (1L, 3L, "up", 1L),
      (2L, 1L, "up", 1L)))
    // observed bounds: first/last event of the run
    assert(out(0)._4 == ts("2024-01-01 10:00:00") && out(0)._5 == ts("2024-01-01 10:05:00"))
    // SCD2 chain: valid_to = next run's start; open-ended on the last run
    assert(out(0)._7.contains(ts("2024-01-01 10:10:00")))
    assert(out(1)._7.contains(ts("2024-01-01 10:20:00")))
    assert(out(2)._7.isEmpty && out(3)._7.isEmpty)
  }

  test("stateRuns: a NULL state is its own run, not absorbed by the neighbor") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, Some("on")),
      (2L, ts("2024-01-01 10:05:00"), 1L, None), // state unknown — own run
      (3L, ts("2024-01-01 10:10:00"), 1L, Some("on")),
      (4L, ts("2024-01-01 10:15:00"), 1L, None),
      (5L, ts("2024-01-01 10:20:00"), 1L, None)  // consecutive NULLs collapse
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessionize.stateRuns(events)
      .select("run_seq", "state", "n_events")
      .as[(Long, Option[String], Long)].collect().sortBy(_._1)
    // on | NULL | on | NULL-NULL → four runs; the null-unsafe =!= form
    // merged 'on'→NULL transitions and reported two runs of 'on'
    assert(out.toSeq == Seq(
      (1L, Some("on"), 1L), (2L, None, 1L),
      (3L, Some("on"), 1L), (4L, None, 2L)))
  }

  test("stateRuns: equal timestamps break ties by event id (deterministic runs)") {
    val t = ts("2024-01-01 10:00:00")
    val events = Seq(
      (2L, t, 1L, "b"), (1L, t, 1L, "a"), (3L, t, 1L, "a")
    ).toDF("event_id", "ts", "user_id", "event_type")
    // id order a(1), b(2), a(3) -> three runs, never two
    val runs = Sessionize.stateRuns(events)
    val out = runs
      .select("run_seq", "state").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "a")))
    // ONE hash exchange end-to-end: the change-flag windows, the run
    // aggregation, and the valid_to window all reuse the user_id
    // partitioning (the rn - rn_per_state formulation would add a second)
    val physical = runs.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(physical).size
    assert(nExchanges == 1, s"expected 1 exchange, got $nExchanges in:\n$physical")
  }
}
