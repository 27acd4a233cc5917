package graft.sources

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

class JdbcTraceSourceSpec extends AnyFunSuite {
  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-01-31 23:59:59")

  // ---- LIVE embedded database (Derby ships on the Spark classpath) ----

  /** One in-memory Derby DB per JVM, seeded with the reference table:
    * ids 1..5 in-range, id 3 also out-of-range, id 9 never queried. */
  private lazy val derbyUrl: String = {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE TD_FD_TRACE_PARAM (
          |  PARAM_INDEX BIGINT NOT NULL,
          |  START_TIME TIMESTAMP NOT NULL,
          |  END_TIME TIMESTAMP NOT NULL,
          |  TRACE_DATA VARCHAR(256) NOT NULL)""".stripMargin)
      val ins = conn.prepareStatement(
        "INSERT INTO TD_FD_TRACE_PARAM VALUES (?, ?, ?, ?)")
      def add(id: Long, start: String, data: String): Unit = {
        ins.setLong(1, id)
        ins.setTimestamp(2, Timestamp.valueOf(start))
        ins.setTimestamp(3, Timestamp.valueOf(start).toInstant
          .plusSeconds(60).let(java.sql.Timestamp.from))
        ins.setString(4, data)
        ins.executeUpdate()
      }
      add(1L, "2024-01-10 08:00:00", "d1a")
      add(1L, "2024-01-05 08:00:00", "d1b") // earlier: sort must put it first
      add(2L, "2024-01-15 12:00:00", "d2")
      add(3L, "2023-12-01 00:00:00", "d3-out-of-range")
      add(3L, "2024-01-20 00:00:00", "d3-in-range")
      add(9L, "2024-01-11 00:00:00", "d9-not-queried")
      ins.close(); st.close()
    } finally conn.close()
    url
  }
  implicit private class LetOps[A](private val a: A) {
    def let[B](f: A => B): B = f(a)
  }
  private def derbyProps: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("LIVE read: the reference query executes on a real database with DB-side filter+sort") {
    val spark = graft.SparkTestSession.spark
    val got = JdbcTraceSource.read(spark, derbyUrl,
      ids = Seq(1L, 2L, 3L), start = t0, end = t1, props = derbyProps,
      tsLiteral = JdbcTraceSource.derbyTsLiteral)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(3)))
    // id 9 excluded by the IN list, the 2023 row by the range; order is
    // (PARAM_INDEX, START_TIME) — the DATABASE sorted, Spark added no sort
    assert(got.toSeq == Seq(
      (1L, Timestamp.valueOf("2024-01-05 08:00:00"), "d1b"),
      (1L, Timestamp.valueOf("2024-01-10 08:00:00"), "d1a"),
      (2L, Timestamp.valueOf("2024-01-15 12:00:00"), "d2"),
      (3L, Timestamp.valueOf("2024-01-20 00:00:00"), "d3-in-range")))
  }

  test("LIVE readPartitioned: parallel range stripes cover the table exactly once") {
    val spark = graft.SparkTestSession.spark
    val df = JdbcTraceSource.readPartitioned(spark, derbyUrl,
      numPartitions = 3, lowerParamIndex = 1L, upperParamIndex = 10L,
      props = derbyProps)
    assert(df.rdd.getNumPartitions == 3, "stripe count lost")
    val ids = df.collect().map(r => (r.getLong(0), r.getString(3))).sorted
    assert(ids.length == 6, s"rows dropped or duplicated across stripes: ${ids.toSeq}")
    assert(ids.map(_._1).toSet == Set(1L, 2L, 3L, 9L))
  }

  test("querySql mirrors the reference SQL: projection, IN-list, closed range, sort") {
    val sql = JdbcTraceSource.querySql(Seq(1L, 2L), t0, t1)
    assert(sql.contains("PARAM_INDEX as paramIndex"))
    assert(sql.contains("FROM TD_FD_TRACE_PARAM"))
    assert(sql.contains("PARAM_INDEX IN (1, 2)"))
    assert(sql.contains("START_TIME >= TIMESTAMP '2024-01-01 00:00:00"))
    assert(sql.contains("START_TIME <= TIMESTAMP '2024-01-31 23:59:59"))
    assert(sql.contains("ORDER BY dparam.PARAM_INDEX, dparam.START_TIME ASC"))
  }

  test("querySql rejects empty ids and inverted ranges") {
    intercept[IllegalArgumentException](JdbcTraceSource.querySql(Nil, t0, t1))
    intercept[IllegalArgumentException](JdbcTraceSource.querySql(Seq(1L), t1, t0))
  }
}
