package graft.sources

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

class JdbcTraceSourceSpec extends AnyFunSuite {
  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-01-31 23:59:59")

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
