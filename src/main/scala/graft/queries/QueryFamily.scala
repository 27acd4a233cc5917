package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers + the (queries, oracles) contract each family exports. */
trait QueryFamily {
  type QueryFn = (SparkSession, String) => DataFrame

  def queries: Map[String, QueryFn]
  def oracles: Map[String, String]

  /** Exact-decimal bridge for double columns: both engines compute the
    * aggregation in DECIMAL(12,2)-derived types (exact), exporting DOUBLE
    * only at the end — identical bits regardless of summation order. */
  protected val D: DecimalType = DecimalType(12, 2)
  protected def dec(c: Column): Column = c.cast(D)
  protected def sumd(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** SQL twin of sumd */
  protected def sqlSumd(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"
}
