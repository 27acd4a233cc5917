package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/**
 * Central query registry: merges every query family. Each family is one
 * object per SURVEY.md §2 operator group; `Queries.all` is the driver's
 * verification surface, `Queries.oracles` its DuckDB twin.
 *
 * Determinism rules shared by all families are documented on
 * [[graft.queries.QueryFamily]].
 */
object Queries {

  private val families: Seq[QueryFamily] = Seq(
    TraceQueries,
    RelationalQueries,
    AnalyticsQueries,
    ScalarQueries,
    ExtensionQueries)

  def all: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_.queries).toMap

  def oracles: Map[String, String] =
    families.flatMap(_.oracles).toMap
}
