package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry assembling every query family into the SparkEntry contract. */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  def all: Map[String, Q] = ParityQueries.queries ++ PipelineQueries.queries ++
    DomainQueries.queries ++ CodeQueries.queries

  def oracles: Map[String, String] = ParityQueries.oracleSql ++ PipelineQueries.oracleSql ++
    DomainQueries.oracleSql ++ CodeQueries.oracleSql
}
