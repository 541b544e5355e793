package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) the equivalent DuckDB SQL for the driver's
  * correctness gate. Entries without an oracle get the driver's weaker
  * rows-only check.
  */
case class QueryEntry(fn: (SparkSession, String) => DataFrame, oracle: Option[String] = None)

object QueryRegistry {
  /** All modules contributing registered queries. */
  def modules: Seq[Map[String, QueryEntry]] = Seq(
    queries.VerifierQueries.entries,
    queries.AnalyticsQueries.entries,
    queries.TextQueries.entries,
    queries.CorpusQueries.entries,
    queries.DedupQueries.entries,
    queries.SimilarityQueries.entries,
    queries.EventQueries.entries,
    queries.MultimodalQueries.entries,
    queries.DriftQueries.entries,
    queries.PrivacyQueries.entries
  )

  lazy val all: Map[String, QueryEntry] = modules.reduce(_ ++ _)
}
