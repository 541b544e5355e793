package graft.queries

import graft.QueryEntry

object SimilarityQueries {
  val entries: Map[String, QueryEntry] = Map()
}
