package graft.queries

import graft.QueryEntry

object DedupQueries {
  val entries: Map[String, QueryEntry] = Map()
}
