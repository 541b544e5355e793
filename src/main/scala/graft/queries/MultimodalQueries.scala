package graft.queries

import graft.QueryEntry

object MultimodalQueries {
  val entries: Map[String, QueryEntry] = Map()
}
