package graft.queries

import graft.QueryEntry

object EventQueries {
  val entries: Map[String, QueryEntry] = Map()
}
