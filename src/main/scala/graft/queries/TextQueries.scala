package graft.queries

import graft.QueryEntry

object TextQueries {
  val entries: Map[String, QueryEntry] = Map()
}
