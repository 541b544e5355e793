package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit: count fact rows whose foreign key has no
  * match in the referenced dimension. The reference verifies tables in
  * isolation; after replication verifies green table-by-table, the remaining
  * way a copy can be wrong is BETWEEN tables (partial/filtered loads, FK
  * constraints dropped for bulk import and never re-checked) — this is the
  * cross-table check a real operator runs next.
  *
  * Scale: each edge is one outer join against the DISTINCT key set of the
  * dimension. Small dimensions take an explicit broadcast (the fact side
  * never shuffles); fact-to-fact edges shuffle both sides on the key — the
  * unavoidable cost, co-located away entirely when storage is bucketed by
  * the join key (see ScaleSpec's bucketed-join plan assertion). NULL FKs are
  * excluded, matching SQL FK semantics (a NULL reference is absent, not
  * dangling).
  */
object Integrity {

  /** One audited edge: `name` labels it `fact.fk -> dim.pk` in the output. */
  case class FkEdge(name: String, fact: DataFrame, fkCol: String,
                    dim: DataFrame, pkCol: String, broadcastDim: Boolean)

  /** Per-edge (fk_name, fact_rows, orphans) — one unioned plan, so all edges
    * audit in a single query rather than one driver round-trip each. The
    * distinct() on the key side guarantees the outer join cannot fan out, so
    * fact_rows doubles as the join's row count.
    */
  def orphanAudit(edges: Seq[FkEdge]): DataFrame =
    edges.map { e =>
      val keys = e.dim.select(col(e.pkCol).as("__dim_key")).distinct()
      e.fact.filter(col(e.fkCol).isNotNull)
        .join(if (e.broadcastDim) broadcast(keys) else keys,
          col(e.fkCol) === col("__dim_key"), "left_outer")
        .agg(
          count(lit(1)).as("fact_rows"),
          count(when(col("__dim_key").isNull, 1)).as("orphans"))
        .select(lit(e.name).as("fk_name"), col("fact_rows"), col("orphans"))
    }.reduce(_ unionAll _).orderBy("fk_name")
}
