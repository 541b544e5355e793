package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive closure of near-dup candidate pairs into dedup clusters:
  * connected components by iterative min-label propagation, each doc labeled
  * with the smallest doc id reachable from it — the canonical-representative
  * selection step that turns pairwise dedup candidates into a keep/drop
  * decision.
  *
  * Scale shape: pure DataFrame label propagation — per iteration one join +
  * one partial-aggregated groupBy, both keyed on doc id; iterations bounded
  * by component diameter (near-dup clusters are shallow — a handful of
  * rounds). This is the standard large-graph CC formulation (the
  * alternating-algorithm family, Kiveris et al. "Connected Components in
  * MapReduce"); no driver-side state beyond the convergence counter.
  */
object DedupClusters {

  /** Pair-count threshold below which the closure runs as driver-side
    * union-find: near-dup pair sets are a tiny fraction of the corpus, and
    * the iterative join loop pays ~3 Spark jobs per round in scheduling
    * alone. 10M pairs ≈ 160 MB of longs — trivially driver-sized even on a
    * 100 TB run; beyond that, [[propagate]] takes over.
    */
  val DriverPairLimit = 10000000L

  /** (doc_id, cluster_id) for every doc appearing in `pairs` (doc_a, doc_b);
    * cluster_id = min doc id of the component. Size-aware: small pair sets
    * close on the driver (union-find), large ones via distributed min-label
    * propagation — identical output either way.
    */
  def components(pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    val p = pairs.persist()
    val result =
      if (p.count() <= DriverPairLimit) unionFind(p)
      else propagate(p, maxIters)
    p.unpersist(blocking = false)
    result
  }

  /** Driver-side union-find with path compression over collected pairs. */
  private def unionFind(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.toSeq.sorted.map(d => (d, find(d)))
      .toDF("doc_id", "cluster_id")
  }

  /** Distributed min-label propagation (the >10M-pairs path). */
  def propagate(pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct().persist()
    var labels = edges.select(col("a").as("doc")).distinct()
      .withColumn("label", col("doc")).persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // push each doc's label to its neighbors, keep the minimum seen
      val pushed = edges.join(labels, edges("a") === labels("doc"))
        .select(col("b").as("doc"), col("label"))
      val next = labels.select(col("doc"), col("label")).union(pushed)
        .groupBy("doc").agg(min("label").as("label")).persist()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "doc")
        .filter(col("label") =!= col("old")).count()
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist(blocking = false)
    // wrong-but-plausible labels are worse than failing: a component whose
    // diameter exceeds maxIters would silently split into several clusters
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIters iterations; raise maxIters")
    labels.select(col("doc").as("doc_id"), col("label").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** DuckDB twin: transitive closure via recursive CTE, then min over the
    * reachable set. `candSql` must yield (doc_a, doc_b).
    */
  def duckComponents(candSql: String): String =
    s"""WITH RECURSIVE cand AS (SELECT doc_a, doc_b FROM ($candSql) AS c0),
       edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
                 UNION SELECT doc_b, doc_a FROM cand),
       reach(doc, r) AS (
         SELECT a, a FROM (SELECT DISTINCT a FROM edges) AS n
         UNION
         SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.doc)
       SELECT doc AS doc_id, min(r) AS cluster_id FROM reach
       GROUP BY doc ORDER BY doc_id"""
}
