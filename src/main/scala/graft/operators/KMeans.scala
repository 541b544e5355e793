package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine k-means (Lloyd) over the embedding column — the trainer that
  * produces the centroids [[Similarity.ivfAssign]] consumes, so the whole
  * IVF story (train → assign → probe) runs inside the engine. Deterministic
  * end-to-end: hash-ordered init sample, floor-scaled cosine assignment with
  * id tiebreaks, and ORDERED-FOLD means (members sorted by id, sequential
  * double summation) so Spark and the DuckDB twin produce bit-identical
  * centroids — a plain `avg()` would sum in partition order and drift by
  * ulps across engines. At production scale swap the ordered-fold mean for
  * native `avg` (the ulp drift is irrelevant when no oracle must agree);
  * everything else scales as-is: assignment is |vectors| × k with the
  * centroid list broadcast, means are one narrow (cent, pos, v) shuffle.
  */
object KMeans {

  /** Deterministic fixed-k init: smallest k vectors by MD5-of-id order. */
  def initCentroids(vectors: DataFrame, k: Int): DataFrame =
    vectors.select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string"))).limit(k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))

  /** Nearest-centroid assignment by floor-scaled cosine, tiebreak cent_id —
    * the `rn = 1` slice of the shared ranked assignment
    * ([[Similarity.assignRanked]], also the IVF index/probe machinery).
    */
  def assign(vectors: DataFrame, cent: DataFrame): DataFrame =
    Similarity.assignRanked(vectors, cent).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))

  /** Row count above which the ordered-fold mean auto-degrades to native
    * `avg` (mirrors `VerifyConfig.fullModeRowLimit`): the ordered fold's
    * `collect_list` buffers every member value of a (centroid, pos) cell in
    * one aggregation buffer — memory ∝ cluster size, and the worst-case
    * cluster size is the input row count. 10M doubles ≈ 80 MB per buffer,
    * the same bound [[DedupClusters]] uses for its driver-side union-find.
    */
  val OrderedFoldRowLimit: Long = 10000000L

  /** Per-centroid element-wise mean with a deterministic fold order: member
    * values sorted by vec_id, summed sequentially in double. Centroids whose
    * cluster empties drop out (both engines agree by construction).
    */
  def meanCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cent_id"), col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cent_id"), col("vec_id"), col("pos"), col("v").cast("double").as("v"))
      .groupBy(col("cent_id"), col("pos"))
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("vec_id"), col("v")))), s => s.getField("v")),
          lit(0.0), (acc, x) => acc + x).as("sum"),
        count(lit(1)).as("n"))
      .select(col("cent_id"), col("pos"), (col("sum") / col("n")).as("m"))
      .groupBy(col("cent_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))), s => s.getField("m"))
        .as("cv"))

  /** Scale-path mean: native codegen `avg` per (centroid, pos) — constant
    * aggregation memory, partition-order summation (ulp drift vs the ordered
    * fold, irrelevant when no cross-engine oracle must agree). The final
    * reassembly `collect_list` holds only `dims` elements per centroid.
    */
  def meanCentroidsAvg(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cent_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cent_id"), col("pos"))
      .agg(avg(col("v").cast("double")).as("m"))
      .groupBy(col("cent_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))), s => s.getField("m"))
        .as("cv"))

  /** Guarded mean: ordered fold (oracle parity) under the row limit, native
    * `avg` above it. `nRows` is the input vector count — the worst-case
    * cluster size — so no extra pass over the (expensive) assignment is
    * needed to probe actual cluster sizes.
    */
  def meanCentroidsGuarded(assigned: DataFrame, nRows: Long,
                           limit: Long = OrderedFoldRowLimit): DataFrame =
    if (nRows > limit) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"k-means: $nRows vectors > orderedFoldRowLimit=$limit; " +
          "switching ordered-fold means to native avg (no bit-parity)")
      meanCentroidsAvg(assigned)
    } else meanCentroids(assigned)

  /** `iters` Lloyd iterations; returns (cent_id, cv). One input count probes
    * the guard (callers that already know the row count pass `nRows` and
    * skip the job — PQ trains m subspaces of identical cardinality); the
    * switch applies to every iteration identically.
    */
  def train(vectors: DataFrame, k: Int, iters: Int,
            orderedFoldLimit: Long = OrderedFoldRowLimit,
            nRows: Option[Long] = None): DataFrame = {
    val n = nRows.getOrElse(vectors.count())
    (1 to iters).foldLeft(initCentroids(vectors, k)) { (cent, _) =>
      meanCentroidsGuarded(assign(vectors, cent), n, orderedFoldLimit)
    }
  }

  /** Training summary for the registered query: final cluster sizes and
    * floor-scaled centroid norms, one row per surviving centroid.
    */
  def summary(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val cent = train(vectors, k, iters).persist()
    summaryFromAssigned(cent, assign(vectors, cent))
  }

  /** [[summary]] over PRE-TRAINED centroids and their final assignment —
    * the staged-trainer seam (`graft.queries.SimilarityStaging`): training
    * runs once per fixture dir; the summary is a k-row join.
    */
  def summaryFromAssigned(cent: DataFrame, assigned: DataFrame): DataFrame = {
    val sizes = assigned.groupBy(col("cent_id"))
      .agg(count(lit(1)).as("n_members"))
    cent.join(sizes, "cent_id")
      .select(col("cent_id"),
        col("n_members"),
        floor(Similarity.norm(col("cv")) * 1e6).cast("long").as("norm_micro"))
      .orderBy("cent_id")
  }

  // -------------------------------------------------------------------------
  // DuckDB twin: the iteration unrolled as CTE stages (same init, assignment,
  // ordered-fold mean), generated from the same k/iters/dims parameters.
  // -------------------------------------------------------------------------

  private[graft] def duckAssign(centCte: String, source: String = "embeddings"): String = {
    val cos = Similarity.duckCosineScaled("v.embedding", "c.cv")
    s"""(SELECT vec_id, embedding, cent_id FROM (
          SELECT v.vec_id, v.embedding, c.cent_id,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY $cos DESC, c.cent_id ASC) AS rn
          FROM $source v CROSS JOIN $centCte c) AS t WHERE rn = 1)"""
  }

  private def duckMean(assignCte: String, dims: Int): String =
    s"""(SELECT cent_id, list(m ORDER BY pos) AS cv FROM (
          SELECT cent_id, pos,
                 list_reduce(list(CAST(embedding[pos] AS DOUBLE) ORDER BY vec_id),
                             (x, y) -> x + y) / count(*) AS m
          FROM $assignCte, generate_series(1, $dims) AS g(pos)
          GROUP BY cent_id, pos) AS s GROUP BY cent_id)"""

  /** The unrolled training CTE chain and the final centroid CTE's name —
    * shared by [[duckSummary]] and the trained-IVF search twin.
    */
  def duckTrainCtes(k: Int, iters: Int, dims: Int,
                    source: String = "embeddings", suffix: String = ""): (String, String) = {
    val init = s"""cent${suffix}0 AS (SELECT vec_id AS cent_id, embedding AS cv FROM $source
                   ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $k)"""
    val stages = (1 to iters).flatMap { i =>
      Seq(s"assign$suffix$i AS ${duckAssign(s"cent$suffix${i - 1}", source)}",
        s"cent$suffix$i AS ${duckMean(s"assign$suffix$i", dims)}")
    }
    (s"$init, ${stages.mkString(",\n")}", s"cent$suffix$iters")
  }

  def duckSummary(k: Int, iters: Int, dims: Int): String = {
    val (ctes, last) = duckTrainCtes(k, iters, dims)
    s"""WITH $ctes,
       final_assign AS ${duckAssign(last)}
       SELECT c.cent_id AS cent_id, count(*) AS n_members,
              CAST(floor(${Similarity.duckNorm("c.cv")} * 1e6) AS BIGINT) AS norm_micro
       FROM $last c JOIN final_assign a ON a.cent_id = c.cent_id
       GROUP BY c.cent_id, c.cv
       ORDER BY c.cent_id"""
  }
}
