package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over `Array[Float]` embedding columns: brute-force
  * cosine top-k as the exact baseline and a random-hyperplane LSH bucketed
  * variant as the scale path (buckets shrink the candidate set from O(n) per
  * query to one bucket).
  *
  * Float parity: elements are widened float→double (exact), dot/norm are
  * sequential left-folds (`aggregate`), and every similarity leaving the
  * operator is floor-scaled to micro-units (`BIGINT`) so an engine's last-ulp
  * difference can't flip a comparison or a rank.
  *
  * Scale shape (100 TB): queries are broadcast (small side); the neighbor
  * scan is embarrassingly parallel; top-k per query is a windowed rank over
  * (query, score) — shuffle keyed by query id only. The LSH variant bucket
  * joins instead of broadcasting the full scan.
  */
object Similarity {

  /** Native codegen'd dot product (see [[graft.functions.DotProduct]]):
    * double accumulation, ascending index — the same left-fold order as
    * DuckDB's list_reduce twin, so results are bit-identical.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Micro-scaled similarity: floor(cos * 1e6) as BIGINT. */
  def cosineScaled(a: Column, b: Column): Column =
    floor(cosine(a, b) * 1e6).cast("long")

  def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  def duckNorm(a: String): String =
    s"sqrt(list_reduce(list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x, y) -> x + y))"

  def duckCosineScaled(a: String, b: String): String =
    s"CAST(floor(${duckDot(a, b)} / (${duckNorm(a)} * ${duckNorm(b)}) * 1e6) AS BIGINT)"

  /** Scaled cosine with norms precomputed as columns — callers stage `na`/`nb`
    * once per vector instead of once per pair (norms inside the pair loop
    * would redo O(dims) work |queries|× per row).
    */
  def cosineScaledWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    floor(dot(a, b) / (na * nb) * 1e6).cast("long")

  /** Exact top-k neighbors for each query vector (brute force): broadcast the
    * query set, score every (query, neighbor) pair, keep k per query by
    * windowed rank with deterministic (score desc, id asc) tiebreak.
    * The scan side repartitions first: per-row scoring is CPU-bound and a
    * single-file local fixture otherwise plans as one partition.
    */
  def topK(queries: DataFrame, neighbors: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"))
    val n = graft.core.Readers.spread(
      neighbors.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")),
      col("neighbor_id"))
      .withColumn("nn", norm(col("nv")))
    val scored = n.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineScaledWithNorms(col("qv"), col("nv"), col("qn"), col("nn")).as("cos_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_micro").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Deterministic ±1 random hyperplanes: component (p, d) from one MD5 bit.
    * Computed in Scala and embedded as literals on BOTH engines, so the plane
    * matrix can never drift between Spark plan and oracle SQL.
    */
  def planes(numPlanes: Int, dims: Int): Seq[Seq[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (0 until dims).map { d =>
        md.reset()
        val h = md.digest(s"$p:$d".getBytes("UTF-8"))
        if ((h(0) & 0x80) == 0) 1 else -1
      }
    }
  }

  /** LSH bucket id: bit p set iff dot(v, plane_p) > 0. */
  def lshBucket(v: Column, planeMatrix: Seq[Seq[Int]]): Column = {
    val bits = planeMatrix.zipWithIndex.map { case (plane, p) =>
      val planeLit = array(plane.map(x => lit(x.toDouble)): _*)
      when(dot(v, planeLit) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  def duckLshBucket(v: String, planeMatrix: Seq[Seq[Int]]): String =
    planeMatrix.zipWithIndex.map { case (plane, p) =>
      val planeLit = plane.map(x => s"CAST($x AS DOUBLE)").mkString("[", ", ", "]")
      s"CASE WHEN ${duckDot(v, planeLit)} > 0 THEN CAST(${1L << p} AS BIGINT) ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** ANN top-k: like [[topK]] but candidates restricted to the query's LSH
    * bucket — the O(n/2^planes) scale path; recall < 1 by design.
    */
  def annTopK(queries: DataFrame, neighbors: DataFrame, k: Int,
              planeMatrix: Seq[Seq[Int]]): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"),
      lshBucket(col("embedding"), planeMatrix).as("bucket"))
    val n = graft.core.Readers.spread(
      neighbors.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")),
      col("neighbor_id"))
      .withColumn("nn", norm(col("nv")))
      .withColumn("bucket", lshBucket(col("nv"), planeMatrix))
    val scored = n.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineScaledWithNorms(col("qv"), col("nv"), col("qn"), col("nn")).as("cos_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_micro").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
