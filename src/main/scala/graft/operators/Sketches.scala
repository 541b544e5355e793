package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Mergeable distinct-count sketching via K-Minimum-Values (the estimator
  * inside Theta sketches): hash every key to a uniform 64-bit value, keep the
  * k smallest distinct hashes, estimate distinct ≈ (k−1)·2⁶⁴ / v_k where v_k
  * is the k-th minimum. The reference has no approximate aggregates
  * (SURVEY.md §2.4 "not present"); at 100 TB a distinct count per column is
  * exactly the query where exact `countDistinct`'s shuffle hurts and a
  * bounded sketch wins.
  *
  * Everything is INTEGER arithmetic on md5-derived values — unlike HLL's
  * harmonic-mean floats, the KMV estimate is exactly reproducible on any
  * engine with md5 and 128-bit integer division, so the estimator itself is
  * oracle-gated (not just rows-checked).
  *
  * Scale shape: per-partition TakeOrdered(k) partials (Spark plans the
  * global `orderBy().limit(k)` exactly that way), so only k hashes per
  * partition cross the wire; the sketch is mergeable by construction (union
  * the hash sets, re-take the k smallest) — the property that makes KMV a
  * per-shard/per-day rollup sketch in production.
  */
object Sketches {

  private val Two64 = BigDecimal(java.math.BigInteger.ONE.shiftLeft(64))

  /** Uniform unsigned-64 hash of a key's text form, as an exact
    * DECIMAL(20,0): the first 16 md5 hex chars. (The signed reinterpretation
    * P7 uses would order negatives first — the sketch needs the UNSIGNED
    * order, so it parses the hex directly.)
    */
  def hash64(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 16), 16, 10).cast(DecimalType(20, 0))

  /** KMV estimate of `countDistinct(key)` — exact integer arithmetic,
    * deterministic across engines and partitionings. Returns the estimate as
    * a long (floor division); when the table has fewer than k distinct
    * hashes the sketch is exhaustive and the estimate is EXACTLY the
    * distinct hash count.
    */
  def kmvDistinct(df: DataFrame, key: Column, k: Int): Long = {
    require(k >= 2, s"k=$k: the estimator needs at least 2 minima")
    val minima = df.select(hash64(key).as("h")).distinct()
      .orderBy(col("h").asc).limit(k)
      .collect().map(r => BigDecimal(r.getDecimal(0)))
    if (minima.length < k) minima.length.toLong
    else ((Two64 * (k - 1)) / minima.last).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
  }

  /** DuckDB twin of [[kmvDistinct]] as a scalar subquery: same hash, same
    * k-th minimum, same floor division in HUGEINT.
    */
  def duckKmvDistinct(table: String, keySql: String, k: Int): String = {
    val h = s"CAST('0x' || substr(md5(CAST($keySql AS VARCHAR)), 1, 16) AS UBIGINT)"
    s"""(WITH m AS (SELECT DISTINCT $h AS h FROM $table ORDER BY h ASC LIMIT $k)
        SELECT CASE WHEN count(*) < $k THEN count(*)
               ELSE CAST(CAST('18446744073709551616' AS HUGEINT) * ${k - 1}
                         // CAST(max(h) AS HUGEINT) AS BIGINT) END
        FROM m)"""
  }
}
