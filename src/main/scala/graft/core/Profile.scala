package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.canon.Canon

/** Per-column data profiling — the data-quality report one step up from the
  * `stats` fingerprint mode ([[Fingerprints.statsDigestCol]]): where stats
  * folds count/min/max into one digest for CHEAP drift detection, profile
  * keeps the per-column figures a human (or a quality gate) reads — row
  * count, null count, exact distinct count, and the modal value with its
  * frequency. Values are compared in their canonical TEXT form
  * ([[Canon.canonText]]), so every column type funnels through one pipeline
  * and the figures are engine-portable by the same rules as the fingerprint
  * modes.
  *
  * Scale shape: one stacked projection (each row explodes into |cols|
  * `(col_name, canonical_value)` entries — column-pruned to exactly the
  * profiled columns) feeding ONE `(col_name, value)` aggregate, from which
  * all four figures derive: the null count and row count roll up per
  * column, each surviving row IS one distinct value, and the mode is a
  * per-column top-1 (map-side-combined counts, then a window over the
  * already-aggregated frame). A high-cardinality column dominates with its
  * distinct projection — the same cost as `count(DISTINCT col)`; when
  * exactness isn't required at 100 TB, the sketch family
  * ([[graft.operators.Sketches]]) is the degrade path, this operator is
  * the exact one.
  */
object Profile {

  /** Profile `cols` of `df` (schema-typed via `schema`): one output row per
    * column — (col_name, n_rows, n_null, n_distinct, top_value, top_n).
    * Ties for the mode break on the smaller canonical value; a column of
    * only NULLs profiles with NULL top_value/top_n.
    */
  def profile(df: DataFrame, schema: StructType, cols: Seq[String],
              tsPrecision: String = "milliseconds"): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    val stacked = df.select(explode(array(cols.map { c =>
      val dt = byName.getOrElse(c, throw new IllegalArgumentException(
        s"profile column '$c' not in schema ${schema.fieldNames.mkString(", ")}"))
      struct(lit(c).as("col_name"), Canon.canonText(col(c), dt, tsPrecision).as("v"))
    }: _*)).as("s")).select(col("s.col_name").as("col_name"), col("s.v").as("v"))
    val counts = stacked.groupBy("col_name", "v").agg(count(lit(1)).as("c")).persist()
    val figures = counts.groupBy("col_name").agg(
      sum(col("c")).as("n_rows"),
      coalesce(sum(when(col("v").isNull, col("c"))), lit(0L)).as("n_null"),
      count(col("v")).as("n_distinct"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name")).orderBy(col("c").desc, col("v").asc)
    val top = counts.filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("col_name"), col("v").as("top_value"), col("c").as("top_n"))
    val result = figures.join(top, Seq("col_name"), "left_outer")
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"),
        col("top_value"), col("top_n"))
      .persist()
    result.count()
    counts.unpersist(blocking = false)
    result
  }

  /** DuckDB twin of [[profile]]: one generated SELECT per column (scalar
    * subqueries over the same canonical projection), UNION ALL'd. The
    * repetition is deliberate — each branch is the independently-readable
    * ground truth for one column.
    */
  def duckProfile(table: String, schema: StructType, cols: Seq[String],
                  tsPrecision: String = "milliseconds"): String = {
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    cols.map { c =>
      val dt = byName.getOrElse(c, throw new IllegalArgumentException(
        s"profile column '$c' not in schema ${schema.fieldNames.mkString(", ")}"))
      val v = Canon.duckSqlRaw(c, dt, tsPrecision)
      val s = s"(SELECT $v AS v FROM $table)"
      val lbl = c.replace("'", "''") // SQL string-literal escape for the label
      s"""SELECT '$lbl' AS col_name,
            (SELECT CAST(count(*) AS BIGINT) FROM $table) AS n_rows,
            (SELECT CAST(count(*) - count(v) AS BIGINT) FROM $s sc) AS n_null,
            (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM $s sd) AS n_distinct,
            (SELECT v FROM $s st WHERE v IS NOT NULL
             GROUP BY v ORDER BY count(*) DESC, v ASC LIMIT 1) AS top_value,
            (SELECT CAST(count(*) AS BIGINT) FROM $s sn WHERE v IS NOT NULL
             GROUP BY v ORDER BY count(*) DESC, v ASC LIMIT 1) AS top_n"""
    }.mkString("\nUNION ALL\n")
  }
}
