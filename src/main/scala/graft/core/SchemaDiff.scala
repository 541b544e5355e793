package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-drift diff between two targets — the catalog-level companion to
  * [[RowDiff]]. The reference compares table CONTENTS and reports per-table
  * agreement (/root/reference/results.go:72-98); when a table disagrees
  * because its shape changed (column added/dropped/retyped by a migration),
  * the first question is the schema one, and every fingerprint mode can only
  * say "(different)". This answers it directly from the catalogs, without
  * scanning a single data row.
  *
  * Scale: catalog-sized — two column listings (parquet footers / JDBC
  * information_schema, never data) joined on (table, column). Runs before
  * any data verification and costs nothing at 100 TB.
  */
object SchemaDiff {

  /** Column catalog of `tables` in `target` as a (table_name, column_name,
    * data_type) frame. Column names are lowercased and timestamp_ntz folds to
    * timestamp, the same heterogeneous-catalog normalizations the A3 merge
    * and pv_columns apply — Derby's `O_ORDERKEY` and PG's `o_orderkey` must
    * diff as the same logical column.
    */
  def catalog(spark: SparkSession, target: Target, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    tables.sorted.flatMap { t =>
      target.read(spark, t).schema.fields.map(f =>
        (t, f.name.toLowerCase,
          f.dataType.simpleString.replace("timestamp_ntz", "timestamp")))
    }.toDF("table_name", "column_name", "data_type")
  }

  /** Drift rows between two catalogs: `missing_in_a` / `missing_in_b` /
    * `type_changed`, with both sides' types carried (empty string when the
    * column is absent). Agreeing columns are filtered out — the result is
    * empty exactly when the schemas match.
    */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val aa = a.select(col("table_name"), col("column_name"), col("data_type").as("a_type"))
    val bb = b.select(col("table_name"), col("column_name"), col("data_type").as("b_type"))
    aa.join(bb, Seq("table_name", "column_name"), "full_outer")
      .withColumn("status",
        when(col("a_type").isNull, lit("missing_in_a"))
          .when(col("b_type").isNull, lit("missing_in_b"))
          .when(col("a_type") =!= col("b_type"), lit("type_changed")))
      .filter(col("status").isNotNull)
      .select(col("table_name"), col("column_name"),
        coalesce(col("a_type"), lit("")).as("a_type"),
        coalesce(col("b_type"), lit("")).as("b_type"), col("status"))
      .orderBy("table_name", "column_name")
  }
}
