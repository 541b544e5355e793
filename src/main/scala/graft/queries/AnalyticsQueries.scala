package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryEntry

/** General analytics over the TPC-H-ish fixtures — exercises scan, filter,
  * hash-aggregate, joins, and windows through plain Catalyst plans.
  *
  * Oracle-parity rule for floating point: every money column is a 2-decimal
  * value stored as double, so `CAST(x AS DECIMAL(18,2))` recovers the exact
  * decimal on both engines; all SUMs run in decimal (exact, order-insensitive)
  * and only the final scalar is cast back to double. Naked double SUMs would
  * be non-deterministic across engines/partitionings. AVG is expressed as
  * decimal-sum / count (one IEEE division) because Spark's avg(decimal) and
  * DuckDB's avg(decimal) round differently.
  */
object AnalyticsQueries {

  val entries: Map[String, QueryEntry] = Map(

    // TPC-H Q1-style pricing summary: the flagship scan→hash-agg plan.
    "q1_pricing" -> QueryEntry(
      fn = (spark, sfDir) => {
        val li = graft.core.Readers.fixture(spark, sfDir, "lineitem")
        val dec = (c: String) => col(c).cast("decimal(18,2)")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec("l_quantity")).cast("double").as("sum_qty"),
            sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
            sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
              .cast("double").as("sum_disc_price"),
            (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    )
  )
}
