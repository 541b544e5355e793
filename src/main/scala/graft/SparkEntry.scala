package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Fixtures, ParquetTarget, TestModes, VerifyConfig, VerifyRun}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full multi-target verification pipeline on sf0.001 — two
    * targets over the same fixture dir, all fingerprint modes, merged and
    * pivoted into the agreement report (SURVEY.md §2.7). Driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val targets = Seq(ParquetTarget("alpha", dir), ParquetTarget("beta", dir))
    val cfg = VerifyConfig(modes = Seq(TestModes.Full, TestModes.RowCount), bookendLimit = 100)
    // events excluded: its TIMESTAMP(NANOS) column needs the nanosAsLong
    // session config, which the caller's session may not carry
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents")
    val results = VerifyRun.run(spark, targets, Fixtures.specs, cfg, includeTables = tables)
    VerifyRun.pivotReport(results, cfg.modes)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.all.map { case (name, e) => name -> e.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    QueryRegistry.all.collect { case (name, QueryEntry(_, Some(sql))) => name -> sql }
}
