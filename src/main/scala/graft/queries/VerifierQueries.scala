package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryEntry
import graft.core._

/** The pgverify-core operators (SURVEY.md §2) registered against the driver's
  * fixture tables: catalog discovery, the four fingerprint modes over every
  * canonicalizable table, the hash-primary-keys variant, the scalable Merkle
  * fingerprint, and the multi-target report/diff pipeline.
  */
object VerifierQueries {

  private val cfg = VerifyConfig()
  private def spec(t: String) = Fixtures.specs(t)

  /** Digest a set of tables with one mode into a (table_name, fingerprint)
    * frame; driver-side scalars exactly like the reference's per-query
    * `QueryRow().Scan` (/root/reference/verify.go:239-255).
    */
  private def digestDf(spark: SparkSession, sfDir: String, tables: Seq[String],
                       mode: String, c: VerifyConfig): DataFrame = {
    val target = ParquetTarget("t", sfDir)
    val rows = tables.sorted.map { t =>
      (t, Fingerprints.runMode(mode, target.read(spark, t), spec(t), c))
    }
    import spark.implicits._
    rows.toDF("table_name", "fingerprint")
  }

  private def digestSql(tables: Seq[String], mode: String, c: VerifyConfig): String =
    tables.sorted.map { t =>
      s"SELECT '$t' AS table_name, ${OracleSql.forMode(mode, t, spec(t), c)} AS fingerprint"
    }.mkString("", " UNION ALL ", " ORDER BY table_name")

  private val smallTables = Seq("region", "nation", "supplier", "customer", "part")

  val entries: Map[String, QueryEntry] = Map(

    // S1: catalog discovery — directory listing as the information_schema scan
    "pv_tables" -> QueryEntry(
      fn = (spark, sfDir) => {
        import spark.implicits._
        ParquetTarget("t", sfDir).tables(spark).toDF("table_name").orderBy("table_name")
      },
      oracle = Some(Fixtures.tableNames.sorted
        .map(t => s"SELECT '$t' AS table_name").mkString("", " UNION ALL ", " ORDER BY table_name"))
    ),

    // S2: column discovery — name/type/PK flags from the actual parquet footers
    "pv_columns" -> QueryEntry(
      fn = (spark, sfDir) => {
        import spark.implicits._
        val target = ParquetTarget("t", sfDir)
        val rows = Fixtures.tableNames.flatMap { t =>
          val pks = spec(t).pks.toSet
          // report the engine-neutral logical type: Spark infers parquet
          // isAdjustedToUTC=false timestamps as timestamp_ntz, an engine
          // detail the cross-engine report canonicalizes away
          target.read(spark, t).schema.fields.map(f =>
            (t, f.name, f.dataType.simpleString.replace("timestamp_ntz", "timestamp"),
              pks.contains(f.name)))
        }
        rows.toDF("table_name", "column_name", "data_type", "is_pk")
          .orderBy("table_name", "column_name")
      },
      oracle = Some(Fixtures.tableNames.flatMap { t =>
        val pks = spec(t).pks.toSet
        OracleSql.schemas(t).fields.map(f =>
          s"SELECT '$t' AS table_name, '${f.name}' AS column_name, " +
            s"'${f.dataType.simpleString}' AS data_type, ${pks.contains(f.name)} AS is_pk")
      }.mkString("", " UNION ALL ", " ORDER BY table_name, column_name"))
    ),

    // A2: rowcount mode over every fixture table
    "pv_rowcount" -> QueryEntry(
      fn = (spark, sfDir) => digestDf(spark, sfDir, Fixtures.tableNames, TestModes.RowCount, cfg),
      oracle = Some(digestSql(Fixtures.tableNames, TestModes.RowCount, cfg))
    ),

    // A1+O1+P1/P2/P3: full-mode fingerprints
    "pv_full_small" -> QueryEntry(
      fn = (spark, sfDir) => digestDf(spark, sfDir, smallTables, TestModes.Full, cfg),
      oracle = Some(digestSql(smallTables, TestModes.Full, cfg))),
    "pv_full_orders" -> QueryEntry(
      fn = (spark, sfDir) => digestDf(spark, sfDir, Seq("orders"), TestModes.Full, cfg),
      oracle = Some(digestSql(Seq("orders"), TestModes.Full, cfg))),
    "pv_full_lineitem" -> QueryEntry( // composite PK
      fn = (spark, sfDir) => digestDf(spark, sfDir, Seq("lineitem"), TestModes.Full, cfg),
      oracle = Some(digestSql(Seq("lineitem"), TestModes.Full, cfg))),
    "pv_full_events" -> QueryEntry( // timestamp canonicalization path
      fn = (spark, sfDir) => digestDf(spark, sfDir, Seq("events"), TestModes.Full, cfg),
      oracle = Some(digestSql(Seq("events"), TestModes.Full, cfg))),
    "pv_full_documents" -> QueryEntry(
      fn = (spark, sfDir) => digestDf(spark, sfDir, Seq("documents"), TestModes.Full, cfg),
      oracle = Some(digestSql(Seq("documents"), TestModes.Full, cfg))),

    // O1 hash-primary-keys variant (/root/reference/config.go:53-57)
    "pv_full_hashpk" -> QueryEntry(
      fn = (spark, sfDir) =>
        digestDf(spark, sfDir, Seq("customer", "lineitem"), TestModes.Full, cfg.copy(hashPrimaryKeys = true)),
      oracle = Some(digestSql(Seq("customer", "lineitem"), TestModes.Full, cfg.copy(hashPrimaryKeys = true)))),

    // O2/O3+J3 bookend mode
    "pv_bookend" -> QueryEntry(
      fn = (spark, sfDir) =>
        digestDf(spark, sfDir, Seq("orders", "lineitem", "events"), TestModes.Bookend, cfg.copy(bookendLimit = 100)),
      oracle = Some(digestSql(Seq("orders", "lineitem", "events"), TestModes.Bookend, cfg.copy(bookendLimit = 100)))),

    // P7+J2 sparse mode (signed 64-bit MD5 sample)
    "pv_sparse" -> QueryEntry(
      fn = (spark, sfDir) =>
        digestDf(spark, sfDir, Seq("orders", "lineitem"), TestModes.Sparse, cfg),
      oracle = Some(digestSql(Seq("orders", "lineitem"), TestModes.Sparse, cfg))),

    // scalable Merkle fingerprint (SURVEY.md §4) — bucketed, one shuffle
    "pv_merkle" -> QueryEntry(
      fn = (spark, sfDir) => {
        import spark.implicits._
        val target = ParquetTarget("t", sfDir)
        Seq("lineitem", "orders").sorted.map { t =>
          (t, Fingerprints.merkleDigest(target.read(spark, t), spec(t), cfg, buckets = 64))
        }.toDF("table_name", "fingerprint")
      },
      oracle = Some(Seq("lineitem", "orders").sorted.map { t =>
        s"SELECT '$t' AS table_name, ${OracleSql.merkle(t, spec(t), cfg, 64)} AS fingerprint"
      }.mkString("", " UNION ALL ", " ORDER BY table_name"))
    )
  )
}
