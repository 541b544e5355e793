package graft

import java.sql.DriverManager

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.core.{Fingerprints, JdbcTarget, SchemaFilter, TableSpec, TestModes, VerifyConfig}

/** Live-JDBC exercise of [[JdbcTarget]] against an embedded Derby database
  * (Spark ships the Derby jars for its Hive metastore, so no extra
  * dependency): S1 catalog scan, S2+J1 column discovery with the P5
  * generated-column filter, and one end-to-end fingerprint whose every byte
  * travels through `spark.read.jdbc`.
  *
  * Derby exposes its catalog as `SYS.*`, not PG's `information_schema`, so
  * the spec materializes an `INFORMATION_SCHEMA` schema whose tables mirror
  * what PostgreSQL would publish for the fixture table (the reference's
  * discovery queries are PG-dialect, /root/reference/query.go:21-118) — the
  * discovery SQL, the catalog joins, and the data reads all execute live
  * over the wire.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val db: Unit = {
    val conn = DriverManager.getConnection(url)
    // idempotent across suite instances (CliSpec reuses this database)
    if (!conn.getMetaData.getTables(null, "APP", "VERIFYME", null).next()) {
      populate(conn)
    }
    conn.close()
  }

  private def populate(conn: java.sql.Connection): Unit = {
    val st = conn.createStatement()
    def exec(sql: String): Unit = st.execute(sql)
    exec("CREATE TABLE verifyme (id INT NOT NULL PRIMARY KEY, name VARCHAR(64), amount DOUBLE)")
    exec("INSERT INTO verifyme VALUES (2, 'beta', 12.5), (1, 'alpha', 3.25), (3, NULL, 100.0)")
    // a string-PK table (hash-split path) and an empty table (probe → NULL
    // bounds → single partition), both also flowing through the CLI e2e run
    exec("CREATE TABLE strkeys (k VARCHAR(16) NOT NULL PRIMARY KEY, v INT)")
    exec("INSERT INTO strkeys VALUES ('a',1),('bb',2),('ccc',3),('dddd',4),('eeeee',5),('f',6)")
    exec("CREATE TABLE emptyt (eid INT NOT NULL PRIMARY KEY, payload VARCHAR(16))")
    // composite PK mixing a wide surrogate key with a narrow discriminator
    // (the lineitem shape): the split chooser must pick korder by span even
    // though knum sorts first alphabetically
    exec("CREATE TABLE compkeys (korder BIGINT NOT NULL, knum INT NOT NULL, " +
      "pay VARCHAR(16), PRIMARY KEY (korder, knum))")
    exec("INSERT INTO compkeys VALUES " +
      (1 to 14).map(i => s"(${i.toLong * 71429 + 100}, ${(i - 1) % 7 + 1}, 'p$i')").mkString(", "))
    // a second user schema, for the --include/--exclude-schemas surface
    exec("CREATE SCHEMA other")
    exec("CREATE TABLE other.extra (xid INT NOT NULL PRIMARY KEY, note VARCHAR(64))")
    exec("INSERT INTO other.extra VALUES (1, 'aux')")
    exec("CREATE SCHEMA information_schema")
    exec("CREATE TABLE information_schema.tables " +
      "(table_schema VARCHAR(128), table_name VARCHAR(128), table_type VARCHAR(32))")
    exec("INSERT INTO information_schema.tables VALUES " +
      "('APP', 'VERIFYME', 'BASE TABLE'), " +
      "('APP', 'STRKEYS', 'BASE TABLE'), " +
      "('APP', 'EMPTYT', 'BASE TABLE'), " +
      "('APP', 'COMPKEYS', 'BASE TABLE'), " +
      "('OTHER', 'EXTRA', 'BASE TABLE'), " +
      "('APP', 'SOMEVIEW', 'VIEW'), " + // excluded: views (P4)
      "('pg_catalog', 'pg_class', 'BASE TABLE')") // excluded: system schema
    exec("CREATE TABLE information_schema.columns (column_name VARCHAR(128), " +
      "data_type VARCHAR(64), table_schema VARCHAR(128), table_name VARCHAR(128), " +
      "is_generated VARCHAR(16), ordinal_position INT)")
    exec("INSERT INTO information_schema.columns VALUES " +
      "('id', 'integer', 'APP', 'VERIFYME', 'NEVER', 1), " +
      "('name', 'character varying', 'APP', 'VERIFYME', 'NEVER', 2), " +
      "('amount', 'double precision', 'APP', 'VERIFYME', 'NEVER', 3), " +
      "('ghost', 'integer', 'APP', 'VERIFYME', 'ALWAYS', 4), " + // excluded: P5
      "('k', 'character varying', 'APP', 'STRKEYS', 'NEVER', 1), " +
      "('v', 'integer', 'APP', 'STRKEYS', 'NEVER', 2), " +
      "('eid', 'integer', 'APP', 'EMPTYT', 'NEVER', 1), " +
      "('payload', 'character varying', 'APP', 'EMPTYT', 'NEVER', 2), " +
      "('korder', 'bigint', 'APP', 'COMPKEYS', 'NEVER', 1), " +
      "('knum', 'integer', 'APP', 'COMPKEYS', 'NEVER', 2), " +
      "('pay', 'character varying', 'APP', 'COMPKEYS', 'NEVER', 3), " +
      "('xid', 'integer', 'OTHER', 'EXTRA', 'NEVER', 1), " +
      "('note', 'character varying', 'OTHER', 'EXTRA', 'NEVER', 2)")
    exec("CREATE TABLE information_schema.key_column_usage (column_name VARCHAR(128), " +
      "table_schema VARCHAR(128), table_name VARCHAR(128), constraint_name VARCHAR(128))")
    exec("INSERT INTO information_schema.key_column_usage VALUES " +
      "('id', 'APP', 'VERIFYME', 'verifyme_pkey'), " +
      "('k', 'APP', 'STRKEYS', 'strkeys_pkey'), " +
      "('eid', 'APP', 'EMPTYT', 'emptyt_pkey'), " +
      "('korder', 'APP', 'COMPKEYS', 'compkeys_pkey'), " +
      "('knum', 'APP', 'COMPKEYS', 'compkeys_pkey'), " +
      "('xid', 'OTHER', 'EXTRA', 'extra_pkey')")
    exec("CREATE TABLE information_schema.table_constraints " +
      "(constraint_name VARCHAR(128), constraint_type VARCHAR(32))")
    exec("INSERT INTO information_schema.table_constraints VALUES " +
      "('verifyme_pkey', 'PRIMARY KEY'), " +
      "('strkeys_pkey', 'PRIMARY KEY'), " +
      "('emptyt_pkey', 'PRIMARY KEY'), " +
      "('compkeys_pkey', 'PRIMARY KEY'), " +
      "('extra_pkey', 'PRIMARY KEY')")
    st.close()
  }

  private def target: JdbcTarget = { db; JdbcTarget("derby", url) }

  /** Idempotent database setup, shared with CliSpec's live-JDBC CLI test. */
  def ensureDb(): Unit = db

  /** A second Derby database holding the SAME logical data under
    * quoted-LOWERCASE identifiers — the heterogeneous-casing counterpart
    * (PG lowercases unquoted identifiers where Derby uppercases them; a
    * Derby+PG pair is exactly this shape). Its catalog mirror reports the
    * physical lowercase names, like PG's information_schema would.
    */
  val lcUrl = "jdbc:derby:memory:graftdb_lc;create=true"

  private lazy val lcDb: Unit = {
    val conn = DriverManager.getConnection(lcUrl)
    if (!conn.getMetaData.getTables(null, "APP", "verifyme", null).next()) {
      val st = conn.createStatement()
      def exec(sql: String): Unit = st.execute(sql)
      exec("""CREATE TABLE "verifyme" ("id" INT NOT NULL PRIMARY KEY, """ +
        """"name" VARCHAR(64), "amount" DOUBLE)""")
      exec("""INSERT INTO "verifyme" VALUES (2, 'beta', 12.5), (1, 'alpha', 3.25), (3, NULL, 100.0)""")
      exec("CREATE SCHEMA information_schema")
      exec("CREATE TABLE information_schema.tables " +
        "(table_schema VARCHAR(128), table_name VARCHAR(128), table_type VARCHAR(32))")
      exec("INSERT INTO information_schema.tables VALUES ('APP', 'verifyme', 'BASE TABLE')")
      exec("CREATE TABLE information_schema.columns (column_name VARCHAR(128), " +
        "data_type VARCHAR(64), table_schema VARCHAR(128), table_name VARCHAR(128), " +
        "is_generated VARCHAR(16), ordinal_position INT)")
      exec("INSERT INTO information_schema.columns VALUES " +
        "('id', 'integer', 'APP', 'verifyme', 'NEVER', 1), " +
        "('name', 'character varying', 'APP', 'verifyme', 'NEVER', 2), " +
        "('amount', 'double precision', 'APP', 'verifyme', 'NEVER', 3)")
      exec("CREATE TABLE information_schema.key_column_usage (column_name VARCHAR(128), " +
        "table_schema VARCHAR(128), table_name VARCHAR(128), constraint_name VARCHAR(128))")
      exec("INSERT INTO information_schema.key_column_usage VALUES " +
        "('id', 'APP', 'verifyme', 'verifyme_pkey')")
      exec("CREATE TABLE information_schema.table_constraints " +
        "(constraint_name VARCHAR(128), constraint_type VARCHAR(32))")
      exec("INSERT INTO information_schema.table_constraints VALUES ('verifyme_pkey', 'PRIMARY KEY')")
      st.close()
    }
    conn.close()
  }

  /** Idempotent setup of the quoted-lowercase twin database. */
  def ensureLowercaseDb(): Unit = lcDb

  test("S1: JDBC catalog scan lists base tables, excluding views and system schemas") {
    assert(target.tables(spark) ==
      Seq("APP.COMPKEYS", "APP.EMPTYT", "APP.STRKEYS", "APP.VERIFYME", "OTHER.EXTRA"))
  }

  test("S6 fail-fast: an unreachable JDBC target aborts before any work") {
    val dead = JdbcTarget("dead", "jdbc:derby:memory:no_such_db_exists")
    val e = intercept[IllegalStateException] {
      graft.core.VerifyRun.discoverTables(spark, dead, graft.core.SchemaFilter.All)
    }
    assert(e.getMessage.contains("unreachable") && e.getMessage.contains("dead"))
  }

  test("schema filters apply in the catalog scan itself (query.go:25-50)") {
    // include wins, case-insensitive (user types lowercase, Derby says OTHER)
    assert(target.tables(spark, SchemaFilter(include = Seq("other"))) == Seq("OTHER.EXTRA"))
    assert(target.tables(spark, SchemaFilter(exclude = Seq("other"))) ==
      Seq("APP.COMPKEYS", "APP.EMPTYT", "APP.STRKEYS", "APP.VERIFYME"))
    // include wins over exclude, same as tables/columns
    assert(target.tables(spark,
      SchemaFilter(include = Seq("APP"), exclude = Seq("APP"))) ==
      Seq("APP.COMPKEYS", "APP.EMPTYT", "APP.STRKEYS", "APP.VERIFYME"))
  }

  test("S2+J1+P5: live column discovery joins catalog tables and drops generated columns") {
    val cols = target.discoverColumns(spark, "APP", "VERIFYME")
    assert(cols.map(_.name).sorted == Seq("amount", "id", "name"))
    assert(cols.filter(_.isPrimaryKey).map(_.name) == Seq("id"))
    assert(!cols.exists(_.name == "ghost"))
  }

  test("end-to-end: full-mode fingerprint over a live JDBC read matches the in-memory digest") {
    val cfg = VerifyConfig()
    // Derby uppercases unquoted identifiers; the in-memory twin mirrors that
    val spec = TableSpec("verifyme", Seq("ID"))
    val viaJdbc = target.read(spark, "APP.VERIFYME")
    val schema = StructType(Seq(StructField("ID", IntegerType),
      StructField("NAME", StringType), StructField("AMOUNT", DoubleType)))
    val local = spark.createDataFrame(java.util.Arrays.asList(
      Row(2, "beta", 12.5), Row(1, "alpha", 3.25), Row(3, null, 100.0)), schema)
    val jdbcModes = Fingerprints.runModes(TestModes.All, viaJdbc, spec, cfg)
    val localModes = Fingerprints.runModes(TestModes.All, local, spec, cfg)
    assert(jdbcModes == localModes)
    assert(jdbcModes(TestModes.RowCount) == "3")
    assert(jdbcModes.values.forall(_ != Fingerprints.Err))
  }

  test("partitioned read: numeric PK range-splits and fingerprints match single-partition") {
    val multi = target.read(spark, "APP.VERIFYME")
    // ids 1..3 → Spark clamps numPartitions to (hi - lo) = 2, still parallel
    assert(multi.rdd.getNumPartitions > 1)
    val single = JdbcTarget("derby1", url, readPartitions = 1).read(spark, "APP.VERIFYME")
    assert(single.rdd.getNumPartitions == 1)
    val spec = TableSpec("verifyme", Seq("ID"))
    val cfg = VerifyConfig()
    assert(Fingerprints.runModes(TestModes.All, multi, spec, cfg) ==
      Fingerprints.runModes(TestModes.All, single, spec, cfg))
  }

  test("partitioned read: string PK hash-splits via dialect predicates, each row exactly once") {
    // Derby-dialect generator (the PG default's md5 SQL doesn't parse here):
    // LENGTH(k) mod n — mutually exclusive and exhaustive like the P7 trick
    val t = JdbcTarget("derbyhash", url, readPartitions = 3,
      stringPkPredicates = Some((c, n) => (0 until n).map(i => s"MOD(LENGTH($c), $n) = $i")))
    val df = t.read(spark, "APP.STRKEYS")
    assert(df.rdd.getNumPartitions == 3)
    val keys = df.select("K").collect().map(_.getString(0)).sorted.toSeq
    assert(keys == Seq("a", "bb", "ccc", "dddd", "eeeee", "f"))
  }

  test("partitioned read: composite PK splits on the widest-span column, not the alphabetical pick") {
    // knum sorts alphabetically before korder but spans only 1..7; an
    // alphabetical pick would clamp this 8-partition read to <=6 skewed
    // range connections (Spark clamps numPartitions to upper-lower)
    val t = JdbcTarget("derbycomp", url, readPartitions = 8)
    assert(t.resolveSplit(spark, "APP.COMPKEYS", 8) ==
      JdbcTarget.RangeSplit("KORDER", 71529L, 14 * 71429L + 100))
    val df = t.read(spark, "APP.COMPKEYS")
    assert(df.rdd.getNumPartitions == 8)
    // every row exactly once across the range partitions
    assert(df.select("KORDER").collect().map(_.getLong(0)).sorted.toSeq ==
      (1 to 14).map(_.toLong * 71429 + 100))
  }

  test("narrow numeric span with a dialect generator falls back to the hash-split") {
    // VERIFYME ids span 1..3 — can't feed 8 range partitions; with a hash
    // generator available the chooser must prefer uniform hash buckets, keyed
    // on the LEADING PK column (catalog ordinal order, not alphabetical)
    val t = JdbcTarget("derbynarrow", url, readPartitions = 8,
      stringPkPredicates = Some((c, n) => (0 until n).map(i => s"""MOD("$c", $n) = $i""")))
    assert(t.resolveSplit(spark, "APP.VERIFYME", 8) == JdbcTarget.HashSplit("ID"))
    val df = t.read(spark, "APP.VERIFYME")
    assert(df.rdd.getNumPartitions == 8)
    assert(df.select("ID").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("partitioned read fallbacks: no generator on a non-PG engine, empty table") {
    // string PK + no dialect generator → single partition, never foreign SQL
    assert(target.read(spark, "APP.STRKEYS").rdd.getNumPartitions == 1)
    // empty table → NULL min/max probe → single partition, zero rows
    val empty = target.read(spark, "APP.EMPTYT")
    assert(empty.rdd.getNumPartitions == 1 && empty.count() == 0)
  }

  test("library entry VerifyRun.run matches spec/include keys case-insensitively") {
    // Derby's catalog reports VERIFYME; a PG-style lowercase spec key must
    // still select it through the library entry point (the CLI path already
    // case-folds; the A3 merge lowercases — this must agree with both)
    val rows = graft.core.VerifyRun.run(spark, Seq(target),
      Map("verifyme" -> TableSpec("verifyme", Seq("ID"))),
      VerifyConfig(modes = Seq(TestModes.RowCount)), includeTables = Seq("VerifyMe"))
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("table") == "VERIFYME" &&
      rows.head.getAs[String]("output") == "3")
  }

  test("cross-engine: parquet vs Derby agree on all four modes; a missing row fails every mode") {
    db
    // stage the region fixture into Derby (idempotent), catalog mirror included
    val conn = DriverManager.getConnection(url)
    if (!conn.getMetaData.getTables(null, "APP", "REGION", null).next()) {
      val st = conn.createStatement()
      st.execute("CREATE TABLE region (r_regionkey INT NOT NULL PRIMARY KEY, " +
        "r_name VARCHAR(64))")
      val ps = conn.prepareStatement("INSERT INTO region VALUES (?, ?)")
      graft.core.Readers.fixture(spark, sfDir, "region").collect().foreach { r =>
        ps.setInt(1, r.getAs[Number]("r_regionkey").intValue())
        ps.setString(2, r.getAs[String]("r_name"))
        ps.executeUpdate()
      }
      ps.close()
      st.execute("INSERT INTO information_schema.tables VALUES ('APP', 'REGION', 'BASE TABLE')")
      st.execute("INSERT INTO information_schema.columns VALUES " +
        "('r_regionkey', 'integer', 'APP', 'REGION', 'NEVER', 1), " +
        "('r_name', 'character varying', 'APP', 'REGION', 'NEVER', 2)")
      st.execute("INSERT INTO information_schema.key_column_usage VALUES " +
        "('r_regionkey', 'APP', 'REGION', 'region_pkey')")
      st.execute("INSERT INTO information_schema.table_constraints VALUES " +
        "('region_pkey', 'PRIMARY KEY')")
      st.close()
    }
    conn.close()

    // end-to-end CLI: per-target discovery (directory listing vs live
    // information_schema), per-target PK casing, fan-out, pivot, exit code —
    // sparse-mod 1 and a small bookend window so every mode sees every row
    // (the reference's negative-test knobs, integration_test.go:294-398)
    def runCli(dir: String): (Int, String) = {
      // --parquet-schema app: the comparison keys on (schema, table), so the
      // parquet side must present as Derby's schema (case-folded by A3)
      val cfg = Cli.parse(Seq("--tests", "full,sparse,bookend,rowcount",
        "--sparse-mod", "1", "--bookend-limit", "4", "--parquet-schema", "app",
        "--include-tables", "region", "--aliases", "pq,derby", dir, url)).toOption.get
      val sw = new java.io.StringWriter()
      (Cli.run(spark, cfg, sw), sw.toString)
    }
    val (okCode, okOut) = runCli(sfDir)
    assert(okCode == 0, okOut)
    assert(okOut.contains("region") && !okOut.contains("(err)"), okOut)

    // a parquet twin missing one row must be flagged — by EVERY mode
    val tmp = java.nio.file.Files.createTempDirectory("graft-hetero").toString
    val full = graft.core.Readers.fixture(spark, sfDir, "region")
    full.filter(org.apache.spark.sql.functions.col("r_regionkey") =!= 0)
      .write.parquet(s"$tmp/region.parquet")
    val (badCode, badOut) = runCli(tmp)
    assert(badCode == 1, badOut)
    val cfgV = VerifyConfig(bookendLimit = 4, sparseMod = 1)
    val viaJdbc = Fingerprints.runModes(TestModes.All,
      target.read(spark, "APP.REGION"), TableSpec("region", Seq("R_REGIONKEY")), cfgV)
    val perturbed = Fingerprints.runModes(TestModes.All,
      spark.read.parquet(s"$tmp/region.parquet"),
      TableSpec("region", Seq("r_regionkey")), cfgV)
    TestModes.All.foreach { m =>
      assert(viaJdbc(m) != perturbed(m), s"mode $m failed to catch the dropped row")
    }
    // and the untouched parquet fixture agrees with Derby mode-for-mode
    val pristine = Fingerprints.runModes(TestModes.All, full,
      TableSpec("region", Seq("r_regionkey")), cfgV)
    assert(pristine == viaJdbc)
  }

  test("pgMd5ModPredicates: N buckets, signed-mod twins paired (P7, query.go:193)") {
    val preds = JdbcTarget.pgMd5ModPredicates("k", 4)
    assert(preds.length == 4)
    assert(preds.head.endsWith("= 0") && !preds.head.contains("OR"))
    // bucket i pairs with its negative twin i-n: MOD over signed bigint
    assert(preds(1).contains("= 1") && preds(1).contains("= -3"))
    assert(preds(3).contains("= 3") && preds(3).contains("= -1"))
    assert(preds.forall(_.contains("md5(CAST(\"k\" AS text))")))
  }
}
