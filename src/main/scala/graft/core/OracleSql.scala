package graft.core

import org.apache.spark.sql.types._

import graft.canon.Canon

/** DuckDB-dialect twins of the fingerprint-mode plans, assembled from the same
  * canonicalization builders ([[Canon.duckSql]]) so Spark and oracle can never
  * drift independently (SURVEY.md §7 risk 3).
  *
  * Fixture schemas are declared statically because `SparkEntry.oracleSql` must
  * be computable without a SparkSession; `FixtureSchemaSpec` asserts they
  * match the actual parquet files.
  */
object OracleSql {

  /** Static copy of the driver fixture schemas (TESTDATA.md). */
  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
  )

  /** `(SELECT <k>, <h> FROM table [WHERE ...])` — the (sort-key, row-hash)
    * projection, twin of [[Fingerprints.hashedRows]].
    */
  def khSub(table: String, spec: TableSpec, cfg: VerifyConfig, where: String = "",
            source: Option[String] = None): String = {
    val schema = schemas(table)
    val cols = schema.fields.map(_.name).filter(spec.validColumn).toSeq
    val k = Canon.duckPkSortKey(schema, spec.pks, cfg.hashPrimaryKeys, cfg.tsPrecision)
    val h = Canon.duckRowHash(schema, cols, cfg.tsPrecision, spec.jsonColumns)
    s"(SELECT $k AS k, $h AS h FROM ${source.getOrElse(table)} AS src$where)"
  }

  private def orderedAgg(sub: String): String =
    s"(SELECT CASE WHEN count(*) = 0 THEN '${Fingerprints.NoRows}' " +
      s"ELSE md5(string_agg(h, '' ORDER BY k, h)) END FROM $sub AS kh)"

  /** Twin of [[Fingerprints.fullDigest]]. `where` (including the leading
    * " WHERE ") lets report oracles express a perturbed target.
    */
  def full(table: String, spec: TableSpec, cfg: VerifyConfig, where: String = "",
           source: Option[String] = None): String =
    orderedAgg(khSub(table, spec, cfg, where, source))

  /** Signed 64-bit reinterpretation of the first 16 MD5 hex chars — PG's
    * `('x'||substr(md5(k),1,16))::bit(64)::bigint` in DuckDB HUGEINT
    * arithmetic; twin of [[graft.functions.HexToSignedLong]].
    */
  def signedMd564(kSql: String): String = {
    val u = s"CAST('0x' || substr(md5($kSql), 1, 16) AS UBIGINT)"
    s"(CAST($u AS HUGEINT) - CASE WHEN $u >= CAST('9223372036854775808' AS HUGEINT) " +
      s"THEN CAST('18446744073709551616' AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)"
  }

  /** Twin of [[Fingerprints.sparseDigest]]: direct P7 filter for single-column
    * PKs; the reference's per-PK-column `IN` subquery form for composite PKs
    * (/root/reference/query.go:186-205 — selects a superset of the jointly
    * sampled rows, replicated for parity).
    */
  def sparse(table: String, spec: TableSpec, cfg: VerifyConfig,
             source: Option[String] = None): String = {
    val schema = schemas(table)
    val pkConcat = Canon.duckPkSortKey(schema, spec.pks, hashPrimaryKeys = false, cfg.tsPrecision)
    val p7 = s"${signedMd564(pkConcat)} % ${cfg.sparseMod} = 0"
    val where =
      if (spec.pks.lengthCompare(1) <= 0) s" WHERE $p7"
      else spec.pks.map(pk =>
        s""""$pk" IN (SELECT "$pk" FROM ${source.getOrElse(table)} AS sub WHERE $p7)""")
        .mkString(" WHERE ", " AND ", "")
    orderedAgg(khSub(table, spec, cfg, where, source))
  }

  /** Twin of [[Fingerprints.bookendDigest]]. */
  def bookend(table: String, spec: TableSpec, cfg: VerifyConfig,
              source: Option[String] = None): String = {
    val kh = khSub(table, spec, cfg, "", source)
    val n = cfg.bookendLimit
    val start = s"(SELECT coalesce(md5(string_agg(h, '' ORDER BY k ASC, h ASC)), '') " +
      s"FROM (SELECT k, h FROM $kh AS kh1 ORDER BY k ASC, h ASC LIMIT $n) AS s)"
    val end = s"(SELECT coalesce(md5(string_agg(h, '' ORDER BY k DESC, h DESC)), '') " +
      s"FROM (SELECT k, h FROM $kh AS kh2 ORDER BY k DESC, h DESC LIMIT $n) AS e)"
    // the reference's outer combine casts table-alias ROWS to text, which PG
    // renders parenthesized — '(<md5>)(<md5>)', '()' for an empty side (see
    // Fingerprints.bookendFromKh; PgLiveSpec pins it on a live wire)
    s"(SELECT md5(concat('(', $start, ')(', $end, ')')))"
  }

  /** Twin of [[Fingerprints.rowCountDigest]]. */
  def rowCount(table: String, where: String = "", source: Option[String] = None): String =
    s"(SELECT CAST(count(*) AS VARCHAR) FROM ${source.getOrElse(table)} AS src$where)"

  /** Twin of [[Fingerprints.unorderedDigest]]: exact HUGEINT sum of the
    * signed-64 of each row hash.
    */
  def unordered(table: String, spec: TableSpec, cfg: VerifyConfig,
                source: Option[String] = None): String = {
    val kh = khSub(table, spec, cfg, "", source)
    s"(SELECT CASE WHEN count(*) = 0 THEN '${Fingerprints.NoRows}' " +
      s"ELSE CAST(sum(${signedMd564("h")}) AS VARCHAR) END FROM $kh AS kh)"
  }

  /** Twin of [[graft.functions.GraftFunctions.md5Bucket]] — THE bucket-id
    * formula; every oracle that buckets rows must use this one string so it
    * cannot drift from the Spark expression.
    */
  def duckMd5Bucket(kSql: String, buckets: Int): String =
    s"CAST('0x' || substr(md5($kSql), 1, 4) AS UBIGINT) % $buckets"

  /** Per-bucket digest vector subquery — twin of
    * [[Fingerprints.merkleBucketDigests]]; shared by the one-shot digest and
    * the incremental bucket diff.
    */
  def merkleBucketsSub(table: String, spec: TableSpec, cfg: VerifyConfig, buckets: Int,
                       source: Option[String] = None): String = {
    val kh = khSub(table, spec, cfg, "", source)
    val bucketed = s"(SELECT ${duckMd5Bucket("k", buckets)} AS bucket, " +
      s"k, h FROM $kh AS kh)"
    s"(SELECT bucket, md5(string_agg(h, '' ORDER BY k, h)) AS bh " +
      s"FROM $bucketed AS b GROUP BY bucket)"
  }

  /** Twin of [[Fingerprints.merkleDigest]]. */
  def merkle(table: String, spec: TableSpec, cfg: VerifyConfig, buckets: Int): String = {
    val perBucket = merkleBucketsSub(table, spec, cfg, buckets)
    s"(SELECT CASE WHEN count(*) = 0 THEN '${Fingerprints.NoRows}' " +
      s"ELSE md5(string_agg(bh, '' ORDER BY bucket)) END FROM $perBucket AS m)"
  }

  /** Twin of [[Fingerprints.merkleChangedBuckets]] over two sources of the
    * same table shape.
    */
  def merkleChanged(table: String, spec: TableSpec, cfg: VerifyConfig, buckets: Int,
                    prevSource: Option[String], currSource: Option[String]): String =
    s"""WITH prev AS (SELECT * FROM ${merkleBucketsSub(table, spec, cfg, buckets, prevSource)} AS p),
         curr AS (SELECT * FROM ${merkleBucketsSub(table, spec, cfg, buckets, currSource)} AS c)
       SELECT CAST(coalesce(prev.bucket, curr.bucket) AS BIGINT) AS bucket,
              coalesce(prev.bh, '') AS prev_hash,
              coalesce(curr.bh, '') AS curr_hash,
              CASE WHEN prev.bh IS NULL THEN 'appeared'
                   WHEN curr.bh IS NULL THEN 'vanished'
                   ELSE 'changed' END AS status
       FROM prev FULL OUTER JOIN curr ON prev.bucket = curr.bucket
       WHERE prev.bh IS DISTINCT FROM curr.bh
       ORDER BY bucket"""

  /** Mode dispatch, twin of [[Fingerprints.runMode]]. */
  /** Twin of [[Fingerprints.statsDigest]]: per-column (count, canonical min,
    * canonical max) with '|' separators in hash column order, MD5'd; raw
    * (non-coalesced) canonical forms keep NULLs out of MIN/MAX on both sides.
    */
  def stats(table: String, spec: TableSpec, cfg: VerifyConfig,
            source: Option[String] = None): String = {
    val schema = schemas(table)
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = Canon.hashColumnOrder(schema.fields.map(_.name).filter(spec.validColumn).toSeq)
    val parts = cols.flatMap { name =>
      val raw =
        if (spec.jsonColumns.exists(_.equalsIgnoreCase(name))) Canon.duckJsonSqlRaw(name)
        else Canon.duckSqlRaw(name, byName(name), cfg.tsPrecision)
      Seq(s"'|${name.toLowerCase}|'", s"""CAST(count("$name") AS VARCHAR)""",
        "'|'", s"coalesce(min($raw), '')", "'|'", s"coalesce(max($raw), '')")
    }
    s"(SELECT CASE WHEN count(*) = 0 THEN '${Fingerprints.NoRows}' ELSE " +
      s"md5(concat(CAST(count(*) AS VARCHAR), ${parts.mkString(", ")})) END " +
      s"FROM ${source.getOrElse(table)} AS src)"
  }

  def forMode(mode: String, table: String, spec: TableSpec, cfg: VerifyConfig,
              source: Option[String] = None): String = mode match {
    case TestModes.Full     => full(table, spec, cfg, "", source)
    case TestModes.Sparse   => sparse(table, spec, cfg, source)
    case TestModes.Bookend  => bookend(table, spec, cfg, source)
    case TestModes.RowCount => rowCount(table, "", source)
    case TestModes.Stats    => stats(table, spec, cfg, source)
    case other => throw new IllegalArgumentException(s"unknown test mode $other")
  }
}
