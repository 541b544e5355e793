package graft.core

/** The reference's PostgreSQL query-text generator, reproduced exactly —
  * `CastToText` (/root/reference/column.go:24-36) and the four mode queries
  * (/root/reference/query.go:122-283) including `formatQuery`'s whitespace
  * collapse (/root/reference/query.go:10-16). This is the contract surface
  * for running the verifier against a live PostgreSQL wire: PgLiveSpec
  * executes these byte-exact texts on a real server and asserts the returned
  * fingerprints equal the Spark engine's over the same rows, and PgSqlSpec
  * pins the generated text so dialect drift fails a golden test even when no
  * server is available.
  *
  * Scala's `String#sorted`/`sortBy` compares UTF-16 code units where Go's
  * `sort.Strings` compares UTF-8 bytes; the two orders agree on ASCII, and
  * every expression this object emits is ASCII as long as column names are
  * (non-ASCII identifiers would also break the reference's own quoting).
  */
object PgSql {

  /** One catalog column as the reference models it: physical name, the
    * information_schema `data_type` string, and PK membership.
    */
  case class PgColumn(name: String, dataType: String, isPk: Boolean = false)

  /** Wire dialect of a PostgreSQL-protocol target. The reference sends ONE
    * SQL text to every target — its integration matrix runs PostgreSQL
    * 10→18 and CockroachDB 22.2→25.3 through the same generators
    * (/root/reference/integration_test.go:94-121) — so a dialect here never
    * rewrites query text ([[modeQueries]] is dialect-independent by
    * construction, and PgSqlSpec pins that identity). What a dialect DOES
    * declare are the engine behaviors the shared text depends on, i.e. the
    * SURVEY.md §1 CRDB delta list as executable facts:
    *
    *  - `implicitRowidPk`: CRDB exposes an internal `rowid` PK on PK-less
    *    tables, so the reference's no-PK skip can never trigger there;
    *  - `isGeneratedNonValues`: catalog values meaning "not generated"
    *    (PG reports `''` or `'NEVER'`; CRDB always `'NEVER'` — both pass
    *    the shared `is_generated != 'ALWAYS'` predicate);
    *  - `minMajorForParity` / [[WireDialect.requireSupported]]: CRDB older
    *    than v22 dropped trailing zeros from `numeric` text (`1.25` vs
    *    `1.250`) and would silently hash-mismatch — the one delta that
    *    can't be papered over, so it fails loudly at config time.
    */
  sealed trait WireDialect {
    def name: String
    def implicitRowidPk: Boolean
    def isGeneratedNonValues: Set[String]
    def minMajorForParity: Int
    /** Parity floor check — called with the server's major version. */
    final def requireSupported(major: Int): Unit =
      require(major >= minMajorForParity,
        s"$name $major is below the fingerprint-parity floor " +
          s"$minMajorForParity: " + parityFloorReason)
    protected def parityFloorReason: String
  }

  case object PostgresDialect extends WireDialect {
    val name = "PostgreSQL"
    val implicitRowidPk = false
    val isGeneratedNonValues = Set("", "NEVER")
    val minMajorForParity = 10
    protected val parityFloorReason =
      "the reference's support floor (README.md)"
  }

  case object CockroachDialect extends WireDialect {
    val name = "CockroachDB"
    val implicitRowidPk = true
    val isGeneratedNonValues = Set("NEVER")
    val minMajorForParity = 22
    protected val parityFloorReason =
      "numeric text dropped trailing zeros before v22 (1.25 vs 1.250) " +
        "and silently hash-mismatches identical data"
  }

  /** The four mode-query texts for one table under a dialect — returned as
    * (full, sparse, bookend, rowcount). Dialect-INDEPENDENT by construction:
    * the reference ships the same SQL to PG and CRDB, and the CRDB pin
    * section of PgSqlSpec asserts the two dialects' texts are byte-equal,
    * so a future dialect branch in any generator breaks a golden test
    * instead of silently forking the contract surface.
    */
  def modeQueries(dialect: WireDialect, schemaName: String, tableName: String,
                  cols: Seq[PgColumn], sparseMod: Int, bookendLimit: Int,
                  precision: String = "milliseconds",
                  hashPrimaryKeys: Boolean = false): (String, String, String, String) = {
    val _ = dialect // declared facts only; text never branches (see scaladoc)
    (fullHashQuery(schemaName, tableName, cols, precision, hashPrimaryKeys),
      sparseHashQuery(schemaName, tableName, cols, sparseMod, precision, hashPrimaryKeys),
      bookendHashQuery(schemaName, tableName, cols, bookendLimit, precision, hashPrimaryKeys),
      rowCountQuery(schemaName, tableName))
  }

  /** `CastToText` — /root/reference/column.go:24-36, byte-for-byte. */
  def castToText(c: PgColumn, precision: String): String =
    c.dataType.toLowerCase match {
      case "timestamp with time zone" =>
        s"""(extract(epoch from date_trunc('$precision', "${c.name}"))::DECIMAL * 1000000)::BIGINT::TEXT"""
      case "json" => s"""length("${c.name}"::JSONB::TEXT)::TEXT"""
      case "jsonb" => s"""length("${c.name}"::TEXT)::TEXT"""
      case _ => s""""${c.name}"::TEXT"""
    }

  /** `formatQuery` — collapse all whitespace runs to one space and trim. */
  def formatQuery(q: String): String = q.replaceAll("\\s+", " ").trim

  private def sortedCasts(cols: Seq[PgColumn], precision: String): (Seq[String], Seq[String]) = {
    val casts = cols.map(castToText(_, precision)).sorted
    val pkCasts = cols.filter(_.isPk).map(castToText(_, precision)).sorted
    (casts, pkCasts)
  }

  private def pkConcat(pkCasts: Seq[String], hashPrimaryKeys: Boolean): String = {
    val c = s"CONCAT(${pkCasts.mkString(", ")})"
    if (hashPrimaryKeys) s"MD5($c)" else c
  }

  /** `buildFullHashQuery` — /root/reference/query.go:122-158. */
  def fullHashQuery(schemaName: String, tableName: String, cols: Seq[PgColumn],
                    precision: String = "milliseconds",
                    hashPrimaryKeys: Boolean = false): String = {
    val (casts, pkCasts) = sortedCasts(cols, precision)
    formatQuery(s"""
      SELECT md5(string_agg(hash, ''))
      FROM (
        SELECT MD5(CONCAT(${casts.mkString(", ")})) AS hash
        FROM "$schemaName"."$tableName"
        ORDER BY ${pkConcat(pkCasts, hashPrimaryKeys)}
      ) as eachhash
      """)
  }

  /** `buildSparseHashQuery` — /root/reference/query.go:160-227. The WHERE
    * term per PK column is the P7 signed-64 md5-mod bucket predicate
    * (query.go:193) that [[JdbcTarget.pgMd5ModPredicates]] reuses as a scan
    * partitioner; note the reference semi-joins each PK column independently
    * against the composite-concat bucket (warts replicated — see SURVEY.md
    * J2).
    */
  def sparseHashQuery(schemaName: String, tableName: String, cols: Seq[PgColumn],
                      sparseMod: Int, precision: String = "milliseconds",
                      hashPrimaryKeys: Boolean = false): String = {
    val (casts, pkCasts) = sortedCasts(cols, precision)
    val pkNames = cols.filter(_.isPk).map(_.name).sorted
    val pkCastsJoined = pkCasts.mkString(", ")
    val whens = pkNames.map { pk =>
      s""" $pk in (
        SELECT $pk
        FROM "$schemaName"."$tableName"
        WHERE ('x' || substr(md5(CONCAT($pkCastsJoined)),1,16))::bit(64)::bigint % $sparseMod = 0
      )"""
    }
    formatQuery(s"""
      SELECT md5(string_agg(hash, ''))
      FROM (
        SELECT MD5(CONCAT(${casts.mkString(", ")})) AS hash
        FROM "$schemaName"."$tableName"
        WHERE ${whens.mkString(" AND ")}
        ORDER BY ${pkConcat(pkCasts, hashPrimaryKeys)}
      ) AS eachrow
      """)
  }

  /** `buildBookendHashQuery` — /root/reference/query.go:230-277. */
  def bookendHashQuery(schemaName: String, tableName: String, cols: Seq[PgColumn],
                       limit: Int, precision: String = "milliseconds",
                       hashPrimaryKeys: Boolean = false): String = {
    val (casts, pkCasts) = sortedCasts(cols, precision)
    val all = casts.mkString(", ")
    val pk = pkConcat(pkCasts, hashPrimaryKeys)
    formatQuery(s"""
      SELECT md5(CONCAT(starthash::TEXT, endhash::TEXT))
      FROM (
        SELECT md5(string_agg(hash, ''))
        FROM (
          SELECT MD5(CONCAT($all)) AS hash
          FROM "$schemaName"."$tableName"
          ORDER BY $pk ASC
          LIMIT $limit
        ) AS eachrow
      ) as starthash, (
        SELECT md5(string_agg(hash, ''))
        FROM (
          SELECT MD5(CONCAT($all)) AS hash
          FROM "$schemaName"."$tableName"
          ORDER BY $pk DESC
          LIMIT $limit
        ) AS eachrow
      ) as endhash
      """)
  }

  /** `buildRowCountQuery` — /root/reference/query.go:280-283. */
  def rowCountQuery(schemaName: String, tableName: String): String =
    formatQuery(s"""SELECT count(*)::TEXT FROM "$schemaName"."$tableName"""")

  /** `buildGetTablesQuery` — /root/reference/query.go:21-99: views always
    * excluded, include lists WIN over exclude lists (the `else if`), same
    * P4 semantics [[SchemaFilter]] applies to file targets.
    */
  def getTablesQuery(includeSchemas: Seq[String] = Nil, excludeSchemas: Seq[String] = Nil,
                     includeTables: Seq[String] = Nil, excludeTables: Seq[String] = Nil): String = {
    def inList(col: String, in: Seq[String], ex: Seq[String]): Seq[String] =
      if (in.nonEmpty) Seq(s"$col IN (${in.map(s => s"'$s'").mkString(", ")})")
      else if (ex.nonEmpty) Seq(s"$col NOT IN (${ex.map(s => s"'$s'").mkString(", ")})")
      else Nil
    val wheres = Seq("table_type != 'VIEW'") ++
      inList("table_schema", includeSchemas, excludeSchemas) ++
      inList("table_name", includeTables, excludeTables)
    formatQuery("SELECT table_schema, table_name FROM information_schema.tables" +
      s" WHERE ${wheres.mkString(" AND ")}")
  }

  /** `buildGetColumsQuery` — /root/reference/query.go:104-119: the two
    * LEFT OUTER catalog joins (J1) with the generated-column filter (P5)
    * pushed into the WHERE.
    */
  def getColumnsQuery(schemaName: String, tableName: String): String =
    formatQuery(s"""
      SELECT c.column_name, c.data_type, k.constraint_name, tc.constraint_type
      FROM information_schema.columns as c
        LEFT OUTER JOIN information_schema.key_column_usage as k ON (
          c.column_name = k.column_name AND
          c.table_name = k.table_name AND
          c.table_schema = k.table_schema
        )
        LEFT OUTER JOIN information_schema.table_constraints as tc ON (
          k.constraint_name = tc.constraint_name
        )
      WHERE c.table_name = '$tableName' AND c.table_schema = '$schemaName' AND c.is_generated != 'ALWAYS'
      """)
}
