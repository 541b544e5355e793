package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{JdbcTarget, PgSql}
import graft.core.PgSql.PgColumn

/** Golden pins for the PostgreSQL dialect text — the no-server complement of
  * PgLiveSpec: if the generated SQL drifts from the reference's
  * (/root/reference/query.go, column.go), these fail regardless of whether a
  * live PostgreSQL is available to notice the semantic change.
  */
class PgSqlSpec extends AnyFunSuite {

  private val cols = Seq(
    PgColumn("id", "bigint", isPk = true),
    PgColumn("ts", "timestamp with time zone"),
    PgColumn("doc", "json"),
    PgColumn("body", "jsonb"),
    PgColumn("name", "text"))

  test("CastToText rules match column.go:24-36 byte-for-byte") {
    assert(PgSql.castToText(PgColumn("c", "timestamp with time zone"), "milliseconds") ==
      """(extract(epoch from date_trunc('milliseconds', "c"))::DECIMAL * 1000000)::BIGINT::TEXT""")
    assert(PgSql.castToText(PgColumn("c", "json"), "milliseconds") ==
      """length("c"::JSONB::TEXT)::TEXT""")
    assert(PgSql.castToText(PgColumn("c", "jsonb"), "milliseconds") ==
      """length("c"::TEXT)::TEXT""")
    assert(PgSql.castToText(PgColumn("c", "uuid"), "milliseconds") == """"c"::TEXT""")
    // data_type casing from the catalog is normalized like the reference's
    // strings.ToLower (column.go:25)
    assert(PgSql.castToText(PgColumn("c", "TIMESTAMP WITH TIME ZONE"), "second") ==
      """(extract(epoch from date_trunc('second', "c"))::DECIMAL * 1000000)::BIGINT::TEXT""")
  }

  test("full-mode query text matches buildFullHashQuery's shape (query.go:122-158)") {
    val got = PgSql.fullHashQuery("public", "t", cols)
    // expression-string sort: '"' < '(' < 'l' puts default casts first, then
    // the timestamptz extract, then the json length proxies
    assert(got ==
      """SELECT md5(string_agg(hash, '')) FROM ( SELECT MD5(CONCAT("id"::TEXT, """ +
      """"name"::TEXT, (extract(epoch from date_trunc('milliseconds', "ts"))::DECIMAL * 1000000)::BIGINT::TEXT, """ +
      """length("body"::TEXT)::TEXT, length("doc"::JSONB::TEXT)::TEXT)) AS hash """ +
      """FROM "public"."t" ORDER BY CONCAT("id"::TEXT) ) as eachhash""")
    assert(PgSql.fullHashQuery("public", "t", cols, hashPrimaryKeys = true)
      .contains("""ORDER BY MD5(CONCAT("id"::TEXT))"""))
  }

  test("sparse WHERE term is the P7 bucket predicate (query.go:193)") {
    val got = PgSql.sparseHashQuery("public", "t", cols, sparseMod = 10)
    assert(got.contains(
      """WHERE id in ( SELECT id FROM "public"."t" """ +
      """WHERE ('x' || substr(md5(CONCAT("id"::TEXT)),1,16))::bit(64)::bigint % 10 = 0 )"""))
  }

  test("pgMd5ModPredicates reuses the P7 expression and partitions exhaustively") {
    val preds = JdbcTarget.pgMd5ModPredicates("id", 3)
    // same signed-64 reinterpret as the sparse predicate, bare-name quoting
    assert(preds.head ==
      """MOD(('x' || substr(md5(CAST("id" AS text)), 1, 16))::bit(64)::bigint, 3) = 0""")
    // SQL MOD over signed values: each non-zero bucket pairs its negative twin
    assert(preds(1).endsWith("= 1 OR MOD(('x' || substr(md5(CAST(\"id\" AS text)), 1, 16))::bit(64)::bigint, 3) = -2"))
    assert(preds.length == 3)
  }

  test("bookend and rowcount shapes (query.go:230-283)") {
    val b = PgSql.bookendHashQuery("public", "t", cols, limit = 7)
    assert(b.startsWith("SELECT md5(CONCAT(starthash::TEXT, endhash::TEXT)) FROM ("))
    assert(b.contains("ORDER BY CONCAT(\"id\"::TEXT) ASC LIMIT 7"))
    assert(b.contains("ORDER BY CONCAT(\"id\"::TEXT) DESC LIMIT 7"))
    assert(PgSql.rowCountQuery("public", "t") ==
      """SELECT count(*)::TEXT FROM "public"."t"""")
  }

  // --- CRDB dialect pins (server-free) --------------------------------------
  // The reference's headline is PG↔CRDB cross-engine verification over ONE
  // generated SQL text (integration_test.go:94-121 runs CockroachDB
  // 22.2→25.3 and PostgreSQL 10→18 through the same generators). No CRDB
  // server installs in this sandbox, so these pins make the SURVEY.md §1
  // delta list executable: the day a CRDB target exists it is a config
  // change (PsqlTarget(dialect = CockroachDialect)), and any future code
  // that forks the SQL text per dialect breaks a golden test here first.

  test("CRDB dialect: all four mode-query texts are byte-identical to PostgreSQL's") {
    val pg = PgSql.modeQueries(PgSql.PostgresDialect, "public", "t", cols,
      sparseMod = 10, bookendLimit = 7)
    val crdb = PgSql.modeQueries(PgSql.CockroachDialect, "public", "t", cols,
      sparseMod = 10, bookendLimit = 7)
    assert(pg == crdb, "the reference sends ONE text to both engines; a dialect fork is drift")
    // the same identity under the non-default knobs (tz precision, hashed PKs)
    assert(PgSql.modeQueries(PgSql.PostgresDialect, "public", "t", cols, 5, 3, "second", hashPrimaryKeys = true) ==
      PgSql.modeQueries(PgSql.CockroachDialect, "public", "t", cols, 5, 3, "second", hashPrimaryKeys = true))
    // the CRDB-sensitive cast chain (SURVEY §1 bit/varbit delta): the
    // 'x'||hex bit-literal reinterpretation both engines must evaluate
    // identically — pinned as text so a cast-chain change forces a re-pin
    assert(crdb._2.contains("""('x' || substr(md5(CONCAT("id"::TEXT)),1,16))::bit(64)::bigint % 10 = 0"""))
  }

  test("CRDB dialect: the SURVEY §1 discovery deltas are declared facts") {
    import PgSql.{CockroachDialect, PostgresDialect}
    // CRDB exposes an internal rowid PK on PK-less tables — the reference's
    // no-PK skip can never trigger there (verify.go:182-198 inherits this)
    assert(CockroachDialect.implicitRowidPk && !PostgresDialect.implicitRowidPk)
    // both engines' "not generated" catalog values pass the shared
    // is_generated != 'ALWAYS' predicate (query.go:116) — the P5 filter
    // needs no dialect branch
    for (d <- Seq(PostgresDialect, CockroachDialect); v <- d.isGeneratedNonValues)
      assert(v != "ALWAYS", s"${d.name}: $v")
    assert(CockroachDialect.isGeneratedNonValues == Set("NEVER"))
  }

  test("CRDB dialect: pre-v22 numeric trailing-zero delta fails loudly at config time") {
    // CRDB < 22 printed numeric without trailing zeros (1.25 vs 1.250) —
    // identical data would silently hash-mismatch, so the parity floor
    // rejects the config instead
    val ex = intercept[IllegalArgumentException] {
      PgSql.CockroachDialect.requireSupported(21)
    }
    assert(ex.getMessage.contains("trailing zeros"), ex.getMessage)
    PgSql.CockroachDialect.requireSupported(22) // the matrix's oldest CRDB
    PgSql.PostgresDialect.requireSupported(10)  // the reference's PG floor
    assert(intercept[IllegalArgumentException] {
      PgSql.PostgresDialect.requireSupported(9)
    }.getMessage.contains("parity floor"))
  }
}
