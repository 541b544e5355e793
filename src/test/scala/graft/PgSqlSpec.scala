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
}
