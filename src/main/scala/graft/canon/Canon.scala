package graft.canon

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Engine-portable canonicalization of column values to TEXT, the analogue of
  * the reference's `CastToText` (/root/reference/column.go:24-36) re-expressed
  * as Spark `Column` expressions.
  *
  * The reference canonicalizes every column to a text form that is identical
  * across heterogeneous engines (PostgreSQL vs CockroachDB). Our pair of
  * engines is Spark vs the DuckDB oracle, so each rule below is chosen so that
  * the Spark expression and its ANSI-SQL twin (see [[Canon.duckSql]]) produce
  * byte-identical strings on both engines:
  *
  *   - boolean   -> "true"/"false" (both engines' native cast)
  *   - integers  -> decimal digits (native cast)
  *   - double    -> shortest round-trip decimal form. Both Spark (Java
  *     Double.toString) and DuckDB (Ryu) emit the shortest uniquely-identifying
  *     decimal; the forms agree for |x| in [1e-3, 1e7) which covers every
  *     numeric column in the fixtures (money-like, 2dp). Values outside that
  *     window would diverge ("1.0E7" vs "10000000.0") — callers canonicalize
  *     wider-domain doubles via [[canonDoubleScaled]] instead.
  *   - timestamp -> epoch microseconds truncated to the configured precision,
  *     rendered as decimal digits (the reference's
  *     `extract(epoch from date_trunc(...))::DECIMAL*1e6::BIGINT::TEXT`,
  *     /root/reference/column.go:28). Truncation is integer floor-division on
  *     the micros value because Spark's `date_trunc` has no sub-second units.
  *   - date      -> "yyyy-MM-dd" (native cast, both engines)
  *   - binary    -> lowercase hex, the analogue of PG's `\x` bytea form
  *   - array     -> "{e1,e2}" PG-literal-ish form over canonicalized elements
  *   - string    -> identity
  *
  * NULL handling: the reference hashes rows with PG `CONCAT`, which treats
  * NULL as '' (/root/reference/query.go:150). Spark's `concat` instead returns
  * NULL if any input is NULL, so every canonical expression is wrapped in
  * `coalesce(_, '')` — see SURVEY.md P3.
  */
object Canon {

  /** Microseconds per unit for the FIXED-WIDTH truncation precisions of
    * PG's `date_trunc` fields, which is what the reference feeds
    * `--tz-precision` into (/root/reference/column.go:28, option
    * /root/reference/config.go:196-203). Month and coarser are
    * variable-width — those truncate via calendar `date_trunc` instead
    * (see [[calendarUnits]]). "seconds" is kept as a legacy synonym of
    * PG's "second".
    */
  val precisionMicros: Map[String, Long] = Map(
    "microseconds" -> 1L,
    "milliseconds" -> 1000L,
    "second"       -> 1000000L,
    "seconds"      -> 1000000L,
    "minute"       -> 60L * 1000000L,
    "hour"         -> 3600L * 1000000L,
    "day"          -> 86400L * 1000000L,
    "week"         -> 7L * 86400L * 1000000L
  )

  /** Variable-width `date_trunc` fields: these CANNOT fold as epoch-micros
    * arithmetic (months differ in length), so they truncate via calendar
    * `date_trunc` in every engine — PG's date_trunc (the reference's path,
    * /root/reference/column.go:28), Spark's date_trunc, and DuckDB's
    * date_trunc all truncate a UTC-session timestamptz to the same instant
    * for these units, so the canonical epoch-micros rendering still agrees
    * byte-for-byte. (`decade`/`century`/`millennium` stay unsupported —
    * pgverify users don't fingerprint at those widths.)
    */
  val calendarUnits: Set[String] = Set("month", "quarter", "year")

  /** Every accepted `--tz-precision` value (fixed-width + calendar). */
  def supportedPrecisions: Seq[String] =
    (precisionMicros.keySet ++ calendarUnits).toSeq.sorted

  /** Epoch-alignment offset: PG truncates weeks to Monday, but the epoch
    * (1970-01-01) was a Thursday, so week-folding anchors at the preceding
    * Monday, 1969-12-29T00:00Z. Every other supported unit is epoch-aligned.
    */
  private val weekAnchorMicros: Long = -259200000000L
  def precisionOffsetMicros(precision: String): Long =
    if (precision == "week") weekAnchorMicros else 0L

  /** Unit lookup with a clean failure mode: an unknown unit is a user error
    * (the reference validates its enum-like options the same way,
    * /root/reference/config.go:101-114), not a NoSuchElementException.
    */
  def unitMicros(precision: String): Long =
    precisionMicros.getOrElse(precision, throw new IllegalArgumentException(
      s"unknown timestamp precision '$precision' " +
        s"(supported: ${supportedPrecisions.mkString(", ")})"))

  /** Canonical TEXT form of one column (no null-coalescing; see [[canonCol]]). */
  def canonText(c: Column, dt: DataType, tsPrecision: String = "milliseconds"): Column = dt match {
    case BooleanType => c.cast(StringType)
    case ByteType | ShortType | IntegerType | LongType => c.cast(StringType)
    case FloatType => c.cast(DoubleType).cast(StringType)
    case DoubleType => c.cast(StringType)
    case _: DecimalType => c.cast(StringType)
    case TimestampType if calendarUnits(tsPrecision) =>
      // variable-width units truncate on the calendar (session TZ is pinned
      // UTC), then render as epoch micros like every other precision
      unix_micros(date_trunc(tsPrecision, c)).cast(StringType)
    case TimestampType =>
      val unit = unitMicros(tsPrecision)
      val off = precisionOffsetMicros(tsPrecision)
      val micros = unix_micros(c)
      // floor-fold onto the unit grid anchored at `off` (non-zero only for
      // week, whose PG boundary is Monday, not the epoch)
      (if (unit == 1L) micros
       else micros - pmod(micros - lit(off), lit(unit))).cast(StringType)
    // naive timestamps take the reference's DEFAULT rule — plain ::TEXT
    // ("yyyy-MM-dd HH:mm:ss[.f]"), NOT the epoch fold: only "timestamp with
    // time zone" is special-cased (/root/reference/column.go:26-28), because
    // the naive rendering is already session-TZ-independent
    case TimestampNTZType => c.cast(StringType)
    case DateType => c.cast(StringType)
    // PG's bytea::TEXT form exactly — `\x` prefix then lowercase hex
    // (/root/reference/column.go:34 default-cases bytea; PgLiveSpec pins the
    // rendering against a live wire)
    case BinaryType => concat(lit("\\x"), lower(hex(c)))
    case ArrayType(et, _) =>
      concat(lit("{"), array_join(transform(c, e => canonText(e, et, tsPrecision)), ","), lit("}"))
    case StringType => c
    case other =>
      throw new IllegalArgumentException(s"no canonical text form for $other")
  }

  /** Canonical form with PG-CONCAT null semantics (NULL -> ''). */
  def canonCol(c: Column, dt: DataType, tsPrecision: String = "milliseconds"): Column =
    coalesce(canonText(c, dt, tsPrecision), lit(""))

  /** JSON length proxy — the reference's json/jsonb rule
    * (/root/reference/column.go:30-32, rationale README.md:74-76: engines
    * disagree on key order/whitespace, so only the text length is compared).
    * Our JSON columns are plain strings, so the proxy is `length(c)::TEXT`.
    */
  def canonJson(c: Column): Column = length(c).cast(StringType)
  def duckJsonSqlRaw(name: String): String = s"""CAST(length("$name") AS VARCHAR)"""
  def duckJsonSql(name: String): String = s"coalesce(${duckJsonSqlRaw(name)}, '')"

  /** Column-name ordering for hashing: lexicographic on the LOWERCASED name
    * (exact name as tie-break). Case-insensitive because heterogeneous targets
    * render the same logical column in different physical case (Derby
    * uppercases unquoted identifiers, PG lowercases them) — an exact-case sort
    * would order e.g. `AB_C`/`ABD` differently from `ab_c`/`abd` ('_' sorts
    * between the cases) and silently produce different row hashes for
    * identical data. Must stay in lock-step with the DuckDB twins below.
    */
  def hashColumnOrder(cols: Seq[String]): Seq[String] =
    cols.sortBy(n => (n.toLowerCase, n))

  /** The reference's hash-order key for one column: its `CastToText`
    * expression string, synthesized over the LOWERCASED physical name (the
    * same heterogeneous-catalog normalization as [[hashColumnOrder]]). The
    * reference sorts the canonicalized EXPRESSION strings, not the names
    * (`sort.Strings(columnsWithCasting)`, /root/reference/query.go:136-137),
    * which makes a specially-cast column sort AFTER every default-cast
    * column regardless of its name — '"' (0x22) < '(' (0x28) < 'l' (0x6c)
    * puts quoted defaults first, then timestamptz extracts, then json
    * length proxies. On a table like the `events` fixture (`ts` mid-schema,
    * `props` json) the name sort and the expression sort genuinely diverge,
    * so the row-hash surfaces use THIS order to match real pgverify
    * fingerprints byte-for-byte (PgLiveSpec proves it on a live wire).
    */
  def referenceSortKey(name: String, dt: DataType, tsPrecision: String,
                       isJson: Boolean): String = {
    val n = name.toLowerCase
    if (isJson) s"""length("$n"::JSONB::TEXT)::TEXT"""
    else dt match {
      case TimestampType =>
        s"""(extract(epoch from date_trunc('$tsPrecision', "$n"))::DECIMAL * 1000000)::BIGINT::TEXT"""
      case _ => s""""$n"::TEXT"""
    }
  }

  /** Hash-column order for the row-hash surfaces: the reference's
    * expression-string sort ([[referenceSortKey]]), with the lowercased and
    * exact names as tie-breaks. Name-only contexts that never feed a
    * reference-comparable hash (stats mode, diff output column order) keep
    * the plain [[hashColumnOrder]].
    */
  def hashColumnOrderTyped(schema: StructType, cols: Seq[String],
                           tsPrecision: String = "milliseconds",
                           jsonCols: Set[String] = Set.empty): Seq[String] = {
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    cols.sortBy { n =>
      val key = referenceSortKey(n, byName(n), tsPrecision,
        jsonCols.exists(_.equalsIgnoreCase(n)))
      (key, n.toLowerCase, n)
    }
  }

  /** Canonicalized columns of `schema` restricted to `cols`, sorted
    * per [[hashColumnOrder]] so DDL column order never affects the
    * row hash — the analogue of the reference sorting canonicalized expression
    * strings before CONCAT (/root/reference/query.go:136-137). Columns named
    * in `jsonCols` take the JSON length proxy (P1 json/jsonb rule; matched
    * case-insensitively for the same heterogeneous-target reason).
    */
  def canonCols(schema: StructType, cols: Seq[String], tsPrecision: String = "milliseconds",
                jsonCols: Set[String] = Set.empty): Seq[Column] = {
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    hashColumnOrderTyped(schema, cols, tsPrecision, jsonCols).map { name =>
      if (jsonCols.exists(_.equalsIgnoreCase(name))) coalesce(canonJson(col(name)), lit(""))
      else canonCol(col(name), byName(name), tsPrecision)
    }
  }

  /** MD5 row hash: `md5(CONCAT(canon(c1),...))`, no separator, NULL as '' —
    * the reference's row hash (/root/reference/query.go:150). The
    * no-separator concat is deliberately replicated, ambiguity and all
    * (SURVEY.md §7 risk 5): "ab"+"c" and "a"+"bc" collide by design parity.
    */
  def rowHash(schema: StructType, cols: Seq[String], tsPrecision: String = "milliseconds",
              jsonCols: Set[String] = Set.empty): Column =
    md5(concat(canonCols(schema, cols, tsPrecision, jsonCols): _*))

  /** Sort key for PK-ordered hashing: concat of canonicalized PK columns in
    * lexicographic column-name order (/root/reference/query.go:141-145), or
    * its MD5 when `hashPrimaryKeys` is set — the collation-neutralizing
    * `--hash-primary-keys` option (/root/reference/config.go:53-57).
    * Spark string comparison is binary over UTF-8, which is exactly the
    * engine-neutral ordering the reference is after; DuckDB's default
    * collation is also binary, so ORDER BY on this key agrees byte-for-byte.
    */
  def pkSortKey(schema: StructType, pks: Seq[String], hashPrimaryKeys: Boolean,
                tsPrecision: String = "milliseconds"): Column = {
    val k = concat(canonCols(schema, pks, tsPrecision): _*)
    if (hashPrimaryKeys) md5(k) else k
  }

  // ---------------------------------------------------------------------------
  // ANSI-SQL (DuckDB) twins of the expressions above, used to assemble oracle
  // SQL in lock-step with the Spark plan (SURVEY.md §7 risk 3).
  // ---------------------------------------------------------------------------

  /** DuckDB SQL text computing the same canonical string as [[canonCol]]. */
  def duckSql(name: String, dt: DataType, tsPrecision: String = "milliseconds"): String =
    s"coalesce(${duckSqlRaw(name, dt, tsPrecision)}, '')"

  /** Twin of [[canonText]] (NULL propagates — no coalesce), for contexts like
    * MIN/MAX aggregates where NULLs must stay ignorable rather than become ''.
    */
  def duckSqlRaw(name: String, dt: DataType, tsPrecision: String = "milliseconds"): String = {
    val c = s""""$name""""
    val inner = dt match {
      case BooleanType => s"CAST($c AS VARCHAR)"
      case ByteType | ShortType | IntegerType | LongType => s"CAST($c AS VARCHAR)"
      case FloatType => s"CAST(CAST($c AS DOUBLE) AS VARCHAR)"
      case DoubleType => s"CAST($c AS VARCHAR)"
      case _: DecimalType => s"CAST($c AS VARCHAR)"
      case TimestampType if calendarUnits(tsPrecision) =>
        s"CAST(epoch_us(date_trunc('$tsPrecision', $c)) AS VARCHAR)"
      case TimestampType =>
        val unit = unitMicros(tsPrecision)
        val off = precisionOffsetMicros(tsPrecision)
        // floor-mod, not %: DuckDB % truncates toward zero, which would
        // diverge from Spark's pmod for pre-1970 sub-unit timestamps
        if (unit == 1L) s"CAST(epoch_us($c) AS VARCHAR)"
        else s"CAST(epoch_us($c) - (((epoch_us($c) - ($off)) % $unit + $unit) % $unit) AS VARCHAR)"
      // naive timestamps: the reference's default ::TEXT rule (see canonText)
      case TimestampNTZType => s"CAST($c AS VARCHAR)"
      case DateType => s"CAST($c AS VARCHAR)"
      // DuckDB standard strings do no backslash processing: '\x' is the
      // two characters backslash-x, PG's bytea::TEXT prefix. NULL guard as
      // for arrays: DuckDB concat SKIPS null args, so without it the bare
      // prefix would leak out of a NULL bytea instead of NULL
      case BinaryType => s"CASE WHEN $c IS NULL THEN NULL ELSE concat('\\x', lower(hex($c))) END"
      case ArrayType(et, _) =>
        val elem = duckElemSql("e", et, tsPrecision)
        // NULL guard: DuckDB concat skips NULL args (a NULL array would
        // yield '{}'), Spark concat nulls out -> ''; make NULL propagate
        s"CASE WHEN $c IS NULL THEN NULL ELSE " +
          s"concat('{', array_to_string(list_transform($c, e -> $elem), ','), '}') END"
      case StringType => c
      case other => throw new IllegalArgumentException(s"no oracle canonical form for $other")
    }
    inner
  }

  /** Element-level twin of [[duckSql]] for array lambdas (bare identifier,
    * not a quoted column reference).
    */
  private def duckElemSql(v: String, dt: DataType, tsPrecision: String): String = dt match {
    case StringType => v
    case BooleanType | ByteType | ShortType | IntegerType | LongType => s"CAST($v AS VARCHAR)"
    case FloatType => s"CAST(CAST($v AS DOUBLE) AS VARCHAR)"
    case DoubleType | _: DecimalType | DateType => s"CAST($v AS VARCHAR)"
    case other => throw new IllegalArgumentException(s"no oracle canonical array-element form for $other")
  }

  /** DuckDB SQL for [[rowHash]]. */
  def duckRowHash(schema: StructType, cols: Seq[String], tsPrecision: String = "milliseconds",
                  jsonCols: Set[String] = Set.empty): String = {
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    val parts = hashColumnOrderTyped(schema, cols, tsPrecision, jsonCols).map(n =>
      if (jsonCols.exists(_.equalsIgnoreCase(n))) duckJsonSql(n) else duckSql(n, byName(n), tsPrecision))
    s"md5(concat(${parts.mkString(", ")}))"
  }

  /** DuckDB SQL for [[pkSortKey]]. */
  def duckPkSortKey(schema: StructType, pks: Seq[String], hashPrimaryKeys: Boolean,
                    tsPrecision: String = "milliseconds"): String = {
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    val parts = hashColumnOrderTyped(schema, pks, tsPrecision)
      .map(n => duckSql(n, byName(n), tsPrecision))
    val k = s"concat(${parts.mkString(", ")})"
    if (hashPrimaryKeys) s"md5($k)" else k
  }
}
