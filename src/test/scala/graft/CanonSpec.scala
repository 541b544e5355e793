package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.canon.Canon
import graft.functions.GraftFunctions

class CanonSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(df: org.apache.spark.sql.DataFrame, name: String): Seq[String] = {
    val dt = df.schema.fields.find(_.name == name).get.dataType
    df.select(Canon.canonCol(col(name), dt)).as[String].collect().toSeq
  }

  test("booleans canonicalize to true/false") {
    val df = Seq(Some(true), Some(false), None).toDF("b")
    assert(canonOf(df, "b") == Seq("true", "false", ""))
  }

  test("integers and longs canonicalize to plain digits") {
    assert(canonOf(Seq(42, -7).toDF("i"), "i") == Seq("42", "-7"))
    assert(canonOf(Seq(1234567890123L).toDF("l"), "l") == Seq("1234567890123"))
  }

  test("doubles canonicalize to shortest round-trip form") {
    val df = Seq(123.45, -0.5, 100.0).toDF("d")
    assert(canonOf(df, "d") == Seq("123.45", "-0.5", "100.0"))
  }

  test("timestamps canonicalize to epoch micros truncated to milliseconds") {
    val ts = Timestamp.valueOf("2020-01-01 01:02:03.456789")
    val df = Seq(ts).toDF("t")
    // 2020-01-01T01:02:03.456789Z = 1577840523456789 us -> ms-truncated
    assert(canonOf(df, "t") == Seq("1577840523456000"))
  }

  test("timestamp precision variants") {
    val ts = Timestamp.valueOf("2020-01-01 00:00:00.123456")
    val df = Seq(ts).toDF("t")
    def canonAt(p: String) =
      df.select(Canon.canonCol(col("t"), TimestampType, p)).as[String].head()
    assert(canonAt("microseconds").endsWith("123456"))
    assert(canonAt("milliseconds").endsWith("123000"))
    assert(canonAt("seconds").endsWith("000000"))
  }

  test("coarse precision units: minute/hour/day fold onto epoch-aligned grids") {
    // 2020-01-01T01:02:03.456789Z = 1577840523456789 us
    val df = Seq(Timestamp.valueOf("2020-01-01 01:02:03.456789")).toDF("t")
    def canonAt(p: String) =
      df.select(Canon.canonCol(col("t"), TimestampType, p)).as[String].head()
    assert(canonAt("second") == "1577840523000000") // PG-singular synonym
    assert(canonAt("minute") == "1577840520000000") // 01:02:00
    assert(canonAt("hour")   == "1577840400000000") // 01:00:00
    assert(canonAt("day")    == "1577836800000000") // 2020-01-01T00:00Z
  }

  test("week truncation anchors at Monday, not the (Thursday) epoch") {
    // 2020-01-01 was a Wednesday; its PG date_trunc('week') is Monday
    // 2019-12-30T00:00Z = 1577664000000000 us
    val df = Seq(Timestamp.valueOf("2020-01-01 01:02:03.456789")).toDF("t")
    val canon = df.select(Canon.canonCol(col("t"), TimestampType, "week")).as[String].head()
    assert(canon == "1577664000000000", canon)
    // epoch itself folds BACK to Monday 1969-12-29, proving the anchor offset
    val epoch = Seq(new Timestamp(0L)).toDF("t")
      .select(Canon.canonCol(col("t"), TimestampType, "week")).as[String].head()
    assert(epoch == "-259200000000", epoch)
  }

  test("calendar units month/quarter/year truncate on the calendar, incl. pre-1970") {
    // variable-width units can't fold as epoch arithmetic — they go through
    // date_trunc (session TZ pinned UTC) and render as epoch micros
    def canonAt(ts: Timestamp, p: String) = Seq(ts).toDF("t")
      .select(Canon.canonCol(col("t"), TimestampType, p)).as[String].head()
    val aug = Timestamp.valueOf("2020-08-15 13:14:15.161718")
    assert(canonAt(aug, "month")   == "1596240000000000") // 2020-08-01
    assert(canonAt(aug, "quarter") == "1593561600000000") // 2020-07-01
    assert(canonAt(aug, "year")    == "1577836800000000") // 2020-01-01
    val pre = Timestamp.valueOf("1969-06-15 06:07:08.9")
    assert(canonAt(pre, "month")   == "-18489600000000")  // 1969-06-01
    assert(canonAt(pre, "quarter") == "-23760000000000")  // 1969-04-01
    assert(canonAt(pre, "year")    == "-31536000000000")  // 1969-01-01
  }

  test("unknown precision unit fails fast with the supported list") {
    val e = intercept[IllegalArgumentException] {
      Seq(new Timestamp(0L)).toDF("t")
        .select(Canon.canonCol(col("t"), TimestampType, "fortnight"))
    }
    assert(e.getMessage.contains("fortnight") && e.getMessage.contains("week"))
  }

  test("hash column order is case-insensitive (heterogeneous-casing parity)") {
    // exact-case ASCII sort would order AB_C/ABD differently from ab_c/abd
    // ('_' = 0x5f sits between the uppercase and lowercase ranges)
    assert(Canon.hashColumnOrder(Seq("ABD", "AB_C")) == Seq("AB_C", "ABD"))
    assert(Canon.hashColumnOrder(Seq("abd", "ab_c")) == Seq("ab_c", "abd"))
  }

  test("row-hash order sorts expression strings, reference-style: special casts last") {
    import org.apache.spark.sql.types._
    // the reference sorts CastToText EXPRESSIONS (query.go:136-137), so a
    // timestamptz column sorts after every default-cast column and a json
    // column after that ('"' < '(' < 'l'), regardless of the column NAME —
    // the events fixture (ts mid-schema, props json) is exactly this shape
    val events = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    assert(Canon.hashColumnOrderTyped(events, events.fieldNames.toSeq,
        jsonCols = Set("props")) ==
      Seq("event_id", "event_type", "user_id", "value", "ts", "props"))
    // name sort alone would interleave them — the two rules genuinely differ
    assert(Canon.hashColumnOrder(events.fieldNames.toSeq) ==
      Seq("event_id", "event_type", "props", "ts", "user_id", "value"))
    // all-default tables: the expression sort degenerates to the name sort
    val plain = StructType(Seq(
      StructField("b", StringType), StructField("a", LongType)))
    assert(Canon.hashColumnOrderTyped(plain, Seq("b", "a")) == Seq("a", "b"))
  }

  test("pre-1970 timestamps truncate by floor, matching the oracle's floor-mod") {
    // 1969-12-31 23:59:59.9995 = -500us; ms-floor -> -1000us (not -0 or -500)
    val df = Seq(new Timestamp(-1L)).toDF("t") // -1 ms = -1000 us
      .withColumn("t", col("t"))
    val canon = df.select(Canon.canonCol(col("t"), TimestampType, "milliseconds"))
      .as[String].head()
    assert(canon == "-1000", canon)
    val canonSec = df.select(Canon.canonCol(col("t"), TimestampType, "seconds"))
      .as[String].head()
    assert(canonSec == "-1000000", canonSec) // floor to the second below
  }

  test("short documents shingle to the whole text on both engines") {
    import graft.operators.TextAnalysis
    val df = Seq("a b").toDF("text")
    val sh = df.select(TextAnalysis.shingles(col("text"), 3)).as[Seq[String]].head()
    assert(sh == Seq("a b"))
  }

  test("binary canonicalizes to PG's bytea text form: \\x then lowercase hex") {
    val df = Seq(Array[Byte](0x0a, -1, 0x00)).toDF("b")
    assert(canonOf(df, "b") == Seq("\\x0aff00"))
  }

  test("arrays canonicalize to PG-literal-ish form") {
    val df = Seq(Seq(1, 2, 3)).toDF("a")
    assert(canonOf(df, "a") == Seq("{1,2,3}"))
  }

  test("declared JSON columns canonicalize to the length proxy (P1 json rule)") {
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("j", StringType)))
    // key order must NOT affect the hash when the column is JSON
    val a = Seq((1, """{"a":1,"b":2}""")).toDF("id", "j")
      .select(Canon.rowHash(schema, Seq("id", "j"), jsonCols = Set("j"))).as[String].head()
    val b = Seq((1, """{"b":2,"a":1}""")).toDF("id", "j")
      .select(Canon.rowHash(schema, Seq("id", "j"), jsonCols = Set("j"))).as[String].head()
    assert(a == b)
    // but a different length still flips it
    val c = Seq((1, """{"a":1,"b":22}""")).toDF("id", "j")
      .select(Canon.rowHash(schema, Seq("id", "j"), jsonCols = Set("j"))).as[String].head()
    assert(a != c)
  }

  test("null canonicalizes to empty string (PG CONCAT semantics)") {
    val df = Seq[Option[String]](None, Some("x")).toDF("s")
    assert(canonOf(df, "s") == Seq("", "x"))
  }

  test("row hash is insensitive to column order (P2)") {
    val schema1 = StructType(Seq(StructField("a", StringType), StructField("b", IntegerType)))
    val h1 = Seq(("x", 1)).toDF("a", "b").select(Canon.rowHash(schema1, Seq("a", "b"))).as[String].head()
    val h2 = Seq((1, "x")).toDF("b", "a").select(Canon.rowHash(
      StructType(Seq(StructField("b", IntegerType), StructField("a", StringType))),
      Seq("b", "a"))).as[String].head()
    assert(h1 == h2)
  }

  test("hex_to_signed_long reinterprets bits like PG ::bit(64)::bigint") {
    val df = Seq("ffffffffffffffff", "0000000000000001", "8000000000000000", "7fffffffffffffff").toDF("h")
    val got = df.select(GraftFunctions.hexToSignedLong(col("h"))).as[Long].collect().toSeq
    assert(got == Seq(-1L, 1L, Long.MinValue, Long.MaxValue))
  }

  test("md5Bucket is stable and in range") {
    val got = Seq("a", "b", "c").toDF("k")
      .select(GraftFunctions.md5Bucket(col("k"), 64)).as[Long].collect().toSeq
    assert(got.forall(b => b >= 0 && b < 64))
    val again = Seq("a", "b", "c").toDF("k")
      .select(GraftFunctions.md5Bucket(col("k"), 64)).as[Long].collect().toSeq
    assert(got == again)
  }
}
