package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse a hex string (1..16 chars) as an UNSIGNED 64-bit value and
  * reinterpret the bits as a SIGNED long — the Spark analogue of PostgreSQL's
  * `('x' || substr(md5(...), 1, 16))::bit(64)::bigint` trick used by the
  * reference's sparse-mode sampling predicate (/root/reference/query.go:193).
  *
  * Spark's built-in `conv(s, 16, 10)` saturates at Long.MaxValue for values
  * ≥ 2^63 instead of wrapping, so it cannot express the signed
  * reinterpretation; this is the one scalar the survey flagged as needing a
  * custom expression (SURVEY.md §2.2 P7). Implemented as a native Catalyst
  * `UnaryExpression` with codegen (not a Scala UDF) so it stays inside
  * whole-stage codegen in the sparse-scan hot path.
  */
case class HexToSignedLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    HexToSignedLong.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexToSignedLong.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): HexToSignedLong =
    copy(child = newChild)

  override def prettyName: String = "hex_to_signed_long"
}

object HexToSignedLong {
  /** Static entry point shared by interpreted eval and generated code. */
  def parse(s: UTF8String): Long = java.lang.Long.parseUnsignedLong(s.toString, 16)
}

/** Unicode NFC normalization as a native codegen expression. Exact dedup
  * hashes bytes, and the same visible text has many codepoint spellings
  * (precomposed é vs e + COMBINING ACUTE) — without canonical normalization
  * a crawler that emits decomposed forms defeats every hash-keyed dedup
  * stage. Spark ships no normalization function (SPARK-companion libraries
  * reach for UDFs); this is the custom-Expression path instead — a
  * `UnaryExpression` over `java.text.Normalizer` with `doGenCode`, so
  * normalization stays inside whole-stage codegen in the scan-side dedup
  * hot path. The DuckDB oracle twin is its built-in `nfc_normalize`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Static entry point shared by interpreted eval and generated code.
    * Already-NFC input (the overwhelmingly common case) short-circuits on
    * the quick-check without allocating.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Column-level helpers shared by the fingerprint modes and the north-star
  * operators. Everything here composes built-in codegen'd functions except
  * [[GraftFunctions.hexToSignedLong]] (custom expression, above).
  */
object GraftFunctions {

  /** Lift the custom [[HexToSignedLong]] expression to the Column API. */
  def hexToSignedLong(c: Column): Column =
    Bridge.column(HexToSignedLong(Bridge.expression(c)))

  /** Lift the custom [[NfcNormalize]] expression to the Column API. */
  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** `('x'||substr(md5(k),1,16))::bit(64)::bigint` analogue: signed 64-bit
    * value from the first 16 hex chars of `k`'s MD5
    * (/root/reference/query.go:193).
    */
  def md5Signed64(k: Column): Column =
    hexToSignedLong(substring(md5(k), 1, 16))

  /** Deterministic engine-portable bucket id in [0, buckets) from the first 4
    * hex chars of `k`'s MD5 — used by the Merkle fingerprint (SURVEY.md §4
    * "range-partitioned Merkle hash") and by LSH-style band bucketing. Only 16
    * bits are parsed so there is no sign subtlety on either engine; the DuckDB
    * twin is `CAST('0x' || substr(md5(k), 1, 4) AS UBIGINT) % buckets`.
    */
  def md5Bucket(k: Column, buckets: Int): Column =
    pmod(conv(substring(md5(k), 1, 4), 16, 10).cast(LongType), lit(buckets.toLong))
}
