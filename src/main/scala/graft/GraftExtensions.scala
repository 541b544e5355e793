package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CdcBoundaries, DotProduct, HexToSignedLong, IntDotProduct, IntL2Squared, NfcNormalize}

/** SparkSessionExtensions entry point: registers graft's custom codegen
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * (and any SQL-first consumer) can reach them without the Column API.
  *
  * Wire up with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the standard
  * injection route for engine extensions (no Spark fork, no reflection).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // (className, db, name) — the current non-deprecated short constructor;
  // usage text lives in the scaladoc above each injection instead
  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  private def binary(name: String, make: (Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
    make(args(0), args(1))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      info("graft_dot"),
      binary("graft_dot", DotProduct.apply) _))
    ext.injectFunction((
      new FunctionIdentifier("graft_int_dot"),
      info("graft_int_dot"),
      binary("graft_int_dot", IntDotProduct.apply) _))
    ext.injectFunction((
      new FunctionIdentifier("graft_int_l2sq"),
      info("graft_int_l2sq"),
      binary("graft_int_l2sq", IntL2Squared.apply) _))
    ext.injectFunction((
      new FunctionIdentifier("graft_hex_signed64"),
      info("graft_hex_signed64"),
      { args: Seq[Expression] =>
        require(args.length == 1, s"graft_hex_signed64 expects 1 argument, got ${args.length}")
        HexToSignedLong(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      info("graft_nfc"),
      { args: Seq[Expression] =>
        require(args.length == 1, s"graft_nfc expects 1 argument, got ${args.length}")
        NfcNormalize(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cdc_cuts"),
      info("graft_cdc_cuts"),
      { args: Seq[Expression] =>
        require(args.length == 3, s"graft_cdc_cuts expects 3 arguments, got ${args.length}")
        CdcBoundaries(args(0), args(1), args(2))
      }))
  }
}
