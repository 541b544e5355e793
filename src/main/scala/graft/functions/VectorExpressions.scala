package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two numeric arrays (float or double elements),
  * accumulating in double left-to-right — semantically identical to
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)` but ~2 orders of
  * magnitude faster: Spark's higher-order functions evaluate interpreted,
  * one closure call + boxing per element, while this is a tight primitive
  * loop inside whole-stage codegen. The survey's preference order (b):
  * a custom codegen `Expression` beats composing HOFs for the similarity
  * hot path (SURVEY.md §0 north-star ops).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  // a NULL element makes x*y NULL and NULL poisons the HOF fold, so the
  // whole result is NULL — this expression must match, and is therefore
  // nullable even over non-null array columns when elements may be null
  override def nullable: Boolean =
    super.nullable || elemNullable(left) || elemNullable(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // fail fast on ragged inputs: silently truncating to the shorter array
    // would mask corrupt data and diverge from the DuckDB twin (which
    // iterates len(a) and NULLs out on the out-of-range side)
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: mismatched vector lengths ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var sum = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) {
          if (a.isNullAt(i) || b.isNullAt(i)) return null
          sum += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
        }
      case (DoubleType, DoubleType) =>
        while (i < n) {
          if (a.isNullAt(i) || b.isNullAt(i)) return null
          sum += a.getDouble(i) * b.getDouble(i); i += 1
        }
      case (FloatType, DoubleType) =>
        while (i < n) {
          if (a.isNullAt(i) || b.isNullAt(i)) return null
          sum += a.getFloat(i).toDouble * b.getDouble(i); i += 1
        }
      case (DoubleType, FloatType) =>
        while (i < n) {
          if (a.isNullAt(i) || b.isNullAt(i)) return null
          sum += a.getDouble(i) * b.getFloat(i).toDouble; i += 1
        }
      case other => throw new IllegalArgumentException(s"DotProduct on $other")
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(e: Expression, arr: String, i: String): String = elemType(e) match {
      case FloatType  => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other => throw new IllegalArgumentException(s"DotProduct on $other")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      // the per-element null branch is only emitted when the array type can
      // actually hold nulls — the parquet embedding hot path stays a tight
      // two-load multiply-add loop
      val checks = Seq(
        if (elemNullable(left)) Some(s"$a.isNullAt($i)") else None,
        if (elemNullable(right)) Some(s"$b.isNullAt($i)") else None).flatten
      val nullGuard =
        if (checks.isEmpty) ""
        else s"if (${checks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      s"""
         if ($a.numElements() != $b.numElements()) {
           throw new IllegalArgumentException(
             "graft_dot: mismatched vector lengths " + $a.numElements() + " vs " + $b.numElements());
         }
         int $n = $a.numElements();
         double $sum = 0.0;
         for (int $i = 0; $i < $n; $i++) {
           $nullGuard
           $sum += ${get(left, a, i)} * ${get(right, b, i)};
         }
         if (!${ev.isNull}) { ${ev.value} = $sum; }
       """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Integer dot product over two `array<long>` columns (the int8-quantized
  * similarity hot path): exact 64-bit accumulation in a tight codegen loop —
  * the integer sibling of [[DotProduct]], replacing the interpreted
  * `aggregate(zip_with(...))` HOF pair in `Similarity.intDot`'s original
  * form. Quantized codes are |q| ≤ 127, so overflow needs ~2⁴⁸ dims.
  */
case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  // NULL-element semantics match the aggregate(zip_with(...)) HOF this
  // replaces: any NULL element → NULL result (SQL-reachable via
  // graft_int_dot, so arbitrary arrays can arrive here)
  override def nullable: Boolean =
    super.nullable || elemNullable(left) || elemNullable(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"graft_int_dot: mismatched vector lengths ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += a.getLong(i) * b.getLong(i); i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val checks = Seq(
        if (elemNullable(left)) Some(s"$a.isNullAt($i)") else None,
        if (elemNullable(right)) Some(s"$b.isNullAt($i)") else None).flatten
      val nullGuard =
        if (checks.isEmpty) ""
        else s"if (${checks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      s"""
         if ($a.numElements() != $b.numElements()) {
           throw new IllegalArgumentException(
             "graft_int_dot: mismatched vector lengths " + $a.numElements() + " vs " + $b.numElements());
         }
         int $n = $a.numElements();
         long $sum = 0L;
         for (int $i = 0; $i < $n; $i++) {
           $nullGuard
           $sum += $a.getLong($i) * $b.getLong($i);
         }
         if (!${ev.isNull}) { ${ev.value} = $sum; }
       """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_int_dot"
}

/** Integer squared-L2 distance over two `array<long>` columns (the
  * JL-sketch ranking hot path): `Σ (a_i − b_i)²` with exact 64-bit
  * accumulation in one tight codegen loop — one expression where the HOF
  * form (`aggregate(zip_with(...))` on a staged diff array) materializes an
  * intermediate array per row and evaluates interpreted. Sketch components
  * are |p| ≤ dims · scale (≈ 2¹⁶ here), so the squared terms sit ~2³²,
  * far from overflow at any plausible sketch width.
  */
case class IntL2Squared(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  // NULL-element semantics match the HOF form this replaces: any NULL
  // element → NULL result (SQL-reachable via graft_int_l2sq)
  override def nullable: Boolean =
    super.nullable || elemNullable(left) || elemNullable(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"graft_int_l2sq: mismatched vector lengths ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      sum += d * d; i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val sum = ctx.freshName("sum")
      val checks = Seq(
        if (elemNullable(left)) Some(s"$a.isNullAt($i)") else None,
        if (elemNullable(right)) Some(s"$b.isNullAt($i)") else None).flatten
      val nullGuard =
        if (checks.isEmpty) ""
        else s"if (${checks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      s"""
         if ($a.numElements() != $b.numElements()) {
           throw new IllegalArgumentException(
             "graft_int_l2sq: mismatched vector lengths " + $a.numElements() + " vs " + $b.numElements());
         }
         int $n = $a.numElements();
         long $sum = 0L;
         for (int $i = 0; $i < $n; $i++) {
           $nullGuard
           long $d = $a.getLong($i) - $b.getLong($i);
           $sum += $d * $d;
         }
         if (!${ev.isNull}) { ${ev.value} = $sum; }
       """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntL2Squared =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_int_l2sq"
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[IntDotProduct]]. */
  def intDotProduct(a: Column, b: Column): Column =
    Bridge.column(IntDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[IntL2Squared]]. */
  def intL2Squared(a: Column, b: Column): Column =
    Bridge.column(IntL2Squared(Bridge.expression(a), Bridge.expression(b)))
}
