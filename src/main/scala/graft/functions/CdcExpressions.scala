package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking cut positions via a ROLLING Karp-Rabin hash —
  * the O(n)-per-document production kernel behind `Cdc.chunks`' per-window
  * md5 form (O(n·window) plus a hash per position). Returns the ascending
  * 1-based END positions of every window whose polynomial hash (base 31,
  * mod the Mersenne prime 2³¹−1, over UTF-16 code units) satisfies
  * `h % divisor == 0`.
  *
  * Cross-engine: the rolling recurrence computes EXACTLY the window
  * polynomial `Σ code(c_j)·31^(w−1−j) mod M`, so a non-rolling engine (the
  * DuckDB oracle) reproduces the identical cut set by evaluating each
  * window directly — same semantics, different algorithm, O(n·w) there.
  * Code units equal code points for BMP text (the fixture and typical
  * corpora); supplementary-plane characters would count as two units here
  * and one in DuckDB — documents containing them should go through the
  * md5-window form instead.
  *
  * A tight primitive loop inside whole-stage codegen: no per-position
  * allocation, one `int[]` result per row.
  */
case class CdcBoundaries(text: Expression, window: Expression, divisor: Expression)
  extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = window
  override def third: Expression = divisor

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private val M = 2147483647L // 2^31 - 1, prime
  private val B = 31L

  override def nullSafeEval(t: Any, w: Any, d: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val win = w.asInstanceOf[Int]
    val div = d.asInstanceOf[Int]
    if (win < 1 || div < 1)
      throw new IllegalArgumentException(s"graft_cdc_cuts: window=$win divisor=$div must be >= 1")
    val n = s.length
    if (n < win) return new GenericArrayData(Array.empty[Int])
    var bw1 = 1L
    var k = 1
    while (k < win) { bw1 = bw1 * B % M; k += 1 }
    val tmp = new Array[Int](n - win + 1)
    var m = 0
    var h = 0L
    var i = 0
    while (i < n) {
      if (i >= win) {
        val out = s.charAt(i - win).toLong
        h = java.lang.Math.floorMod(h - out * bw1 % M, M)
      }
      h = (h * B + s.charAt(i).toLong) % M
      if (i >= win - 1 && h % div == 0) { tmp(m) = i + 1; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(tmp, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, d) => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val bw1 = ctx.freshName("bw1")
      val k = ctx.freshName("k")
      val tmp = ctx.freshName("tmp")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val out = ctx.freshName("cout")
      s"""
         if ($w < 1 || $d < 1) {
           throw new IllegalArgumentException(
             "graft_cdc_cuts: window=" + $w + " divisor=" + $d + " must be >= 1");
         }
         String $s = $t.toString();
         int $n = $s.length();
         if ($n < $w) {
           ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new int[0]);
         } else {
           long $bw1 = 1L;
           for (int $k = 1; $k < $w; $k++) { $bw1 = $bw1 * ${B}L % ${M}L; }
           int[] $tmp = new int[$n - $w + 1];
           int $m = 0;
           long $h = 0L;
           for (int $i = 0; $i < $n; $i++) {
             if ($i >= $w) {
               long $out = (long) $s.charAt($i - $w);
               $h = java.lang.Math.floorMod($h - $out * $bw1 % ${M}L, ${M}L);
             }
             $h = ($h * ${B}L + (long) $s.charAt($i)) % ${M}L;
             if ($i >= $w - 1 && $h % $d == 0) { $tmp[$m] = $i + 1; $m++; }
           }
           ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
             java.util.Arrays.copyOf($tmp, $m));
         }
       """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CdcBoundaries =
    copy(text = newFirst, window = newSecond, divisor = newThird)

  override def prettyName: String = "graft_cdc_cuts"
}

object CdcFunctions {
  /** Column wrapper: rolling-hash CDC cut END positions (1-based, ascending). */
  def cdcCuts(text: Column, window: Int, divisor: Int): Column =
    Bridge.column(CdcBoundaries(Bridge.expression(text),
      Bridge.expression(org.apache.spark.sql.functions.lit(window)),
      Bridge.expression(org.apache.spark.sql.functions.lit(divisor))))
}
