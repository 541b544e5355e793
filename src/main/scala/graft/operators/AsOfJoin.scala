package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with the same key and
  * time <= left time. Spark has no native ASOF JOIN; the naive formulation
  * (range join + per-row rank) explodes to |left| × |right-per-key| pairs.
  *
  * This is the scale-correct composition (survey custom-operator preference
  * (a) — compose built-ins before custom plans): UNION the two inputs into
  * one stream tagged by side, sort within key by (time, side), and carry the
  * most recent right payload forward with last_value(ignoreNulls) — one
  * shuffle on the key, one sort, zero row blow-up. DuckDB's native
  * `ASOF JOIN` serves as the oracle twin.
  */
object AsOfJoin {

  /** Left rows (leftTime, leftKey, leftCols) joined to the latest right row
    * (rightTime, rightKey, valueCols) at-or-before leftTime. Right rows must
    * be unique per (key, time) — pre-aggregate duplicates first, or the
    * match is ambiguous on any engine.
    *
    * All valueCols ride in ONE struct carried by a single
    * `last(ignoreNulls)` — the struct is non-null for every right row even
    * when every payload field is NULL, so a matched row's NULLs propagate to
    * the left row (per-column carry would skip past them to an older match,
    * diverging from native ASOF semantics). Internal columns are suffixed
    * until they collide with nothing in either input.
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String,
           valueCols: Seq[String]): DataFrame =
    asOfImpl(left, right, leftKey, leftTime, rightKey, rightTime, valueCols,
      forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with the same
    * key and time >= left time — "next event after the order", the mirror
    * of [[asOf]]'s "last order before the event". Same union + one-shuffle
    * window composition, with the carry running over the FOLLOWING frame
    * and left rows sorting before right at equal time so an exactly-
    * coincident right row is still visible (>= semantics, matching DuckDB's
    * forward `ASOF JOIN ... ON l.t <= r.t` oracle).
    *
    * Same contract as [[asOf]]: right rows must be unique per (key, time) —
    * the window order ties within equal (time, side) are unordered, so
    * duplicate right keys would surface an arbitrary payload (on this and
    * any engine). Pre-aggregate the right side first, as the registered
    * queries do.
    */
  def asOfForward(left: DataFrame, right: DataFrame,
                  leftKey: String, leftTime: String,
                  rightKey: String, rightTime: String,
                  valueCols: Seq[String]): DataFrame =
    asOfImpl(left, right, leftKey, leftTime, rightKey, rightTime, valueCols,
      forward = true)

  private def asOfImpl(left: DataFrame, right: DataFrame,
                       leftKey: String, leftTime: String,
                       rightKey: String, rightTime: String,
                       valueCols: Seq[String], forward: Boolean): DataFrame = {
    // a zero-field payload struct has no null-vs-non-null carry signal
    require(valueCols.nonEmpty, "asOf requires at least one value column to carry")
    val reserved = (left.columns ++ right.columns).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(reserved.contains).next()
    val (kC, tC, sideC, payC) = (fresh("__k"), fresh("__t"), fresh("__side"), fresh("__pay"))
    val leftCols = left.columns.toSeq
    // tie-breaking by side makes the coincident right row visible in BOTH
    // directions: backward scans [start, current] so right must sort before
    // left at equal time (rightSide 0 < leftSide 1); forward scans
    // [current, end] so right must sort after left (rightSide 1 > leftSide 0)
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val r = right.select(col(rightKey).as(kC), col(rightTime).as(tC),
      lit(rightSide).as(sideC), struct(valueCols.map(col): _*).as(payC))
    val payType = r.schema(payC).dataType
    val unioned = left.select(
      (Seq(col(leftKey).as(kC), col(leftTime).as(tC), lit(leftSide).as(sideC),
        lit(null).cast(payType).as(payC)) ++ leftCols.map(col)): _*)
      .unionByName(r.select(
        (Seq(col(kC), col(tC), col(sideC), col(payC)) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*))
    val base = Window.partitionBy(col(kC)).orderBy(col(tC), col(sideC))
    val carried =
      if (forward)
        first(col(payC), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col(payC), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    unioned.withColumn(payC, carried)
      .filter(col(sideC) === leftSide)
      .select(leftCols.map(col) ++ valueCols.map(c => col(payC).getField(c).as(c)): _*)
  }
}
