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
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String,
           valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right.select(
      col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        valueCols.map(col): _*)
    val leftCols = left.columns.toSeq
    val unioned = l.select(
      (Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) ++ valueCols.map(c => lit(null).cast(r.schema(c).dataType).as(c))): _*)
      .unionByName(r.select(
        (Seq(col("__k"), col("__t"), col("__side")) ++
          leftCols.map(c => lit(null).cast(l.schema(c).dataType).as(c)) ++ valueCols.map(col)): _*))
    // right rows sort before left rows at equal time (side 0 < 1), so an
    // exactly-coincident right row IS visible to the left row — ASOF <= semantics
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(col): _*)
  }
}
