package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded interval self-join: pairs of rows with the same key whose times lie
  * within `tolerance` of each other. The naive `|t1 - t2| <= tol` theta-join
  * degenerates to a per-key cross product; the standard scale formulation
  * bins each row into time buckets of width `tolerance` and equi-joins each
  * left bucket against right buckets {b-1, b, b+1} — every qualifying pair
  * lands in exactly one of those, so results equal the naive join while the
  * shuffle stays keyed on (key, bucket).
  */
object RangeJoin {

  /** Id-ordered pairs (id_a < id_b) within `tolerance` time units of each
    * other, same join key. Input needs (idCol, keyCol, timeCol); output:
    * id_a, id_b, and the absolute time gap.
    */
  def withinIntervalPairs(df: DataFrame, idCol: String, keyCol: String, timeCol: String,
                          tolerance: Long): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(keyCol).as("k"), col(timeCol).as("t"))
      .withColumn("b", floor(col("t") / tolerance))
    val lhs = base.select(col("id").as("id_a"), col("k"), col("t").as("t_a"), col("b"))
    // right side replicated into the three candidate buckets
    val rhs = base
      .withColumn("b", explode(array(col("b") - 1, col("b"), col("b") + 1)))
      .select(col("id").as("id_b"), col("k"), col("t").as("t_b"), col("b"))
    lhs.join(rhs, Seq("k", "b"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("t_b") - col("t_a")) <= tolerance)
      .select(col("id_a"), col("id_b"), abs(col("t_b") - col("t_a")).as("gap"))
      .distinct() // a pair can qualify via two bucket alignments
    // no output sort: presentation order belongs to the registered query —
    // an operator-level global sort is pure waste when the consumer
    // aggregates or reshuffles anyway (c74635b sort policy)
  }
}
