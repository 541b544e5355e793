package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual scale remedy when one key
  * dominates a shuffle join and AQE's skew splitting isn't available (e.g.
  * pre-AQE clusters, or deliberately-partitioned stateful pipelines).
  *
  * The large side gets a uniform salt in [0, salt); the small side is
  * replicated once per salt value; the join key becomes (key, salt), so the
  * hot key's rows spread over `salt` reducers instead of one. Result is
  * row-identical to the plain join (salt columns are internal).
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    // the salt is a hash of the whole row, not rand(): any per-row value
    // yields a salt-invariant join result, but a random value is fresh on
    // every task RETRY — one retried task would emit byte-different
    // intermediate partitions in an otherwise fully deterministic engine.
    // Exact-duplicate rows share a salt (co-located), which only matters if
    // a hot key is dominated by identical rows
    val rowHash = graft.functions.GraftFunctions.md5Signed64(
      concat_ws("", large.columns.map(c => col(c).cast("string")): _*))
    val saltedLarge = large.withColumn("__salt", pmod(rowHash, lit(salt)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
