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
    // deterministic-per-seed uniform salt; any per-row value works — the
    // join result is salt-invariant
    val saltedLarge = large.withColumn("__salt", (rand(42) * salt).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
