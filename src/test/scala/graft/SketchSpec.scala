package graft

import org.apache.spark.sql.functions._

import graft.core.Readers

/** Approximate aggregates (engine-specific sketches, so no equality oracle):
  * assert accuracy bounds against the exact answers instead.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact") {
    val li = Readers.fixture(spark, sfDir, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile is within 2% of the exact percentile") {
    val li = Readers.fixture(spark, sfDir, "lineitem")
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"exact=$exact approx=$approx")
  }

  test("KMV distinct sketch: within ~2/sqrt(k) of exact, exhaustive below k, stable") {
    import graft.operators.Sketches
    val li = Readers.fixture(spark, sfDir, "lineitem")
    val exact = li.agg(countDistinct(col("l_partkey"))).head().getLong(0)
    val est = Sketches.kmvDistinct(li, col("l_partkey"), 256)
    // KMV relative standard error ≈ 1/sqrt(k-2) ≈ 6.3% at k=256; 3σ bound
    assert(math.abs(est - exact).toDouble / exact < 0.19, s"exact=$exact est=$est")
    // deterministic: same sketch every run, any partitioning
    assert(Sketches.kmvDistinct(li.repartition(7), col("l_partkey"), 256) == est)
    // fewer distinct hashes than k → the sketch is exhaustive and exact
    val region = Readers.fixture(spark, sfDir, "region")
    assert(Sketches.kmvDistinct(region, col("r_regionkey"), 256) == 5L)
  }
}
