package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped quantiles with a thresholded scale degrade.
  *
  * Exact `percentile` buffers every value of a group in a single
  * aggregation buffer — memory ∝ the hottest group — which is fine at
  * fixture scale and an executor OOM against a 100 TB table with a skewed
  * group key. Same discipline as `Fingerprints.fullModeRowLimit`: measure
  * first (one map-side-combined count aggregate), run exact below the
  * threshold (bit-for-bit oracle parity with DuckDB's `quantile_cont`),
  * switch to the mergeable t-digest sketch (`approx_percentile`: constant
  * memory per group, map-side partial, rank error ≤ n/[[SketchAccuracy]])
  * above it — and log the switch so a degraded run is never silent.
  */
object Quantiles {

  /** Values per group above which the exact path risks executor memory:
    * 10M doubles ≈ 80 MB in one unspillable aggregation buffer. */
  val ExactGroupRowLimit: Long = 10000000L

  /** `approx_percentile` accuracy knob on the degraded path. */
  val SketchAccuracy: Int = 10000

  def grouped(df: DataFrame, groupCol: String, valueCol: String,
      percentiles: Seq[(String, Double)],
      exactGroupRowLimit: Long = ExactGroupRowLimit): DataFrame =
    groupedWithMode(df, groupCol, valueCol, percentiles, exactGroupRowLimit)._1

  /** As [[grouped]], also returning whether the sketch degrade fired —
    * the hook ScaleSpec uses to pin the over-threshold path. */
  def groupedWithMode(df: DataFrame, groupCol: String, valueCol: String,
      percentiles: Seq[(String, Double)],
      exactGroupRowLimit: Long = ExactGroupRowLimit): (DataFrame, Boolean) = {
    // hottest-group size, not total rows: per-group buffering is the hazard,
    // and a billion-row table with uniform small groups is exact-safe while
    // a million-row table with one hot group is not. Short-circuit: the
    // hottest group can never exceed the TOTAL row count, and for a BARE
    // source scan a plain count() is metadata-only (parquet footer row
    // counts — no column decode, no exchange). For derived inputs
    // (filters/joins/generated columns) count() is a real job, so those go
    // straight to the one grouped-count pass (r13 advisor: the
    // unconditional count was an extra full pass, and over-threshold
    // inputs paid BOTH passes). The degrade decision is identical either
    // way: hottest <= total, so total <= limit implies not-degraded, and
    // the grouped max answers it exactly otherwise.
    def hottestViaGroups(): Long =
      df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("m")).collect().headOption
        .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long])).getOrElse(0L)
    val metadataCountable = df.queryExecution.optimizedPlan.collect {
      case n => n
    }.forall {
      case _: org.apache.spark.sql.catalyst.plans.logical.Project => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
      case _ => false
    }
    val hottest =
      if (metadataCountable) {
        val total = df.count()
        if (total <= exactGroupRowLimit) total else hottestViaGroups()
      } else hottestViaGroups()
    val degraded = hottest > exactGroupRowLimit
    if (degraded)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"grouped quantiles: hottest group has $hottest rows > " +
          s"exactGroupRowLimit=$exactGroupRowLimit; switching exact " +
          s"percentile -> approx_percentile(accuracy=$SketchAccuracy)")
    val aggs = percentiles.map { case (name, p) =>
      val c =
        if (degraded) expr(s"approx_percentile(`$valueCol`, ${p}d, $SketchAccuracy)")
        else expr(s"percentile(`$valueCol`, ${p}d)")
      // cast pins the schema across modes (approx returns the input type,
      // exact interpolates to double)
      c.cast("double").as(name)
    } :+ count(lit(1)).as("n")
    // spread by VALUE before the aggregate (r13; guide §2.5): percentile's
    // partial state is a per-value count map built row-by-row, and an
    // unsplittable input (the single-row-group fixture shape) pipelines all
    // of it into one task; hashing on the value column spreads the build
    // across cores while grouping on the (few) group keys would not. The
    // value-count maps merge commutatively, so the EXACT result is
    // unchanged. The DEGRADED path keeps the caller's partitioning (r13
    // advisor): approx_percentile's Greenwald-Khanna sketch is
    // merge-order-sensitive, so re-keying there could shift the sketch
    // output relative to the undecorated plan.
    val data =
      if (degraded) df else graft.core.Readers.spread(df, col(valueCol))
    val out = data.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .orderBy(groupCol)
    (out, degraded)
  }
}
