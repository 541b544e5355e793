package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking without the single-partition window.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY is correct SQL and
  * the right DuckDB oracle form, but Spark executes it by moving EVERY row
  * into ONE partition — a single executor thread sorts and numbers the
  * whole table. Over a per-document score frame at pretraining scale that
  * is the difference between a shuffle and a stall: the narrow (id, score)
  * table still has billions of rows.
  *
  * The exact distributed equivalent, kept fully declarative:
  *
  *  1. `repartitionByRange` on the sort key — a parallel, sampling-based
  *     range shuffle, so partition i holds keys strictly before partition
  *     i+1's;
  *  2. count rows per range partition — at most `partitions` longs of
  *     driver state (the bounded-collect convention) — and prefix-sum them
  *     into per-partition rank offsets;
  *  3. rank WITHIN each partition (a partition-local window — parallel)
  *     and add the broadcast offset.
  *
  * Output is bit-identical to the global window whenever the order is
  * TOTAL (callers pass a tie-breaking id column — the same requirement the
  * global window already had for a deterministic result).
  *
  * Two materialization facts, both load-bearing:
  *  - the ranged frame MUST persist until the result materializes: range
  *    boundaries come from sampling, and an unpersisted second evaluation
  *    could draw different boundaries than the ones the offsets were
  *    computed from (offsets keyed to stale boundaries = silently wrong
  *    ranks). Materialize-then-release, the incrementalCandidates
  *    lifecycle.
  *  - the partition-local window re-shuffles by partition id (range
  *    partitioning doesn't satisfy the window's clustering requirement).
  *    Two narrow-table shuffles instead of one — the price of staying in
  *    DataFrame land — but both parallel; the global window's single-task
  *    sort is what this exists to avoid.
  */
object Ranks {

  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String,
                 partitions: Int = 32): DataFrame = {
    // localCheckpoint, not persist: ranking is many small jobs (sampling,
    // shuffle, per-partition counts, the rank itself), and EVERY job pays
    // driver-side analysis + cache-lookup canonicalization over the
    // input's full logical plan. Fed by a deep pipeline (corpus_waterfall:
    // LSH + LM + DSIR lineage) that planning cost dominated execution 5:1
    // — measured 13 s for a count over a fully-cached 6 MB frame.
    // Truncating the lineage here makes every rank job plan O(rank), and
    // also stops repartitionByRange's sampling pass from re-evaluating the
    // upstream pipeline. Same device as Graph's per-iteration cap.
    val in = df.localCheckpoint()
    val (lazyOut, ranged) = globalRankLazy(in, order, rankCol, partitions)
    val out = lazyOut.persist()
    out.count()
    ranged.unpersist(blocking = false)
    out
  }

  /** SQL `ntile(k)` recovered from an exact global rank: the first
    * N mod k buckets hold N div k + 1 rows, the rest N div k — the same
    * arithmetic the window function applies on both engines, so the
    * recovered buckets match a DuckDB `ntile` oracle row-for-row
    * (including the N < k degenerate case, where every row is its own
    * bucket). Pair with [[globalRank]] to replace
    * `ntile(k) OVER (ORDER BY …)` — same answer, no single-partition
    * window.
    */
  def ntileFromRank(rankCol: String, n: Long, k: Int): Column = {
    val q = n / k
    val rem = n % k
    val big = (q + 1) * rem // rows covered by the one-larger buckets
    expr(s"IF($rankCol <= ${big}L, ($rankCol - 1) div ${q + 1}L, " +
      s"${rem}L + ($rankCol - 1 - ${big}L) div ${math.max(q, 1)}L) + 1")
  }

  /** The unpersisted rank frame plus the internally-persisted range stage —
    * exposed so PlanSpec can assert every Window node is partition-local
    * (the lazy form is NOT safe to hand out: a second evaluation of the
    * range stage after its cache is dropped could re-sample different
    * boundaries than the offsets were computed from).
    */
  private[graft] def globalRankLazy(df: DataFrame, order: Seq[Column],
                                    rankCol: String,
                                    partitions: Int): (DataFrame, DataFrame) = {
    val ranged = df.repartitionByRange(partitions, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    // ≤ `partitions` rows: the one driver-side collect, bounded by design
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    val offsets = counts.map { case (pid, c) => val o = (pid, cum); cum += c; o }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val out = ranged.join(broadcast(offDf), "__pid")
      .withColumn(rankCol,
        row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*))
          .cast("long") + col("__off"))
      .drop("__pid", "__off")
    (out, ranged)
  }
}
