package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — the multi-dimensional clustering that
  * lets a 100 TB table skip data on BOTH of two filter columns at once.
  * Sorting by `(a, b)` clusters only on `a`: a predicate on `b` alone still
  * scans every file. Interleaving the bits of `a` and `b` into one z-value
  * and clustering by it maps each storage bucket to a small RECTANGLE of the
  * `(a, b)` key space, so per-file min/max statistics prune scans for
  * predicates on either column — the layout optimization behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * Everything is 64-bit integer bit arithmetic (shift/and/or), exactly
  * reproducible across engines — the same no-libm discipline as the hash
  * and PageRank operators, and codegen-friendly: the interleave folds into
  * one `WholeStageCodegen` expression over the scan, no shuffle until the
  * per-bucket aggregate.
  */
object Layout {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
    * positions) into a z-value: bit i of x lands at 2i, bit i of y at 2i+1.
    * `bits` ≤ 31 keeps the result in a positive long. Inputs must be
    * non-negative and below 2^bits — callers pick `bits` from the key
    * domain (the fixture keys are dense from 1, so 21 bits covers a
    * thousand-fold scale-up).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    val lanes = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    lanes.reduce(_ bitwiseOR _)
  }

  /** [[zValue]] with a loud domain check: a key outside `[0, 2^bits)` would
    * silently alias into the wrong tile (the interleave drops high bits), so
    * a domain overflow — e.g. the key space growing past the headroom `bits`
    * was sized for — must fail the job rather than corrupt every bucket
    * statistic downstream. The guard is a codegen-friendly CASE WHEN around
    * the same bit lanes; in-domain inputs produce the identical z-value, so
    * the unguarded DuckDB twin stays cell-for-cell comparable.
    */
  def zValueChecked(x: Column, y: Column, bits: Int): Column = {
    val limit = lit(1L << bits)
    val xl = x.cast("long")
    val yl = y.cast("long")
    when(xl < 0L || xl >= limit || yl < 0L || yl >= limit,
      raise_error(concat(
        lit(s"zValue domain overflow: key outside [0, 2^$bits): x="),
        xl.cast("string"), lit(" y="), yl.cast("string"))).cast("long"))
      .otherwise(zValue(x, y, bits))
  }

  /** DuckDB twin of [[zValue]] — the identical bit lanes as SQL text,
    * generated from the same loop so the two engines cannot drift.
    */
  def duckZValue(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    val lanes = (0 until bits).flatMap { i =>
      Seq(
        s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i})",
        s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }
    lanes.mkString("(", " | ", ")")
  }

  /** Per-bucket layout statistics for a z-clustered table: bucket id =
    * z-value with the low `tileShift` bits dropped (each bucket is a
    * 2^(tileShift/2) × 2^(tileShift/2) tile of the key plane), plus the
    * min/max span of each key inside the bucket — exactly the per-file
    * statistics a lakehouse scan prunes on. The proof of locality is in the
    * output: every bucket's `(x, y)` bounding box is tile-bounded no matter
    * how large the table grows, where size-equal row-order buckets would
    * each span the FULL key domain.
    */
  def zBucketStats(df: org.apache.spark.sql.DataFrame, xCol: String, yCol: String,
                   bits: Int, tileShift: Int): org.apache.spark.sql.DataFrame = {
    require(tileShift >= 2 && tileShift % 2 == 0 && tileShift < 2 * bits,
      s"tileShift=$tileShift must be even and inside the ${2 * bits}-bit z-domain")
    df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("bucket", shiftright(zValueChecked(col("x"), col("y"), bits), tileShift))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  /** DuckDB twin of [[zBucketStats]] over a named table. */
  def duckZBucketStats(table: String, xCol: String, yCol: String,
                       bits: Int, tileShift: Int): String =
    s"""SELECT bucket, count(*) AS n_rows,
          min(x) AS x_min, max(x) AS x_max,
          min(y) AS y_min, max(y) AS y_max
        FROM (SELECT CAST($xCol AS BIGINT) AS x, CAST($yCol AS BIGINT) AS y,
                     (${duckZValue(xCol, yCol, bits)} >> $tileShift) AS bucket
              FROM $table) AS z
        GROUP BY bucket ORDER BY bucket"""

  /** Small-file compaction plan — the other half of lakehouse layout
    * maintenance next to [[zBucketStats]]: given a file listing (directory,
    * ordered file id, byte size), assign files to merge groups by constant-
    * size chunking of each directory's cumulative byte offset: a file whose
    * START offset falls in `[b·target, (b+1)·target)` joins bin `b`. The
    * output (one row per planned merge group: file count, bytes, id range)
    * is what a compactor executes with per-group concatenating rewrites.
    *
    * Scale shape (100 TB): one window over (dir, id) — Spark shuffles by
    * `dir` and sorts each partition once; every downstream figure is a
    * partial-agg `groupBy` on the same keys, so AQE coalesces it onto the
    * window's partitioning with no second exchange. The offset-chunking rule
    * (rather than stateful first-fit) is what keeps the planner a pure
    * window expression: bin boundaries depend only on the prefix sum, not on
    * earlier bin decisions, so both engines compute it with identical SQL
    * semantics and a 1000-dir listing plans in one pass.
    */
  def compactionPlan(files: org.apache.spark.sql.DataFrame, dirCol: String,
                     idCol: String, sizeCol: Column, targetBytes: Long): org.apache.spark.sql.DataFrame = {
    require(targetBytes > 0, s"targetBytes=$targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dir")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    files
      .select(col(dirCol).as("dir"), col(idCol).cast("long").as("id"),
        sizeCol.cast("long").as("bytes"))
      .withColumn("cum_before", sum(col("bytes")).over(w) - col("bytes"))
      // integer floor division (DIV), not a double quotient: past 2^53
      // cumulative bytes a double rounds across bin boundaries; offsets are
      // non-negative so DIV and floor-divide agree on every in-range input
      .withColumn("bin", expr(s"cum_before DIV ${targetBytes}L"))
      .drop("cum_before")
      .groupBy(col("dir"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"),
        min(col("id")).as("id_first"), max(col("id")).as("id_last"))
  }

  /** DuckDB twin of [[compactionPlan]] over a named table. */
  def duckCompactionPlan(table: String, dirCol: String, idCol: String,
                         sizeSql: String, targetBytes: Long): String =
    s"""WITH files AS (
          SELECT $dirCol AS dir, CAST($idCol AS BIGINT) AS id,
                 CAST($sizeSql AS BIGINT) AS bytes FROM $table),
        packed AS (
          SELECT dir, id, bytes,
                 -- CAST: DuckDB widens the windowed sum and // returns DOUBLE;
                 -- the driver's comparator is dtype-sensitive (int64 != float64)
                 CAST((sum(bytes) OVER (PARTITION BY dir ORDER BY id
                      ROWS UNBOUNDED PRECEDING) - bytes) // $targetBytes
                   AS BIGINT) AS bin
          FROM files)
        SELECT dir, bin, count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS bytes,
               min(id) AS id_first, max(id) AS id_last
        FROM packed GROUP BY dir, bin ORDER BY dir, bin"""
}
