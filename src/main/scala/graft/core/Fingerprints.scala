package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType, StructType}

import graft.canon.Canon
import graft.core.Readers
import graft.functions.{Digests, GraftFunctions}

/** Verification run configuration — mirrors the reference's `Config` defaults
  * (/root/reference/config.go:83-98): mode full, bookend limit 1000, sparse
  * mod 10, timestamp precision milliseconds.
  */
case class VerifyConfig(
    modes: Seq[String] = Seq(TestModes.Full, TestModes.Bookend, TestModes.Sparse, TestModes.RowCount),
    tsPrecision: String = "milliseconds",
    hashPrimaryKeys: Boolean = false,
    bookendLimit: Int = 1000,
    sparseMod: Int = 10,
    // row count above which full mode auto-degrades to the Merkle digest in
    // [[Fingerprints.runModes]]: the exact digest serializes 32 B/row through
    // the driver's sequential MD5 chain, so beyond this the scale-safe
    // variant is the default rather than a caller opt-in. Both sides of a
    // comparison share the config, so both degrade identically.
    fullModeRowLimit: Long = 100000000L,
    // row count above which the exact digest stops collect()-ing the sorted
    // hashes into one driver array (32 B/row — 10M rows ≈ 320 MB) and
    // streams them via toLocalIterator instead (driver holds one partition
    // at a time), extending exact parity to fullModeRowLimit without a
    // driver-heap cliff. Below it, collect() wins: one job, where
    // toLocalIterator schedules a job per partition (~2× at bench scale).
    streamingCollectRowLimit: Long = 10000000L,
    merkleBuckets: Int = 1024)

object TestModes {
  val Full = "full"
  val Bookend = "bookend"
  val Sparse = "sparse"
  val RowCount = "rowcount"
  val Stats = "stats"
  val All: Seq[String] = Seq(Bookend, Full, RowCount, Sparse, Stats) // alphabetical, O5
}

/** The four test modes, each reducing a table to one scalar fingerprint
  * string — the programs the reference generates as SQL text
  * (/root/reference/query.go:120-283) re-expressed as Spark plans.
  *
  * Scale notes (100 TB target):
  *   - `hashedRows` is a narrow projection: Catalyst prunes the parquet scan
  *     to exactly the hashed columns and the whole row→md5 pipeline is
  *     whole-stage-codegen'd per partition. On a splittable input there is
  *     no shuffle; only when the planned scan cannot spread (one row group,
  *     gzip, a single hot file) does a pre-projection repartition fire
  *     ([[Readers.spreadBySize]]'s splittability gate) so the md5 work is
  *     not pipelined into one task.
  *   - `exactDigest` needs a global PK-order — a range-partition exchange
  *     (parallel sort) followed by a sequential driver-side MD5 chain.
  *     MD5-chaining is inherently sequential, so byte-parity with the
  *     reference's `md5(string_agg(...))` cannot be parallelized further;
  *     use it when the literal reference fingerprint is required.
  *   - `merkleDigest` is the scalable variant (SURVEY.md §4): rows are
  *     bucketed by a deterministic MD5-derived key, each bucket is digested
  *     independently (one shuffle, fully parallel, buckets sized to fit
  *     executors), and the per-bucket digests are combined in bucket order.
  *     Same sensitivity (any changed/added/removed row flips it), different
  *     literal value; both sides of a comparison must use the same variant.
  */
object Fingerprints {

  /** Sentinel for empty tables (/root/reference/verify.go:246-249). */
  val NoRows = "no rows"

  /** Error sentinel, a valid comparable output (/root/reference/results.go:12). */
  val Err = "(err)"

  /** Hashable columns of `df` for `spec`: include/exclude filtered (P6), in
    * analysis order; canonicalization itself re-sorts lexicographically (P2).
    */
  def hashableColumns(df: DataFrame, spec: TableSpec): Seq[String] =
    df.schema.fields.map(_.name).filter(spec.validColumn).toSeq

  /** Project `df` to `(k sort-key, h row-hash)` — the inner SELECT of every
    * generated hash query (/root/reference/query.go:147-158).
    */
  def hashedRows(df: DataFrame, spec: TableSpec, cfg: VerifyConfig): DataFrame = {
    val cols = hashableColumns(df, spec)
    // spread BEFORE the per-row canonicalize+md5 projection (r13; guide §2.5
    // input skew / §6): a single-row-group parquet file — the fixture shape,
    // and the small-file shape generally — is unsplittable, so without the
    // repartition the whole table's md5 work pipelines into ONE scan task
    // no matter how many cores the session has. Keyed by the first PK
    // column (uniform for any real key; digests are global-sort/aggregate
    // shaped, so partitioning never changes a result); no-PK specs keep the
    // scan shape (their only hash consumers are PK-free aggregates).
    val spreadDf =
      if (spec.pks.nonEmpty) Readers.spreadBySize(df, col(spec.pks.head)) else df
    spreadDf.select(
      Canon.pkSortKey(df.schema, spec.pks, cfg.hashPrimaryKeys, cfg.tsPrecision).as("k"),
      Canon.rowHash(df.schema, cols, cfg.tsPrecision, spec.jsonColumns).as("h"))
  }

  /** Digest an already-(k,h)-projected frame in exact global (k,h) order:
    * parallel range-partitioned sort, then a driver-side MD5 chain over the
    * hashes (32 bytes/row — 600k rows is ~19 MB). Equal to SQL
    * `md5(string_agg(h, '' ORDER BY k, h))`.
    *
    * The MD5 chain is inherently sequential, so the exact-parity fingerprint
    * is driver-bound by construction (like the reference's single-node
    * `string_agg`, README.md:69); at real scale [[merkleDigest]]'s combine is
    * parallel. Below `streamLimit` rows the sorted hashes are collect()-ed
    * (one job — fastest at bench scale); when the caller KNOWS the count
    * exceeds it, the sorted column streams through toLocalIterator so driver
    * memory is one partition, not the table — exact parity holds another
    * order of magnitude before the Merkle degrade. Callers without a cheap
    * count (the single-mode sparse paths) pass None and keep collect().
    */
  private def digestOrdered(kh: DataFrame, nRows: Option[Long] = None,
                            streamLimit: Long = Long.MaxValue): Option[String] = {
    val sorted = kh.orderBy(col("k"), col("h")).select(col("h"))
    if (nRows.exists(_ > streamLimit)) {
      import scala.jdk.CollectionConverters.IteratorHasAsScala
      val it = sorted.toLocalIterator().asScala.map(_.getString(0))
      if (it.hasNext) Some(Digests.md5OfConcat(it)) else None
    } else {
      val rows = sorted.collect()
      if (rows.isEmpty) None
      else Some(Digests.md5OfConcat(rows.iterator.map(_.getString(0))))
    }
  }

  /** full mode — /root/reference/query.go:122-158. Carries the same
    * `fullModeRowLimit` auto-degrade as the multi-mode path in [[runModes]]:
    * without it, the same `VerifyConfig` would yield different "full" outputs
    * depending on call path (single-mode vs multi-mode), and the driver-side
    * collect hazard the limit exists for would survive on this path. The
    * persist makes the count and the digest share one canonicalize+hash pass.
    */
  def fullDigest(df: DataFrame, spec: TableSpec, cfg: VerifyConfig): String = {
    val kh = hashedRows(df, spec, cfg).persist()
    try {
      val n = kh.count()
      if (n > cfg.fullModeRowLimit) degradeToMerkle(kh, cfg)
      else digestOrdered(kh, Some(n), cfg.streamingCollectRowLimit).getOrElse(NoRows)
    } finally kh.unpersist(blocking = false)
  }

  /** Shared full→Merkle degrade (scale guard), logged so a degraded run is
    * never silent; both comparison sides share `cfg`, so both degrade together.
    */
  private def degradeToMerkle(kh: DataFrame, cfg: VerifyConfig): String = {
    org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"full mode: row count exceeds fullModeRowLimit=${cfg.fullModeRowLimit}; " +
        s"switching to Merkle digest (${cfg.merkleBuckets} buckets)")
    merkleFromKh(kh.select(col("k"), col("h")), cfg.merkleBuckets)
  }

  /** sparse mode — deterministic 1/mod MD5-keyed sample *before* hashing all
    * columns (/root/reference/query.go:160-229). The reference filters through
    * one `IN` subquery **per PK column**, AND-ed (/root/reference/
    * query.go:186-205): a row passes when each of its PK values appears in
    * the P7-sampled set's projection of that column. For single-column PKs
    * that collapses to the direct P7 predicate (the sample key depends only
    * on that column), so we use the one-scan filter; for composite PKs the
    * per-column form selects a *superset* of the jointly-sampled rows and we
    * replicate it exactly ([[sparseDigestSemiJoin]]) — warts and all — so
    * fingerprints match real pgverify output.
    */
  def sparseFilter(df: DataFrame, spec: TableSpec, cfg: VerifyConfig): Column = {
    // the sparse key is the MD5 of the *unhashed* canonicalized PK concat
    // (/root/reference/query.go:190-203), independent of hashPrimaryKeys
    val pkConcat = Canon.pkSortKey(df.schema, spec.pks, hashPrimaryKeys = false, cfg.tsPrecision)
    GraftFunctions.md5Signed64(pkConcat) % cfg.sparseMod === 0
  }

  def sparseDigest(df: DataFrame, spec: TableSpec, cfg: VerifyConfig): String =
    if (spec.pks.lengthCompare(1) <= 0)
      digestOrdered(hashedRows(df.filter(sparseFilter(df, spec, cfg)), spec, cfg))
        .getOrElse(NoRows)
    else sparseDigestSemiJoin(df, spec, cfg)

  /** The reference's literal sparse formulation — `WHERE pk IN (SELECT pk
    * FROM t WHERE <P7>) AND pk2 IN (...)`, one independent subquery per PK
    * column (/root/reference/query.go:186-205) — as chained left-semi joins.
    * This is the production path for composite PKs (the per-column IN form is
    * NOT equivalent to the joint filter there; see [[sparseFilter]]).
    */
  def sparseDigestSemiJoin(df: DataFrame, spec: TableSpec, cfg: VerifyConfig): String = {
    val sampled = df.filter(sparseFilter(df, spec, cfg))
    val selected = spec.pks.foldLeft(df) { (acc, pk) =>
      acc.join(sampled.select(col(pk)), Seq(pk), "left_semi")
    }
    digestOrdered(hashedRows(selected, spec, cfg)).getOrElse(NoRows)
  }

  /** bookend mode — first and last `limit` rows in PK order, digested
    * separately and combined (/root/reference/query.go:231-277). Spark plans
    * the ORDER BY+LIMIT as TakeOrderedAndProject (no full sort/shuffle).
    *
    * Combine wart, replicated deliberately: the reference's outer
    * `md5(CONCAT(starthash::TEXT, endhash::TEXT))` casts TABLE ALIASES to
    * text, and PG renders a one-column row as a parenthesized literal — so
    * the combined hash is over `(<md5>)(<md5>)`, an empty side contributing
    * `()` (string_agg NULL inside the row renders empty). PgLiveSpec pins
    * this against a live server; the DuckDB twin (OracleSql.bookend)
    * replicates the same parens.
    */
  def bookendDigest(df: DataFrame, spec: TableSpec, cfg: VerifyConfig): String = {
    // persist the (k, h) projection: both bookend sides scan it, and without
    // the barrier the full canonicalize+hash pass runs twice (the first
    // TakeOrdered action populates the cache; the second reads it)
    val kh = hashedRows(df, spec, cfg).persist()
    try bookendFromKh(kh, cfg)
    finally kh.unpersist(blocking = false)
  }

  /** Bookend over an existing (k, h) frame — shared by [[bookendDigest]] and
    * the multi-mode path so the algorithm exists exactly once.
    */
  private def bookendFromKh(kh: DataFrame, cfg: VerifyConfig): String = {
    val start = kh.orderBy(col("k").asc, col("h").asc).limit(cfg.bookendLimit)
      .select(col("h")).collect().map(_.getString(0))
    val end = kh.orderBy(col("k").desc, col("h").desc).limit(cfg.bookendLimit)
      .select(col("h")).collect().map(_.getString(0))
    val startHash = if (start.isEmpty) "" else Digests.md5OfConcat(start.iterator)
    val endHash = if (end.isEmpty) "" else Digests.md5OfConcat(end.iterator)
    Digests.md5OfConcat(Iterator("(", startHash, ")(", endHash, ")"))
  }

  /** rowcount mode — `SELECT count(*)::TEXT` (/root/reference/query.go:279-283). */
  def rowCountDigest(df: DataFrame): String = df.count().toString

  /** stats mode (our extension beyond the reference's four): a per-column
    * statistics fingerprint — row count plus, for every compared column,
    * (non-null count, min, max) over the CANONICAL text form, concatenated
    * with '|' separators in [[Canon.hashColumnOrder]] and MD5'd.
    *
    * Min/max compare the canonical STRINGS (binary UTF-8 order on both
    * engines), not native values — the digest needs only that both engines
    * pick the same element of an identical string set, never per-type
    * min/max semantics, so one rule covers the full type matrix. Column
    * names are lowercased in the digest for heterogeneous-catalog parity
    * (Derby's `R_REGIONKEY` and PG's `r_regionkey` must fingerprint alike).
    *
    * Scale shape: this is the CHEAP first-pass check for a nightly 100 TB
    * verify — one scan, map-side partial aggregation, a single scalar to the
    * driver. No per-row MD5, no sort, no join, and (unlike every hash mode)
    * no PK requirement, so it also covers P8-skipped tables. Sensitivity is
    * deliberately weaker than the hash modes: a drift that preserves every
    * column's count/min/max (e.g. swapping two mid-range values) passes —
    * run it as the screen, the Merkle/full digest as the confirm.
    */
  /** Mirror of Spark's hash-partitioning hashability rule: MapType is
    * rejected wherever it appears in the type tree, not just top-level.
    */
  private[core] def typeContainsMap(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: StructType => s.fields.exists(f => typeContainsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => typeContainsMap(a.elementType)
      case _ => false
    }

  def statsDigest(df: DataFrame, spec: TableSpec, cfg: VerifyConfig): String = {
    // spread before the aggregate for the same single-row-group reason as
    // [[hashedRows]] — the per-column canonText evaluation for min/max is
    // the CPU stage. No PK requirement here (stats covers P8 tables), so
    // key on the whole row; count/min/max are commutative, result unchanged.
    // key on the hashable columns only: hash partitioning rejects MapType
    // at ANY nesting depth (a struct/array wrapping a map is just as
    // unhashable — r13 advisor), and stats must stay computable for every
    // table shape; when nothing hashable remains, no spread
    val keyCols = df.schema.fields.filterNot(f => typeContainsMap(f.dataType))
      .map(f => col(f.name)).toSeq
    val spreadDf =
      if (keyCols.isEmpty) df else Readers.spreadBySize(df, struct(keyCols: _*))
    spreadDf.agg(statsDigestCol(df.schema, spec, cfg).as("fp")).head().getString(0)
  }

  /** The stats fingerprint as a single aggregate Column over `schema`'s
    * compared columns — the batch mode above and the streaming continuous
    * variant ([[graft.streaming.EventStreams.runningStats]]) share it, so the
    * two can never drift. Every piece (count, min, max) is a commutative
    * monotone aggregate under APPEND-ONLY input, which is what makes the
    * streaming twin exact: the running digest equals the batch digest of
    * everything ingested so far. Deletes/updates break min/max monotonicity —
    * re-verification after mutation is the Merkle snapshot's job.
    */
  def statsDigestCol(schema: StructType, spec: TableSpec, cfg: VerifyConfig): Column = {
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = Canon.hashColumnOrder(schema.fields.map(_.name).filter(spec.validColumn).toSeq)
    val pieces: Seq[Column] = cols.flatMap { name =>
      val canon =
        if (spec.jsonColumns.exists(_.equalsIgnoreCase(name))) Canon.canonJson(col(name))
        else Canon.canonText(col(name), byName(name), cfg.tsPrecision)
      Seq(lit("|" + name.toLowerCase + "|"),
        count(col(name)).cast(StringType),
        lit("|"), coalesce(min(canon), lit("")),
        lit("|"), coalesce(max(canon), lit("")))
    }
    when(count(lit(1)) === 0, lit(NoRows))
      .otherwise(md5(concat(count(lit(1)).cast(StringType) +: pieces: _*)))
  }

  /** Order-insensitive fingerprint (our extension): the SUM of each row
    * hash's signed-64 reinterpretation, accumulated exactly in
    * DECIMAL(38,0) (no overflow before ~10¹⁹ rows). The sum is commutative
    * and associative, so the aggregate combines map-side, is independent of
    * partitioning, and — unlike the ordered digest, which must re-sort all
    * history — is INCREMENTALLY MAINTAINABLE: the streaming variant
    * ([[graft.streaming.EventStreams.runningFingerprint]]) folds each
    * micro-batch into one decimal per group. The price: it cannot
    * distinguish reorderings of the same row multiset — exactly the
    * property that makes it incremental; value-sum cancellation collisions
    * are ~2⁻⁶⁴.
    */
  def unorderedDigestCol(schema: StructType, spec: TableSpec, cfg: VerifyConfig): Column =
    sum(graft.functions.GraftFunctions.md5Signed64(
      Canon.rowHash(schema, schema.fieldNames.filter(spec.validColumn).toSeq,
        cfg.tsPrecision, spec.jsonColumns)).cast(DecimalType(38, 0)))

  def unorderedDigest(df: DataFrame, spec: TableSpec, cfg: VerifyConfig): String = {
    val r = df.agg(unorderedDigestCol(df.schema, spec, cfg).as("d")).head()
    if (r.isNullAt(0)) NoRows else r.getDecimal(0).toBigInteger.toString
  }

  /** Scalable Merkle fingerprint (our extension; SURVEY.md §4). Deterministic
    * across partitioning and cluster size: bucket ids derive from the row's PK
    * MD5, per-bucket digests order rows by (k, h), and the final digest folds
    * bucket digests in bucket-id order. One shuffle (groupBy bucket); the
    * per-bucket ordered aggregation is built-in codegen'd
    * `array_sort(collect_list(struct))`, memory-bounded by bucket sizing.
    */
  def merkleBucketDigests(df: DataFrame, spec: TableSpec, cfg: VerifyConfig, buckets: Int): DataFrame =
    merkleBucketsFromKh(hashedRows(df, spec, cfg), buckets)

  private def merkleBucketsFromKh(kh: DataFrame, buckets: Int): DataFrame =
    kh.withColumn("bucket", GraftFunctions.md5Bucket(col("k"), buckets))
      .groupBy(col("bucket"))
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("k"), col("h")))), s => s.getField("h")),
        "")).as("bucket_hash"))

  private def merkleFromKh(kh: DataFrame, buckets: Int): String = {
    val parts = merkleBucketsFromKh(kh, buckets).orderBy(col("bucket")).collect()
    if (parts.isEmpty) NoRows
    else Digests.md5OfConcat(parts.iterator.map(_.getString(1)))
  }

  def merkleDigest(df: DataFrame, spec: TableSpec, cfg: VerifyConfig, buckets: Int): String =
    merkleFromKh(hashedRows(df, spec, cfg), buckets)

  /** Incremental re-verification (our extension): persist the per-bucket
    * digest vector a [[merkleDigest]] computes and then discards, so the next
    * run diffs bucket vectors instead of re-verifying the whole table — the
    * "verify 100 TB nightly" shape. A changed row flips exactly its bucket;
    * [[merkleChangedBuckets]] names the flipped buckets and [[RowDiff]] can
    * then drill into ~1/buckets of the data. The reference re-reads
    * everything every run (its only mitigation is sparse mode,
    * /root/reference/query.go:186-205).
    */
  def writeMerkleSnapshot(df: DataFrame, spec: TableSpec, cfg: VerifyConfig,
                          buckets: Int, path: String): Unit =
    writeMerkleSnapshotVector(merkleBucketDigests(df, spec, cfg, buckets), buckets, path)

  /** Persist an already-computed bucket vector — the one authority on the
    * snapshot format: `n_buckets` rides along as metadata because a diff
    * between vectors built with different bucket counts is meaningless mass
    * drift, and the read side must be able to refuse it loudly.
    */
  def writeMerkleSnapshotVector(vector: DataFrame, buckets: Int, path: String): Unit =
    vector.withColumn("n_buckets", lit(buckets))
      .write.mode("overwrite").parquet(path)

  /** Read a snapshot, failing loudly when it was built with a different
    * bucket count than `expectBuckets` (pass None to skip the check). An
    * EMPTY snapshot (zero-row table at write time) carries no metadata rows
    * and compares against anything.
    */
  def readMerkleSnapshot(spark: org.apache.spark.sql.SparkSession, path: String,
                         expectBuckets: Option[Int] = None): DataFrame = {
    val snap = spark.read.parquet(path)
    for (expected <- expectBuckets if snap.columns.contains("n_buckets");
         actualRow <- snap.select("n_buckets").head(1).headOption) {
      val actual = actualRow.getInt(0)
      require(actual == expected,
        s"Merkle snapshot at $path was built with $actual buckets, run expects " +
          s"$expected — bucket vectors with different widths cannot be compared " +
          s"(re-baseline or pass --merkle-buckets $actual)")
    }
    snap.drop("n_buckets")
  }

  /** Buckets whose digest differs between two snapshot vectors: `changed`
    * (both sides, different digest), `appeared` (bucket gained its first
    * rows), `vanished` (bucket lost all rows). Output is buckets-sized
    * (≤ `merkleBuckets` rows), never data-sized.
    */
  def merkleChangedBuckets(prev: DataFrame, curr: DataFrame): DataFrame =
    prev.select(col("bucket"), col("bucket_hash").as("prev_hash"))
      .join(curr.select(col("bucket"), col("bucket_hash").as("curr_hash")),
        Seq("bucket"), "full_outer")
      .filter(!(col("prev_hash") <=> col("curr_hash")))
      .select(col("bucket"),
        coalesce(col("prev_hash"), lit("")).as("prev_hash"),
        coalesce(col("curr_hash"), lit("")).as("curr_hash"),
        when(col("prev_hash").isNull, "appeared")
          .when(col("curr_hash").isNull, "vanished")
          .otherwise("changed").as("status"))

  /** Mode dispatch — /root/reference/verify.go:205-232. */
  def runMode(mode: String, df: DataFrame, spec: TableSpec, cfg: VerifyConfig): String = mode match {
    case TestModes.Full     => fullDigest(df, spec, cfg)
    case TestModes.Sparse   => sparseDigest(df, spec, cfg)
    case TestModes.Bookend  => bookendDigest(df, spec, cfg)
    case TestModes.RowCount => rowCountDigest(df)
    case TestModes.Stats    => statsDigest(df, spec, cfg)
    case other => throw new IllegalArgumentException(s"unknown test mode $other")
  }

  /** All requested modes over one table with the canonicalize+hash projection
    * computed ONCE: the (k, h, sparse-key) frame persists across modes
    * instead of re-canonicalizing per mode (a multi-mode run is the common
    * case — /root/reference/verify.go:205-232 loops modes per table the same
    * way but pays the scan each time server-side). Per-mode failures degrade
    * to the `(err)` sentinel like the reference (X3).
    */
  def runModes(modes: Seq[String], df: DataFrame, spec: TableSpec, cfg: VerifyConfig): Map[String, String] = {
    import scala.util.Try
    val needsHash = modes.exists(m => m != TestModes.RowCount && m != TestModes.Stats)
    // (k, h, sparse-key) computed once and persisted across modes; building
    // the plan throws for tables whose PK columns are missing — each hash
    // mode then degrades to the (err) sentinel below
    // pk columns ride along (aliased positionally so they can't collide with
    // k/h/sk) for the composite-PK sparse semantics, which semi-join per column
    val khOpt: Option[(DataFrame, Long)] = if (!needsHash) None else Try {
      // same pre-projection spread as [[hashedRows]] (r13): the one-off
      // canonicalize+hash pass must not pipeline into a single scan task
      // when the input is unsplittable (missing PK columns still throw
      // inside this Try — the per-mode (err) degrade is unchanged)
      val src = if (spec.pks.nonEmpty) Readers.spreadBySize(df, col(spec.pks.head)) else df
      val kh = src.select(
        Canon.pkSortKey(df.schema, spec.pks, cfg.hashPrimaryKeys, cfg.tsPrecision).as("k") +:
          Canon.rowHash(df.schema, hashableColumns(df, spec), cfg.tsPrecision, spec.jsonColumns).as("h") +:
          GraftFunctions.md5Signed64(
            Canon.pkSortKey(df.schema, spec.pks, hashPrimaryKeys = false, cfg.tsPrecision)).as("sk") +:
          spec.pks.zipWithIndex.map { case (p, i) => col(p).as(s"__pk$i") }: _*)
        .persist()
      val n = kh.count() // materialize once so every mode reads the cache
      (kh, n)
    }.toOption
    val out = modes.map { mode =>
      mode -> Try {
        mode match {
          case TestModes.RowCount => rowCountDigest(df)
          // aggregates over df directly (not the kh projection): stats has no
          // per-row hash and no PK need, so it stays computable for tables
          // every hash mode (err)s on
          case TestModes.Stats => statsDigest(df, spec, cfg)
          case TestModes.Full =>
            val (kh, n) = khOpt.get
            // scale guard: past the row limit the exact digest's driver-side
            // collect is the 100TB killer — degrade to the Merkle digest
            // (same sensitivity, parallel combine, different literal value)
            if (n > cfg.fullModeRowLimit) degradeToMerkle(kh, cfg)
            else digestOrdered(kh.select(col("k"), col("h")), Some(n),
              cfg.streamingCollectRowLimit).getOrElse(NoRows)
          case TestModes.Sparse =>
            // the sampled set is ~1/sparseMod of the table — still collect-
            // hazardous at scale, so both paths count before digesting
            val kh = khOpt.get._1
            val sampled = kh.filter(col("sk") % cfg.sparseMod === 0)
            if (spec.pks.lengthCompare(1) <= 0)
              // a filter over the persisted kh: the guarding count and the
              // digest are both cached-frame scans
              digestOrdered(sampled.select(col("k"), col("h")), Some(sampled.count()),
                cfg.streamingCollectRowLimit).getOrElse(NoRows)
            else {
              // the chained semi-joins are NOT covered by kh's persist —
              // materialize them once so the guarding count doesn't run the
              // whole join tree a second time when the digest evaluates
              val selected = spec.pks.indices.foldLeft(kh) { (acc, i) =>
                acc.join(sampled.select(col(s"__pk$i")), Seq(s"__pk$i"), "left_semi")
              }.select(col("k"), col("h")).persist()
              try digestOrdered(selected, Some(selected.count()),
                cfg.streamingCollectRowLimit).getOrElse(NoRows)
              finally selected.unpersist(blocking = false)
            }
          case TestModes.Bookend => bookendFromKh(khOpt.get._1.select(col("k"), col("h")), cfg)
          case other => throw new IllegalArgumentException(s"unknown test mode $other")
        }
      }.getOrElse(Err)
    }.toMap
    khOpt.foreach(_._1.unpersist(blocking = false))
    out
  }
}
