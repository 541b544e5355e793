package graft

import org.apache.spark.sql.functions._

import graft.core._
import graft.functions.{Digests, OrderedConcatMd5}

/** Port of the reference's agree/disagree integration strategy
  * (/root/reference/integration_test.go): identical targets agree on every
  * mode; a perturbed target (row added / removed / value changed) must flip
  * every mode that can see the change. Plus invariance properties from
  * SURVEY.md §5(d).
  */
class FingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = VerifyConfig(bookendLimit = 10)
  private val spec = TableSpec("t", Seq("id"))

  private def df(rows: (Int, String, Double)*) =
    rows.toSeq.toDF("id", "s", "d")

  private val base = df((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5), (4, "d", 4.5))

  test("identical frames agree on every mode") {
    val other = df((4, "d", 4.5), (2, "b", 2.5), (3, "c", 3.5), (1, "a", 1.5)) // shuffled rows
    for (mode <- TestModes.All) {
      assert(Fingerprints.runMode(mode, base, spec, cfg)
        == Fingerprints.runMode(mode, other, spec, cfg), s"mode $mode")
    }
  }

  test("full digest is invariant under partitioning") {
    assert(Fingerprints.fullDigest(base.repartition(7), spec, cfg)
      == Fingerprints.fullDigest(base.coalesce(1), spec, cfg))
  }

  test("a changed value flips full/sparse-visible digests but not rowcount") {
    val changed = df((1, "a", 1.5), (2, "XXX", 2.5), (3, "c", 3.5), (4, "d", 4.5))
    assert(Fingerprints.fullDigest(base, spec, cfg) != Fingerprints.fullDigest(changed, spec, cfg))
    assert(Fingerprints.rowCountDigest(base) == Fingerprints.rowCountDigest(changed))
    assert(Fingerprints.bookendDigest(base, spec, cfg) != Fingerprints.bookendDigest(changed, spec, cfg))
  }

  test("an extra row flips every mode (the reference negative test)") {
    val extra = df((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5), (4, "d", 4.5), (5, "e", 5.5))
    assert(Fingerprints.fullDigest(base, spec, cfg) != Fingerprints.fullDigest(extra, spec, cfg))
    assert(Fingerprints.bookendDigest(base, spec, cfg) != Fingerprints.bookendDigest(extra, spec, cfg))
    assert(Fingerprints.rowCountDigest(base) != Fingerprints.rowCountDigest(extra))
    assert(Fingerprints.statsDigest(base, spec, cfg) != Fingerprints.statsDigest(extra, spec, cfg))
  }

  test("stats digest: sensitivity is count/min/max of the canonical text, by design") {
    val s = Fingerprints.statsDigest(base, spec, cfg)
    // a min-breaking change flips it ...
    assert(s != Fingerprints.statsDigest(
      df((1, "A", 1.5), (2, "b", 2.5), (3, "c", 3.5), (4, "d", 4.5)), spec, cfg))
    // ... a NULL flips it (non-null count drops, even with min/max intact) ...
    val withNull = Seq((1, Some("a"), 1.5), (2, None: Option[String], 2.5),
      (3, Some("c"), 3.5), (4, Some("d"), 4.5)).toDF("id", "s", "d")
    assert(s != Fingerprints.statsDigest(withNull, spec, cfg))
    // ... but a mid-range swap that preserves every column's stats passes —
    // the documented screen-vs-confirm trade (Fingerprints.statsDigest)
    val swapped = df((1, "a", 2.5), (2, "b", 1.5), (3, "c", 3.5), (4, "d", 4.5))
    assert(s == Fingerprints.statsDigest(swapped, spec, cfg))
    // and the empty table takes the sentinel, like the hash modes
    assert(Fingerprints.statsDigest(base.limit(0), spec, cfg) == Fingerprints.NoRows)
  }

  test("stats digest needs no primary key (covers P8-skipped tables)") {
    val noPk = TableSpec("t", Seq.empty)
    val viaRunModes = Fingerprints.runModes(Seq(TestModes.Stats), base, noPk, cfg)
    assert(viaRunModes(TestModes.Stats) == Fingerprints.statsDigest(base, noPk, cfg))
    assert(viaRunModes(TestModes.Stats) != Fingerprints.Err)
  }

  test("streamed exact digest equals collect() digest across the threshold") {
    // the toLocalIterator path must be byte-identical to the collect() path
    // it replaces past streamingCollectRowLimit; force the threshold to both
    // sides of a 200k-row frame (DigestProbe measures the same equivalence
    // plus driver peak heap at 12M rows — numbers in IMPLEMENTATION.md)
    val big = spark.range(200000).select(col("id"),
      concat(lit("payload-"), col("id")).as("s"))
    val base = VerifyConfig(fullModeRowLimit = Long.MaxValue)
    val viaCollect = Fingerprints.fullDigest(big, TableSpec("t", Seq("id")),
      base.copy(streamingCollectRowLimit = Long.MaxValue))
    val viaStream = Fingerprints.fullDigest(big, TableSpec("t", Seq("id")),
      base.copy(streamingCollectRowLimit = 1L))
    assert(viaCollect == viaStream)
  }

  test("incremental Merkle: one perturbed row flips exactly one bucket; snapshot round-trips") {
    val orders = Readers.fixture(spark, sfDir, "orders")
    val ospec = Fixtures.specs("orders")
    val buckets = 64
    val prev = Fingerprints.merkleBucketDigests(orders, ospec, cfg, buckets)
    // identical data → empty diff
    assert(Fingerprints.merkleChangedBuckets(prev,
      Fingerprints.merkleBucketDigests(orders, ospec, cfg, buckets)).isEmpty)
    // perturb exactly one row's value
    val key = orders.agg(min(col("o_orderkey"))).head().getLong(0)
    val tweaked = orders.withColumn("o_totalprice",
      when(col("o_orderkey") === key, col("o_totalprice") + 1).otherwise(col("o_totalprice")))
    val curr = Fingerprints.merkleBucketDigests(tweaked, ospec, cfg, buckets)
    val changed = Fingerprints.merkleChangedBuckets(prev, curr).collect()
    assert(changed.length == 1 && changed.head.getAs[String]("status") == "changed")
    // a persisted snapshot diffs identically to the in-memory vector
    val dir = java.nio.file.Files.createTempDirectory("graft-merkle").toString
    Fingerprints.writeMerkleSnapshot(orders, ospec, cfg, buckets, dir)
    val snap = Fingerprints.readMerkleSnapshot(spark, dir)
    assert(Fingerprints.merkleChangedBuckets(snap, prev).isEmpty)
    assert(Fingerprints.merkleChangedBuckets(snap, curr).collect().toSeq == changed.toSeq)
  }

  test("bucket-scoped diff equals the full diff: differing rows always flip their bucket") {
    val orders = Readers.fixture(spark, sfDir, "orders")
    val ospec = Fixtures.specs("orders")
    val pert = orders.filter(col("o_orderkey") % 500 =!= 3)
      .withColumn("o_totalprice", when(col("o_orderkey") % 500 === 7,
        col("o_totalprice") + 1).otherwise(col("o_totalprice")))
    val buckets = 64
    val changed = Fingerprints.merkleChangedBuckets(
        Fingerprints.merkleBucketDigests(orders, ospec, cfg, buckets),
        Fingerprints.merkleBucketDigests(pert, ospec, cfg, buckets))
      .select("bucket").collect().map(_.getLong(0)).toSeq
    assert(changed.nonEmpty && changed.length < buckets)
    val full = RowDiff.diff(orders, pert, ospec).collect().toSeq
    val scoped = RowDiff.diffInBuckets(orders, pert, ospec, changed, buckets).collect().toSeq
    assert(scoped == full)
  }

  test("empty table digests to the no-rows sentinel") {
    val empty = base.filter(col("id") < 0)
    assert(Fingerprints.fullDigest(empty, spec, cfg) == Fingerprints.NoRows)
    assert(Fingerprints.sparseDigest(empty, spec, cfg) == Fingerprints.NoRows)
    assert(Fingerprints.rowCountDigest(empty) == "0")
  }

  test("sparse digest only hashes the deterministic 1/mod sample") {
    // with mod=1 every row is sampled: sparse == full
    assert(Fingerprints.sparseDigest(base, spec, cfg.copy(sparseMod = 1))
      == Fingerprints.fullDigest(base, spec, cfg))
  }

  test("bookend with limit >= n equals md5(full||full-reversed bookends)") {
    val d1 = Fingerprints.bookendDigest(base, spec, cfg.copy(bookendLimit = 100))
    val d2 = Fingerprints.bookendDigest(base.repartition(5), spec, cfg.copy(bookendLimit = 100))
    assert(d1 == d2)
  }

  test("hashPrimaryKeys changes the sort but stays deterministic") {
    val a = Fingerprints.fullDigest(base, spec, cfg.copy(hashPrimaryKeys = true))
    val b = Fingerprints.fullDigest(base.repartition(3), spec, cfg.copy(hashPrimaryKeys = true))
    assert(a == b)
  }

  test("merkle digest is partition-invariant and change-sensitive") {
    val a = Fingerprints.merkleDigest(base, spec, cfg, buckets = 8)
    val b = Fingerprints.merkleDigest(base.repartition(5), spec, cfg, buckets = 8)
    assert(a == b)
    val changed = df((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5), (4, "ZZ", 4.5))
    assert(a != Fingerprints.merkleDigest(changed, spec, cfg, buckets = 8))
  }

  test("OrderedConcatMd5 aggregator equals the streamed exact digest") {
    val kh = Fingerprints.hashedRows(base, spec, cfg)
    val agg = new OrderedConcatMd5().toColumn
    val viaAgg = kh.as[(String, String)].select(agg).head()
    assert(viaAgg == Fingerprints.fullDigest(base, spec, cfg))
  }

  test("column include/exclude filters change the hashed column set (P6)") {
    val withS = Fingerprints.fullDigest(base, spec.copy(excludeColumns = Seq("d")), cfg)
    val withD = Fingerprints.fullDigest(base, spec.copy(excludeColumns = Seq("s")), cfg)
    assert(withS != withD)
    val includeOnly = Fingerprints.fullDigest(base, spec.copy(includeColumns = Seq("id", "s")), cfg)
    assert(includeOnly == withS)
  }

  test("profile: nulls, exact distincts, deterministic mode, all-null column") {
    val rows = Seq[(java.lang.Long, String, String)](
      (1L, "a", null), (2L, "b", null), (3L, "a", null), (4L, null, null))
    val df = rows.toDF("id", "s", "z")
    val got = Profile.profile(df, df.schema, Seq("id", "s", "z"))
      .as[(String, Long, Long, Long, Option[String], Option[Long])]
      .collect().toSeq.sortBy(_._1)
    // id: unique -> distinct 4, mode ties break on smallest canonical value
    assert(got(0) == ("id", 4L, 0L, 4L, Some("1"), Some(1L)), s"id=${got(0)}")
    // s: 'a' twice beats 'b'; one null
    assert(got(1) == ("s", 4L, 1L, 2L, Some("a"), Some(2L)), s"s=${got(1)}")
    // z: all null -> no mode at all, not a '' mode
    assert(got(2) == ("z", 4L, 4L, 0L, None, None), s"z=${got(2)}")
  }
}
