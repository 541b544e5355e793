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

  test("KMV set algebra: exhaustive segments exact, estimates bounded, self-consistent") {
    import graft.operators.Sketches
    val orders = Readers.fixture(spark, sfDir, "orders")
    def seg(p: String) = orders.filter(col("o_orderpriority") === p)
      .select(col("o_custkey").as("k")).distinct()
    val (a, b) = (seg("1-URGENT"), seg("5-LOW"))

    // exhaustive case (k above both segment sizes): θ = 2⁶⁴, every estimate
    // IS the exact distinct count of the hash-set algebra
    val bigK = Sketches.kmvSetOps(a, col("k"), b, col("k"), k = 100000)
      .map { case (op, n, est) => op -> (n, est) }.toMap
    val exactInt = a.intersect(b).count()
    val exactUni = a.union(b).distinct().count()
    assert(bigK("intersect") == ((exactInt, exactInt)), bigK.toString)
    assert(bigK("union") == ((exactUni, exactUni)), bigK.toString)
    assert(bigK("a_minus_b")._2 == a.count() - exactInt, bigK.toString)

    // sketched case (k=32 below the ~130-key segments, so θ < 2⁶⁴ and the
    // scale-up is live): partitioning-invariant, internally consistent
    // (kept hashes of a∖b and a∩b partition fa, so their sum is ≤ union's),
    // and within a generous relative band of exact — RSE ≈ 1/√(k−2) ≈ 18%
    val est = Sketches.kmvSetOps(a, col("k"), b, col("k"), k = 32)
      .map { case (op, n, e) => op -> (n, e) }.toMap
    val est2 = Sketches.kmvSetOps(a.repartition(7), col("k"),
      b.repartition(5), col("k"), k = 32)
      .map { case (op, n, e) => op -> (n, e) }.toMap
    assert(est == est2, s"partitioning changed the sketch: $est vs $est2")
    assert(est("a_minus_b")._1 + est("intersect")._1 <= est("union")._1, est.toString)
    assert(math.abs(est("union")._2 - exactUni).toDouble / exactUni < 0.55,
      s"union est=${est("union")} exact=$exactUni")
    assert(math.abs(est("intersect")._2 - exactInt).toDouble / exactInt < 0.75,
      s"intersect est=${est("intersect")} exact=$exactInt")
  }

  test("HLL distinct sketch: within 3 sigma of exact, partitioning-invariant") {
    import graft.operators.Sketches
    val li = Readers.fixture(spark, sfDir, "lineitem")
    val exact = li.agg(countDistinct(col("l_partkey"))).head().getLong(0)
    val est = Sketches.hllDistinct(li, col("l_partkey"))
    // HLL relative standard error ≈ 1.04/sqrt(m) = 6.5% at m=256; 3σ bound
    assert(math.abs(est - exact).toDouble / exact < 0.20, s"exact=$exact est=$est")
    // register merge is a max — any partitioning yields the identical sketch
    assert(Sketches.hllDistinct(li.repartition(7), col("l_partkey")) == est)
  }

  test("Count-Min sketch never underestimates and is exact for unique lanes") {
    import graft.operators.Sketches
    import spark.implicits._
    val ev = Readers.fixture(spark, sfDir, "events")
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
    val counters = Sketches.cmsCounters(ev, col("user_id"), 4, 512)
    val est = Sketches.cmsEstimates(counters, exact, "user_id", 4, 512)
    val joined = exact.join(est, col("user_id") === col("key"))
      .select(col("n_exact"), col("cms_count")).as[(Long, Long)].collect()
    assert(joined.nonEmpty)
    // the one-sided guarantee: every estimate >= the true count
    assert(joined.forall { case (n, c) => c >= n },
      s"CMS underestimated: ${joined.filter { case (n, c) => c < n }.take(3).mkString(",")}")
  }

  test("cmsEstimatesSparse: absent key reads zero on untouched buckets, one-sided for present keys") {
    import graft.operators.Sketches
    import spark.implicits._
    // sketch a tiny stream; probe keys that never occurred — with 3 distinct
    // inserted keys in a 4x512 sketch, some probe must land on all-empty
    // lanes and MUST read 0 (the inner-join probe would drop or overestimate)
    val stream = Seq("a", "a", "b", "c").toDF("k")
    val counters = Sketches.cmsCounters(stream, col("k"), 4, 512)
    val probes = (Seq("a", "b", "c") ++ (1 to 40).map(i => s"absent$i")).toDF("k")
    val got = Sketches.cmsEstimatesSparse(counters, probes, "k", 4, 512)
      .as[(String, Long)].collect().toMap
    assert(got("a") >= 2 && got("b") >= 1 && got("c") >= 1)
    val absents = (1 to 40).map(i => got(s"absent$i"))
    assert(absents.forall(_ >= 0) && absents.count(_ == 0) > 30,
      s"expected mostly exact zeros for absent keys, got $absents")
    // sparse == inner-join probe wherever the key is present
    val inner = Sketches.cmsEstimates(counters, Seq("a", "b", "c").toDF("k"), "k", 4, 512)
      .as[(String, Long)].collect().toMap
    assert(Seq("a", "b", "c").forall(k => got(k) == inner(k)))
  }

  test("CMS inner product brackets the exact join size: exact <= est <= L1·L1") {
    import graft.operators.Sketches
    val (depth, width) = (4, 4096)
    val ev = Readers.fixture(spark, sfDir, "events")
    val a = ev.filter(col("event_type") === "click").select(col("user_id"))
    val b = ev.filter(col("event_type") === "view").select(col("user_id"))
    val est = Sketches.cmsInnerProduct(
      Sketches.cmsCounters(a, col("user_id"), depth, width),
      Sketches.cmsCounters(b, col("user_id"), depth, width))
      .head().getLong(0)
    val exact = a.join(b, "user_id").count()
    val (l1a, l1b) = (a.count(), b.count())
    // lower bound is structural (collision cross-terms only ADD); upper is
    // the certain Σ cA·cB <= (Σ cA)(Σ cB) envelope, no probability involved
    assert(est >= exact, s"inner product underestimated: $est < $exact")
    assert(est <= l1a * l1b, s"inner product exceeded the L1 envelope: $est > ${l1a * l1b}")
    // a wide sketch on this fixture should sit well inside the envelope —
    // a broken hash family (all lanes colliding) would pin est at L1·L1
    assert(est <= exact + (l1a * l1b) / width * 4,
      s"est $est implausibly loose vs exact $exact (bound ${exact + (l1a * l1b) / width * 4})")
  }

  test("hllEstimateByGroup (Column arithmetic) equals the driver-side fold bit-for-bit") {
    import graft.operators.Sketches
    val spark2 = spark; import spark2.implicits._
    val ev = Readers.fixture(spark, sfDir, "events")
    val regs = graft.streaming.EventStreams.runningHll(ev, "event_type", "user_id")
    val colEst = Sketches.hllEstimateByGroup(regs, "event_type")
      .as[(String, Long)].collect().toMap
    val fold = regs.select(col("event_type"), col("m_rho").cast("int"))
      .as[(String, Int)].collect().groupBy(_._1)
      .map { case (t, rs) => t -> Sketches.hllEstimateFromRegisters(rs.map(_._2).toIndexedSeq) }
    assert(colEst == fold, s"column estimator diverged: $colEst vs $fold")
    // small-range (linear-counting) branch: 20 distinct keys leave most
    // registers empty, so the correction path must agree too
    val tiny = (0 until 20).map(i => ("g", s"k$i")).toDF("g", "k")
    val tregs = graft.streaming.EventStreams.runningHll(tiny, "g", "k")
    val tCol = Sketches.hllEstimateByGroup(tregs, "g").as[(String, Long)].head()._2
    val tFold = Sketches.hllEstimateFromRegisters(
      tregs.select(col("m_rho").cast("int")).as[Int].collect().toIndexedSeq)
    assert(tCol == tFold, s"linear-counting branch diverged: $tCol vs $tFold")
  }

  test("CMS inner product: a zero-collision lane survives into the min (disjoint keys)") {
    import graft.operators.Sketches
    // a wide sketch over two tiny DISJOINT key sets: with high probability at
    // least one lane has zero colliding buckets, whose inner product is 0 —
    // the correct (and exact) estimate. An inner-join-only implementation
    // drops those lanes and reports the loosest surviving lane instead (or
    // no rows at all when nothing collides anywhere)
    val spark2 = spark; import spark2.implicits._
    val a = (0 until 20).map(i => s"left_$i").toDF("k")
    val b = (0 until 20).map(i => s"right_$i").toDF("k")
    val (depth, width) = (4, 1 << 20)
    val est = Sketches.cmsInnerProduct(
      Sketches.cmsCounters(a, col("k"), depth, width),
      Sketches.cmsCounters(b, col("k"), depth, width))
    val rows = est.collect()
    assert(rows.length == 1, s"expected one estimate row, got ${rows.length}")
    assert(rows(0).getLong(0) == 0L,
      s"disjoint 20x20 keys at width=$width should estimate 0, got ${rows(0).getLong(0)}")
  }
}
