package graft

import org.apache.spark.sql.functions._

import graft.core._

/** The multi-target pipeline: fan-out, merge (A3), consistency diff (A4) and
  * pivot report (A5) over real fixture parquet — agree on identical targets,
  * flag a perturbed target (/root/reference/integration_test.go:294-398).
  */
class ReportSpec extends SparkSpec {

  private val cfg = VerifyConfig(modes = Seq(TestModes.Full, TestModes.RowCount, TestModes.Bookend),
    bookendLimit = 20)
  private val tables = Seq("region", "nation", "customer")

  test("identical targets agree: no inconsistencies, full pivot report") {
    val targets = Seq(ParquetTarget("alpha", sfDir), ParquetTarget("beta", sfDir))
    val results = VerifyRun.run(spark, targets, Fixtures.specs, cfg, includeTables = tables)
    assert(results.count() == tables.size * cfg.modes.size * targets.size)
    assert(VerifyRun.inconsistencies(results, targets.size).count() == 0)
    val report = VerifyRun.pivotReport(results, cfg.modes)
    assert(report.count() == tables.size * targets.size)
    assert(report.columns.toSeq == Seq("schema", "table", "target", "bookend", "full", "rowcount"))
  }

  test("fan-out generalizes past pairs: 3 targets, one perturbed, only it disagrees") {
    val targets = Seq(
      ParquetTarget("alpha", sfDir), ParquetTarget("beta", sfDir),
      ParquetTarget("gamma", sfDir,
        tweaks = Map("region" -> (df => df.filter(col("r_regionkey") =!= 0)))))
    val results = VerifyRun.run(spark, targets, Fixtures.specs, cfg, includeTables = tables)
    assert(results.count() == tables.size * cfg.modes.size * targets.size)
    val bad = VerifyRun.inconsistencies(results, targets.size)
    // only region disagrees; the diff logic keys on n_outputs, not pair-ness
    assert(bad.select("table").distinct().collect().map(_.getString(0)).toSeq == Seq("region"))
    // the merged view shows alpha+beta on one output, gamma alone on another
    val merged = VerifyRun.merged(results)
      .filter(col("table") === "region" && col("mode") === TestModes.RowCount)
    assert(merged.count() == 2)
    assert(merged.filter(array_join(col("targets"), ",") === "alpha,beta").count() == 1)
  }

  test("a perturbed target is flagged by every affected mode") {
    val perturbed = ParquetTarget("beta", sfDir,
      tweaks = Map("customer" -> (df => df.filter(col("c_custkey") =!= 1))))
    val targets = Seq(ParquetTarget("alpha", sfDir), perturbed)
    val results = VerifyRun.run(spark, targets, Fixtures.specs, cfg, includeTables = tables)
    val bad = VerifyRun.inconsistencies(results, targets.size).collect()
    // only customer disagrees, on all three modes (row 1 is inside the bookend window)
    assert(bad.map(_.getString(1)).distinct.toSeq == Seq("customer"))
    assert(bad.map(_.getString(2)).sorted.toSeq == Seq("bookend", "full", "rowcount"))
  }

  test("an unreachable target aborts the run up front (S6 fail-fast)") {
    val targets = Seq(ParquetTarget("alpha", sfDir), ParquetTarget("ghost", "/nonexistent"))
    val e = intercept[IllegalStateException] {
      VerifyRun.run(spark, targets, Fixtures.specs, cfg, includeTables = tables)
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("a failing table leaves the (err) sentinel and is flagged") {
    val broken = ParquetTarget("beta", sfDir,
      tweaks = Map("region" -> (df => df.select(col("r_name"))))) // drops the PK column
    val targets = Seq(ParquetTarget("alpha", sfDir), broken)
    val results = VerifyRun.run(spark, targets, Fixtures.specs, cfg, includeTables = Seq("region"))
    val outputs = results.filter(col("target") === "beta").select("mode", "output")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // hash modes need the PK and fail to the sentinel; rowcount still works
    assert(outputs(TestModes.Full) == Fingerprints.Err)
    assert(outputs(TestModes.Bookend) == Fingerprints.Err)
    assert(outputs(TestModes.RowCount) == "5")
    assert(VerifyRun.inconsistencies(results, targets.size).count() == 2)
    // ... and so does stats, which never touches the PK
    val withStats = VerifyRun.run(spark, targets, Fixtures.specs,
      cfg.copy(modes = Seq(TestModes.Stats)), includeTables = Seq("region"))
    val statsOut = withStats.filter(col("target") === "beta")
      .select("output").head().getString(0)
    assert(statsOut != Fingerprints.Err, statsOut)
  }

  test("schema diff: identical catalogs are empty; a migration diffs as exactly its drift") {
    val alpha = ParquetTarget("alpha", sfDir)
    assert(SchemaDiff.diff(
      SchemaDiff.catalog(spark, alpha, tables),
      SchemaDiff.catalog(spark, alpha, tables)).isEmpty)
    val drift = SparkEntry.queries("pv_diff_schema")(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(4))).toSeq.sorted
    assert(drift == Seq(("o_note", "missing_in_a"),
      ("o_orderdate", "type_changed"), ("o_orderpriority", "missing_in_b")))
  }

  test("orphan audit: intact FK edges count zero, the dangling band counts exactly") {
    val rows = SparkEntry.queries("pv_orphans")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("customer.c_nationkey->nation.n_nationkey")._2 == 0)
    assert(rows("lineitem.l_orderkey->orders.o_orderkey")._2 == 0)
    assert(rows("lineitem.l_partkey->part.p_partkey")._2 == 0)
    // the perturbed edge dangles one key band — exactly the band's size
    val orders = graft.core.Readers.fixture(spark, sfDir, "orders")
    val band = orders.filter(col("o_orderkey") % 1000 === 13).count()
    assert(band > 0 && rows("orders.o_custkey->customer.c_custkey")._2 == band)
    // dims marked broadcastable must actually broadcast (no fact-side shuffle)
    val plan = SparkEntry.queries("pv_orphans")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
