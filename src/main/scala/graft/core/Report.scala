package graft.core

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One fingerprint cell, long/tidy form — the flattened analogue of the
  * reference's nested `SingleResult` maps (/root/reference/results.go:41-43).
  */
case class ResultRow(target: String, schema: String, table: String, mode: String, output: String)

/** The client-side dataflow of the reference re-hosted on Spark: per-target
  * parallel fan-out (X1), per-table/mode loop (X2), error containment (X3),
  * grouped merge (A3), consistency diff (A4), and the pivoted report (A5).
  */
object VerifyRun {

  /** Parquet targets have a single implicit schema. */
  val SchemaName = "main"

  /** `schema.table` catalog key → (schema, table); bare names (parquet) get
    * the implicit `main` schema — the reference keys results by the actual
    * (schema, table) pair (/root/reference/results.go:41-43).
    */
  def splitName(full: String): (String, String) = full.split("\\.", 2) match {
    case Array(s, t) => (s, t)
    case _ => (SchemaName, full)
  }

  /** One unit of per-target work: where the result rows are keyed (schema and
    * table in THIS target's physical catalog case), the name to read it by,
    * and the PK/column spec bound against this target's own catalog — the
    * analogue of the reference discovering columns per connection
    * (/root/reference/verify.go:146-198).
    */
  case class TableWork(schema: String, table: String, readName: String, spec: TableSpec)

  /** S6 fail-fast discovery: an unreachable or empty target aborts the whole
    * run before any fingerprint work (/root/reference/verify.go:33-61).
    */
  def discoverTables(spark: SparkSession, target: Target, schemas: SchemaFilter): Seq[String] =
    Try(target.tables(spark, schemas)) match {
      case Success(ts) if ts.nonEmpty => ts
      case Success(_) =>
        throw new IllegalStateException(s"target ${target.name} has no tables")
      case Failure(e) =>
        throw new IllegalStateException(s"target ${target.name} unreachable: ${e.getMessage}", e)
    }

  /** Generic fan-out with per-table error containment. The reference runs a
    * goroutine per TARGET (/root/reference/verify.go:66-77) and walks that
    * target's tables sequentially; here every (target, table) pair gets its
    * own `Future`, so Spark's scheduler interleaves ALL scans — with two
    * targets of two tables the wall time tends to the slowest single table,
    * not the slowest target's sum (measured ≈ 1 s off pv_inconsistency's
    * cold run at sf0.1 — the cold cost is dominated by per-plan codegen, so
    * the gain grows with tables per target). Concurrency is bounded by the
    * ExecutionContext (the default
    * global pool sizes to cores); a 1000-table catalog queues, it doesn't
    * oversubscribe. A failed table logs and degrades to `onError`'s row, the
    * run continues (X3) — shared by the fingerprint run and the
    * incremental-Merkle run so the fan-out and containment policy has one
    * authority.
    */
  def fanOutPerTarget[A](plans: Seq[(Target, Seq[TableWork])])(
      work: (Target, TableWork) => A)(onError: (Target, TableWork) => A)(
      implicit ec: ExecutionContext): Seq[A] = {
    val perPair = plans.flatMap { case (t, works) =>
      works.map { w =>
        Future {
          Try(work(t, w)) match {
            case Success(a) => a
            case Failure(e) =>
              System.err.println(s"[graft] ${t.name}/${w.readName} failed: ${e.getMessage}")
              onError(t, w)
          }
        }
      }
    }
    Await.result(Future.sequence(perPair), Duration.Inf)
  }

  /** Run every (target × table × mode) fingerprint over per-target plans;
    * failures leave the `(err)` sentinel
    * (/root/reference/verify.go:131,153-157).
    */
  def runPerTarget(spark: SparkSession, plans: Seq[(Target, Seq[TableWork])],
                   cfg: VerifyConfig)(
                   implicit ec: ExecutionContext = ExecutionContext.global): DataFrame = {
    val rows = fanOutPerTarget(plans) { (t, w) =>
      // all modes share one canonicalize+hash pass per table
      val outputs = Fingerprints.runModes(cfg.modes, t.read(spark, w.readName), w.spec, cfg)
      cfg.modes.map(mode => ResultRow(t.name, w.schema, w.table, mode, outputs(mode)))
    } { (t, w) =>
      cfg.modes.map(mode => ResultRow(t.name, w.schema, w.table, mode, Fingerprints.Err))
    }.flatten
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  /** Shared-spec convenience run: every target verifies the same catalog of
    * table specs (the fixture-parquet shape). Tables without a PK spec are
    * skipped (/root/reference/verify.go:194-198); heterogeneous targets should
    * build per-target plans and call [[runPerTarget]] instead.
    */
  def run(spark: SparkSession, targets: Seq[Target], specs: Map[String, TableSpec],
          cfg: VerifyConfig, includeTables: Seq[String] = Nil)(
          implicit ec: ExecutionContext = ExecutionContext.global): DataFrame = {
    // match bare names case-insensitively, consistent with the A3 merge: an
    // uppercase catalog (Derby reports REGION) must hit a lowercase spec key
    val includeLc = includeTables.map(_.toLowerCase)
    val specsLc = specs.map { case (k, v) => k.toLowerCase -> v }
    val plans = targets.map { t =>
      t -> discoverTables(spark, t, SchemaFilter.All)
        .map(tb => (tb, splitName(tb)._2.toLowerCase)) // filters match the BARE
        .filter { case (_, bare) =>      // name, so a schema-qualified catalog works
          (includeLc.isEmpty || includeLc.contains(bare)) && specsLc.contains(bare)
        }
        .map { case (tb, bare) =>
          val (schema, table) = splitName(tb)
          TableWork(schema, table, tb, specsLc(bare))
        }
    }
    runPerTarget(spark, plans, cfg)
  }

  /** A3: group cells by (schema, table, mode, output), collecting which
    * targets produced each output — the reference's mutex-guarded nested-map
    * insert (/root/reference/results.go:46-69) becomes one tiny shuffle.
    * Schema/table keys are lowercased: heterogeneous targets fold identifier
    * case differently (Derby `APP.VERIFYME` vs a quoted-lowercase
    * `APP.verifyme`), and the comparison must line those up as the same
    * logical table rather than report a spurious missing-table mismatch.
    */
  def merged(results: DataFrame): DataFrame =
    results.groupBy(lower(col("schema")).as("schema"), lower(col("table")).as("table"),
        col("mode"), col("output"))
      .agg(sort_array(collect_list(col("target"))).as("targets"))

  /** A4: the consistency diff (/root/reference/results.go:72-98). A cell fails
    * if targets disagree on the output, if some target is missing, or if any
    * output is the `(err)` sentinel.
    */
  def inconsistencies(results: DataFrame, nTargets: Int): DataFrame =
    merged(results)
      .groupBy("schema", "table", "mode")
      .agg(
        countDistinct(col("output")).as("n_outputs"),
        sum(size(col("targets"))).cast("int").as("n_reports"),
        max((col("output") === Fingerprints.Err).cast("int")).cast("boolean").as("has_err"))
      .filter(col("n_outputs") > 1 || col("n_reports") =!= nTargets || col("has_err"))
      .orderBy(col("schema"), col("table"), col("mode"))

  /** A5 + O4/O5: one row per (schema, table, target), one column per mode
    * (alphabetical), `(err)` filling gaps, lexicographic row order
    * (/root/reference/results.go:101-166).
    */
  def pivotReport(results: DataFrame, modes: Seq[String]): DataFrame = {
    val sortedModes = modes.sorted
    val pivoted = results
      .groupBy("schema", "table", "target")
      .pivot("mode", sortedModes)
      .agg(first(col("output")))
      .na.fill(Fingerprints.Err, sortedModes)
    pivoted.orderBy(pivoted.columns.map(col).toSeq: _*)
  }

  /** S5 report sink: render the pivot as an ASCII box table to `out` — the
    * analogue of the reference's tablewriter output
    * (/root/reference/results.go:101-166): header `schema, table, <modes
    * alphabetical>, target`, rows sorted lexicographically across ALL columns
    * in header order, uppercase header row. The report is one row per
    * (schema, table, target) — always tiny — so the driver-side collect is
    * the right shape.
    */
  def renderAsciiTable(pivot: DataFrame, modes: Seq[String], out: java.io.Writer): Unit =
    renderTable(pivot, Seq("schema", "table") ++ modes.sorted ++ Seq("target"), out)

  /** Generic box-table renderer over an explicit header — the report sink
    * shared by the mode pivot above and the incremental-Merkle drift report.
    */
  def renderTable(df: DataFrame, header: Seq[String], out: java.io.Writer): Unit = {
    val rows = df.select(header.map(col): _*).collect()
      .map(r => header.indices.map(i => Option(r.get(i)).map(_.toString).getOrElse("")))
      .sortWith { (a, b) => // column-wise lexicographic, results.go:148-156
        a.indices.find(i => a(i) != b(i)).exists(i => a(i) < b(i))
      }
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    def sep: String = widths.map("-" * (_: Int)).mkString("+-", "-+-", "-+\n")
    def line(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("| ", " | ", " |\n")
    out.write(sep)
    out.write(line(header.map(_.toUpperCase)))
    out.write(sep)
    rows.foreach(r => out.write(line(r)))
    out.write(sep)
    out.flush()
  }
}
