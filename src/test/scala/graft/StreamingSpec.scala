package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.core.Readers
import graft.streaming.EventStreams

/** Streaming pipelines replayed over the finite fixture must agree with
  * their batch twins in graft.queries.EventQueries.
  */
class StreamingSpec extends SparkSpec {

  /** File-source streams need a directory; stage the single fixture file. */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("events.parquet"))
    dir.toString
  }

  private lazy val batchEvents = Readers.fixture(spark, sfDir, "events")

  test("streaming hourly window equals the batch aggregation") {
    val stream = EventStreams.hourlyWindow(EventStreams.readEvents(spark, streamDir))
    val got = EventStreams.runToBatch(stream, "hourly", OutputMode.Complete)
      .select(unix_micros(col("window.start")).as("hour_us"), col("event_type"),
        col("n_events"), col("sum_value"))
    val want = batchEvents
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("streaming sliding window equals the batch hopping aggregation") {
    val stream = EventStreams.slidingWindow(EventStreams.readEvents(spark, streamDir))
    val got = EventStreams.runToBatch(stream, "sliding", OutputMode.Complete)
      .select(unix_micros(col("window.start")).as("win_us"), col("event_type"),
        col("n_events"))
    val want = batchEvents
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("window.start")).as("win_us"), col("event_type"),
        col("n_events"))
    assert(got.count() > 0)
    // each event must land in exactly size/hop = 2 windows
    assert(got.agg(sum(col("n_events"))).head().getLong(0) == 2 * batchEvents.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("streaming dedup keeps one event per (user, type)") {
    val stream = EventStreams.dedupFirst(EventStreams.readEvents(spark, streamDir))
    val got = EventStreams.runToBatch(stream, "dedup", OutputMode.Append)
    val wantKeys = batchEvents.select("user_id", "event_type").distinct().count()
    assert(got.count() == wantKeys)
    assert(got.select("user_id", "event_type").distinct().count() == wantKeys)
  }

  test("stream-static join enriches events with a dimension table") {
    import spark.implicits._
    // static dimension: per-user order count from the orders fixture
    val dim = Readers.fixture(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val stream = EventStreams.readEvents(spark, streamDir)
      .join(dim, Seq("user_id"), "left_outer")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("n_orders"), lit(0L))).as("orders_touched"))
    val got = EventStreams.runToBatch(stream, "enriched", OutputMode.Complete)
    val want = batchEvents.join(dim, Seq("user_id"), "left_outer")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("n_orders"), lit(0L))).as("orders_touched"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("stream-stream attribution join equals the batch interval join") {
    val windowUs = 3600L * 1000000
    val joined = EventStreams.attributionJoin(
      EventStreams.readEvents(spark, streamDir),
      EventStreams.readEvents(spark, streamDir), windowUs)
    val got = EventStreams.runToBatch(joined, "attr", OutputMode.Append)
    val ev = batchEvents
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us").as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us").as("p_us"))
    val want = c.join(p, Seq("user_id"))
      .filter(col("p_us") >= col("c_us") && col("p_us") - col("c_us") <= windowUs)
      .select(col("click_id"), col("purchase_id"), (col("p_us") - col("c_us")).as("gap_us"))
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("checkpointed stream survives a restart: offsets and window state restored") {
    val inDir = Files.createTempDirectory("graft-ckpt-in")
    val ckpt = Files.createTempDirectory("graft-ckpt-meta").toString
    // split the normalized fixture into two time-ordered
    // halves — files arriving in event-time order, the shape a real ingest has
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-ckpt-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")

    def start(name: String) =
      EventStreams.hourlyWindow(EventStreams.readEvents(spark, inDir.toString))
        .writeStream.outputMode(OutputMode.Complete).format("memory")
        .queryName(name).option("checkpointLocation", ckpt).start()

    // run 1: half the input; the checkpoint records file offsets + agg state
    val q1 = start("ckpt_run1")
    q1.processAllAvailable(); q1.stop()
    val mid = spark.table("ckpt_run1").count()
    assert(mid > 0)

    // the second half arrives while the query is DOWN
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
    val half1Rows = raw.filter(unix_micros(col("ts")) > cutUs).count()

    // run 2: fresh query object, SAME checkpoint
    val q2 = start("ckpt_run2")
    q2.processAllAvailable()
    // only the new file may be read — half0 is recorded as processed, so a
    // correct final frame REQUIRES the restored aggregation state
    val readRows = q2.recentProgress.map(_.numInputRows).sum
    q2.stop()
    assert(readRows == half1Rows,
      s"restart re-read input: $readRows rows vs new-file $half1Rows")

    val got = spark.table("ckpt_run2")
      .select(unix_micros(col("window.start")).as("hour_us"), col("event_type"),
        col("n_events"), col("sum_value"))
    val want = batchEvents
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    assert(got.count() > mid)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("running fingerprint equals the batch digest after each arriving file") {
    val inDir = Files.createTempDirectory("graft-fp-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-fp-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    def digests(df: org.apache.spark.sql.DataFrame): Map[String, String] = {
      import graft.core.{Fingerprints, Fixtures, OracleSql, VerifyConfig}
      df.groupBy(col("event_type"))
        .agg(Fingerprints.unorderedDigestCol(OracleSql.schemas("events"),
          Fixtures.specs("events"), VerifyConfig()).cast("string").as("d"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    }
    def emitted(): Map[String, String] = spark.table("fp_run")
      .select(col("event_type"), col("digest_sum").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    val q = EventStreams.runningFingerprint(EventStreams.readEvents(spark, inDir.toString))
      .writeStream.outputMode(OutputMode.Complete).format("memory")
      .queryName("fp_run").start()
    try {
      // the continuous-verification claim: at EVERY point, the running
      // digests equal the batch digest over the rows that have arrived
      q.processAllAvailable()
      val gotHalf = emitted()
      assert(gotHalf == digests(batchEvents.filter(unix_micros(col("ts")) <= cutUs)))
      stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
      q.processAllAvailable()
      val gotAll = emitted()
      assert(gotAll == digests(batchEvents))
      assert(gotAll != gotHalf)
    } finally q.stop()
  }

  test("running stats digest equals the batch stats mode after each arriving file") {
    import graft.core.{Fingerprints, Fixtures, VerifyConfig}
    val inDir = Files.createTempDirectory("graft-st-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-st-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    def batchStats(df: org.apache.spark.sql.DataFrame): String =
      Fingerprints.statsDigest(df, Fixtures.specs("events"), VerifyConfig())
    def emitted(): String =
      spark.table("st_run").select(col("fingerprint")).head().getString(0)

    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    val q = EventStreams.runningStats(EventStreams.readEvents(spark, inDir.toString))
      .writeStream.outputMode(OutputMode.Complete).format("memory")
      .queryName("st_run").start()
    try {
      q.processAllAvailable()
      val gotHalf = emitted()
      assert(gotHalf == batchStats(batchEvents.filter(unix_micros(col("ts")) <= cutUs)))
      stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
      q.processAllAvailable()
      val gotAll = emitted()
      assert(gotAll == batchStats(batchEvents))
      assert(gotAll != gotHalf)
    } finally q.stop()
  }

  test("stateful sessionization equals the batch session counts") {
    val gapUs = 30L * 60 * 1000000
    val stream = EventStreams.sessionize(EventStreams.readEvents(spark, streamDir), gapUs)
    val got = EventStreams.runToBatch(stream.toDF(), "sessions", OutputMode.Update)
    // single-batch replay: last update per user is the full-history summary
    val gotFinal = got.groupBy("user_id")
      .agg(max(col("n_sessions")).as("n_sessions"), max(col("n_events")).as("n_events"))
    val want = SparkEntry.queries("ev_sessionize")(spark, sfDir)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    assert(gotFinal.except(want).isEmpty && want.except(gotFinal).isEmpty)
  }

  test("retention state carries across micro-batches: no re-emitted hits, batch-equal counts") {
    val inDir = Files.createTempDirectory("graft-ret-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-ret-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
    val stream = EventStreams.retentionHits(
      EventStreams.readEvents(spark, inDir.toString, maxFilesPerTrigger = Some(1)))
    val got = EventStreams.runToBatch(stream.toDF(), "ret2", OutputMode.Append)
    // append semantics: each (cohort, offset, user) hit appears exactly once
    // even when a user's cohort day and return day split across batches
    assert(got.count() == got.distinct().count())
    val counts = got.groupBy(col("cohort_us"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
    val want = SparkEntry.queries("ev_retention")(spark, sfDir)
      .select("cohort_us", "offset_days", "n_users")
    assert(counts.except(want).isEmpty && want.except(counts).isEmpty)
  }

  test("watermark contract: data arriving later than the delay is dropped, not double-counted") {
    import spark.implicits._
    // arrival inverts event time: the RECENT three-quarters arrives first
    // (advancing the watermark to max - 2h), then the OLDEST quarter — all
    // of it far below the watermark. The hourly append stream must (a) drop
    // every late row (no window older than the first on-time hour appears)
    // and (b) leave the already-emitted windows untouched — the bounded-
    // state bargain: accepting arbitrarily late data would mean keeping
    // every window open forever
    val inDir = Files.createTempDirectory("graft-late-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    // the cut lives in MICROS on both sides (stream normalizes ns → µs by
    // integer div; a nanos-side cut could split a microsecond across files)
    val cutUs = batchEvents.agg(expr("percentile_approx(unix_micros(ts), 0.25)"))
      .head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-late-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "ontime.parquet")
    val q = EventStreams.hourlyWindow(
        EventStreams.readEvents(spark, inDir.toString))
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("late_run").start()
    q.processAllAvailable()
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "late.parquet")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("late_run")
      .select(unix_micros(col("window.start")).as("hour_us"), col("event_type"),
        col("n_events"))
    val onTime = batchEvents.filter(unix_micros(col("ts")) > cutUs)
    val onTimeFirstHour = onTime
      .agg(min(unix_micros(date_trunc("hour", col("ts"))))).head().getLong(0)
    // (a) nothing from the late file's exclusive hours leaked in
    assert(got.filter(col("hour_us") < onTimeFirstHour).count() == 0,
      "late rows below the watermark were admitted")
    // (b) every emitted window equals the on-time-only batch aggregation —
    // late arrivals neither created windows nor inflated counts
    val want = onTime
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(got.join(want, Seq("hour_us", "event_type"), "left_anti").count() == 0,
      "emitted a window the on-time batch aggregation does not have")
    val mismatch = got.join(want.withColumnRenamed("n_events", "want_n"),
        Seq("hour_us", "event_type"))
      .filter(col("n_events") =!= col("want_n")).count()
    assert(mismatch == 0, s"$mismatch emitted windows have inflated counts")
  }

  test("flatMapGroupsWithState survives a restart: custom state restored from checkpoint") {
    // the windowed-agg restart test above exercises the ENGINE's state; this
    // one proves OUR custom anomaly state (open hour, count, baseline)
    // round-trips the checkpoint: run 1 processes half the input and stops,
    // run 2 (fresh query, same checkpoint) reads ONLY the new file yet its
    // union of emissions equals the uninterrupted single-run replay —
    // impossible unless the open hour and baseline totals were restored
    val inDir = Files.createTempDirectory("graft-anckpt-in")
    val ckpt = Files.createTempDirectory("graft-anckpt-meta").toString
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-anckpt-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    // a FILE sink, not memory: append-mode memory sinks refuse checkpoint
    // recovery (emitted rows die with the query); the parquet sink is the
    // exactly-once shape a real deployment restarts into
    val outDir = Files.createTempDirectory("graft-anckpt-out").toString
    def start() =
      EventStreams.anomalyHours(EventStreams.readEvents(spark, inDir.toString)).toDF()
        .writeStream.outputMode(OutputMode.Append).format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt).start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(outDir).count() > 0)
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
    val half1Rows = raw.filter(unix_micros(col("ts")) > cutUs).count()
    val q2 = start()
    q2.processAllAvailable()
    val readRows = q2.recentProgress.map(_.numInputRows).sum
    q2.stop()
    assert(readRows == half1Rows,
      s"restart re-read input: $readRows rows vs new-file $half1Rows")
    // append-once semantics: the sink's total content (run 1 + run 2, no
    // dedup) must equal the uninterrupted replay — a re-emitted or lost
    // hour would surface as a diff either way
    val got = spark.read.parquet(outDir)
    val want = SparkEntry.queries("ev_anomaly_stream")(spark, sfDir)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "restarted replay diverged from the uninterrupted replay")
  }

  test("native session windows roll up to the custom-state sessionize totals") {
    // two independent implementations of one semantics: session_window's
    // per-session rows, re-aggregated per user, must equal the
    // flatMapGroupsWithState sessionizer's (n_sessions, n_events)
    val rolled = SparkEntry.queries("ev_session_window_stream")(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
    val want = SparkEntry.queries("ev_sessionize")(spark, sfDir)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    assert(rolled.except(want).isEmpty && want.except(rolled).isEmpty)
  }

  test("streaming HLL registers equal the batch sketch after two-batch arrival") {
    import spark.implicits._
    // register merge is max — batch boundaries must be invisible: the
    // drained two-batch register table equals batch registers bit for bit,
    // so the drained estimate IS the batch estimate
    val inDir = Files.createTempDirectory("graft-hll-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-hll-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
    val stream = EventStreams.runningHll(
      EventStreams.readEvents(spark, inDir.toString, maxFilesPerTrigger = Some(1)),
      "event_type", "user_id")
    val got = EventStreams.runToBatch(stream, "hll2", OutputMode.Complete)
      .select(col("event_type"), col("reg"), col("m_rho").cast("int"))
      .as[(String, Int, Int)].collect().toSeq.sorted
    val batch = Readers.fixture(spark, sfDir, "events")
    val want = batch.select(col("event_type")).distinct().as[String].collect().toSeq
      .flatMap { t =>
        graft.operators.Sketches.hllRegisters(
            batch.filter(col("event_type") === t), col("user_id"))
          .as[(Int, Int)].collect().map { case (r, m) => (t, r, m) }
      }.sorted
    assert(got == want)
  }

  test("streaming value histogram equals the batch histogram after two-batch arrival") {
    import spark.implicits._
    // histogram counts only ADD, so batch boundaries must be invisible:
    // the drained two-batch counter table equals the batch histogram of
    // the same rows, and therefore so does every quantile read from it
    val inDir = Files.createTempDirectory("graft-qh-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-qh-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
    val stream = EventStreams.runningValueHistogram(
      EventStreams.readEvents(spark, inDir.toString, maxFilesPerTrigger = Some(1)),
      widthCents = 1000L, maxBin = 63)
    val got = EventStreams.runToBatch(stream, "qhist2", OutputMode.Complete)
      .as[(String, Long, Long)].collect().toSeq.sorted
    val want = EventStreams.runningValueHistogram(raw, widthCents = 1000L, maxBin = 63)
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(got == want)
    // state bound: never more than types × 64 counter rows
    assert(got.size <= got.map(_._1).distinct.size * 64)
    // quantile readout is monotone in p per type
    val qs = EventStreams.histogramQuantiles(
        EventStreams.runToBatch(stream, "qhist3", OutputMode.Complete),
        widthCents = 1000L, pcts = Seq(50, 90, 99))
      .as[(String, Long, Long, Long)].collect().toSeq
    qs.groupBy(_._1).foreach { case (t, rows) =>
      val byP = rows.sortBy(_._2).map(_._3)
      assert(byP == byP.sorted, s"$t quantile bins not monotone: $rows")
    }
  }

  test("anomaly baseline carries across micro-batches, open hour resumed not re-emitted") {
    // split at the median so hours straddle the cut: batch 1's OPEN hour
    // must resume counting in batch 2 (state carry), and every completed
    // hour must be emitted exactly once with the same trailing baseline as
    // the single-batch replay (the oracle-gated registered query)
    val inDir = Files.createTempDirectory("graft-anom-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-anom-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
    val stream = EventStreams.anomalyHours(
      EventStreams.readEvents(spark, inDir.toString, maxFilesPerTrigger = Some(1)))
    val got = EventStreams.runToBatch(stream.toDF(), "anom2", OutputMode.Append)
    assert(got.count() == got.distinct().count(), "an hour was emitted twice")
    val want = SparkEntry.queries("ev_anomaly_stream")(spark, sfDir)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "two-batch replay diverged from the single-batch result")
  }

  test("funnel state machine carries across micro-batches (two-file staged arrival)") {
    // split the fixture into two time-ordered halves so a user's signup can
    // land in batch 1 and their click/purchase in batch 2 — the final stage
    // must still equal the batch funnel (state carried, not recomputed)
    val inDir = Files.createTempDirectory("graft-funnel-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-funnel-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
    // one file per micro-batch → two batches, event-time ordered
    val stream = EventStreams.funnelStages(
      EventStreams.readEvents(spark, inDir.toString, maxFilesPerTrigger = Some(1)))
    val got = EventStreams.runToBatch(stream.toDF(), "funnel2", OutputMode.Update)
      .groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
    def reach(n: Int) = got.filter(col("stage") >= n).count()
    val want = SparkEntry.queries("ev_funnel")(spark, sfDir)
      .select("stage", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reach(1) == want("1_signup"))
    assert(reach(2) == want("2_click"))
    assert(reach(3) == want("3_purchase"))
  }

  test("co-occurrence pairs emit exactly once across micro-batches (two-file staged arrival)") {
    // split the fixture by time so a user's first type lands in batch 1 and
    // a co-occurring second type in batch 2: the pair must emit in batch 2
    // (state carried) and ONLY there (no re-emission of settled pairs) —
    // the drained count then equals the batch co-occurrence query
    val inDir = Files.createTempDirectory("graft-cooccur-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-cooccur-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
    val stream = EventStreams.cooccurHits(
      EventStreams.readEvents(spark, inDir.toString, maxFilesPerTrigger = Some(1)))
    val drained = EventStreams.runToBatch(stream.toDF(), "cooccur2", OutputMode.Append)
    // exactly-once: no (pair, user) row may appear twice across the batches
    assert(drained.count() == drained.distinct().count(),
      "a settled pair re-emitted after the batch boundary")
    val got = drained.groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = SparkEntry.queries("ev_cooccur")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, "staged two-batch replay diverged from the batch pair support")
  }

  test("transition steps chain across micro-batches (two-file staged arrival)") {
    // time-split halves: a user's boundary-straddling step (last event of
    // batch 1 → first event of batch 2) must emit exactly once, from the
    // carried last-event state; total steps then tie out to n_events −
    // n_users and the pair counts equal the batch window query
    val inDir = Files.createTempDirectory("graft-trans-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-trans-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
    val stream = EventStreams.transitionSteps(
      EventStreams.readEvents(spark, inDir.toString, maxFilesPerTrigger = Some(1)))
    val drained = EventStreams.runToBatch(stream.toDF(), "trans2", OutputMode.Append)
    // every event except each user's first contributes exactly one step
    val nEvents = raw.count()
    val nUsers = raw.select(col("user_id")).distinct().count()
    assert(drained.count() == nEvents - nUsers,
      s"steps ${drained.count()} != events $nEvents - users $nUsers")
    val got = drained.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = SparkEntry.queries("ev_transitions")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, "staged two-batch replay diverged from the batch transition counts")
  }

  test("transition steps equal a plain-Scala lead() on random streams and random splits") {
    // random event sets with heavy timestamp ties, split at a random
    // event-time cut (the arrival-order contract): the drained steps must
    // equal the reference sequence walk for EVERY sample — ties are the
    // hazard (the operator breaks them by (ts, event_id), so the reference
    // must too)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(5, 40)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 4L)
        ts <- Gen.choose(0L, 9L)
        t <- Gen.oneOf("a", "b", "c")
      } yield (u, ts, t))
      cut <- Gen.choose(0L, 9L)
    } yield (rows.zipWithIndex.map { case ((u, ts, t), i) => (u, ts, i.toLong, t) }, cut)
    (0 until 2).foreach { i =>
      val (rows, cut) = gen.apply(Gen.Parameters.default, Seed(211L + i)).get
      val inDir = Files.createTempDirectory(s"graft-transprop-$i")
      def stage(half: Seq[(Long, Long, Long, String)], name: String): Unit = if (half.nonEmpty) {
        val tmp = Files.createTempDirectory("graft-transprop-half").toString
        half.toDF("user_id", "ts_us", "event_id", "event_type")
          .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
            col("event_id"), col("event_type"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, inDir.resolve(name))
      }
      stage(rows.filter(_._2 <= cut), "half0.parquet")
      stage(rows.filter(_._2 > cut), "half1.parquet")
      val stream = EventStreams.transitionSteps(
        EventStreams.readEvents(spark, inDir.toString, maxFilesPerTrigger = Some(1)))
      val drained = EventStreams.runToBatch(stream.toDF(), s"transprop$i", OutputMode.Append)
      val got = drained.groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // plain-Scala reference: per user, sort by (ts, id), walk the pairs
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).collect {
          case Seq(a, b) => (a, b)
        }
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got == want, s"sample $i (cut=$cut) diverged: got=$got want=$want")
    }
  }

  test("latest-state view carries across micro-batches and compacts to the batch snapshot") {
    // time-split halves: a user's newer event lands in batch 2 and must
    // OVERWRITE the state emitted in batch 1; the drained update stream's
    // per-user max-(ts, event_id) row then equals ev_state_at
    val inDir = Files.createTempDirectory("graft-state-in")
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutArrivalUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-state-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutArrivalUs), "half0.parquet")
    stage(raw.filter(unix_micros(col("ts")) > cutArrivalUs), "half1.parquet")
    val snapshotCutUs = 1705276800000000L
    val stream = EventStreams.latestStates(
      EventStreams.readEvents(spark, inDir.toString, maxFilesPerTrigger = Some(1)),
      snapshotCutUs)
    val drained = EventStreams.runToBatch(stream.toDF(), "state2", OutputMode.Update)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("state_ts_us").desc, col("event_id").desc)
    val got = drained.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "state_type", "state_value_cents", "state_ts_us")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val want = SparkEntry.queries("ev_state_at")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, "staged two-batch state view diverged from the batch snapshot")
  }

  test("JVM band hashing is hash-identical to the batch Catalyst banding expressions") {
    import graft.operators.{MinHashLSH, TextAnalysis}
    import graft.streaming.IngestStreams
    // the streaming path computes MinHash banding in plain JVM code; any
    // divergence from the SQL expressions would silently split the online
    // index from the batch join — pin them cell-for-cell on real fixture
    // text plus the short-doc fallback edge
    import spark.implicits._
    val docs = Readers.fixture(spark, sfDir, "documents").limit(30)
      .select(col("doc_id"), col("text"))
      .unionAll(Seq((900001L, "one two"), (900002L, "")).toDF("doc_id", "text"))
    val sqlBands = docs
      .select(col("doc_id").as("id"),
        posexplode(MinHashLSH.bandHashes(
          MinHashLSH.signature(
            TextAnalysis.shinglesFromTokens(TextAnalysis.tokens(col("text")), 3), 16),
          4, 4)).as(Seq("bandIdx", "bandHash")))
      .as[(Long, Int, String)].collect().toSet
    val jvmBands = IngestStreams.bandRows(docs, "doc_id", "text", 3, 16, 4)
      .collect().map(r => (r.id, r.bandIdx, r.bandHash)).toSet
    assert(jvmBands == sqlBands)
  }

  test("foreachBatch upsert snapshot: versioned merge is restart-safe and replay-idempotent") {
    val inDir = Files.createTempDirectory("graft-snap-in")
    val ckpt = Files.createTempDirectory("graft-snap-meta").toString
    val outDir = Files.createTempDirectory("graft-snap-out").toString
    val raw = Readers.fixture(spark, sfDir, "events")
    val cutUs = raw.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-snap-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half0.parquet")
    def start() = EventStreams.snapshotUpsertQuery(
      EventStreams.readEvents(spark, inDir.toString), outDir, ckpt)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val v1 = EventStreams.latestSnapshotVersion(outDir)
    assert(v1.nonEmpty, "no snapshot version written by run 1")
    // run 2: fresh query, same checkpoint, only the new file arrives —
    // its merge must land ON TOP of run 1's snapshot
    stage(raw.filter(unix_micros(col("ts")) > cutUs), "half1.parquet")
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val vLast = EventStreams.latestSnapshotVersion(outDir).get
    assert(vLast > v1.get, s"restart did not advance the snapshot: $vLast vs $v1")
    val got = spark.read.parquet(s"$outDir/v$vLast")
    // batch truth: latest (ts, event_id) record per user over ALL events
    val want = raw
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"))).as("s"))
      .select(col("user_id"), col("s.ts_us"), col("s.event_id"), col("s.event_type"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "snapshot diverged from the batch latest-state view")
    // replay idempotence (the foreachBatch at-least-once contract): merging
    // the final batch AGAIN under the same batch id must rewrite v<last>
    // with identical content — versioning absorbs the duplicate delivery
    val replayRows = raw.filter(unix_micros(col("ts")) > cutUs)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
    EventStreams.mergeSnapshot(replayRows, outDir, vLast)
    val replayed = spark.read.parquet(s"$outDir/v$vLast")
    assert(replayed.except(want).isEmpty && want.except(replayed).isEmpty,
      "batch replay changed the snapshot — the merge is not idempotent")
  }

  test("streaming LSH band index survives a restart: the checkpoint IS the index") {
    import graft.streaming.IngestStreams
    // run 1 ingests the first id-half and stops; run 2 (fresh query, same
    // checkpoint) ingests only the second half. Cross-half pairs can only
    // appear if run 2 restored run 1's bucket occupants from the checkpoint
    // — the property that lets a production ingest resume without re-reading
    // or re-signing the corpus
    val inDir = Files.createTempDirectory("graft-lshckpt-in")
    val ckpt = Files.createTempDirectory("graft-lshckpt-meta").toString
    val outDir = Files.createTempDirectory("graft-lshckpt-out").toString
    val raw = Readers.fixture(spark, sfDir, "documents")
    val cut = raw.agg(expr("percentile_approx(doc_id, 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-lshckpt-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(col("doc_id") <= cut), "half0.parquet")
    def start() = IngestStreams.lshCandidates(IngestStreams.bandRows(
        IngestStreams.readDocuments(spark, inDir.toString),
        "doc_id", "text", 3, 16, 4)).toDF()
      .writeStream.outputMode(OutputMode.Append).format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    stage(raw.filter(col("doc_id") > cut), "half1.parquet")
    val q2 = start()
    q2.processAllAvailable()
    val readRows = q2.recentProgress.map(_.numInputRows).sum
    q2.stop()
    val half1Docs = raw.filter(col("doc_id") > cut).count()
    assert(readRows == half1Docs,
      s"restart re-read input: $readRows rows vs new-half $half1Docs")
    val got = spark.read.parquet(outDir).select("doc_a", "doc_b").distinct()
    val want = graft.operators.MinHashLSH.candidatePairs(
      raw, "doc_id", "text", 3, 16, 4).select("doc_a", "doc_b")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "restarted ingest diverged from the batch banding join")
    assert(got.filter(col("doc_a") <= cut && col("doc_b") > cut).count() > 0,
      "no cross-half pair: restart did not exercise restored state")
  }

  test("streaming LSH band index carries across micro-batches: pair set equals the batch join") {
    import graft.streaming.IngestStreams
    // split documents into two id-halves, one file per micro-batch: a
    // near-dup pair straddling the halves can only be found if batch 1's
    // bucket occupants survived in state when batch 2's doc arrives
    val inDir = Files.createTempDirectory("graft-lsh-in")
    val raw = Readers.fixture(spark, sfDir, "documents")
    val cut = raw.agg(expr("percentile_approx(doc_id, 0.5)")).head().getLong(0)
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-lsh-half").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, inDir.resolve(name))
    }
    stage(raw.filter(col("doc_id") <= cut), "half0.parquet")
    stage(raw.filter(col("doc_id") > cut), "half1.parquet")
    val stream = IngestStreams.lshCandidates(IngestStreams.bandRows(
      IngestStreams.readDocuments(spark, inDir.toString, maxFilesPerTrigger = Some(1)),
      "doc_id", "text", shingleN = 3, numPerm = 16, numBands = 4))
    val got = EventStreams.runToBatch(stream.toDF(), "lsh2", OutputMode.Append)
      .select("doc_a", "doc_b").distinct()
    val want = graft.operators.MinHashLSH.candidatePairs(
      raw, "doc_id", "text", shingleN = 3, numPerm = 16, numBands = 4)
      .select("doc_a", "doc_b")
    assert(got.count() > 0, "fixture should contain near-dup candidates")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "staged two-batch replay diverged from the batch banding join")
    // and at least one pair crosses the halves — otherwise this test isn't
    // actually exercising cross-batch state carry
    assert(got.filter(col("doc_a") <= cut && col("doc_b") > cut).count() > 0,
      "no cross-half pair: split did not exercise state carry")
  }
}
