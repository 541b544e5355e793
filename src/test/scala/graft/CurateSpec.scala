package graft

import org.apache.spark.sql.functions._

/** graft-curate end-to-end: funnel monotonicity, stage agreement with the
  * oracle-checked queries, output layout, and flag parsing.
  */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("curate pipeline funnel is monotone and matches the query-level stages") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate").toString
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = sfDir, outDir = out, minQuality = 0.45)).toMap
    assert(funnel("input") == spark.read.parquet(s"$sfDir/documents.parquet").count())
    // each stage can only drop documents
    val order = Seq("input", "exact_deduped", "near_deduped", "decontaminated", "quality_kept")
    order.sliding(2).foreach {
      case Seq(a, b) => assert(funnel(a) >= funnel(b), s"$a -> $b grew")
      case _ =>
    }
    assert(funnel("written") == funnel("quality_kept"), "write round-trips the kept set")
    // stage agreement: exact dedup count equals the dedup_exact distinct-hash count
    val wantExact = SparkEntry.queries("dedup_exact")(spark, sfDir).count()
    assert(funnel("exact_deduped") == wantExact)
    // output is hive-partitioned by split then lang
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("split=")), dirs.toSeq)
    val back = spark.read.parquet(out)
    assert(back.columns.toSet.contains("split") && back.columns.toSet.contains("lang"))
  }

  test("weighted-sample stage keeps exactly k of the quality survivors") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate-w").toString
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = sfDir, outDir = out, minQuality = 0.45,
      sampleWeighted = Some(20))).toMap
    assert(funnel("quality_filtered") >= 20,
      s"fixture too small for the test: ${funnel("quality_filtered")} survivors")
    assert(funnel("quality_kept") == 20L, funnel.toString)
    assert(funnel("written") == 20L, funnel.toString)
    // the sample is drawn FROM the survivors (subset, not a re-read)
    val written = spark.read.parquet(out).select("doc_id")
    val noSampleOut = java.nio.file.Files.createTempDirectory("graft-curate-w0").toString
    val full = Curate.run(spark, Curate.Config(
      docsDir = sfDir, outDir = noSampleOut, minQuality = 0.45)).toMap
    val fullWritten = spark.read.parquet(noSampleOut).select("doc_id")
    assert(written.join(fullWritten, Seq("doc_id"), "left_anti").count() == 0)
    assert(full("quality_kept") == full("quality_filtered"))
  }

  test("perplexity gate and DSIR selection apply between quality and sampling") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-curate-x").toString
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = sfDir, outDir = out, minQuality = 0.0,
      maxXentMicro = Some(3500000L),
      dsirTargetLang = Some("en"), dsirKeepPct = Some(50))).toMap
    // the xent gate drops SOMETHING (the fixture's xent spread straddles
    // 3.5 nats) but not everything; DSIR then halves the survivors
    assert(funnel("xent_gated") < funnel("quality_filtered"), funnel.toString)
    assert(funnel("xent_gated") > 0, funnel.toString)
    assert(funnel("dsir_selected") <= funnel("xent_gated") / 2 + 1, funnel.toString)
    assert(funnel("quality_kept") == funnel("dsir_selected"), funnel.toString)
    assert(funnel("written") == funnel("dsir_selected"), funnel.toString)
    // the written set skews toward the target language relative to input
    val written = spark.read.parquet(out)
    val wEn = written.filter(col("lang") === "en").count().toDouble / written.count()
    val iEn = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("lang") === "en").count().toDouble /
      spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(wEn > iEn, s"DSIR selection did not enrich the target language: $wEn <= $iEn")
  }

  test("PII gate drops exactly the over-density documents") {
    val dir = java.nio.file.Files.createTempDirectory("graft-curate-pii").toString
    val docs = Seq(
      (1L, "contact me at alice@example.com for the table scan rows", "en", "s0"),
      (2L, "call 5551234567 now or 5559876543 later ref 1234567 ok", "en", "s0"),
      (3L, "plain clean words only here nothing sensitive at all", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-curate-pii-o").toString
    // doc1: 1 PII token of 10 -> 100000/M; doc2: 3 of 10 -> 300000/M; doc3: 0
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = dir, outDir = out, minQuality = 0.0,
      maxPiiPerMillion = Some(200000L))).toMap
    assert(funnel("pii_gated") == 2L, funnel.toString)
    assert(funnel("written") == 2L, funnel.toString)
    val kept = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(1L, 3L), kept.toString)
    // cap at zero keeps only the clean document
    val out0 = java.nio.file.Files.createTempDirectory("graft-curate-pii-0").toString
    val strict = Curate.run(spark, Curate.Config(
      docsDir = dir, outDir = out0, minQuality = 0.0,
      maxPiiPerMillion = Some(0L))).toMap
    assert(strict("pii_gated") == 1L, strict.toString)
    assert(Curate.parse(Seq("--max-pii-per-million", "-1", "/d", "/o")).isLeft)
  }

  test("dsir flags must come together; xent cap must be non-negative") {
    assert(Curate.parse(Seq("--dsir-keep-pct", "25", "/d", "/o")).isLeft)
    assert(Curate.parse(Seq("--dsir-target-lang", "en", "/d", "/o")).isLeft)
    assert(Curate.parse(Seq("--max-xent-micro", "-1", "/d", "/o")).isLeft)
    assert(Curate.parse(Seq("--dsir-target-lang", "en", "--dsir-keep-pct", "25",
      "/d", "/o")).isRight)
  }

  test("--redact-pii rewrites surviving text in place without changing counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-curate-rp").toString
    val docs = Seq(
      (1L, "contact me at alice@example.com for the table scan rows", "en", "s0"),
      (2L, "plain clean words only here nothing sensitive at all", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-curate-rp-o").toString
    assert(Curate.parse(Seq("--redact-pii", dir, out)) ==
      Right(Curate.Config(docsDir = dir, outDir = out, redactPii = true)))
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = dir, outDir = out, minQuality = 0.0, redactPii = true)).toMap
    assert(funnel("written") == 2L, funnel.toString) // transform, not a drop
    val texts = spark.read.parquet(out).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(texts(1L) == "contact me at <PII> for the table scan rows")
    assert(texts(2L) == "plain clean words only here nothing sensitive at all")
  }

  test("lr flags must come together; sigma cap bounded to micro range") {
    assert(Curate.parse(Seq("--min-lr-sigma-micro", "500000", "/d", "/o")).isLeft)
    assert(Curate.parse(Seq("--lr-target-lang", "en", "/d", "/o")).isLeft)
    assert(Curate.parse(Seq("--lr-target-lang", "en", "--min-lr-sigma-micro",
      "1000001", "/d", "/o")).isLeft)
    assert(Curate.parse(Seq("--lr-target-lang", "en", "--min-lr-sigma-micro",
      "500000", "/d", "/o")).isRight)
  }

  test("trained-classifier gate drops below-threshold documents and enriches the target") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate-lr").toString
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = sfDir, outDir = out, minQuality = 0.0,
      lrTargetLang = Some("en"), minLrSigmaMicro = Some(500000L))).toMap
    // the 0.5-posterior cap keeps roughly the predicted-positive slice:
    // strictly fewer than the gate's input, never zero on this fixture
    assert(funnel("lr_gated") < funnel("dsir_selected"), funnel.toString)
    assert(funnel("lr_gated") > 0, funnel.toString)
    assert(funnel("written") == funnel("lr_gated"), funnel.toString)
    // the written set skews toward the target language relative to input —
    // the point of a trained domain filter
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val written = spark.read.parquet(out)
    val wEn = written.filter(col("lang") === "en").count().toDouble / written.count()
    val iEn = all.filter(col("lang") === "en").count().toDouble / all.count()
    assert(wEn > iEn, s"LR gate did not enrich the target language: $wEn <= $iEn")
  }

  test("decontamination stage drops trigram-overlapping documents") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate-d").toString
    // decontaminating a corpus against itself leaves nothing (every doc
    // shares all its trigrams with itself)
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = sfDir, outDir = out, decontaminateAgainst = Some(sfDir))).toMap
    assert(funnel("decontaminated") == 0L)
    assert(funnel("written") == 0L)
  }

  test("flag parsing: help, unknown flags, bad numerics, positional arity") {
    assert(Curate.parse(Seq("--help")) == Left(Curate.helpText))
    assert(Curate.parse(Seq("a", "b", "c")).isLeft)
    assert(Curate.parse(Seq("--min-quality", "high", "a", "b")).isLeft)
    assert(Curate.parse(Seq("--bogus", "1", "a", "b")).isLeft)
    assert(Curate.parse(Seq("--train-pct", "80", "--val-pct", "30", "a", "b")).isLeft)
    // negative pcts would silently route everything to the 'test' split
    assert(Curate.parse(Seq("--train-pct", "-10", "a", "b")).isLeft)
    assert(Curate.parse(Seq("--val-pct", "-1", "a", "b")).isLeft)
    val ok = Curate.parse(Seq("--min-quality=0.5", "--shards", "2", "in", "out"))
    assert(ok == Right(Curate.Config(docsDir = "in", outDir = "out",
      minQuality = 0.5, shards = 2)))
    // substring-coverage threshold: micro-units within [0, 1000000]
    assert(Curate.parse(Seq("--max-substr-coverage", "high", "a", "b")).isLeft)
    assert(Curate.parse(Seq("--max-substr-coverage", "-1", "a", "b")).isLeft)
    assert(Curate.parse(Seq("--max-substr-coverage", "1000001", "a", "b")).isLeft)
    assert(Curate.parse(Seq("--max-substr-coverage", "300000", "a", "b"))
      == Right(Curate.Config(docsDir = "a", outDir = "b",
        maxSubstrCoverage = Some(300000L))))
  }

  test("chunked + shuffled output: parent-assigned splits, traceable ids, order column") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate-c").toString
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = sfDir, outDir = out, minQuality = 0.45,
      chunkTokens = Some(32), chunkStride = Some(24), shuffleSeed = Some(3))).toMap
    assert(funnel("written_units") >= funnel("quality_kept"),
      "chunking can only multiply units")
    assert(funnel("written") == funnel("written_units"))
    val back = spark.read.parquet(out)
    assert(back.columns.contains("shuffle_pos"))
    // chunk ids pack (parent * 100000 + idx); every parent's chunks must sit
    // in ONE split — the leakage guard the stage ordering exists for
    val parents = back.select((col("doc_id") / 100000L).cast("long").as("parent"), col("split"))
      .distinct().groupBy("parent").count().filter(col("count") > 1).count()
    assert(parents == 0L, "a parent document's chunks straddle splits")
    // the shuffle column is a within-shard permutation: positions distinct
    // per id-hash shard is implied by distinct doc ids; check global sanity
    assert(back.select("doc_id").distinct().count() == funnel("written_units"))
  }

  test("substring-coverage stage drops exactly the over-threshold documents") {
    // the screen's motivating case: an 8+-token license block repeated
    // across otherwise-unrelated documents — too little shingle overlap for
    // the LSH near-dup stage (Jaccard ≈ 0.13 << 0.5), so only the substring
    // screen can catch it. Build that corpus and run the full CLI pipeline.
    val license = (1 to 10).map(i => s"license$i").mkString(" ")
    def uniq(d: Int) = (1 to 30).map(i => s"w${d}x$i").mkString(" ")
    val rows = (1 to 3).map(d => (d.toLong, s"$license ${uniq(d)}", "en", "synth")) ++
      (4 to 8).map(d => (d.toLong, uniq(d), "en", "synth"))
    val docsDir = java.nio.file.Files.createTempDirectory("graft-sub-docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    // shared 10-token block, 40-token docs: coverage = 10/40 = 250000 micro
    val out = java.nio.file.Files.createTempDirectory("graft-curate-s").toString
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = docsDir, outDir = out, minQuality = 0.0,
      maxSubstrCoverage = Some(200000L))).toMap
    assert(funnel("decontaminated") == 8L, "no exact/near dups in this corpus")
    assert(funnel("substr_screened") == 5L, "the three license-headed docs drop")
    // a permissive threshold keeps everything
    val funnel2 = Curate.run(spark, Curate.Config(
      docsDir = docsDir, outDir = out, minQuality = 0.0,
      maxSubstrCoverage = Some(250000L))).toMap
    assert(funnel2("substr_screened") == 8L)
  }

  test("paragraph-dup screen drops partial-copy docs the whole-doc stage misses") {
    // the gate's motivating case: a page quoting HALF its paragraphs from an
    // earlier document. Whole-doc token Jaccard ≈ 0.33 (< the 0.5 near-dup
    // threshold — the LSH stage keeps it); the paragraph pass sees 2 of 4
    // paragraphs exactly duplicated (ratio 500000) and the doc drops at a
    // 500000 cap, survives at 600000. The source doc keeps (keep-first).
    def para(tag: String) = (1 to 10).map(i => s"$tag$i").mkString(" ")
    val rows = Seq(
      (1L, s"${para("a")} ${para("b")} ${para("c")} ${para("d")}", "en", "synth"),
      (2L, s"${para("a")} ${para("b")} ${para("u")} ${para("v")}", "en", "synth"),
      (3L, s"${para("w")} ${para("x")} ${para("y")} ${para("z")}", "en", "synth"))
    val docsDir = java.nio.file.Files.createTempDirectory("graft-para-docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-curate-para").toString
    val f = Curate.run(spark, Curate.Config(
      docsDir = docsDir, outDir = out, minQuality = 0.0,
      maxParaDupMicro = Some(500000L))).toMap
    assert(f("boilerplate_screened") == 3L, "no whole-doc dups in this corpus: " + f)
    assert(f("para_screened") == 2L, f.toString)
    val f2 = Curate.run(spark, Curate.Config(
      docsDir = docsDir, outDir = out, minQuality = 0.0,
      maxParaDupMicro = Some(600000L))).toMap
    assert(f2("para_screened") == 3L, f2.toString)
  }

  test("boilerplate screen, per-source quality, and temperature mix gate as configured") {
    // srcA: three docs share a 4-token header (removed_micro = 4/8 = 500000);
    // srcB carries the SAME header once (per-source scoping must not flag it)
    // plus one unique doc; srcC has four docs of strictly increasing length
    // (distinct quality scores for the per-source quartile cut). Shared
    // 4-token headers produce Jaccard ~0.2 << 0.5 — invisible to the
    // near-dup stage, exactly the gap the boilerplate screen covers.
    def uniq(d: Int, n: Int) = (1 to n).map(i => s"w${d}x$i").mkString(" ")
    val rows = (1 to 3).map(d => (d.toLong, s"the same old header ${uniq(d, 4)}", "en", "srcA")) ++
      Seq((4L, s"the same old header ${uniq(4, 8)}", "en", "srcB"),
        (5L, uniq(5, 12), "en", "srcB")) ++
      (6 to 9).map(d => (d.toLong, uniq(d, (d - 5) * 10), "en", "srcC"))
    val docsDir = java.nio.file.Files.createTempDirectory("graft-bp-docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-curate-bp").toString

    // boilerplate screen at 400000 drops exactly srcA's three header docs
    val fBp = Curate.run(spark, Curate.Config(
      docsDir = docsDir, outDir = out, minQuality = 0.0,
      maxBoilerplate = Some(400000L))).toMap
    assert(fBp("substr_screened") == 9L, "no exact/near dups in this corpus")
    assert(fBp("boilerplate_screened") == 6L, fBp.toString)
    // permissive threshold keeps everything (removed_micro tops out at 500000)
    val fBp2 = Curate.run(spark, Curate.Config(
      docsDir = docsDir, outDir = out, minQuality = 0.0,
      maxBoilerplate = Some(500000L))).toMap
    assert(fBp2("boilerplate_screened") == 9L, fBp2.toString)

    // per-source quartile: only srcC has >= 4 docs, so exactly its shortest
    // drops (sources with n < 4 threshold at their minimum score and keep all)
    val fQ = Curate.run(spark, Curate.Config(
      docsDir = docsDir, outDir = out, minQuality = 0.0,
      perSourceQuality = true)).toMap
    assert(fQ("quality_filtered") == 8L, fQ.toString)

    // temperature mix: budget sized so every source's keep rate saturates at
    // 1e6 keeps ALL; the funnel count must equal the operator run directly
    val docsDF = spark.read.parquet(s"$docsDir/documents.parquet")
    val fMixAll = Curate.run(spark, Curate.Config(
      docsDir = docsDir, outDir = out, minQuality = 0.0,
      mixTemperature = Some(10000L))).toMap
    assert(fMixAll("quality_kept") == 9L, fMixAll.toString)
    val fMix1 = Curate.run(spark, Curate.Config(
      docsDir = docsDir, outDir = out, minQuality = 0.0,
      mixTemperature = Some(30L))).toMap
    val expect = graft.operators.Corpus.temperatureMix(
      docsDF, "doc_id", "source", "text", 30L).count()
    assert(fMix1("quality_kept") == expect, s"funnel=${fMix1("quality_kept")} op=$expect")
  }

  test("--keep-best picks the higher-quality near-dup, min-id default keeps the lower id") {
    // two near-identical docs (one token differs -> Jaccard ~0.9 > 0.5):
    // doc 2 is longer so it scores higher quality; default keeps doc 1
    // (cluster representative = min id), --keep-best keeps doc 2
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, s"$base endA", "en", "s0"),
      (2L, s"$base endB plus extra distinct tail tokens here now", "en", "s0"),
      (3L, (1 to 30).map(i => s"other$i").mkString(" "), "en", "s0"))
    val docsDir = java.nio.file.Files.createTempDirectory("graft-kb-docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    def kept(cfg: Curate.Config): Set[Long] = {
      val out = java.nio.file.Files.createTempDirectory("graft-curate-kb").toString
      Curate.run(spark, cfg.copy(docsDir = docsDir, outDir = out))
      spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    }
    val minId = kept(Curate.Config(minQuality = 0.0))
    val best = kept(Curate.Config(minQuality = 0.0, keepBest = true))
    assert(minId.contains(1L) && !minId.contains(2L), minId.toString)
    assert(best.contains(2L) && !best.contains(1L), best.toString)
    assert(minId.contains(3L) && best.contains(3L), "singleton doc must survive both")
  }

  test("--max-cluster-size drops wide near-dup clusters wholesale, keeps narrow ones") {
    // a 4-doc near-dup clique (template farm), a 2-doc near-dup pair, and a
    // singleton: with the cap at 3 the farm drops ENTIRELY (representative
    // included), the pair keeps its min-id representative, the singleton
    // survives; without the cap the farm keeps its representative
    val farm = (1 to 40).map(i => s"tok$i").mkString(" ")
    val pair = (1 to 40).map(i => s"pair$i").mkString(" ")
    val rows = Seq(
      (1L, s"$farm endA", "en", "s0"), (2L, s"$farm endB", "en", "s0"),
      (3L, s"$farm endC", "en", "s0"), (4L, s"$farm endD", "en", "s0"),
      (5L, s"$pair endA", "en", "s0"), (6L, s"$pair endB", "en", "s0"),
      (7L, (1 to 30).map(i => s"other$i").mkString(" "), "en", "s0"))
    val docsDir = java.nio.file.Files.createTempDirectory("graft-farm-docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    def kept(cfg: Curate.Config): Set[Long] = {
      val out = java.nio.file.Files.createTempDirectory("graft-curate-farm").toString
      Curate.run(spark, cfg.copy(docsDir = docsDir, outDir = out))
      spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    }
    val capped = kept(Curate.Config(minQuality = 0.0, maxClusterSize = Some(3L)))
    assert(capped == Set(5L, 7L), capped.toString)
    val uncapped = kept(Curate.Config(minQuality = 0.0))
    assert(uncapped == Set(1L, 5L, 7L), uncapped.toString)
    // flag surface: parse + the >= 2 guard
    assert(Curate.parse(Seq("--max-cluster-size", "8", "in", "out"))
      .toOption.get.maxClusterSize.contains(8L))
    assert(Curate.parse(Seq("--max-cluster-size", "1", "in", "out")).isLeft)
  }
}
