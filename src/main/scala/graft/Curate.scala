package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, DedupClusters, MinHashLSH, TextAnalysis}

/** `graft-curate` — the training-data product surface: one command running
  * the full curation pipeline the registered queries verify piecewise
  * (exact dedup → near-dup cluster drop → optional decontamination →
  * quality filter → deterministic split → sharded partitioned write).
  * Every stage is the SAME operator the oracle gate checks, so the CLI's
  * behavior is pinned by the query-level correctness runs.
  */
object Curate {

  val helpText: String =
    """Curate a document corpus into sharded train/val/test parquet.
      |
      |Usage:
      |  graft-curate [flags] <documentsDir> <outDir>
      |
      |<documentsDir> must hold documents.parquet. Output is hive-partitioned
      |parquet (split=<train|val|test>/lang=<lang>/) with file counts bounded
      |by deterministic id-hash sharding.
      |
      |Flags:
      |      --decontaminate-against dir  drop documents sharing a word trigram
      |                                   with this corpus's documents.parquet
      |      --max-substr-coverage int    drop documents whose duplicated
      |                                   8-token-span coverage exceeds this
      |                                   (micro-units, 0..1000000; default off)
      |      --max-boilerplate int        drop documents whose same-source
      |                                   boilerplate-window coverage exceeds
      |                                   this (micro-units; default off)
      |      --max-para-dup-micro int     drop documents whose share of
      |                                   10-token paragraphs near-duplicating
      |                                   an earlier document's paragraphs
      |                                   exceeds this (micro-units; default
      |                                   off) — the doc+paragraph two-pass
      |      --keep-best                  near-dup clusters keep their highest-
      |                                   quality member instead of the minimum id
      |      --max-cluster-size int       drop near-dup clusters LARGER than this
      |                                   wholesale, representative included — the
      |                                   template-farm screen (default off)
      |      --min-quality num            quality-score threshold (default 0.45)
      |      --max-xent-micro int         drop documents whose mean bigram
      |                                   cross-entropy (micro-nats, LM trained
      |                                   on the surviving corpus) exceeds this
      |                                   — the perplexity gate (default off)
      |      --max-pii-per-million int    drop documents whose PII-shaped
      |                                   token density (email / long-digit /
      |                                   URL tokens per million) exceeds this
      |                                   — the redaction-or-drop safety gate
      |                                   (default off)
      |      --redact-pii                 replace PII-shaped tokens with the
      |                                   <PII> sentinel in surviving documents
      |                                   instead of (or after) dropping — the
      |                                   keep-the-document alternative
      |      --dsir-target-lang str       with --dsir-keep-pct: score documents
      |                                   by DSIR target-vs-raw likelihood with
      |                                   this language as the target domain
      |      --dsir-keep-pct int          keep the top N% by DSIR weight
      |                                   (default off; requires
      |                                   --dsir-target-lang)
      |      --lr-target-lang str         with --min-lr-sigma-micro: train the
      |                                   logistic-regression filter on the
      |                                   surviving corpus with this language
      |                                   as the positive class
      |      --min-lr-sigma-micro int     drop documents whose trained-filter
      |                                   posterior (micro, 0..1000000) falls
      |                                   below this — the fastText-style
      |                                   classifier gate (default off;
      |                                   requires --lr-target-lang)
      |      --per-source-quality         replace the global threshold with each
      |                                   source's own bottom-quartile cut
      |      --mix-temperature int        after sampling, temperature-mix sources
      |                                   toward this token budget (share per
      |                                   source proportional to sqrt of its
      |                                   token total; default off)
      |      --sample-weighted int        after the quality filter, keep a
      |                                   quality-weighted priority sample of
      |                                   this many documents (deterministic;
      |                                   default off = keep all)
      |      --train-pct int              train percentage (default 90)
      |      --val-pct int                validation percentage (default 5)
      |      --shards int                 max files per output partition (default 4)
      |      --chunk-tokens int           emit overlapping token-window chunks
      |                                   instead of whole documents (default off);
      |                                   split is assigned by PARENT document so
      |                                   overlapping chunks never straddle
      |                                   train/val/test
      |      --chunk-stride int           chunk window stride (default =
      |                                   chunk-tokens, i.e. no overlap)
      |      --shuffle-seed int           add deterministic epoch-seeded
      |                                   training-order columns
      |                                   (shuffle_shard, shuffle_pos)
      |  -h, --help                       help for graft-curate
      |""".stripMargin

  case class Config(
      docsDir: String = "", outDir: String = "",
      decontaminateAgainst: Option[String] = None,
      maxSubstrCoverage: Option[Long] = None,
      maxBoilerplate: Option[Long] = None,
      maxParaDupMicro: Option[Long] = None,
      keepBest: Boolean = false,
      maxClusterSize: Option[Long] = None,
      perSourceQuality: Boolean = false,
      mixTemperature: Option[Long] = None,
      minQuality: Double = 0.45,
      maxXentMicro: Option[Long] = None,
      maxPiiPerMillion: Option[Long] = None,
      redactPii: Boolean = false,
      dsirTargetLang: Option[String] = None,
      dsirKeepPct: Option[Int] = None,
      lrTargetLang: Option[String] = None,
      minLrSigmaMicro: Option[Long] = None,
      sampleWeighted: Option[Int] = None,
      trainPct: Int = 90, valPct: Int = 5, shards: Int = 4,
      chunkTokens: Option[Int] = None, chunkStride: Option[Int] = None,
      shuffleSeed: Option[Int] = None)

  def parse(args: Seq[String]): Either[String, Config] = {
    val split = args.toList.flatMap { a =>
      if (a.startsWith("--") && a.contains("=")) { val Array(f, v) = a.split("=", 2); List(f, v) }
      else List(a)
    }
    def num[A](flag: String, value: String, conv: String => Option[A])(set: A => Config): Either[String, Config] =
      conv(value).toRight(s"""invalid argument "$value" for $flag\n\n$helpText""").map(set)
    def loop(rest: List[String], acc: Config, positional: List[String]): Either[String, Config] =
      rest match {
        case Nil => positional match {
          case docs :: out :: Nil => Right(acc.copy(docsDir = docs, outDir = out))
          case _ => Left(s"expected <documentsDir> <outDir>, got ${positional.size} positional args\n\n$helpText")
        }
        case ("-h" | "--help") :: _ => Left(helpText)
        case "--per-source-quality" :: tail =>
          loop(tail, acc.copy(perSourceQuality = true), positional)
        case "--keep-best" :: tail =>
          loop(tail, acc.copy(keepBest = true), positional)
        case "--redact-pii" :: tail =>
          loop(tail, acc.copy(redactPii = true), positional)
        case flag :: value :: tail if flag.startsWith("--") =>
          flag match {
            case "--decontaminate-against" =>
              loop(tail, acc.copy(decontaminateAgainst = Some(value)), positional)
            case "--max-substr-coverage" =>
              num(flag, value, (_: String).toLongOption)(n =>
                acc.copy(maxSubstrCoverage = Some(n)))
                .flatMap(loop(tail, _, positional))
            case "--max-cluster-size" =>
              num(flag, value, (_: String).toLongOption)(n =>
                acc.copy(maxClusterSize = Some(n)))
                .flatMap(loop(tail, _, positional))
            case "--max-boilerplate" =>
              num(flag, value, (_: String).toLongOption)(n =>
                acc.copy(maxBoilerplate = Some(n)))
                .flatMap(loop(tail, _, positional))
            case "--max-para-dup-micro" =>
              num(flag, value, (_: String).toLongOption)(n =>
                acc.copy(maxParaDupMicro = Some(n)))
                .flatMap(loop(tail, _, positional))
            case "--mix-temperature" =>
              num(flag, value, (_: String).toLongOption)(n =>
                acc.copy(mixTemperature = Some(n)))
                .flatMap(loop(tail, _, positional))
            case "--min-quality" =>
              num(flag, value, (_: String).toDoubleOption)(d => acc.copy(minQuality = d))
                .flatMap(loop(tail, _, positional))
            case "--sample-weighted" =>
              num(flag, value, (_: String).toIntOption)(n =>
                acc.copy(sampleWeighted = Some(n))).flatMap(loop(tail, _, positional))
            case "--max-xent-micro" =>
              num(flag, value, (_: String).toLongOption)(n =>
                acc.copy(maxXentMicro = Some(n))).flatMap(loop(tail, _, positional))
            case "--max-pii-per-million" =>
              num(flag, value, _.toLongOption)(n =>
                acc.copy(maxPiiPerMillion = Some(n))).flatMap(loop(tail, _, positional))
            case "--dsir-target-lang" =>
              loop(tail, acc.copy(dsirTargetLang = Some(value)), positional)
            case "--dsir-keep-pct" =>
              num(flag, value, (_: String).toIntOption)(n =>
                acc.copy(dsirKeepPct = Some(n))).flatMap(loop(tail, _, positional))
            case "--lr-target-lang" =>
              loop(tail, acc.copy(lrTargetLang = Some(value)), positional)
            case "--min-lr-sigma-micro" =>
              num(flag, value, (_: String).toLongOption)(n =>
                acc.copy(minLrSigmaMicro = Some(n))).flatMap(loop(tail, _, positional))
            case "--train-pct" =>
              num(flag, value, (_: String).toIntOption)(n => acc.copy(trainPct = n))
                .flatMap(loop(tail, _, positional))
            case "--val-pct" =>
              num(flag, value, (_: String).toIntOption)(n => acc.copy(valPct = n))
                .flatMap(loop(tail, _, positional))
            case "--shards" =>
              num(flag, value, (_: String).toIntOption)(n => acc.copy(shards = n))
                .flatMap(loop(tail, _, positional))
            case "--chunk-tokens" =>
              num(flag, value, (_: String).toIntOption)(n =>
                acc.copy(chunkTokens = Some(n))).flatMap(loop(tail, _, positional))
            case "--chunk-stride" =>
              num(flag, value, (_: String).toIntOption)(n =>
                acc.copy(chunkStride = Some(n))).flatMap(loop(tail, _, positional))
            case "--shuffle-seed" =>
              num(flag, value, (_: String).toIntOption)(n =>
                acc.copy(shuffleSeed = Some(n))).flatMap(loop(tail, _, positional))
            case other => Left(s"unknown flag: $other\n\n$helpText")
          }
        case flag :: Nil if flag.startsWith("--") =>
          Left(s"flag needs an argument: $flag\n\n$helpText")
        case flag :: _ if flag.startsWith("-") && flag != "-" =>
          Left(s"unknown flag: $flag\n\n$helpText")
        case p :: tail => loop(tail, acc, positional :+ p)
      }
    loop(split, Config(), Nil).flatMap { c =>
      if (c.trainPct < 0 || c.valPct < 0)
        Left(s"train-pct and val-pct must be >= 0, got ${c.trainPct}/${c.valPct}")
      else if (c.trainPct + c.valPct > 100)
        Left(s"train-pct + val-pct must be <= 100, got ${c.trainPct}+${c.valPct}")
      else if (c.shards < 1) Left(s"--shards must be >= 1, got ${c.shards}")
      else if (c.maxSubstrCoverage.exists(m => m < 0 || m > 1000000))
        Left(s"--max-substr-coverage must be in [0, 1000000], got ${c.maxSubstrCoverage.get}")
      else if (c.maxBoilerplate.exists(m => m < 0 || m > 1000000))
        Left(s"--max-boilerplate must be in [0, 1000000], got ${c.maxBoilerplate.get}")
      else if (c.maxParaDupMicro.exists(m => m < 0 || m > 1000000))
        Left(s"--max-para-dup-micro must be in [0, 1000000], got ${c.maxParaDupMicro.get}")
      else if (c.maxClusterSize.exists(_ < 2))
        Left(s"--max-cluster-size must be >= 2 (every near-dup cluster has at least 2 members), got ${c.maxClusterSize.get}")
      else if (c.mixTemperature.exists(_ < 1))
        Left(s"--mix-temperature must be >= 1, got ${c.mixTemperature.get}")
      else if (c.sampleWeighted.exists(_ < 1))
        Left(s"--sample-weighted must be >= 1, got ${c.sampleWeighted.get}")
      else if (c.chunkTokens.exists(_ < 1))
        Left(s"--chunk-tokens must be >= 1, got ${c.chunkTokens.get}")
      else if (c.maxXentMicro.exists(_ < 0))
        Left(s"--max-xent-micro must be >= 0, got ${c.maxXentMicro.get}")
      else if (c.maxPiiPerMillion.exists(_ < 0))
        Left(s"--max-pii-per-million must be >= 0, got ${c.maxPiiPerMillion.get}")
      else if (c.dsirKeepPct.exists(p => p < 1 || p > 100))
        Left(s"--dsir-keep-pct must be in [1, 100], got ${c.dsirKeepPct.get}")
      else if (c.dsirKeepPct.isDefined != c.dsirTargetLang.isDefined)
        Left("--dsir-keep-pct and --dsir-target-lang go together")
      else if (c.minLrSigmaMicro.exists(m => m < 0 || m > 1000000))
        Left(s"--min-lr-sigma-micro must be in [0, 1000000], got ${c.minLrSigmaMicro.get}")
      else if (c.minLrSigmaMicro.isDefined != c.lrTargetLang.isDefined)
        Left("--min-lr-sigma-micro and --lr-target-lang go together")
      else if (c.chunkStride.isDefined && c.chunkTokens.isEmpty)
        Left("--chunk-stride requires --chunk-tokens")
      else if (c.chunkStride.exists(s => s < 1 || s > c.chunkTokens.get))
        Left(s"--chunk-stride must be in [1, chunk-tokens], got ${c.chunkStride.get}")
      else Right(c)
    }
  }

  /** Runs the pipeline; returns per-stage surviving document counts (a
    * funnel, printed as the run summary and asserted by CurateSpec).
    *
    * Every stage boundary is localCheckpoint-ed, not merely persisted —
    * the corpus_waterfall gate-boundary lesson: the later gates (DSIR
    * rank, the LR training loop, priority sampling, chunk packing) run
    * many small actions, and each would re-plan the full accumulated
    * stage lineage; truncation caps plan depth at one stage. The funnel
    * counts materialize every stage regardless, so the eager checkpoint
    * adds only the block write.
    */
  def run(spark: SparkSession, cfg: Config): Seq[(String, Long)] = {
    val docs = spark.read.parquet(s"${cfg.docsDir}/documents.parquet")
    val input = docs.count()

    // exact dedup: keep the smallest id per distinct text
    val keepIds = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val exact = docs.join(keepIds, Seq("doc_id"), "left_semi").localCheckpoint()

    // near-dup dedup: LSH candidates → connected components → keep one
    // representative per cluster: minimum id by default, or the
    // highest-quality member under --keep-best (the dedup_best_rep rule —
    // dropping duplicates shouldn't also drop the best-written copy)
    val pairs = MinHashLSH.candidatePairs(exact, "doc_id", "text", 3, 16, 4)
      .filter(col("est_jaccard") >= 0.5).select("doc_a", "doc_b")
    val comp = DedupClusters.components(pairs)
    val dropNearBase =
      if (!cfg.keepBest) comp.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
      else {
        import org.apache.spark.sql.expressions.Window
        comp.join(exact.select(col("doc_id"),
            TextAnalysis.qualityScore(TextAnalysis.tokens(col("text"))).as("q")), "doc_id")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("cluster_id")).orderBy(col("q").desc, col("doc_id"))))
          .filter(col("rn") > 1).select("doc_id")
      }
    // --max-cluster-size: a cluster wider than the cap is a template farm —
    // its REPRESENTATIVE is as synthetic as its members, so the whole
    // cluster drops (dedup_cluster_sizes is the histogram that picks the
    // cap). Cluster sizes are a clusters-sized aggregate of the components
    // frame; the drop set unions with the representative rule
    val dropNear = cfg.maxClusterSize.fold(dropNearBase) { maxSz =>
      val farms = comp.join(
        comp.groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
          .filter(col("sz") > maxSz).select("cluster_id"),
        Seq("cluster_id"), "left_semi").select("doc_id")
      dropNearBase.unionByName(farms).distinct()
    }
    val nearDeduped = exact.join(dropNear, Seq("doc_id"), "left_anti").localCheckpoint()

    // optional eval-set decontamination (broadcast trigram semi-join)
    val decontaminated = cfg.decontaminateAgainst.fold(nearDeduped) { dir =>
      val eval = spark.read.parquet(s"$dir/documents.parquet")
      nearDeduped.join(
        Corpus.contaminatedIds(nearDeduped, eval, "doc_id", "text", shingleN = 3),
        Seq("doc_id"), "left_anti").localCheckpoint()
    }

    // optional duplicated-substring screen: drop documents mostly covered by
    // k-token spans that repeat elsewhere in the surviving corpus (license
    // blocks, boilerplate) — the ExactSubstr operator dedup_substring gates
    val substrScreened = cfg.maxSubstrCoverage.fold(decontaminated) { maxMicro =>
      // coverage() returns a persisted frame: materialize the screened set,
      // then release it — otherwise the per-doc coverage table stays pinned
      // in executor memory for the rest of the pipeline run
      val cov = graft.operators.ExactSubstr
        .coverage(decontaminated, "doc_id", "text", k = 8)
      val heavy = cov.filter(col("coverage_micro") > maxMicro)
        .select(col("id").as("doc_id"))
      val out = decontaminated.join(heavy, Seq("doc_id"), "left_anti").localCheckpoint()
      out.count()
      cov.unpersist(blocking = false)
      out
    }

    // optional same-source boilerplate screen: drop documents dominated by
    // windows repeated across their source's other documents — the
    // dedup_boilerplate operator as a gate (finer-grained than the
    // corpus-wide substring screen: a phrase common across sources survives)
    val bpScreened = cfg.maxBoilerplate.fold(substrScreened) { maxMicro =>
      // same materialize-then-release as the substring screen above
      val bp = graft.operators.ExactSubstr
        .boilerplate(substrScreened, "doc_id", "text", "source", k = 4, minDocs = 2)
      val heavy = bp.filter(col("removed_micro") > maxMicro)
        .select(col("id").as("doc_id"))
      val out = substrScreened.join(heavy, Seq("doc_id"), "left_anti").localCheckpoint()
      out.count()
      bp.unpersist(blocking = false)
      out
    }

    // optional paragraph-granularity screen (the dedup_paragraph operator as
    // a gate — the standard doc+paragraph two-pass): drop documents whose
    // share of 10-token paragraphs near-duplicating an EARLIER surviving
    // document's paragraphs reaches the cap. Runs on the corpus the earlier
    // whole-doc passes kept, so it catches the partial-copy pages whole-doc
    // MinHash missed
    val paraScreened = cfg.maxParaDupMicro.fold(bpScreened) { maxMicro =>
      val pd = MinHashLSH.paragraphDedup(bpScreened, "doc_id", "text",
        paraTokens = 10, shingleN = 3, numPerm = 16, numBands = 4,
        minMatching = 12, dropRatioMicro = maxMicro)
      val heavy = pd.filter(col("drop_doc")).select("doc_id")
      val out = bpScreened.join(heavy, Seq("doc_id"), "left_anti").localCheckpoint()
      out.count()
      out
    }

    // quality filter (shared scorer — same expression the oracle checks):
    // one global threshold, or each source's own bottom-quartile cut (the
    // corpus_quality_gate operator) under --per-source-quality
    val quality = (if (cfg.perSourceQuality)
      paraScreened.join(
        Corpus.perSourceQualityGate(paraScreened, "doc_id", "source", "text")
          .select("doc_id"),
        Seq("doc_id"), "left_semi")
    else
      paraScreened
        .filter(TextAnalysis.qualityScore(TextAnalysis.tokens(col("text"))) >= cfg.minQuality))
      .localCheckpoint()

    val qualityCount = quality.count()

    // optional perplexity gate (the text_lm_xent quantity as a filter): LM
    // trains on the SURVIVING corpus, docs above the cross-entropy cap drop
    // — the CCNet-style fluency screen. Docs too short to score (< 2
    // tokens) have no xent row and survive the anti-join
    val xentGated = cfg.maxXentMicro.fold(quality) { cap =>
      val x = graft.operators.Vocab.lmXent(quality, "doc_id", "text")
      val heavy = x.filter(col("mean_xent_micro") > cap).select("doc_id")
      val out = quality.join(heavy, Seq("doc_id"), "left_anti").localCheckpoint()
      out.count()
      out
    }

    // optional PII safety gate (the text_pii_scan detectors per document):
    // drop documents whose PII-shaped token density exceeds the cap — the
    // drop-side alternative to redaction, one per-row HOF expression
    val piiGated = cfg.maxPiiPerMillion.fold(xentGated) { cap =>
      val out = xentGated.filter(
        TextAnalysis.piiPerMillion(TextAnalysis.tokens(col("text"))) <= cap).localCheckpoint()
      out.count()
      out
    }

    // optional in-place PII redaction (the text_pii_redact transform): the
    // keep-the-document alternative to the density drop above — every
    // detector-positive token becomes the <PII> sentinel; all later gates
    // (DSIR, the LR filter, chunking) see the redacted text
    val redacted = if (!cfg.redactPii) piiGated else {
      val out = piiGated.withColumn("text",
        TextAnalysis.redactPii(TextAnalysis.tokens(col("text")))).localCheckpoint()
      out.count()
      out
    }

    // optional DSIR selection (the corpus_dsir operators as a gate): score
    // survivors by hashed-bigram target-vs-raw likelihood with the given
    // language as the target domain, keep the top N% by exact distributed
    // rank (range-partitioned + offset, never a single-partition window)
    val dsirKept = (cfg.dsirTargetLang, cfg.dsirKeepPct) match {
      case (Some(lang0), Some(pct)) =>
        val w = graft.operators.Selection.dsirWeights(
          redacted, "doc_id", "text", col("lang") === lang0, 1024)
        // distributed exact rank, never a single-partition global window
        // (Ranks scaladoc) — the curate binary sees full-corpus inputs
        val ranked = graft.operators.Ranks.globalRank(
          w, Seq(col("dsir_micro").desc, col("doc_id").asc), "rnk")
        // ranked is cached + row-preserving: a cache read, not a re-score
        val n = ranked.count()
        val keep = ranked.filter(col("rnk") * 100L <= n * pct).select("doc_id")
        val out = redacted.join(keep, Seq("doc_id"), "left_semi").localCheckpoint()
        out.count()
        out
      case _ => redacted
    }

    // optional trained-classifier gate (the text_lr operators as a filter):
    // train the logistic-regression filter ON the survivors (hashed
    // presence features, NB init, integer-GD fine-tune — LogReg scaladoc),
    // then drop documents whose posterior falls below the cap. The
    // fastText-style "does this look like the target domain" screen,
    // discriminative where the DSIR gate above is generative
    val lrGated = (cfg.lrTargetLang, cfg.minLrSigmaMicro) match {
      case (Some(lang0), Some(minSigma)) =>
        import graft.operators.LogReg
        import graft.queries.TextQueries.{LrBuckets, LrSteps, LrNum, LrDen}
        val nDocs = dsirKept.count()
        val x = LogReg.features(dsirKept, "doc_id", "text",
          col("lang") === lang0, LrBuckets).localCheckpoint()
        val w = LogReg.trainWeights(spark, x, nDocs, LrBuckets, LrSteps,
          LrNum, LrDen, init = Some(LogReg.nbInit(x, LrBuckets)))
        val keep = LogReg.score(spark, x, w)
          .filter(col("sigma") >= minSigma).select("doc_id")
        val out = dsirKept.join(keep, Seq("doc_id"), "left_semi").localCheckpoint()
        out.count()
        out
      case _ => dsirKept
    }

    // optional quality-weighted downsample (Duffield–Lund–Thorup priority
    // sample — the corpus_sample_weighted operator): keep-probability scales
    // with the shared quality score, so the budget cut preserves the mix
    // instead of top-k cherry-picking; deterministic across runs
    val sampled0 = cfg.sampleWeighted.fold(lrGated) { k =>
      Corpus.prioritySample(
          lrGated.withColumn("q",
            TextAnalysis.qualityScore(TextAnalysis.tokens(col("text")))),
          "doc_id", expr("CAST(floor(q * 1000000) AS BIGINT) + 1"), k)
        .drop("q", "w", "priority").localCheckpoint()
    }
    // optional temperature-scaled source mix toward a token budget (the
    // corpus_mix_temperature operator): applied to whatever survived the
    // earlier gates, so the mix reweights the CURATED corpus
    val sampled = cfg.mixTemperature.fold(sampled0) { budget =>
      sampled0.join(
        Corpus.temperatureMix(sampled0, "doc_id", "source", "text", budget)
          .select("doc_id"),
        Seq("doc_id"), "left_semi").localCheckpoint()
    }

    // deterministic split, assigned by (parent) document BEFORE optional
    // chunking: overlapping chunks of one document share text, so letting
    // them straddle train/val/test would leak evaluation data into training
    val qualityKept =
      if (cfg.sampleWeighted.isDefined || cfg.mixTemperature.isDefined
        || cfg.maxXentMicro.isDefined || cfg.dsirKeepPct.isDefined
        || cfg.minLrSigmaMicro.isDefined) sampled.count()
      else qualityCount
    val split = sampled.withColumn("split",
      Corpus.splitAssign(col("doc_id"), cfg.trainPct, cfg.valPct))

    // optional chunking: the written unit becomes the overlapping token
    // window; chunk ids pack (parent, idx) so they stay unique and traceable
    val units = cfg.chunkTokens.fold(split) { ct =>
      val stride = cfg.chunkStride.getOrElse(ct)
      val chunks = Corpus.chunk(split, "doc_id", "text", ct, stride).persist()
      // the id packing is only collision-free below 100k chunks per doc —
      // fail loudly instead of silently fusing two parents' chunks
      val maxIdx = chunks.agg(max(col("chunk_idx"))).head().getLong(0)
      require(maxIdx < 100000L,
        s"chunk id packing overflow: a document produced ${maxIdx + 1} chunks " +
          "(>= 100000); raise --chunk-stride or --chunk-tokens")
      val packed = chunks
        .join(split.select(col("doc_id"), col("lang"), col("split")), "doc_id")
        .select((col("doc_id") * 100000L + col("chunk_idx")).as("doc_id"),
          col("chunk_text").as("text"), col("lang"), col("split"))
        .localCheckpoint()
      packed.count()
      chunks.unpersist(blocking = false)
      packed
    }

    // optional epoch-seeded training order: shard + position columns the
    // trainer reads in (shuffle_shard, shuffle_pos) order; a new seed
    // re-permutes. BOTH columns are written — shuffle_pos alone is a
    // per-shard position and would be ambiguous without its shard
    val tagged = cfg.shuffleSeed.fold(units) { seed =>
      units.join(
        Corpus.shuffle(units, "doc_id", seed, cfg.shards)
          .select(col("id").as("doc_id"), col("shard").as("shuffle_shard"),
            col("pos").as("shuffle_pos")),
        "doc_id")
    }
    Corpus.writeSharded(tagged, cfg.outDir, "doc_id", Seq("split", "lang"), cfg.shards)
    // an all-filtered corpus writes only _SUCCESS — nothing to read back
    val written = if (qualityKept == 0) 0L else spark.read.parquet(cfg.outDir).count()

    val funnel = Seq(
      "input" -> input,
      "exact_deduped" -> exact.count(),
      "near_deduped" -> nearDeduped.count(),
      "decontaminated" -> decontaminated.count(),
      "substr_screened" -> substrScreened.count(),
      "boilerplate_screened" -> bpScreened.count(),
      "para_screened" -> paraScreened.count(),
      "quality_filtered" -> qualityCount,
      "xent_gated" -> xentGated.count(),
      "pii_gated" -> piiGated.count(),
      "dsir_selected" -> dsirKept.count(),
      "lr_gated" -> lrGated.count(),
      "quality_kept" -> qualityKept,
      "written_units" -> (if (qualityKept == 0) 0L else units.count()),
      "written" -> written)
    (Seq(exact, nearDeduped, decontaminated, substrScreened, quality) ++
      (if (bpScreened ne substrScreened) Seq(bpScreened) else Nil) ++
      (if (paraScreened ne bpScreened) Seq(paraScreened) else Nil) ++
      (if (xentGated ne quality) Seq(xentGated) else Nil) ++
      (if (piiGated ne xentGated) Seq(piiGated) else Nil) ++
      (if (redacted ne piiGated) Seq(redacted) else Nil) ++
      (if (dsirKept ne redacted) Seq(dsirKept) else Nil) ++
      (if (lrGated ne dsirKept) Seq(lrGated) else Nil) ++
      (if (sampled0 ne lrGated) Seq(sampled0) else Nil) ++
      (if (sampled ne sampled0) Seq(sampled) else Nil) ++
      (if (units ne split) Seq(units) else Nil)).foreach(_.unpersist())
    funnel
  }

  def main(args: Array[String]): Unit = {
    parse(args.toSeq) match {
      case Left(msg) =>
        // stdout carries only the JSON funnel summary; help goes to stdout
        // (it was asked for), errors to stderr.
        if (msg == helpText) println(msg)
        else { Console.err.println(msg); sys.exit(2) }
      case Right(cfg) =>
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
          .config("spark.sql.adaptive.enabled", "true")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        val funnel = run(spark, cfg)
        println(funnel.map { case (k, v) => s""""$k":$v""" }
          .mkString("{", ",", s""","out":"${cfg.outDir}"}"""))
        spark.stop()
    }
  }
}
