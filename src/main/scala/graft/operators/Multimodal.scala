package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in partition-sized
  * batches.
  *
  * The container has no image/audio libraries, so [[decodeStub]] is a
  * clearly-marked deterministic fake (header fields + nibble histogram from
  * the raw bytes). Everything around it — binary column schema, the
  * `Dataset.mapPartitions` batch shape with product encoders, partitioning —
  * is the real pipeline a codec-backed decoder would drop into: swap
  * `decodeStub` for an actual decoder and nothing else changes.
  *
  * Scale shape (100 TB): decode is per-partition imperative work with no
  * shuffle; partition sizing (`spark.sql.files.maxPartitionBytes`) bounds
  * decoder memory. This is the one operator family where `mapPartitions`
  * beats expressions — codecs are black-box native calls, not Catalyst
  * expressions (SURVEY.md preference order (d)).
  */
object Multimodal {

  /** Decoded media metadata + a small feature vector. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       channels: Long, feat: Array[Long])

  /** Pluggable decoder boundary: a codec-backed implementation (libjpeg /
    * ffmpeg bindings, etc.) is a drop-in — [[extractMeta]]'s schema, batch
    * shape, and partitioning don't change. Must be Serializable: instances
    * ship to executors inside the mapPartitions closure.
    */
  trait MediaDecoder extends Serializable {
    /** (width, height, channels, feature vector) from raw media bytes. */
    def decode(bytes: Array[Byte]): (Long, Long, Long, Array[Long])
  }

  /** The env-forced deterministic fake (no codec libs in this container). */
  object StubDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte]): (Long, Long, Long, Array[Long]) =
      decodeStub(bytes)
  }

  /** STUB decode — deterministic fake standing in for a real codec
    * (libs unavailable in this container). Header fields derive from the
    * first bytes; the "feature vector" is the low-nibble histogram. Bytes
    * past the end read as 0, so a short/empty payload degrades to the
    * minimum header + zero histogram — exactly what the DuckDB twin computes
    * for empty text — instead of crashing the whole query.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Long, Array[Long]) = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else 0
    val width = 32L + at(0) % 224
    val height = 32L + at(1) % 224
    val channels = 1L + at(2) % 3
    val hist = new Array[Long](16)
    bytes.foreach(b => hist(b & 0x0f) += 1)
    (width, height, channels, hist)
  }

  /** Real image decoder backed by the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF
    * — ships with the JRE, no external codec libs). Width/height/channels come
    * from the decoded raster; the 16-entry feature vector is the classic
    * pHash front half: grayscale → area-averaged 32×32 downsample → 2D
    * DCT-II → the 4×4 low-frequency coefficient block. [[phash]]'s pairwise
    * rank thresholding over those coefficients then yields a 64-bit
    * perceptual hash: per-pixel noise perturbs low-frequency DCT magnitudes
    * only slightly, so near-identical images land within a small hamming
    * distance while unrelated images scatter.
    *
    * Fixture parquet carries synthetic (non-image) bytes, so oracle-gated
    * queries stay on [[StubDecoder]]; this decoder is the production drop-in
    * the `MediaDecoder` trait exists for, exercised on real PNGs in
    * MultimodalSpec.
    */
  object ImageIoDecoder extends MediaDecoder {
    private val N = 32 // pHash downsample grid

    override def decode(bytes: Array[Byte]): (Long, Long, Long, Array[Long]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"undecodable media payload (${bytes.length} bytes)")
      val (w, h) = (img.getWidth, img.getHeight)
      // area-averaged luminance on the N×N grid (deterministic, unlike the
      // platform-dependent AWT scaling filters)
      val gray = Array.ofDim[Double](N, N)
      for (gy <- 0 until N; gx <- 0 until N) {
        val x0 = gx * w / N; val x1 = math.max((gx + 1) * w / N, x0 + 1)
        val y0 = gy * h / N; val y1 = math.max((gy + 1) * h / N, y0 + 1)
        var sum = 0.0
        for (y <- y0 until y1; x <- x0 until x1) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        }
        gray(gy)(gx) = sum / ((x1 - x0) * (y1 - y0))
      }
      // 2D DCT-II, low-frequency 4×4 block only (16 of N² coefficients —
      // O(16·N²), no full transform needed). Coefficients quantize by Q
      // before the rank hash: per-pixel noise moves a coefficient by
      // O(N·noise) ≈ tens, so noise-scale differences collapse to TIES
      // (stable rank bits) while genuine structure — hundreds to thousands —
      // keeps its ordering. Without this, comparisons between the near-zero
      // cross terms of smooth scenes flip randomly under noise.
      val Q = 512.0
      val feat = new Array[Long](16)
      for (v <- 0 until 4; u <- 0 until 4) {
        var c = 0.0
        for (y <- 0 until N; x <- 0 until N) {
          c += gray(y)(x) *
            math.cos((2 * x + 1) * u * math.Pi / (2 * N)) *
            math.cos((2 * y + 1) * v * math.Pi / (2 * N))
        }
        feat(v * 4 + u) = math.round(c / Q)
      }
      (w.toLong, h.toLong, img.getColorModel.getNumComponents.toLong, feat)
    }
  }

  /** Batch decode: (id, binary) rows through the decoder, one partition
    * at a time — the mapInPandas-equivalent batch shape in Scala.
    */
  def extractMeta(df: DataFrame, idCol: String, binCol: String,
                  decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    implicit val outEnc = Encoders.product[MediaMeta]
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, c, feat) = decoder.decode(bytes)
          MediaMeta(id, bytes.length.toLong, w, h, c, feat)
        }
      }
      .toDF()
  }

  /** 64-bit perceptual hash over the decoder's 16-entry feature vector: bit b
    * compares feat[i] vs feat[j] for a fixed enumeration of (i, j) pairs
    * (i = b/4, j the next 1..4 entries cyclically) — the rank-based analogue
    * of pHash's DCT-median thresholding, invariant to global feature scaling.
    * Near-dup media → similar features → small hamming distance; banded pair
    * generation reuses the [[SimHash]] chunk-join machinery unchanged.
    */
  def phash(feat: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 64).map { b =>
      val i = b / 4
      val j = (i + 1 + b % 4) % 16
      when(element_at(feat, i + 1) > element_at(feat, j + 1), lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** DuckDB twin of stub-decode → [[phash]] → hamming pairs over media bytes
    * synthesized as the first 32 text characters (ASCII fixture, so chars ==
    * bytes and the stub's low-nibble histogram is `ascii(char) % 16`). The
    * oracle pairs brute-force (n² is fine oracle-side); the Spark side's
    * chunk-banded join must produce exactly this set — the pigeonhole bound
    * makes banding exact for hamming <= 3.
    */
  def duckPhashPairs(table: String, idCol: String, textCol: String,
                     maxHamming: Int): String =
    s"""WITH f AS (SELECT $idCol AS id, list_transform(generate_series(0,15), n ->
             CAST(len(list_filter(generate_series(1, least(32, len($textCol))), i ->
               ascii(substr($textCol, i, 1)) % 16 = n)) AS BIGINT)) AS hist
           FROM $table),
       p0 AS (SELECT id, list_sum(list_transform(generate_series(0,63), b ->
                CASE WHEN hist[(b//4)+1] > hist[((b//4 + 1 + b%4) % 16)+1]
                     THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END)) AS u
              FROM f),
       p AS (SELECT id,
               CAST(u - CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
                    THEN CAST('18446744073709551616' AS HUGEINT)
                    ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS ph
             FROM p0)
       SELECT a.id AS doc_a, b.id AS doc_b,
              CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
       FROM p a JOIN p b ON a.id < b.id
       WHERE bit_count(xor(a.ph, b.ph)) <= $maxHamming
       ORDER BY doc_a, doc_b"""

  /** One output row per sampled video frame. */
  case class FrameRow(doc_id: Long, frame_idx: Long, feat: Array[Long])

  /** Pluggable video decoder boundary — the ffmpeg-shaped seam: a real
    * implementation seeks to frame f and decodes it; the stub derives a
    * frame count and per-frame features from the raw bytes. Serializable
    * for the same reason as [[MediaDecoder]].
    */
  trait VideoDecoder extends Serializable {
    def frameCount(bytes: Array[Byte]): Int
    /** Feature vector of frame `f` (0-based). */
    def frameFeature(bytes: Array[Byte], f: Int): Array[Long]
  }

  /** STUB video decode — deterministic fake (no codec libs in this
    * container): frame count 2..7 from header byte 3, frame f's 4-lane
    * feature sums `(byte + 7f) mod 256` over the byte lanes — enough to
    * make every frame's feature distinct and recomputable by the DuckDB
    * twin. A real decoder drops in without touching [[sampleFrames]].
    */
  object StubVideoDecoder extends VideoDecoder {
    private def at(bytes: Array[Byte], i: Int): Int =
      if (i < bytes.length) bytes(i) & 0xff else 0
    override def frameCount(bytes: Array[Byte]): Int = 2 + at(bytes, 3) % 6
    override def frameFeature(bytes: Array[Byte], f: Int): Array[Long] = {
      val feat = new Array[Long](4)
      var i = 0
      while (i < bytes.length) {
        feat(i % 4) += (at(bytes, i) + 7L * f) % 256
        i += 1
      }
      feat
    }
  }

  /** Uniform-stride frame sampling: every `everyN`-th frame of each video
    * becomes one output row (doc id, frame index, feature vector) — the
    * preprocessing step that turns a video corpus into a frame-level
    * training table. Decode is per-partition imperative work behind the
    * [[VideoDecoder]] seam, like [[extractMeta]]; output is
    * frame-proportional, so downstream operators (dedup over frame
    * features, ANN over frame embeddings) see an ordinary columnar table.
    *
    * Scale shape (100 TB of video): no shuffle — rows explode inside the
    * partition, and `spark.sql.files.maxPartitionBytes` bounds how many
    * containers one task holds; a stride of N divides decode cost AND
    * output volume by N, which is the knob a 100 TB corpus is actually
    * sampled with.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, everyN: Int,
                   decoder: VideoDecoder = StubVideoDecoder): DataFrame = {
    require(everyN >= 1, s"everyN=$everyN must be >= 1")
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    implicit val outEnc = Encoders.product[FrameRow]
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          (0 until decoder.frameCount(bytes)).iterator
            .filter(_ % everyN == 0)
            .map(f => FrameRow(id, f.toLong, decoder.frameFeature(bytes, f)))
        }
      }
      .toDF()
  }

  /** One output row per audio analysis window. */
  case class AudioWindow(doc_id: Long, window_idx: Long, energy: Long)

  /** Windowed audio energy over an opaque PCM-ish binary column: window w
    * covers bytes [w·stride, w·stride + width) and its energy is the sum of
    * squared zero-centered samples (byte − 128)² — the RMS-shaped feature a
    * real audio front-end computes per hop, silence/voice detection's first
    * signal. Integer throughout, so the DuckDB twin recomputes it exactly.
    * The "decode" here is byte-as-sample — the clearly-marked stand-in for
    * a real PCM decode (no codec libs in this container); the per-window
    * shape, stride/width knobs, and mapPartitions batch plumbing are the
    * real pipeline, exactly as [[sampleFrames]] for video.
    *
    * Scale shape: identical to [[sampleFrames]] — shuffle-free partition
    * work, output rows = ceil(bytes/stride) per clip, bounded by
    * `maxPartitionBytes` per task.
    */
  def audioEnergy(df: DataFrame, idCol: String, binCol: String,
                  width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1, s"width=$width stride=$stride must be >= 1")
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    implicit val outEnc = Encoders.product[AudioWindow]
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nWin = math.max((bytes.length + stride - 1) / stride, 0)
          (0 until nWin).iterator.map { w =>
            var e = 0L
            var i = w * stride
            val end = math.min(i + width, bytes.length)
            while (i < end) {
              val s = (bytes(i) & 0xff) - 128L
              e += s * s
              i += 1
            }
            AudioWindow(id, w.toLong, e)
          }
        }
      }
      .toDF()
  }

  /** Distinct per-clip frame signatures: each sampled frame's feature
    * vector rendered as an exact-match key — the video inverted-index unit
    * (one row per distinct (clip, signature), presence semantics).
    */
  def videoFrameSigs(df: DataFrame, idCol: String, binCol: String,
                     everyN: Int, decoder: VideoDecoder = StubVideoDecoder): DataFrame =
    sampleFrames(df, idCol, binCol, everyN, decoder)
      .select(col("doc_id"),
        array_join(transform(col("feat"), x => x.cast("string")), "_").as("sig"))
      .distinct()

  /** Video near-dup matching: clip pairs sharing ≥ `minShared` DISTINCT
    * frame signatures, joined through the signature inverted index — never
    * clip × clip, and temporally shift-tolerant (the frame index is not
    * part of the key, so a re-cut clip still matches on its shared
    * frames). The video sibling of the audio landmark matcher; on the
    * synthetic stub-decoded fixture only exact-duplicate payloads produce
    * matching frames (documented convention — the plumbing is the real
    * pipeline, a production deployment swaps the decoder).
    */
  def videoNearDupPairs(df: DataFrame, idCol: String, binCol: String,
                        everyN: Int, minShared: Int): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    val sigs = videoFrameSigs(df, idCol, binCol, everyN).persist()
    val result = sigs.as("x").join(sigs.as("y"),
        col("x.sig") === col("y.sig") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // materialize-then-release (the incrementalCandidates lifecycle): the
    // signature cache must not outlive this call
    val out = result.persist()
    out.count()
    sigs.unpersist(blocking = false)
    out
  }

  /** Ingest-time video matcher against a persisted frame-signature index —
    * decode on the delta only; the shared-distinct-signature count depends
    * only on the clip pair, so the output is exactly the full
    * [[videoNearDupPairs]] set restricted to delta-touching pairs (the
    * restriction-oracle convention of the pHash/audio screens).
    */
  def videoNearDupIncremental(newDf: DataFrame, indexSigs: DataFrame,
                              idCol: String, binCol: String,
                              everyN: Int, minShared: Int): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    val ns = videoFrameSigs(newDf, idCol, binCol, everyN).persist()
    val cross = ns.as("x").join(indexSigs.as("y"),
        col("x.sig") === col("y.sig") && col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
    val within = ns.as("x").join(ns.as("y"),
        col("x.sig") === col("y.sig") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val result = cross.unionByName(within)
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // materialize-then-release: the delta signature cache must not outlive
    // the ingest — repeated ingests would otherwise accumulate cached
    // partitions in a long-lived session
    val out = result.persist()
    out.count()
    ns.unpersist(blocking = false)
    out
  }

  /** Persist a frame-signature index with its sampling parameter. */
  def writeFrameSigIndex(sigs: DataFrame, everyN: Int, path: String): Unit =
    sigs.withColumn("every_n", lit(everyN)).write.mode("overwrite").parquet(path)

  /** Read a frame-signature index, refusing a sampling mismatch — a
    * different frame stride produces disjoint signature sets. An EMPTY
    * index is deliberately accepted (the readHashIndex bootstrap-ingest
    * convention: zero cross pairs is correct for an empty corpus).
    */
  def readFrameSigIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                        expectEveryN: Int): DataFrame = {
    val idx = spark.read.parquet(path)
    for (r <- idx.select("every_n").head(1).headOption) {
      require(r.getInt(0) == expectEveryN,
        s"frame-signature index at $path was sampled every_n=${r.getInt(0)}; " +
          s"this ingest expects $expectEveryN — mismatched sampling produces " +
          "disjoint signature sets (rebuild the index or match its stride)")
    }
    idx.drop("every_n")
  }

  /** Audio fingerprint matching (the constellation/landmark shape — Wang
    * 2003): quantize each clip's energy windows into (window, band)
    * landmarks, join clips through the landmark INVERTED INDEX (an
    * equi-join keyed on the landmark — never clip×clip), and keep pairs
    * sharing ≥ `minShared` landmarks. The audio twin of the pHash banded
    * hamming join: candidate generation is bucket-local (fan-out bounded by
    * landmark-bucket width, tunable via `bandDiv` granularity and window
    * count), the vote count is one map-side-combined aggregate.
    *
    * On the synthetic md5-derived fixture payloads only EXACT duplicate
    * texts produce fully matching landmark sequences, so the spec can pin
    * the output against the exact-dup pair set — the matching plumbing
    * (landmark extraction → inverted index → pair vote) is the real
    * pipeline; a production deployment swaps the byte-as-sample decode for
    * a PCM front-end and widens the landmark space.
    */
  def audioFingerprintPairs(df: DataFrame, idCol: String, binCol: String,
                            width: Int, stride: Int, bandDiv: Long,
                            minShared: Int): DataFrame = {
    require(bandDiv >= 1, s"bandDiv=$bandDiv must be >= 1")
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    val lm = audioEnergy(df, idCol, binCol, width, stride)
      .select(col("doc_id"), col("window_idx"),
        expr(s"energy div $bandDiv").as("band"))
    lm.as("x").join(lm.as("y"),
        col("x.window_idx") === col("y.window_idx") &&
          col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The landmark inverted-index rows of a clip set — what
    * [[writeLandmarkIndex]] persists and the incremental matcher probes.
    */
  def audioLandmarks(df: DataFrame, idCol: String, binCol: String,
                     width: Int, stride: Int, bandDiv: Long): DataFrame =
    audioEnergy(df, idCol, binCol, width, stride)
      .select(col("doc_id"), col("window_idx"),
        expr(s"energy div $bandDiv").as("band"))

  /** Ingest-time audio matcher: every pair sharing ≥ `minShared` landmarks
    * that TOUCHES the new batch, with the corpus side supplied as a
    * persisted landmark index — the corpus audio is never re-decoded,
    * O(delta + index) per ingest. `n_shared` depends only on the two
    * clips, so the output is EXACTLY the full [[audioFingerprintPairs]]
    * set restricted to pairs touching a new id (the oracle-sharing
    * convention of the pHash and paragraph screens).
    */
  def audioFingerprintIncremental(newDf: DataFrame, indexLm: DataFrame,
                                  idCol: String, binCol: String,
                                  width: Int, stride: Int, bandDiv: Long,
                                  minShared: Int): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    val nl = audioLandmarks(newDf, idCol, binCol, width, stride, bandDiv).persist()
    def lmCond = col("x.window_idx") === col("y.window_idx") &&
      col("x.band") === col("y.band")
    val cross = nl.as("x").join(indexLm.as("y"),
        lmCond && col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
    val within = nl.as("x").join(nl.as("y"),
        lmCond && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val result = cross.unionByName(within)
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // materialize-then-release: the delta landmark cache must not outlive
    // the ingest
    val out = result.persist()
    out.count()
    nl.unpersist(blocking = false)
    out
  }

  /** Persist a landmark index with its extraction parameters. */
  def writeLandmarkIndex(lm: DataFrame, width: Int, stride: Int,
                         bandDiv: Long, path: String): Unit =
    lm.withColumn("width", lit(width)).withColumn("stride", lit(stride))
      .withColumn("band_div", lit(bandDiv))
      .write.mode("overwrite").parquet(path)

  /** Read a landmark index, refusing a parameter mismatch — landmarks from
    * a different quantization silently match nothing. An EMPTY index is
    * deliberately accepted (the readHashIndex bootstrap-ingest convention).
    */
  def readLandmarkIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                        expectWidth: Int, expectStride: Int,
                        expectBandDiv: Long): DataFrame = {
    val idx = spark.read.parquet(path)
    for (r <- idx.select("width", "stride", "band_div").head(1).headOption) {
      require(r.getInt(0) == expectWidth && r.getInt(1) == expectStride &&
        r.getLong(2) == expectBandDiv,
        s"landmark index at $path was built with width=${r.getInt(0)} " +
          s"stride=${r.getInt(1)} bandDiv=${r.getLong(2)}; this ingest expects " +
          s"$expectWidth/$expectStride/$expectBandDiv — mismatched quantization " +
          "silently matches nothing (rebuild the index or match its parameters)")
    }
    idx.drop("width", "stride", "band_div")
  }

  /** DuckDB twin of [[videoNearDupPairs]] at everyN = 1 over
    * `unhex(md5(text))` payloads (the stub-decoder staging shared with the
    * mm_scene_changes oracle).
    */
  def duckVideoNearDupPairs(table: String, idCol: String,
                            minShared: Int): String =
    s"""WITH hx AS (SELECT $idCol AS doc_id, md5(text) AS h FROM $table),
       meta AS (SELECT doc_id, h,
                  2 + CAST('0x' || substr(h, 7, 2) AS UBIGINT) % 6 AS nf FROM hx),
       fr AS (SELECT doc_id, h,
                     unnest(generate_series(0, CAST(nf - 1 AS INTEGER))) AS f
              FROM meta),
       feats AS (SELECT doc_id, f,
                   list_transform(generate_series(0, 3), l ->
                     CAST(list_sum(list_transform(generate_series(0, 3), m ->
                       (CAST('0x' || substr(h, 2*(4*m + l) + 1, 2) AS UBIGINT) + 7*f) % 256))
                       AS BIGINT)) AS feat
                 FROM fr),
       vsig AS (SELECT DISTINCT doc_id,
                  array_to_string(list_transform(feat, x -> CAST(x AS VARCHAR)), '_') AS sig
                FROM feats)
       SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_shared
       FROM vsig x JOIN vsig y ON x.sig = y.sig AND x.doc_id < y.doc_id
       GROUP BY 1, 2 HAVING count(*) >= $minShared"""

  /** DuckDB twin of [[audioFingerprintPairs]] over `unhex(md5(text))`
    * payloads (the [[duckAudioEnergy]] staging).
    */
  def duckAudioFingerprintPairs(table: String, idCol: String, width: Int,
                                stride: Int, bandDiv: Long, minShared: Int): String =
    s"""WITH en AS (${duckAudioEnergy(table, idCol, width, stride)}),
       lm AS (SELECT doc_id, window_idx, energy // $bandDiv AS band FROM en)
       SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_shared
       FROM lm x JOIN lm y
         ON x.window_idx = y.window_idx AND x.band = y.band AND x.doc_id < y.doc_id
       GROUP BY x.doc_id, y.doc_id
       HAVING count(*) >= $minShared"""

  /** DuckDB twin of [[audioEnergy]] over `unhex(md5(text))` payloads
    * (16 bytes per doc; byte i, 0-based, is hex pair (2i+1, 2i+2)).
    */
  def duckAudioEnergy(table: String, idCol: String, width: Int, stride: Int): String =
    s"""WITH hx AS (SELECT $idCol AS doc_id, md5(text) AS h FROM $table),
       win AS (SELECT doc_id, h, unnest(generate_series(0, CAST(ceil(16.0 / $stride) AS INTEGER) - 1)) AS w
               FROM hx)
       SELECT doc_id, CAST(w AS BIGINT) AS window_idx,
              CAST(list_sum(list_transform(
                generate_series(w*$stride, least(w*$stride + $width, 16) - 1), i ->
                  (CAST('0x' || substr(h, 2*i + 1, 2) AS BIGINT) - 128)
                    * (CAST('0x' || substr(h, 2*i + 1, 2) AS BIGINT) - 128)))
                AS BIGINT) AS energy
       FROM win ORDER BY doc_id, window_idx"""

  /** DuckDB twin of stub-decode [[sampleFrames]] over `unhex(md5(text))`
    * payloads (byte i, 0-based, is hex pair (2i+1, 2i+2)).
    */
  def duckFrameSample(table: String, idCol: String, everyN: Int): String =
    s"""WITH hx AS (SELECT $idCol AS doc_id, md5(text) AS h FROM $table),
       meta AS (SELECT doc_id, h,
                  2 + CAST('0x' || substr(h, 7, 2) AS UBIGINT) % 6 AS nf FROM hx),
       fr AS (SELECT doc_id, h, f FROM (
                SELECT doc_id, h,
                       unnest(generate_series(0, CAST(nf - 1 AS INTEGER))) AS f
                FROM meta) z
              WHERE f % $everyN = 0)
       SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
              array_to_string(list_transform(generate_series(0, 3), l ->
                CAST(list_sum(list_transform(generate_series(0, 3), m ->
                  (CAST('0x' || substr(h, 2*(4*m + l) + 1, 2) AS UBIGINT) + 7*f) % 256))
                  AS BIGINT)), ',') AS feat
       FROM fr ORDER BY doc_id, frame_idx"""

  /** DuckDB twin of [[extractMeta]] over bytes produced as `unhex(md5(text))`:
    * byte i (1-based) is hex pair (2i-1, 2i) of the md5, so every stub field
    * is recomputable from the hex string.
    */
  def duckMetaSql(table: String, idCol: String): String = {
    val b = (i: Int) => s"CAST('0x' || substr(h, ${2 * i - 1}, 2) AS UBIGINT)"
    s"""WITH hx AS (SELECT $idCol AS doc_id, md5(text) AS h FROM $table)
       SELECT doc_id,
              CAST(16 AS BIGINT) AS n_bytes,
              CAST(32 + ${b(1)} % 224 AS BIGINT) AS width,
              CAST(32 + ${b(2)} % 224 AS BIGINT) AS height,
              CAST(1 + ${b(3)} % 3 AS BIGINT) AS channels,
              array_to_string(list_transform(generate_series(0, 15), n ->
                CAST(len(list_filter(generate_series(1, 16), i ->
                  substr(h, 2*i, 1) = substr('0123456789abcdef', n + 1, 1))) AS BIGINT)), ',') AS feat
       FROM hx ORDER BY doc_id"""
  }
}
