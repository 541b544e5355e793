package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.{duckTokens, shinglesFromTokens, tokens}

/** Near-duplicate detection for a training-data pipeline: MinHash+LSH
  * (shingle → signature → band → bucket-join), SimHash with chunk-bucketed
  * pairing, and exact n-gram Jaccard verification of candidates.
  *
  * Hash functions are MD5-derived so every stage is engine-portable (DuckDB
  * oracle twins built from the same parameters).
  *
  * Scale shape (100 TB): signatures are per-row expressions (scan-parallel,
  * no shuffle). Candidate generation shuffles only narrow (id, band, hash)
  * tuples — the standard LSH banding join — and exact verification joins
  * signatures back by id. Nothing ever materializes the O(n²) pair space.
  */
object MinHashLSH {

  /** MinHash signature: for permutation p, min over shingles of
    * md5("p:shingle") — string min over hex is a uniform hash min.
    */
  def signature(sh: Column, numPerm: Int): Column =
    transform(sequence(lit(0), lit(numPerm - 1)),
      p => array_min(transform(sh, s => md5(concat(p.cast("string"), lit(":"), s)))))

  def duckSignature(shSql: String, numPerm: Int): String =
    s"list_transform(generate_series(0, ${numPerm - 1}), " +
      s"p -> list_min(list_transform($shSql, s -> md5(concat(CAST(p AS VARCHAR), ':', s)))))"

  /** Band hashes: signature split into `numBands` rows-per-band chunks, each
    * hashed — two docs sharing any band hash become a candidate pair.
    */
  def bandHashes(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => md5(array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), "|")))

  def duckBandHashes(sigSql: String, numBands: Int, rowsPerBand: Int): String =
    s"list_transform(generate_series(0, ${numBands - 1}), " +
      s"b -> md5(array_to_string(list_slice($sigSql, b*$rowsPerBand + 1, b*$rowsPerBand + $rowsPerBand), '|')))"

  /** Candidate pairs (a < b) with estimated Jaccard = matching signature
    * positions / numPerm. `df` must have an id column and a text column.
    */
  /** Materialized (id, sig) signatures: the expensive shingle+signature
    * expressions are computed exactly once per row behind a persist() barrier
    * — without it Catalyst inlines them into downstream join predicates and
    * re-evaluates per comparison (measured: minutes instead of seconds at
    * sf0.1). The repartition spreads per-row CPU across cores: a single
    * parquet file otherwise plans as one partition.
    */
  def signatures(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int, numPerm: Int): DataFrame = {
    // explode + codegen'd hash-aggregate instead of the per-row HOF
    // [[signature]]: HOFs evaluate interpreted (closure per element); the
    // exploded form runs the same 16 MD5s per shingle inside whole-stage
    // codegen with map-side partial min — measured ~4x faster at sf0.1.
    val exploded = graft.core.Readers.spread(
      df.select(col(idCol).as("id"), col(textCol).as("text")), col("id"))
      .withColumn("tk", tokens(col("text")))
      .select(col("id"), explode(shinglesFromTokens(col("tk"), shingleN)).as("s"))
    val mins = (0 until numPerm).map(p =>
      min(md5(concat(lit(p.toString), lit(":"), col("s")))).as(s"m$p"))
    exploded.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numPerm).map(p => col(s"m$p")): _*).as("sig"))
      .persist()
  }

  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int, numPerm: Int, numBands: Int): DataFrame = {
    require(numPerm % numBands == 0,
      s"numPerm=$numPerm must be divisible by numBands=$numBands or trailing signature positions silently drop from banding")
    val rowsPerBand = numPerm / numBands
    val sigs = signatures(df, idCol, textCol, shingleN, numPerm)
      .withColumn("bands", bandHashes(col("sig"), numBands, rowsPerBand))
      .persist()
    // narrow band relation: only (id, band_idx, band_hash) shuffles
    val bands = sigs.select(col("id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b")).distinct()
    val sa = sigs.select(col("id").as("doc_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("id").as("doc_b"), col("sig").as("sig_b"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("n_matching",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (u, v) => u === v), x => x)).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("n_matching"),
        (col("n_matching").cast("double") / numPerm).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** CTE staging shared by duck twins: id + tokens + shingles. */
  def duckShingleCte(table: String, idCol: String, textCol: String, shingleN: Int): String =
    s"""toks AS (SELECT $idCol AS id, ${duckTokens(textCol)} AS tk FROM $table),
       shs AS (SELECT id, ${TextAnalysis.duckShinglesExpr("tk", shingleN)} AS sh FROM toks)"""

  def duckCandidatePairs(table: String, idCol: String, textCol: String,
                         shingleN: Int, numPerm: Int, numBands: Int): String = {
    require(numPerm % numBands == 0,
      s"numPerm=$numPerm must be divisible by numBands=$numBands or trailing signature positions silently drop from banding")
    val rowsPerBand = numPerm / numBands
    val sig = duckSignature("sh", numPerm)
    s"""WITH ${duckShingleCte(table, idCol, textCol, shingleN)},
       sigs AS (SELECT id, $sig AS sig FROM shs),
       bands AS (SELECT id, b AS band_idx,
                        md5(array_to_string(list_slice(sig, b*$rowsPerBand + 1, b*$rowsPerBand + $rowsPerBand), '|')) AS band_hash
                 FROM sigs, generate_series(0, ${numBands - 1}) AS t(b)),
       pairs AS (SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
                 FROM bands x JOIN bands y
                 ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.id < y.id)
       SELECT p.doc_a, p.doc_b,
              CAST(len(list_filter(generate_series(1, $numPerm), i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS n_matching,
              CAST(len(list_filter(generate_series(1, $numPerm), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / $numPerm AS est_jaccard
       FROM pairs p JOIN sigs sa ON sa.id = p.doc_a JOIN sigs sb ON sb.id = p.doc_b
       ORDER BY doc_a, doc_b"""
  }
}

/** 32-bit SimHash (Charikar'02 / Manku et al. WWW'07, scaled down from their
  * 64-bit so signed-integer semantics stay portable): per-token 32-bit MD5
  * hash, per-bit weighted vote, near-dup = Hamming distance <= k.
  *
  * Pairing uses the pigeonhole chunk trick: with 4 byte-chunks and k = 3,
  * any pair within distance 3 shares at least one exact chunk, so a
  * chunk-bucket join finds exactly the brute-force result without O(n²).
  */
object SimHash {
  val Bits = 32
  val Chunks = 4
  val MaxHamming = 3 // must stay < Chunks for the pigeonhole guarantee

  def simhash(text: Column): Column = {
    val th = transform(tokens(text),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    aggregate(sequence(lit(0), lit(Bits - 1)), lit(0L), (acc, b) =>
      acc + when(
        aggregate(th, lit(0L), (a2, h) => a2 + (shiftright_dyn(h, b) % 2) * 2 - 1) > 0,
        shiftleft_dyn(lit(1L), b)).otherwise(lit(0L)))
  }

  /** Scan-scale simhash: explode tokens, one codegen'd hash-aggregate with 32
    * per-bit vote sums (map-side partial agg), reassemble the hash from the
    * 32 scalars. Identical output to the per-row [[simhash]] expression —
    * that one evaluates interpreted (HOFs) and exists as the semantic
    * reference; this is the one to run on real data.
    */
  def simhashDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val th = graft.core.Readers.spread(
      df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok")), col("id"))
      .select(col("id"), conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"))
    val votes = (0 until Bits).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$b"))
    val assembled = (0 until Bits).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    th.groupBy(col("id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("id"), assembled.as("simhash"))
  }

  /** Dynamic-shift helpers: functions.shiftright/left only take Int literals;
    * division/multiplication by 2^b is the portable equivalent (b <= 31, so
    * pow(2,b) is exact in double).
    */
  private def shiftright_dyn(c: Column, b: Column): Column =
    (c / pow(lit(2.0), b)).cast("long") // power-of-two division is IEEE-exact
  private def shiftleft_dyn(c: Column, b: Column): Column =
    c * pow(lit(2.0), b).cast("long")

  def duckSimhash(text: String): String = {
    val th = s"list_transform(${duckTokens(text)}, " +
      "t -> CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) AS BIGINT))"
    s"""(SELECT CAST(list_sum(list_transform(generate_series(0, ${Bits - 1}), b ->
          CASE WHEN list_sum(list_transform(th, h -> ((h >> b) & 1) * 2 - 1)) > 0
               THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
        FROM (SELECT $th AS th) AS _t)"""
  }

  /** Near-dup pairs via chunk-bucket join; exactly equals brute-force
    * bit_count(xor) <= MaxHamming thanks to the pigeonhole bound.
    */
  def nearPairs(df: DataFrame, idCol: String, simhashCol: String): DataFrame = {
    // persist: the chunk relation feeds both sides of the self-join; without
    // the barrier the upstream simhash pipeline runs twice (or worse, inlines
    // into the join predicate)
    val chunks = graft.core.Readers.spread(
      df.select(col(idCol).as("id"), col(simhashCol).as("sh")), col("id"))
      .select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(Chunks - 1)),
          c => shiftright_dyn(col("sh"), c * lit(8)) % 256)).as(Seq("chunk_idx", "chunk")))
      .persist()
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") &&
          col("x.chunk") === col("y.chunk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"),
        bit_count(expr("x.sh ^ y.sh")).cast("long").as("hamming")).distinct()
      .filter(col("hamming") <= MaxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
