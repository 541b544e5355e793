package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.OracleSql
import graft.functions.GraftFunctions

/** Content-defined chunking (the FastCDC/LBFS family): cut each document at
  * positions where a hash of the trailing `window`-char context satisfies
  * `hash % divisor == 0`, so chunk boundaries follow CONTENT, not offsets —
  * insert one character near the front of a document and every fixed-size
  * block after it changes, but content-defined chunks realign immediately.
  * Chunk-hash dedup then finds PARTIAL overlap between documents (shared
  * boilerplate, quoted passages, near-identical revisions) that whole-doc
  * hashing misses and per-doc shingling only detects pairwise.
  *
  * Engine-parity form: the boundary hash is the portable signed-64 MD5 of
  * the explicit `window`-char substring at every position — both engines
  * agree on it exactly. At 100 TB the per-position md5 becomes a rolling
  * Karp-Rabin hash inside one codegen expression (O(1) per position instead
  * of O(window)); the PLAN is unchanged: scan → position explode → per-doc
  * lag window (partitioned by doc, never global) → groupBy(chunk hash) with
  * map-side partials. Expected chunk length ≈ `divisor` chars.
  */
object Cdc {

  /** Exploded chunk table: (doc_id, cstart, clen, ch) — ch = md5 of the
    * chunk text. A document shorter than `window` yields one whole-doc
    * chunk; empty documents yield none. Cuts land at the END of each
    * matching window; the document end is always a cut.
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             window: Int, divisor: Int): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    val pos = d.select(col("doc_id"), col("__t"),
      explode(when(length(col("__t")) >= window,
          sequence(lit(1), length(col("__t")) - (window - 1)))
        .otherwise(array().cast("array<int>"))).as("i"))
    val cuts = pos
      .filter(pmod(GraftFunctions.md5Signed64(col("__t").substr(col("i"), lit(window))),
        lit(divisor.toLong)) === 0)
      .select(col("doc_id"), (col("i") + (window - 1)).cast("long").as("e"))
    assemble(d, cuts)
  }

  /** [[chunks]] with the rolling Karp-Rabin kernel
    * ([[graft.functions.CdcBoundaries]]): O(n) per document inside
    * whole-stage codegen, no position explode, no md5 per window — the
    * production cut path at 100 TB. Cut positions differ from [[chunks]]
    * (different boundary hash family), but every CDC property (content-
    * defined realignment, ~divisor mean chunk, lossless cover) is
    * identical, and the DuckDB twin reproduces the exact cut set by
    * evaluating each window's polynomial directly.
    */
  def chunksRolling(docs: DataFrame, idCol: String, textCol: String,
                    window: Int, divisor: Int): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    val cuts = d.select(col("doc_id"),
        explode(graft.functions.CdcFunctions.cdcCuts(col("__t"), window, divisor)).as("ei"))
      .select(col("doc_id"), col("ei").cast("long").as("e"))
    assemble(d, cuts)
  }

  /** Cut ENDS for whole-row chunking: the rolling kernel's cuts with the
    * document end appended (deduplicated). Callers MUST stage this as its
    * own column before [[chunkStructsFromEnds]] — a HOF lambda re-evaluates
    * its argument expressions per element, and this one contains the whole
    * rolling kernel (the staged-array lesson).
    */
  def chunkEnds(text: Column, window: Int, divisor: Int): Column = {
    val cuts = graft.functions.CdcFunctions.cdcCuts(text, window, divisor)
    val len = length(text)
    when(size(cuts) > 0 && element_at(cuts, -1) === len, cuts)
      .otherwise(concat(cuts, array(len)))
  }

  /** Whole-row chunking as ONE pure expression over STAGED attribute
    * columns (`text`, `ends` from [[chunkEnds]]) — array<struct<cstart,
    * clen, ch>>, no explode, no window: the STREAMING-safe form (a per-doc
    * lag window is stateful on a stream; this is stateless per arriving
    * row). Bit-identical chunks to [[chunksRolling]] — spec-pinned.
    */
  def chunkStructsFromEnds(text: Column, ends: Column): Column =
    transform(sequence(lit(1), size(ends)), i => {
      val prev = when(i === 1, lit(0)).otherwise(element_at(ends, i - 1))
      val e = element_at(ends, i)
      struct((prev + 1).cast("long").as("cstart"),
        (e - prev).cast("long").as("clen"),
        md5(text.substr(prev + 1, e - prev)).as("ch"))
    })

  /** Shared back half: cut ends → contiguous (start, end] chunk spans via a
    * per-DOC lag window → chunk md5. */
  private def assemble(d: DataFrame, cuts: DataFrame): DataFrame = {
    val ends = cuts
      .union(d.filter(length(col("__t")) > 0)
        .select(col("doc_id"), length(col("__t")).cast("long").as("e")))
      .distinct()
    val bounds = ends.withColumn("s",
      coalesce(lag(col("e"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("e"))), lit(0L)))
    bounds.join(d, "doc_id")
      .filter(col("e") > col("s"))
      .select(col("doc_id"), (col("s") + 1).as("cstart"),
        (col("e") - col("s")).as("clen"),
        md5(col("__t").substr((col("s") + 1).cast("int"), (col("e") - col("s")).cast("int"))).as("ch"))
  }

  /** DuckDB twin of [[chunks]] as a CTE chain ending in `cdc_chunks`
    * (doc_id, cstart, clen, ch) over the `documents` fixture.
    */
  def duckChunksCtes(window: Int, divisor: Int): String = {
    val h = OracleSql.signedMd564(s"substr(text, i, $window)")
    duckChunksCtesWith(s"(($h % $divisor + $divisor) % $divisor) = 0", window)
  }

  /** DuckDB twin of [[chunksRolling]]: the SAME window polynomial the
    * rolling kernel maintains incrementally, evaluated directly per window
    * (O(n·w) here — the oracle pays compute to stay algorithm-independent).
    */
  def duckChunksRollingCtes(window: Int, divisor: Int): String = {
    val h = s"list_reduce(list_transform(generate_series(0, ${window - 1}), " +
      s"j -> CAST(unicode(substr(text, i + j, 1)) AS BIGINT)), " +
      s"(a, c) -> (a * 31 + c) % 2147483647)"
    duckChunksCtesWith(s"$h % $divisor = 0", window)
  }

  private def duckChunksCtesWith(cutPredicate: String, window: Int): String =
    s"""cdc_pos AS (
          SELECT doc_id, unnest(generate_series(1, greatest(length(text) - ${window - 1}, 0))) AS i
          FROM documents),
        cdc_cuts AS (
          SELECT p.doc_id, CAST(p.i + ${window - 1} AS BIGINT) AS e
          FROM cdc_pos p JOIN documents d USING (doc_id)
          WHERE $cutPredicate),
        cdc_ends AS (
          SELECT DISTINCT doc_id, e FROM (
            SELECT doc_id, e FROM cdc_cuts
            UNION ALL
            SELECT doc_id, CAST(length(text) AS BIGINT) AS e
            FROM documents WHERE length(text) > 0) u),
        cdc_bounds AS (
          SELECT doc_id, e,
                 coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS s
          FROM cdc_ends),
        cdc_chunks AS (
          SELECT b.doc_id, b.s + 1 AS cstart, b.e - b.s AS clen,
                 md5(substr(d.text, CAST(b.s + 1 AS INTEGER), CAST(b.e - b.s AS INTEGER))) AS ch
          FROM cdc_bounds b JOIN documents d USING (doc_id)
          WHERE b.e > b.s)"""

  /** Corpus-level chunk dedup savings: one row —
    * (n_chunks, n_distinct, dup_chunks, total_chars, dup_chars, mean_chunk).
    * `dup_chars` is the storage the chunk store saves vs raw (every instance
    * of a chunk beyond the first is free).
    */
  def savings(ch: DataFrame): DataFrame = {
    val byChunk = ch.groupBy(col("ch"))
      .agg(count(lit(1)).as("n"), max(col("clen")).as("l"))
    byChunk.agg(
      sum(col("n")).as("n_chunks"),
      count(lit(1)).as("n_distinct"),
      (sum(col("n")) - count(lit(1))).as("dup_chunks"),
      sum(col("n") * col("l")).as("total_chars"),
      sum((col("n") - 1) * col("l")).as("dup_chars"),
      expr("sum(n * l) div sum(n)").as("mean_chunk"))
  }

  /** Cross-document shared-chunk pairs: per (doc_a < doc_b), how many
    * distinct chunks and characters they share. Chunks present in more than
    * `maxDocsPerChunk` documents are EXCLUDED before pairing (the same
    * hot-bucket cap every banded join here uses: a boilerplate chunk shared
    * by ten thousand docs is a frequency fact, not 10^8 useful pairs — at
    * scale it would be reported separately, never joined quadratically).
    */
  def sharedPairs(ch: DataFrame, maxDocsPerChunk: Int): DataFrame = {
    val docCh = ch.select(col("doc_id"), col("ch"), col("clen")).distinct()
    val eligible = docCh.groupBy(col("ch"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= maxDocsPerChunk)
      .select(col("ch"))
    val e = docCh.join(eligible, "ch")
    e.as("a").join(e.as("b"),
        col("a.ch") === col("b.ch") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_chunks"), sum(col("a.clen")).as("shared_chars"))
  }

  /** DuckDB twin of [[sharedPairs]] over `cdc_chunks` (same cap). */
  def duckSharedPairs(maxDocsPerChunk: Int): String =
    s"""cdc_docch AS (SELECT DISTINCT doc_id, ch, clen FROM cdc_chunks),
        cdc_eligible AS (
          SELECT ch FROM cdc_docch GROUP BY ch
          HAVING count(*) >= 2 AND count(*) <= $maxDocsPerChunk),
        cdc_pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS shared_chunks,
                 CAST(sum(a.clen) AS BIGINT) AS shared_chars
          FROM cdc_docch a JOIN cdc_eligible USING (ch)
          JOIN cdc_docch b ON b.ch = a.ch AND a.doc_id < b.doc_id
          GROUP BY 1, 2)"""
}
