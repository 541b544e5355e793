package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary-level text operators for a training-data pipeline: TF-IDF term
  * scoring and an inverted (term → postings) index — the corpus-wide
  * complements to [[TextAnalysis]]'s per-row signals.
  *
  * Cross-engine parity: scores use a reciprocal-df TF-IDF variant,
  * `tf/len × N/df`, computed entirely in 64-bit INTEGER arithmetic
  * (`floor(1e6·tf·N / (df·len))` via integer division) — no `ln`, so there is
  * no libm last-ulp risk between JVM `Math.log` and DuckDB's C `log`. The
  * classic `ln(N/df)` weighting is a one-expression swap where exactness is
  * not required.
  *
  * Scale shape (100 TB): both operators are explode → hash-aggregate with
  * map-side partial combine; the only wide exchanges are keyed by term
  * (vocabulary-sized, Zipf-distributed — AQE skew handling or a stopword cap
  * absorbs the hot head). The tf⋈df join is an equi-join on term that AQE
  * broadcasts when the vocabulary is small.
  */
object Vocab {

  import TextAnalysis.{duckTokens, tokens}

  /** Top-k terms per document by integer TF-IDF.
    * Output: (doc_id, term, tfidf_micro, rank), rank 1..k per document.
    *
    * Generators stay inline (not an explode of a projected `split()`
    * attribute): InferFiltersFromGenerate would re-substitute the defining
    * expression into a pushed filter and recompute it per row — the round-4
    * regression documented on [[MinHashLSH.signatures]].
    *
    * Numeric bound: `tfidf_micro = (1e6 * tf * n_docs) div (df * len)` is
    * int64 throughout, so the numerator must stay under 2^63 ≈ 9.2e18 —
    * i.e. `tf * n_docs < 9.2e12`. A 1e9-document corpus is safe while
    * `tf < 9200` (per-doc term frequency); beyond that, stage the division
    * as `(1e6 * tf div len) * something` or widen to decimal(38,0) on BOTH
    * engines — the DuckDB twin shares the same int64 formula, so a silent
    * Spark wrap would be an overflow DuckDB raises on instead.
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val ex = graft.core.Readers.spread(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("len"),
        explode(tokens(col(textCol))).as("term"))
    val tf = ex.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        expr("(1000000 * tf * n_docs) div (df * len)").as("tfidf_micro"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_micro").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("doc_id", "rank")
  }

  /** DuckDB twin of [[tfIdfTopK]] over the `documents` fixture. */
  def duckTfIdfTopK(k: Int): String =
    s"""WITH ex AS (SELECT doc_id, CAST(len(${duckTokens("text")}) AS BIGINT) AS len,
                           unnest(${duckTokens("text")}) AS term FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf, max(len) AS len
              FROM ex GROUP BY doc_id, term),
       df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       nd AS (SELECT count(*) AS n_docs FROM documents),
       scored AS (SELECT doc_id, term,
                         (1000000 * tf * n_docs) // (df * len) AS tfidf_micro
                  FROM tf JOIN df USING (term) CROSS JOIN nd)
       SELECT doc_id, term, tfidf_micro, rank FROM (
         SELECT doc_id, term, tfidf_micro,
                CAST(row_number() OVER (PARTITION BY doc_id
                  ORDER BY tfidf_micro DESC, term ASC) AS BIGINT) AS rank
         FROM scored) t
       WHERE rank <= $k ORDER BY doc_id, rank"""

  /** Inverted index: one row per distinct term with its document frequency
    * and an MD5 digest of the sorted posting list (doc ids). The digest keeps
    * the compared output narrow; a production sink would write the postings
    * themselves, partitioned by term range. Postings are per-term
    * `collect_list` buffers — bounded by document frequency; a stopword-class
    * term holds its whole posting list in one buffer, so corpus-scale builds
    * cap df (drop terms present in >X% of documents — they carry no retrieval
    * signal) or shard the digest Merkle-style like
    * [[graft.core.Fingerprints]].
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = graft.core.Readers.spread(docs, col(idCol))
      .select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
    ex.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        md5(array_join(
          transform(array_sort(collect_list(col("id"))), x => x.cast("string")),
          ",")).as("postings_md5"))
      .orderBy("term")
  }

  /** DuckDB twin of [[invertedIndex]] over the `documents` fixture. */
  def duckInvertedIndex: String =
    s"""WITH toks AS (SELECT doc_id, list_distinct(${duckTokens("text")}) AS tk
                      FROM documents),
       ex AS (SELECT doc_id, unnest(tk) AS term FROM toks)
       SELECT term, count(*) AS df,
              md5(array_to_string(list_sort(list(doc_id)), ',')) AS postings_md5
       FROM ex GROUP BY term ORDER BY term"""
}
