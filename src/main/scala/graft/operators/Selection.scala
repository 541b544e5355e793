package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling"): score every document by the
  * log-likelihood ratio of its hashed n-gram features under a TARGET domain
  * distribution vs the RAW corpus distribution, then keep the top slice —
  * the standard recipe for "find the web documents that look like the
  * high-quality domain" at pretraining scale.
  *
  * Shape at 100 TB: one bigram-explode scan builds TWO bucket histograms
  * (`buckets` rows each — hashed feature space, NOT vocabulary-sized, the
  * point of DSIR's hashing trick), the per-bucket log-ratio table is
  * broadcast (kilobytes), and scoring is one more explode + map-side-summed
  * groupBy(doc). No shuffle carries anything wider than (doc_id, micro sum).
  *
  * Cross-engine exactness: the log-likelihood needs ln, which is float — so
  * both engines evaluate [[lnMicroSparkSql]]/[[duckLnMicro]], an INTEGER
  * micro fixed-point ln (bit-length argument reduction + 5-term atanh
  * series; every step is the same positive-integer arithmetic in both
  * engines, so the scores agree bit-for-bit; absolute accuracy vs true ln
  * is ~1e-5, irrelevant to a selection ranking).
  */
object Selection {

  /** ln(2) in micro fixed point (floor). */
  val Ln2Micro = 693147L

  /** Integer micro-ln pieces, shared by both engine templates:
    * for x ≥ 1, with b = bitlength(x)-1 and p = 2^b (so y = x/p ∈ [1,2)),
    * ln(x) = b·ln2 + 2·atanh(z), z = (x−p)/(x+p) ∈ [0, 1/3). The odd
    * series z + z³/3 + z⁵/5 + z⁷/7 + z⁹/9 truncates at ≤ 2·z¹¹/11 < 1e-6.
    * All operands stay positive, so Spark's truncating `div` and DuckDB's
    * flooring `//` agree on every division.
    */
  private def lnMicroTpl(x: String, DIV: String, shl: String => String): String = {
    val b = s"(length(bin($x)) - 1)"
    val p = shl(b)
    val z = s"((($x - $p) * 1000000) $DIV ($x + $p))"
    val z2 = s"(($z * $z) $DIV 1000000)"
    val z4 = s"(($z2 * $z2) $DIV 1000000)"
    val t3 = s"((($z2 * $z) $DIV 1000000) $DIV 3)"
    val t5 = s"((($z4 * $z) $DIV 1000000) $DIV 5)"
    val t7 = s"(((($z4 * $z2) $DIV 1000000) * $z $DIV 1000000) $DIV 7)"
    val t9 = s"(((($z4 * $z4) $DIV 1000000) * $z $DIV 1000000) $DIV 9)"
    s"(CAST($b AS BIGINT) * $Ln2Micro + 2 * ($z + $t3 + $t5 + $t7 + $t9))"
  }

  /** Spark SQL (for `expr`) integer micro-ln of positive-BIGINT column/expr
    * `x`. NOTE: `x` is textually substituted many times — pass a COLUMN
    * NAME, not a wide subexpression.
    */
  def lnMicroSparkSql(x: String): String =
    lnMicroTpl(x, "div", b => s"shiftleft(CAST(1 AS BIGINT), $b)")

  /** DuckDB twin of [[lnMicroSparkSql]] — same arithmetic, `//` and `<<`. */
  def duckLnMicro(x: String): String =
    lnMicroTpl(x, "//", b => s"(CAST(1 AS BIGINT) << $b)")

  /** Word-bigram array over an ALREADY-STAGED token-array column. `tk` must
    * be an attribute, not an inline `split(...)` — a HOF lambda re-evaluates
    * its argument expressions per element, so an inline split turns this
    * quadratic (the recorded staged-array lesson; measured on the sf0.1
    * bench). Empty when < 2 tokens — Spark's `sequence(1, 0)` counts DOWN,
    * so the guard is load-bearing, unlike DuckDB's empty
    * `generate_series(1, 0)`.
    */
  def bigramsFromTokens(tk: Column): Column =
    when(size(tk) >= 2,
      transform(sequence(lit(1), size(tk) - 1),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Convenience form for cold paths; hot paths stage the token array. */
  def bigrams(text: Column): Column = bigramsFromTokens(split(text, " "))

  def duckBigrams(text: String): String =
    s"list_transform(generate_series(1, greatest(len(string_split($text, ' ')) - 1, 0)), " +
      s"i -> string_split($text, ' ')[i] || ' ' || string_split($text, ' ')[i + 1])"

  /** Hashed-feature bucket of one bigram string: floor-mod of the portable
    * signed-64 MD5 (same machinery as the verifier's sparse mode, P7).
    */
  def bucketOf(bg: Column, buckets: Int): Column =
    pmod(GraftFunctions.md5Signed64(bg), lit(buckets.toLong))

  def duckBucketOf(bgSql: String, buckets: Int): String = {
    val h = graft.core.OracleSql.signedMd564(bgSql)
    s"CAST((($h % $buckets + $buckets) % $buckets) AS BIGINT)"
  }

  /** Stage an integer micro-ln column: `out` = lnMicro(`in`), where `in` is
    * an existing positive-BIGINT column name.
    */
  private def withLnMicro(df: DataFrame, in: String, out: String): DataFrame =
    df.withColumn(out, expr(lnMicroSparkSql(in)))

  /** Per-document DSIR importance weight in micro fixed point:
    * `dsir_micro(d) = Σ_{bigram g ∈ d} ln p̂_target(bucket(g)) − ln p̂_raw(bucket(g))`
    * with add-1 smoothing over the `buckets`-way hashed feature space
    * (p̂(β) = (n_β + 1)/(T + buckets)). Documents with no bigrams score 0.
    * Output: (doc_id, <carry cols>, n_bigrams, dsir_micro).
    *
    * `isTarget` marks the rows whose bigram distribution defines the target
    * domain; every document (target and raw alike) is scored — a useful
    * self-check is that target members rank high.
    */
  /** (doc_id, is_t, bkt) — one row per bigram occurrence: the single
    * corpus-explode pass every DSIR stage reads. */
  private def bucketed(docs: DataFrame, idExpr: Column, textCol: String,
                       isTarget: Column, buckets: Int): DataFrame =
    docs.select(idExpr.as("doc_id"), isTarget.as("is_t"),
        split(col(textCol), " ").as("__tk"))
      .select(col("doc_id"), col("is_t"),
        explode(bigramsFromTokens(col("__tk"))).as("bg"))
      .select(col("doc_id"), col("is_t"), bucketOf(col("bg"), buckets).as("bkt"))

  /** (bkt, n_t, n_r) per-bucket target/raw occurrence counts — ≤ `buckets`
    * rows, the single aggregate every llr consumer derives from. */
  private def countsFromBucketed(bg: DataFrame): DataFrame =
    bg.groupBy(col("bkt")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("n_t"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("n_r"))

  private def llrFromCounts(counts: DataFrame, buckets: Int): DataFrame = {
    val totals = counts.agg(
      (sum(col("n_t")) + buckets).as("tt"), (sum(col("n_r")) + buckets).as("tr"))
    val llr0 = counts.crossJoin(broadcast(totals))
      .withColumn("nt1", col("n_t") + 1L)
      .withColumn("nr1", col("n_r") + 1L)
    Seq(("nt1", "ln_nt"), ("nr1", "ln_nr"), ("tt", "ln_tt"), ("tr", "ln_tr"))
      .foldLeft(llr0) { case (d, (in, out)) => withLnMicro(d, in, out) }
      .select(col("bkt"),
        (col("ln_nt") - col("ln_tt") - col("ln_nr") + col("ln_tr")).as("llr_micro"))
  }

  private def llrFromBucketed(bg: DataFrame, buckets: Int): DataFrame =
    llrFromCounts(countsFromBucketed(bg), buckets)

  /** The complete frozen scorer for [[dsirScoreRows]] in ONE corpus pass:
    * (llr map, unseen-bucket default llr). Previously its two halves
    * (llrTable + smoothedTotals) each exploded the corpus; here the
    * ≤ `buckets`-row per-bucket count table is staged once and both the llr
    * table and the smoothed totals read it. Bounded driver state: `buckets`
    * map entries plus two longs.
    */
  def frozenScorer(docs: DataFrame, textCol: String, isTarget: Column,
                   buckets: Int): (Map[Long, Long], Long) = {
    val counts = countsFromBucketed(
      bucketed(docs, lit(0L), textCol, isTarget, buckets)).persist()
    val llr = llrFromCounts(counts, buckets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t = counts.agg(
      (sum(col("n_t")) + buckets).as("tt"), (sum(col("n_r")) + buckets).as("tr"))
      .head()
    counts.unpersist(blocking = false)
    (llr, lnMicroLong(t.getLong(1)) - lnMicroLong(t.getLong(0)))
  }

  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int,
                  carryCols: Seq[String] = Nil): DataFrame = {
    // persist barrier: the exploded bucket frame feeds BOTH the histogram
    // (llr training) and the per-doc scoring sum — without it the corpus
    // explodes and hashes twice (measured 2x on the sf0.1 bench)
    val bg = bucketed(docs, col(idCol), textCol, isTarget, buckets).persist()
    val llr = llrFromBucketed(bg, buckets)
    val perDoc = bg.join(broadcast(llr), "bkt")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("llr_micro")).as("dsir_micro"))
    docs.select((Seq(col(idCol).as("doc_id")) ++ carryCols.map(col)): _*)
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select((Seq(col("doc_id")) ++ carryCols.map(col) :+
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams") :+
        coalesce(col("dsir_micro"), lit(0L)).as("dsir_micro")): _*)
  }

  /** Scala mirror of [[lnMicroSparkSql]] — the SAME integer algorithm
    * (truncating division on positives), for driver-side constants like the
    * unseen-bucket default. Spec-pinned equal to the SQL form.
    */
  def lnMicroLong(x: Long): Long = {
    require(x >= 1, s"lnMicroLong($x)")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val p = 1L << b
    val z = (x - p) * 1000000L / (x + p)
    val z2 = z * z / 1000000L
    val z4 = z2 * z2 / 1000000L
    b.toLong * Ln2Micro + 2L * (z + (z2 * z / 1000000L) / 3L +
      (z4 * z / 1000000L) / 5L + ((z4 * z2 / 1000000L) * z / 1000000L) / 7L +
      ((z4 * z4 / 1000000L) * z / 1000000L) / 9L)
  }

  /** Stateless per-row DSIR scoring with a FROZEN scorer: the llr table
    * (collected once — `buckets` rows, kilobytes) rides to every executor as
    * a map literal, and each document is scored by a pure expression over
    * its own bigrams. Works identically on batch and STREAMING frames — the
    * streaming query holds ZERO state (append mode, no watermark, no
    * shuffle): the ingest-time "does this doc look like the target domain"
    * gate. `defaultLlr` covers buckets unseen at training time
    * (lnM(T_raw+B) − lnM(T_target+B), both smoothed counts being 1).
    */
  def dsirScoreRows(docs: DataFrame, idCol: String, textCol: String,
                    llr: Map[Long, Long], defaultLlr: Long,
                    buckets: Int): DataFrame = {
    val ks = llr.keys.toArray.sorted
    val m = map_from_arrays(lit(ks), lit(ks.map(llr)))
    // stage tokens, then the bigram array, as columns: every HOF lambda
    // must reference attributes (the recorded staged-array lesson)
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__tk"))
      .select(col("doc_id"), bigramsFromTokens(col("__tk")).as("__bg"))
      .select(col("doc_id"),
        size(col("__bg")).cast("long").as("n_bigrams"),
        aggregate(
          transform(col("__bg"),
            g => coalesce(element_at(m, bucketOf(g, buckets)), lit(defaultLlr))),
          lit(0L), (acc, x) => acc + x).as("dsir_micro"))
  }

  /** DuckDB twin of [[dsirWeights]] over the `documents` fixture: same
    * bucket hash, same smoothing, same integer micro-ln — CTE stages mirror
    * the Spark column stages. `targetSql` is the is-target predicate.
    */
  def duckDsirWeights(targetSql: String, buckets: Int,
                      carrySql: Seq[String] = Nil,
                      table: String = "documents"): String = {
    val carry = if (carrySql.isEmpty) "" else carrySql.mkString(", ", ", ", "")
    s"""WITH bg AS (
          SELECT doc_id, ($targetSql) AS is_t,
                 ${duckBucketOf("g", buckets)} AS bkt
          FROM (SELECT *, unnest(${duckBigrams("text")}) AS g FROM $table) ex),
        counts AS (
          SELECT bkt,
                 CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
                 CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS n_r
          FROM bg GROUP BY bkt),
        tot AS (
          SELECT CAST(sum(n_t) + $buckets AS BIGINT) AS tt,
                 CAST(sum(n_r) + $buckets AS BIGINT) AS tr
          FROM counts),
        staged AS (
          SELECT bkt, CAST(n_t + 1 AS BIGINT) AS nt1, CAST(n_r + 1 AS BIGINT) AS nr1,
                 tt, tr
          FROM counts, tot),
        llr AS (
          SELECT bkt, ${duckLnMicro("nt1")} - ${duckLnMicro("tt")}
                      - ${duckLnMicro("nr1")} + ${duckLnMicro("tr")} AS llr_micro
          FROM staged),
        per_doc AS (
          SELECT bg.doc_id, count(*) AS n_bigrams,
                 CAST(sum(llr_micro) AS BIGINT) AS dsir_micro
          FROM bg JOIN llr USING (bkt) GROUP BY bg.doc_id)
        SELECT d.doc_id$carry,
               coalesce(p.n_bigrams, 0) AS n_bigrams,
               coalesce(p.dsir_micro, 0) AS dsir_micro
        FROM $table d LEFT JOIN per_doc p USING (doc_id)"""
  }
}
