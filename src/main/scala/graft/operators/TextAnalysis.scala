package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a large-scale training-data pipeline:
  * tokenization, quality scoring, stopword-profile language ID, BPE-ish token
  * counting, and bottom-k document fingerprints.
  *
  * Every primitive is a pure per-row expression (no UDFs, no shuffles): at
  * 100 TB these run embarrassingly parallel inside whole-stage codegen
  * directly over the parquet scan. Each Spark builder has a DuckDB twin
  * (`duck*`) generated from the same constants so oracle SQL can't drift.
  */
object TextAnalysis {

  /** Whitespace tokens. Fixture text is single-space delimited. */
  def tokens(text: Column): Column = split(text, " ")
  def duckTokens(text: String): String = s"string_split($text, ' ')"

  /** PII-shaped token detectors (see `text_pii_scan`). LIKE patterns and a
    * digit-stripping regexp_replace only — constructs whose semantics are
    * identical in Java regex and RE2, so the DuckDB twin can't drift. The
    * synthetic fixture is PII-free by construction (the oracle-gated zeros
    * are the correct answer there); PrivacySpec pins each detector's
    * positive/negative behavior on hand-built tokens.
    */
  def isEmailToken(tk: Column): Column = tk.like("%@%.%")
  def isLongNumToken(tk: Column): Column =
    length(tk) - length(regexp_replace(tk, "[0-9]", "")) >= 7
  def isUrlToken(tk: Column): Column = tk.like("http%") || tk.like("www.%")

  /** Per-document PII-shaped-token density (tokens per million) as one
    * per-row expression over a staged token array — the graft-curate
    * `--max-pii-per-million` gate. Counts are HOF filters, no explode; the
    * double division is exact-floor here (operands < 2^53, quotient either
    * exactly integral or ≥ 1/|tokens| away from one).
    */
  def piiPerMillion(tk: Column): Column = {
    val hits = size(filter(tk, isEmailToken _)) +
      size(filter(tk, isLongNumToken _)) + size(filter(tk, isUrlToken _))
    when(size(tk) > 0,
      floor(hits.cast("double") * 1000000d / size(tk)).cast("long"))
      .otherwise(lit(0L))
  }

  /** Redact PII-shaped tokens in place — the transform twin of the
    * `--max-pii-per-million` drop gate (redaction keeps the document, the
    * standard choice when the surrounding text is valuable): every
    * detector-positive token becomes the `<PII>` sentinel, document
    * structure otherwise preserved. One per-row HOF over a staged token
    * array — scan-parallel, no shuffle.
    */
  def redactPii(tk: Column): Column =
    array_join(transform(tk, t =>
      when(isEmailToken(t) || isLongNumToken(t) || isUrlToken(t), lit("<PII>"))
        .otherwise(t)), " ")

  /** DuckDB twin of [[redactPii]] over a staged token-array column. */
  def duckRedactPii(tkCol: String): String =
    s"array_to_string(list_transform($tkCol, t -> CASE WHEN t LIKE '%@%.%' " +
      "OR length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) >= 7 " +
      "OR t LIKE 'http%' OR t LIKE 'www.%' THEN '<PII>' ELSE t END), ' ')"

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash dedup.
    * Documents shorter than n words shingle to the whole text.
    */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)

  /** Shingles over an already-computed token array. Callers doing heavy
    * downstream work should materialize the token array as its own column
    * first — expressions referenced inside lambdas are re-evaluated per
    * element, so an inline `split()` here turns shingling quadratic.
    */
  def shinglesFromTokens(tk: Column, n: Int): Column = {
    // explicit short-doc branch: relying on concat_ws to drop the NULL
    // tokens of a partial window is Spark-specific (DuckDB concat keeps the
    // literal separators), so both engines take the whole-text fallback
    val grams = transform(
      sequence(lit(1), size(tk) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + o)): _*))
    when(size(tk) >= n, array_distinct(grams))
      .otherwise(array(array_join(tk, " ")))
  }

  /** Shingle expression over an already-materialized token-array column
    * `tkCol` (DuckDB rejects subqueries inside lambdas, so callers stage the
    * token split through a CTE and pass its column name here).
    */
  def duckShinglesExpr(tkCol: String, n: Int): String = {
    val parts = (0 until n).map(o => s"$tkCol[i+$o]").mkString(", ' ', ")
    s"CASE WHEN len($tkCol) >= $n THEN " +
      s"list_distinct(list_transform(generate_series(1, len($tkCol) - ${n - 1}), " +
      s"i -> concat($parts))) ELSE [array_to_string($tkCol, ' ')] END"
  }

  /** Small function-word profiles per language. Real pipelines use character
    * n-gram profiles (fastText-style); word profiles keep the operator
    * SQL-expressible for the oracle. CJK needs char-level profiles — the
    * fixture corpus is space-delimited, so word-level suffices here.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "es", "se", "no", "por"),
    "fr" -> Seq("le", "la", "et", "un", "une", "est", "que", "dans", "pour", "sur"),
    "zh" -> Seq("的", "是", "在", "了", "不", "我", "有", "他", "这", "中")
  )

  val langs: Seq[String] = stopwords.keys.toSeq.sorted

  /** Count of tokens that appear in `words` (with multiplicity). */
  def matchCount(tk: Column, words: Seq[String]): Column =
    size(filter(tk, t => array_contains(array(words.map(lit): _*), t)))

  def duckMatchCount(tkSql: String, words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($tkSql, t -> list_contains($arr, t)))"
  }

  /** Per-language stopword ratio, the language-ID score. */
  def langScore(tk: Column, lang: String): Column =
    matchCount(tk, stopwords(lang)).cast("double") / size(tk)

  def duckLangScore(tkSql: String, lang: String): String =
    s"CAST(${duckMatchCount(tkSql, stopwords(lang))} AS DOUBLE) / len($tkSql)"

  /** Argmax over per-language scores with alphabetical tiebreak: evaluated in
    * sorted-lang order, first language whose score >= every other wins.
    */
  def predictedLang(scores: Map[String, Column]): Column =
    langs.init.foldRight(lit(langs.last)) { (lang, rest) =>
      val ge = langs.filter(_ != lang).map(o => scores(lang) >= scores(o)).reduce(_ && _)
      when(ge, lang).otherwise(rest)
    }

  def duckPredictedLang(scoreSql: String => String): String = {
    val cases = langs.init.map { lang =>
      val ge = langs.filter(_ != lang)
        .map(o => s"${scoreSql(lang)} >= ${scoreSql(o)}").mkString(" AND ")
      s"WHEN $ge THEN '$lang'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${langs.last}' END"
  }

  /** Composite quality score over a token-array column: length saturation
    * (40%), lexical diversity (30%), English-stopword plausibility (30%) —
    * the blend `text_stats`, `corpus_curated`, and the curate CLI all share
    * (one definition so the thresholded pipelines can't drift).
    */
  def qualityScore(tk: Column): Column =
    least(size(tk).cast("double") / 100.0, lit(1.0)) * 0.4 +
      (size(array_distinct(tk)).cast("double") / size(tk)) * 0.3 +
      least(langScore(tk, "en") * 5.0, lit(1.0)) * 0.3

  def duckQualityScore(tkSql: String): String =
    s"least(len($tkSql) / 100.0, 1.0) * 0.4 + " +
      s"(CAST(len(list_distinct($tkSql)) AS DOUBLE) / len($tkSql)) * 0.3 + " +
      s"least(${duckLangScore(tkSql, "en")} * 5.0, 1.0) * 0.3"

  /** BPE-ish piece pattern: letter runs, digit runs, single other non-space.
    * Identical regex semantics in Java (Spark) and RE2 (DuckDB).
    */
  val piecePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Bottom-k sketch of character n-gram MD5 hashes — a winnowing-style
    * document fingerprint (Schleimer et al., SIGMOD'03): deterministic,
    * engine-portable, and comparable via overlap of the k minima.
    */
  def fingerprint(text: Column, n: Int, k: Int): Column = {
    val hashes = transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => md5(text.substr(i, lit(n))))
    md5(array_join(slice(array_sort(array_distinct(hashes)), 1, k), ""))
  }

  def duckFingerprint(text: String, n: Int, k: Int): String =
    s"md5(array_to_string(list_slice(list_sort(list_distinct(" +
      s"list_transform(generate_series(1, greatest(length($text) - ${n - 1}, 1)), " +
      s"i -> md5($text[i:i+${n - 1}])))), 1, $k), ''))"
}
