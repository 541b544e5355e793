package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.{shinglesFromTokens, tokens}

/** Exact shingle-set similarity join via prefix filtering (the AllPairs /
  * PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08): every pair
  * with Jaccard >= t, with NO false negatives — the exact counterpart of the
  * MinHash-LSH candidate pipeline ([[MinHashLSH]]), for the dedup stages
  * where a probabilistic miss is not acceptable (e.g. benchmark
  * decontamination audits).
  *
  * The pruning rule: order every document's token set by one global total
  * order (document frequency ascending, then token — rare tokens first) and
  * keep only the first `|x| - ceil(t*|x|) + 1` tokens as its "prefix". If
  * J(x,y) >= t the two prefixes must share a token, so an inverted-index
  * self-join on prefix tokens generates a candidate superset; a size filter
  * (`min(|x|,|y|) >= t*max(|x|,|y|)` — Jaccard cannot reach t across a
  * larger size skew) prunes further, and an exact intersection verifies.
  * Correctness needs only SOME fixed global order; the rare-first choice is
  * the efficiency lever (frequent tokens land outside prefixes, so the
  * inverted index's hot buckets disappear).
  *
  * Scale shape (100 TB): tokenize + per-doc sort are scan-parallel; the df
  * dimension is vocabulary-sized (joined back by token — broadcast when it
  * fits, shuffle otherwise); the candidate join shuffles narrow
  * `(token, id, size)` prefix rows only — never whole documents, never the
  * O(n^2) pair space. Verification joins token arrays back by id, the same
  * candidate-then-verify shape as the LSH path. Thresholds are exact
  * integer arithmetic (t = num/den) on both engines.
  */
object PrefixJaccard {

  /** Per-doc distinct-shingle rows `(id, t)` — the same word-n-gram sets the
    * MinHash pipeline hashes ([[TextAnalysis.shinglesFromTokens]]; never an
    * empty array: short docs shingle to the whole text), so the exact join
    * and the LSH join rank the same pair population.
    */
  private def shingleRows(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int): DataFrame =
    graft.core.Readers.spread(
      df.select(col(idCol).as("id"), col(textCol).as("text")), col("id"))
      .withColumn("tk", tokens(col("text")))
      .select(col("id"), explode(shinglesFromTokens(col("tk"), shingleN)).as("t"))

  /** All pairs `(doc_a, doc_b, jaccard_micro)` with doc_a < doc_b and
    * shingle-set Jaccard >= num/den, jaccard_micro = floor(1e6*|inter|/|union|).
    */
  def pairs(df: DataFrame, idCol: String, textCol: String, shingleN: Int,
            num: Int, den: Int): DataFrame =
    pairsFromRows(shingleRows(df, idCol, textCol, shingleN), num, den)

  /** [[pairs]] from a pre-staged `(id, sh)` distinct-shingle frame
    * ([[MinHashLSH.shingled]] / the DedupStaging memo) — the seam that lets
    * the exact join share the one tokenize+shingle pass the LSH pipeline
    * already staged instead of re-running it (the r11 shared-staging item).
    * The explode reads a materialized array column, so the
    * InferFiltersFromGenerate recompute hazard documented on
    * [[MinHashLSH.signatures]] does not apply.
    */
  def pairsFromShingles(shingled: DataFrame, num: Int, den: Int): DataFrame =
    pairsFromRows(shingled.select(col("id"), explode(col("sh")).as("t")), num, den)

  /** Broadcast budget for the prefix inverted index (the
    * [[Similarity.EmbCosBroadcastBudgetBytes]] convention): when the
    * MEASURED index size fits, the candidate self-join broadcasts it —
    * Catalyst's own choice when its estimates are accurate, and 2.5×
    * faster at fixture scale; past the budget it hash-shuffles on the
    * prefix token (the 100 TB plan — a corpus-sized index must never
    * broadcast, and an SMJ would pay a pointless O(n log n) sort per side).
    * The pre-r12 text-input path got the broadcast via a stats
    * UNDERESTIMATE; the staged LogicalRDD input has no stats at all, so the
    * choice is made from measurement instead of estimate either way.
    */
  val PrefixBroadcastBudgetBytes: Long = 32L * 1024 * 1024

  /** Conservative per-row overhead (bytes) of a prefix-index row beyond its
    * token chars — three numeric columns plus hashed-relation bookkeeping.
    */
  private val PrefixRowOverheadBytes = 64L

  /** One row per doc: the full sorted token set (for exact verification),
    * the df-ordered set (for prefix extraction), and the set size — the
    * threshold-INDEPENDENT stage of the PPJoin, so one staged copy serves
    * every threshold (DedupStaging stages it per fixture dir). Returned
    * UN-materialized; [[pairsFromDocs]] reads it from three plan positions,
    * so callers must hand it a materialized (checkpointed) frame.
    */
  def docsFrame(tok: DataFrame): DataFrame = {
    // document frequency per token: the global-order key (df asc, token asc)
    val dfDim = tok.groupBy("t").agg(count(lit(1)).as("df"))
    tok.join(dfDim, "t")
      .groupBy("id")
      .agg(sort_array(collect_list(col("t"))).as("toks"),
        sort_array(collect_list(struct(col("df"), col("t")))).as("ord"))
      .withColumn("s", size(col("toks")).cast("long"))
  }

  private def pairsFromRows(tok: DataFrame, num: Int, den: Int): DataFrame =
    // eager checkpoint, NOT persist-and-unpersist: the returned frame reads
    // docs from three plan positions (prefix explode + both verify joins),
    // so its materialization must outlive this call — the pre-r12 form
    // unpersisted in a finally BEFORE the caller's action, which silently
    // recomputed the double-collect_list aggregate three times per run.
    // Blocks are reclaimed by the ContextCleaner once the result frame is
    // unreferenced (a deterministic release is impossible for a dependency
    // of a lazily-returned plan).
    pairsFromDocs(docsFrame(tok).localCheckpoint(), num, den)

  /** [[pairs]] from a pre-staged, MATERIALIZED [[docsFrame]]. */
  def pairsFromDocs(docs: DataFrame, num: Int, den: Int): DataFrame =
    pairsFromDocs(docs, num, den, PrefixBroadcastBudgetBytes)

  /** Budget-parameterized form so the spec can pin BOTH guard paths (the
    * embcos-guard convention): broadcast under the budget, shuffle-hash
    * past it.
    */
  private[graft] def pairsFromDocs(docs: DataFrame, num: Int, den: Int,
                                   budgetBytes: Long): DataFrame = {
    require(num > 0 && num <= den, s"threshold $num/$den must be in (0, 1]")
    locally {
      // prefix length |x| - ceil(t|x|) + 1, all-integer ceil; posexplode
      // keeps each prefix token's 1-based position for the positional filter
      val withPlen = docs
        .withColumn("plen", expr(s"s - ((s * $num + ${den - 1}) div $den) + 1"))
      val prefixed = withPlen
        .select(col("id"), col("s"),
          posexplode(expr("transform(slice(ord, 1, int(plen)), x -> x.t)")).as(Seq("p0", "pt")))
        .withColumn("px", col("p0") + 1).drop("p0")
      // measure the index (docs is materialized, so this one ≤1-row agg
      // reads blocks, not a corpus pass) and pick the join per
      // PrefixBroadcastBudgetBytes
      val indexBytes = withPlen
        .agg(coalesce(sum(expr(
          s"aggregate(slice(ord, 1, int(plen)), 0L, (acc, x) -> acc + length(x.t) + $PrefixRowOverheadBytes)")),
          lit(0L)))
        .head.getLong(0)
      val build =
        if (indexBytes <= budgetBytes) prefixed.hint("broadcast")
        else prefixed.hint("shuffle_hash")
      // inverted-index candidate join on prefix tokens + two sound prunes:
      // size filter (Jaccard >= t forces min/max >= t) and PPJoin's
      // positional filter — overlap <= 1 + min(|x|-px, |y|-py) for a pair's
      // FIRST common token (everything before px in x is absent from y, by
      // minimality under the shared global order), and that token is in
      // both prefixes with the LOOSEST bound of any common token, so
      // pruning every index row by its own bound never loses a qualifying
      // pair. Jaccard >= t needs overlap >= ceil(t/(1+t)·(|x|+|y|)), stated
      // division-free by cross-multiplying with t = num/den
      val cand = prefixed.as("a")
        .join(build.as("b"),
          col("a.pt") === col("b.pt") && col("a.id") < col("b.id") &&
            least(col("a.s"), col("b.s")) * den >= greatest(col("a.s"), col("b.s")) * num &&
            (lit(1L) + least(col("a.s") - col("a.px"), col("b.s") - col("b.px"))) * (num + den)
              >= (col("a.s") + col("b.s")) * num)
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
        .distinct()
      // exact verify: inter*den >= num*(|a|+|b|-inter)
      val byId = docs.select(col("id"), col("toks"), col("s"))
      cand
        .join(byId.select(col("id").as("doc_a"), col("toks").as("ta"), col("s").as("sa")), "doc_a")
        .join(byId.select(col("id").as("doc_b"), col("toks").as("tb"), col("s").as("sb")), "doc_b")
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
        .filter(col("inter") * den >= (col("sa") + col("sb") - col("inter")) * num)
        .select(col("doc_a"), col("doc_b"),
          expr("(1000000 * inter) div (sa + sb - inter)").as("jaccard_micro"))
    }
  }

  /** DuckDB oracle: BRUTE-FORCE all-pairs exact Jaccard — deliberately
    * algorithm-independent ground truth, so the gate proves the prefix
    * pruning loses no pair (the no-false-negative claim), not merely that
    * two copies of the same pruning agree.
    */
  def duckPairs(table: String, idCol: String, textCol: String, shingleN: Int,
                num: Int, den: Int): String =
    s"""WITH ${MinHashLSH.duckShingleCte(table, idCol, textCol, shingleN)},
        sized AS (SELECT id, list_sort(sh) AS toks,
                         CAST(len(sh) AS BIGINT) AS s FROM shs)
        SELECT a.id AS doc_a, b.id AS doc_b,
               (1000000 * CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT))
                 // (a.s + b.s - len(list_intersect(a.toks, b.toks))) AS jaccard_micro
        FROM sized a JOIN sized b ON a.id < b.id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) * $den
                >= (a.s + b.s - len(list_intersect(a.toks, b.toks))) * $num
        ORDER BY doc_a, doc_b"""
}
