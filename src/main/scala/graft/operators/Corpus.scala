package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.OracleSql
import graft.functions.GraftFunctions

/** Corpus-management primitives for a training-data pipeline: deterministic
  * train/val/test splitting and per-stratum downsampling. Both are pure
  * per-row hash predicates over the document id — scan-parallel, no shuffle,
  * reproducible across runs/engines/partitionings (the same MD5-derived
  * signed-64 bucket the verifier's sparse mode uses, P7).
  */
object Corpus {

  /** Uniform hash bucket in [0, mod): floor-mod of the signed-64 MD5 of the
    * id rendered as text — portable to any engine that can md5 a string.
    */
  def hashBucket(id: Column, mod: Int): Column =
    pmod(GraftFunctions.md5Signed64(id.cast("string")), lit(mod.toLong))

  /** DuckDB twin; floor-mod, not %, for negative hash values. */
  def duckHashBucket(idSql: String, mod: Int): String = {
    val h = OracleSql.signedMd564(s"CAST($idSql AS VARCHAR)")
    s"CAST((($h % $mod + $mod) % $mod) AS BIGINT)"
  }

  /** Deterministic split assignment: percentile thresholds over the 100-way
    * hash bucket — e.g. (90, 95) = 90% train / 5% val / 5% test. A document's
    * split never changes as the corpus grows (id-keyed, not position-keyed).
    */
  def splitAssign(id: Column, trainPct: Int, valPct: Int): Column = {
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  def duckSplitAssign(idSql: String, trainPct: Int, valPct: Int): String = {
    val b = duckHashBucket(idSql, 100)
    s"CASE WHEN $b < $trainPct THEN 'train' " +
      s"WHEN $b < ${trainPct + valPct} THEN 'val' ELSE 'test' END"
  }

  /** Stratified keep-predicate: stratum s keeps 1/rates(s) of its rows
    * (deterministic hash sample per stratum; unlisted strata use
    * `defaultRate`). The per-stratum rates are plan literals on both engines.
    */
  def stratifiedKeep(id: Column, stratum: Column, rates: Map[String, Int],
                     defaultRate: Int): Column = {
    val rate = rates.foldLeft(lit(defaultRate): Column) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    pmod(GraftFunctions.md5Signed64(id.cast("string")), rate.cast("long")) === 0
  }

  def duckStratifiedKeep(idSql: String, stratumSql: String, rates: Map[String, Int],
                         defaultRate: Int): String = {
    val rate = rates.toSeq.sortBy(_._1)
      .map { case (s, r) => s"WHEN $stratumSql = '$s' THEN $r" }
      .mkString("CASE ", " ", s" ELSE $defaultRate END")
    val h = OracleSql.signedMd564(s"CAST($idSql AS VARCHAR)")
    s"(($h % ($rate) + ($rate)) % ($rate)) = 0"
  }

  /** Eval-set decontamination: ids of `train` documents sharing ANY word
    * n-gram shingle with the (small) `eval` corpus. The eval shingle set is
    * broadcast — at corpus scale (100 TB train, MB-scale benchmark suites)
    * the train side stays a scan + broadcast left-semi join with no large
    * shuffle; the output is the (tiny) contaminated-id set for an anti-join.
    * Generators stay inline per the InferFiltersFromGenerate note on
    * [[MinHashLSH.signatures]].
    */
  def contaminatedIds(train: org.apache.spark.sql.DataFrame,
                      eval: org.apache.spark.sql.DataFrame,
                      idCol: String, textCol: String, shingleN: Int): org.apache.spark.sql.DataFrame = {
    import TextAnalysis.{shinglesFromTokens, tokens}
    val evalShingles = eval
      .withColumn("tk", tokens(col(textCol)))
      .select(explode(shinglesFromTokens(col("tk"), shingleN)).as("shingle"))
      .distinct()
    graft.core.Readers.spread(train, col(idCol))
      .withColumn("tk", tokens(col(textCol)))
      .select(col(idCol), explode(shinglesFromTokens(col("tk"), shingleN)).as("shingle"))
      .join(broadcast(evalShingles), Seq("shingle"), "left_semi")
      .select(idCol).distinct()
  }
}
