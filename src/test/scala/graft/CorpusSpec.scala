package graft

import org.apache.spark.sql.functions._

import graft.core.Readers
import graft.operators.{Corpus, KMeans}

/** Invariants of the corpus-management and centroid-training operators that
  * the DuckDB oracle's value-compare can't express directly.
  */
class CorpusSpec extends SparkSpec {

  test("hash split partitions the corpus and is stable under corpus growth") {
    val docs = Readers.fixture(spark, sfDir, "documents")
    val withSplit = docs.select(col("doc_id"),
      Corpus.splitAssign(col("doc_id"), 90, 5).as("split")).persist()
    assert(withSplit.count() == docs.count())
    assert(withSplit.select("split").distinct().count() <= 3)
    // id-keyed, not position-keyed: a subset's assignments match the full run
    val subset = docs.filter(col("doc_id") % 3 === 0).select(col("doc_id"),
      Corpus.splitAssign(col("doc_id"), 90, 5).as("split2"))
    assert(withSplit.join(subset, "doc_id")
      .filter(col("split") =!= col("split2")).count() == 0)
  }

  test("stratified sampling keeps roughly 1/rate per stratum, deterministically") {
    val docs = Readers.fixture(spark, sfDir, "documents")
    val rates = Map("en" -> 2)
    val kept = docs.filter(Corpus.stratifiedKeep(col("doc_id"), col("lang"), rates, 10))
    val kept2 = docs.filter(Corpus.stratifiedKeep(col("doc_id"), col("lang"), rates, 10))
    assert(kept.exceptAll(kept2).isEmpty) // same sample every run
    val en = docs.filter(col("lang") === "en").count()
    val enKept = kept.filter(col("lang") === "en").count()
    assert(enKept > 0 && math.abs(enKept.toDouble / en - 0.5) < 0.25)
  }

  test("k-means: every vector lands in a surviving cluster; centroids refine") {
    val vecs = Readers.fixture(spark, sfDir, "embeddings")
    val n = vecs.count()
    val sum = KMeans.summary(vecs, k = 4, iters = 2)
      .agg(org.apache.spark.sql.functions.sum(col("n_members"))).head().getLong(0)
    assert(sum == n, "cluster sizes must partition the vector set")
    // trained centroids keep the embedding dimensionality and survive a round
    val trained = KMeans.train(vecs, 4, 1)
    assert(trained.count() >= 1 && trained.count() <= 4)
    assert(trained.select(size(col("cv")).as("d")).distinct().head().getInt(0) == 64)
  }
}
