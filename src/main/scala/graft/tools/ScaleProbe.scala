package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Fingerprints, TableSpec, VerifyConfig}
import graft.operators.{DedupClusters, MinHashLSH, SimHash}

/** Empirical scale probe: run the dedup/fingerprint pipelines on a replicated
  * documents set (see IMPLEMENTATION.md "scale probe") and print stage
  * timings. Usage: sbt "runMain graft.tools.ScaleProbe <documents.parquet>"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/scaleprobe/documents_x10.parquet")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(path)
    println(s"[probe] $path rows=${docs.count()}")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val nPairs = timed("minhash_lsh candidates") {
      MinHashLSH.candidatePairs(docs, "doc_id", "text", 3, 16, 4).count()
    }
    println(s"[probe]   candidate pairs: $nPairs")
    val nClusters = timed("dedup clusters") {
      val pairs = MinHashLSH.candidatePairs(docs, "doc_id", "text", 3, 16, 4)
        .filter(col("est_jaccard") >= 0.5).select("doc_a", "doc_b")
      DedupClusters.components(pairs).agg(countDistinct(col("cluster_id"))).head().getLong(0)
    }
    println(s"[probe]   clusters: $nClusters")
    timed("simhash signatures") {
      SimHash.simhashDf(docs, "doc_id", "text").count()
    }
    val nSimPairs = timed("simhash near pairs") {
      val sh = SimHash.simhashDf(docs, "doc_id", "text")
      SimHash.nearPairs(sh, "id", "simhash").count()
    }
    println(s"[probe]   simhash pairs: $nSimPairs")
    val nContaminated = timed("decontaminate vs eval slice") {
      graft.operators.Corpus.contaminatedIds(
        docs.filter(col("doc_id") % 100 =!= 7), docs.filter(col("doc_id") % 100 === 7),
        "doc_id", "text", shingleN = 3).count()
    }
    println(s"[probe]   contaminated train docs: $nContaminated")
    timed("merkle fingerprint") {
      Fingerprints.merkleDigest(docs, TableSpec("documents", Seq("doc_id")),
        VerifyConfig(), buckets = 256)
    }
    timed("exact full fingerprint") {
      Fingerprints.fullDigest(docs, TableSpec("documents", Seq("doc_id")), VerifyConfig())
    }
    // round-5 operators: vocabulary-wide aggregations, packing, containment
    val nTfIdf = timed("tf-idf top-3") {
      graft.operators.Vocab.tfIdfTopK(docs, "doc_id", "text", 3).count()
    }
    println(s"[probe]   tfidf rows: $nTfIdf")
    val nTerms = timed("inverted index") {
      graft.operators.Vocab.invertedIndex(docs, "doc_id", "text").count()
    }
    println(s"[probe]   index terms: $nTerms")
    val nSeqs = timed("sequence packing") {
      graft.operators.Corpus.packSequences(docs, "doc_id", "text", "lang", 512, 4).count()
    }
    println(s"[probe]   sequences: $nSeqs")
    // optional second arg: replicated embeddings parquet → vector-op stages
    args.drop(1).headOption.foreach { embPath =>
      val emb = spark.read.parquet(embPath)
      println(s"[probe] $embPath rows=${emb.count()}")
      val q = emb.filter(col("vec_id") < 8)
      timed("exact topk (f32)") {
        graft.operators.Similarity.topK(q, emb, 10).count()
      }
      timed("quantized topk (int8)") {
        graft.operators.Similarity.quantizedTopK(q, emb, 10).count()
      }
      timed("hard negatives") {
        graft.operators.Similarity.hardNegatives(q, emb, 10).count()
      }
      timed("ivf topk (probe-1)") {
        graft.operators.Similarity.ivfTopK(emb, col("vec_id") < 8, 10, 20).count()
      }
      spark.catalog.clearCache()
    }
    spark.catalog.clearCache()
    val nContain = timed("containment verify") {
      // the registered dedup_containment pipeline exactly (shared operator)
      MinHashLSH.containmentPairs(
        MinHashLSH.shingled(docs, "doc_id", "text", 3), 16, 4, 800000L).count()
    }
    println(s"[probe]   containment pairs: $nContain")
    spark.catalog.clearCache()
    spark.stop()
  }
}
