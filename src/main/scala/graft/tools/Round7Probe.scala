package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, ExactSubstr, Similarity}

/** Round-7 scale probe: the ExactSubstr span-dedup and PQ/ADC search stages
  * on replicated fixtures (same replication scheme as [[ScaleProbe]] —
  * docs cloned with a mutated tail token, embeddings with a perturbed first
  * component). Usage:
  *   sbt "runMain graft.tools.Round7Probe <docsParquet> <embParquet>"
  */
object Round7Probe {
  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    val embPath = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(docsPath)
    println(s"[probe] docs rows=${docs.count()}")
    val nCov = timed("substr coverage k=8")(
      ExactSubstr.coverage(docs, "doc_id", "text", 8).count())
    println(s"[probe]   covered docs: $nCov")
    val nChunk = timed("chunk 32/24")(
      Corpus.chunk(docs, "doc_id", "text", 32, 24).count())
    println(s"[probe]   chunks: $nChunk")
    timed("shuffle 8 shards")(
      Corpus.shuffle(docs, "doc_id", 7, 8).count())
    val emb = spark.read.parquet(embPath)
    println(s"[probe] emb rows=${emb.count()}")
    val nPq = timed("pq topk m=4 cb=8")(
      Similarity.pqTopK(emb, col("vec_id") < 8, 10, 4, 64, 8, 1).count())
    println(s"[probe]   pq rows: $nPq")
    spark.stop()
  }
}
