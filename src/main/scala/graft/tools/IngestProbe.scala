package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.MinHashLSH

/** Ingest-shape probe: measures what `dedup_incremental` exists for — the
  * cost of admitting a 10% delta into an already-deduped corpus via the
  * persisted band/signature index vs the naive nightly full re-dedup.
  *
  * Corpus = fixture docs replicated (distinct ids, per-replica tail token —
  * every replica clique is a near-dup clique, the candidate-heavy worst
  * case, same scheme as [[ScaleProbe]]); delta = the last replica. The
  * index build is EXCLUDED from the incremental timing: it is the artifact
  * a production ingest amortizes across runs (built once per doc at its own
  * ingest), exactly like the Merkle snapshot in `pv_merkle_incremental`.
  *
  *   sbt "runMain graft.tools.IngestProbe [sfDir] [replicas]"
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(10)
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
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val stride = 1000000L
    val staged = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(sequence(lit(0), lit(reps - 1))).as("r"),
        col("doc_id"), col("text"))
      .select((col("doc_id") + col("r") * stride).as("doc_id"),
        concat(col("text"), lit(" rep"), col("r")).as("text"), col("r"))
      .write.mode("overwrite").parquet(staged)
    val all = spark.read.parquet(staged)
    val corpus = all.filter(col("r") < reps - 1).drop("r")
    val delta = all.filter(col("r") === reps - 1).drop("r")
    println(s"[probe] corpus=${corpus.count()} delta=${delta.count()} docs")

    // naive nightly re-dedup: every doc re-shingled, re-signed, re-banded
    val nFull = timed(s"full re-dedup (${reps}x)")(
      MinHashLSH.candidatePairs(corpus.unionByName(delta), "doc_id", "text", 3, 16, 4)
        .count())
    println(s"[probe]   full pairs: $nFull")
    spark.catalog.clearCache()

    // the persisted index exists from prior ingests — build & materialize
    // OUTSIDE the timed section
    val sigsIdx = MinHashLSH.signaturesFromShingles(
      MinHashLSH.shingled(corpus, "doc_id", "text", 3), 16)
    sigsIdx.count()
    val nInc = timed("incremental ingest (delta only)") {
      val sigsNew = MinHashLSH.signaturesFromShingles(
        MinHashLSH.shingled(delta, "doc_id", "text", 3), 16)
      MinHashLSH.incrementalCandidates(sigsNew, sigsIdx, 16, 4).count()
    }
    println(s"[probe]   incremental pairs: $nInc")
    spark.stop()
  }
}
