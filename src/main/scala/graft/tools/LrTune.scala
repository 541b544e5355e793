package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hyperparameter scout for the LogReg quality filter: prints the
  * confusion scorecard at a few learning rates so the registered query's
  * frozen constants are a measured choice, not a guess.
  */
object LrTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Readers.fixture(spark, sfDir, "documents")
    val nDocs = docs.count()
    for (buckets <- Seq(1024)) {
      val x = graft.operators.LogReg.features(
        docs, "doc_id", "text", col("lang") === "en", buckets).localCheckpoint()
      val init = graft.operators.LogReg.nbInit(x, buckets)
      for ((lrNum, lrDen) <- Seq((2L, 1L), (4L, 1L), (8L, 1L));
           steps <- Seq(2, 3, 5)) {
        val w = graft.operators.LogReg.trainWeights(spark, x, nDocs, buckets, steps, lrNum, lrDen,
          init = Some(init))
        val sc = graft.operators.LogReg.score(spark, x, w)
          .groupBy(col("y"), col("pred")).agg(count(lit(1)).as("n"))
          .orderBy(col("y"), col("pred")).collect()
        val wAbsMax = w.map(math.abs).max
        println(s"[lr] b=$buckets lr=$lrNum/$lrDen steps=$steps |w|max=$wAbsMax bias=${w(buckets)}  " +
          sc.map(r => s"y=${r.getLong(0)} pred=${r.getLong(1)} n=${r.getLong(2)}").mkString("  "))
      }
    }
    spark.stop()
  }
}
