package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for registered queries: times N repeated materializations
  * of one query at a given fixture (first run = cold plan + codegen, repeats
  * = steady state), so bench outliers can be split into plan-time vs
  * execution-time. (Also the LR hyperparameter scout lived here while the
  * text_lr constants were being frozen — BASELINE.md round-10.)
  */
object LrTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).headOption.getOrElse("text_nb_langid").split(",").toSeq
    val reps = args.drop(2).headOption.flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (name <- names; i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.QueryRegistry.all(name).fn(spark, sfDir).count()
      println(f"[prof] $name rep$i ${(System.nanoTime() - t0) / 1e9}%7.2f s (rows=$n)")
    }
    spark.stop()
  }
}
