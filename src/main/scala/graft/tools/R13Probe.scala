package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-13 micro-probe: run named registered queries N times in one JVM
  * (min-of-reps isolates JIT/contention noise — the bench_min discipline at
  * probe granularity). Args: sfDir reps query[,query...]
  */
object R13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").map(_.trim).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[probe] $name rep$i $dt%.2f s")
        dt
      }
      System.err.println(f"[probe] $name MIN ${times.min}%.2f s of $reps reps")
    }
    spark.stop()
  }
}
