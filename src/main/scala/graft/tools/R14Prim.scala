package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 primitive probe: does a cached frame's explicit hash layout
  * reach an iterated join's EnsureRequirements under this Spark build?
  * Prints the session default of canChangeCachedPlanOutputPartitioning and
  * the executed-plan exchange counts for a cached-edges iterated join with
  * the conf on and off.
  */
object R14Prim {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    System.err.println(s"[prim] default $key = ${spark.conf.getOption(key)}")

    def trial(flag: String): Unit = {
      spark.conf.set(key, flag)
      spark.catalog.clearCache()
      val edges = (1L to 200000L).map(i => (i % 997, i % 1013)).toDF("src", "dst")
      val e = edges.repartition(col("src")).persist()
      e.count()
      var rank = e.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(1L))
      for (_ <- 1 to 3) {
        rank = e.join(rank.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum(col("rank")).as("rank"))
      }
      rank.write.format("noop").mode("overwrite").save()
      val executed = rank.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning\\(src".r.findAllIn(executed).length
      System.err.println(s"[prim] conf=$flag: src-side exchanges in executed plan = $nEx")
      e.unpersist()
    }
    trial("true")
    trial("false")

    // variant: repartition + localCheckpoint (LogicalRDD preserves physical
    // outputPartitioning in the logical plan — the staging house device)
    locally {
      spark.catalog.clearCache()
      val edges = (1L to 200000L).map(i => (i % 997, i % 1013)).toDF("src", "dst")
      val e = edges.repartition(col("src")).localCheckpoint()
      var rank = e.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(1L))
      for (_ <- 1 to 3) {
        rank = e.join(rank.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum(col("rank")).as("rank"))
      }
      rank.write.format("noop").mode("overwrite").save()
      val executed = rank.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning\\(src".r.findAllIn(executed).length
      val nBhj = "BroadcastHashJoin".r.findAllIn(executed).length
      val nSmj = "SortMergeJoin".r.findAllIn(executed).length
      System.err.println(s"[prim] localCheckpoint variant: src-side exchanges = $nEx, BHJ = $nBhj, SMJ = $nSmj")
      System.err.println("[prim] checkpointed edge logical: " +
        e.queryExecution.optimizedPlan.toString.linesIterator.take(2).mkString(" | "))
    }
    spark.stop()
  }
}
