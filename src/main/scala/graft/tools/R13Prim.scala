package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off primitive timings on the lineitem fixture (r13 diagnosis). */
object R13Prim {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[prim] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    if (args.length > 1 && args(1) == "assoc") {
      val li0 = graft.core.Readers.fixture(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val p = graft.core.Readers.fixture(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val baskets = li0.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      for (i <- 1 to 3) {
        t(s"baskets.noop $i") { baskets.write.format("noop").mode("overwrite").save() }
        t(s"baskets.distinct.noop $i") { baskets.distinct()
          .write.format("noop").mode("overwrite").save() }
        val b = baskets.distinct().persist(); b.count()
        t(s"freq $i") { b.groupBy("item").agg(count(lit(1)).as("n_item"))
          .filter(col("n_item") >= 400).collect() }
        t(s"nB $i") { b.select(count_distinct(col("basket"))).collect() }
        t(s"lists+pairs $i") {
          val freq = b.groupBy("item").agg(count(lit(1)).as("n_item"))
            .filter(col("n_item") >= 400)
          b.join(freq.select(col("item")), Seq("item"), "left_semi")
            .groupBy("basket").agg(sort_array(collect_list(col("item"))).as("items"))
            .select(explode(expr(
              "flatten(transform(items, (x, i) -> transform(slice(items, i + 2, size(items) - i - 1), y -> struct(x AS item_a, y AS item_b))))")).as("pp"))
            .select(col("pp.item_a"), col("pp.item_b"))
            .groupBy("item_a", "item_b").agg(count(lit(1)))
            .write.format("noop").mode("overwrite").save() }
        t(s"lists only $i") {
          val freq = b.groupBy("item").agg(count(lit(1)).as("n_item"))
            .filter(col("n_item") >= 400)
          b.join(freq.select(col("item")), Seq("item"), "left_semi")
            .groupBy("basket").agg(sort_array(collect_list(col("item"))).as("items"))
            .write.format("noop").mode("overwrite").save() }
        if (i == 3) {
          val freq = b.groupBy("item").agg(count(lit(1)).as("n_item"))
            .filter(col("n_item") >= 400)
          val pp = b.join(freq.select(col("item")), Seq("item"), "left_semi")
            .groupBy("basket").agg(sort_array(collect_list(col("item"))).as("items"))
            .select(explode(expr(
              "flatten(transform(items, (x, i) -> transform(slice(items, i + 2, size(items) - i - 1), y -> struct(x AS item_a, y AS item_b))))")).as("pp"))
          System.err.println(pp.queryExecution.executedPlan.toString.take(4000))
        }
        b.unpersist()
        t(s"pairRules full $i") {
          graft.operators.Itemsets.pairRules(baskets, 400L)
            .write.format("noop").mode("overwrite").save() }
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    val li = graft.core.Readers.fixture(spark, sfDir, "lineitem")
    System.err.println(s"[prim] lineitem rows: ${li.count()}  partitions: ${li.rdd.getNumPartitions}")
    for (i <- 1 to 3) {
      t(s"count $i") { li.count() }
      t(s"sum(price) $i") { li.agg(sum(col("l_extendedprice"))).head() }
      t(s"groupBy(flag).count $i") { li.groupBy("l_returnflag").count().collect() }
      t(s"exact percentile $i") {
        li.groupBy("l_returnflag")
          .agg(expr("percentile(l_extendedprice, 0.5d)")).collect() }
      t(s"distinct(orderkey,partkey) noop $i") {
        li.select("l_orderkey", "l_partkey").distinct()
          .write.format("noop").mode("overwrite").save() }
      t(s"selfjoin-agg $i") {
        val f = li.select(col("l_orderkey"), col("l_partkey"))
        f.join(f.withColumnRenamed("l_partkey", "p2"), Seq("l_orderkey"))
          .groupBy("l_partkey", "p2").count()
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
