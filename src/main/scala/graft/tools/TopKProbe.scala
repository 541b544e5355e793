package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the top-k tail rewrite (window rank → CollectTopK bounded-heap
  * aggregate) at the candidate fan-outs where it matters: the fixture
  * queries score a few hundred candidates per query, so the two forms are
  * noise-identical there (BASELINE.md A/B), but a production ANN pass
  * nominates thousands per query — this probe synthesizes that shape and
  * times both plans on identical input.
  *
  * The structural difference under measurement: the window form shuffles
  * EVERY scored row to its query's partition and sorts whole partitions;
  * the aggregate form combines k-element heaps map-side and shuffles
  * |queries|·k partials.
  *
  * Usage: sbt "runMain graft.tools.TopKProbe [nQueries] [candsPerQuery]"
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val nQueries = args.headOption.map(_.toInt).getOrElse(64)
    val perQuery = args.drop(1).headOption.map(_.toInt).getOrElse(500000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic scores: md5-derived, so neither plan can
    // exploit pre-sorted input; staged to parquet so both reads are equal
    val dir = java.nio.file.Files.createTempDirectory("graft-topk-probe").toString
    spark.range(nQueries.toLong * perQuery)
      .select((col("id") % nQueries).as("query_id"),
        col("id").as("neighbor_id"),
        graft.functions.GraftFunctions.hexToSignedLong(
          substring(md5(col("id").cast("string")), 1, 16)).as("score"))
      .write.mode("overwrite").parquet(dir)
    val scored = spark.read.parquet(dir)

    def windowForm(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      df.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
    }
    def aggForm(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
      import org.apache.spark.sql.graftbridge.Bridge
      val pair = struct(col("score"), (-col("neighbor_id")).as("__nid"))
      val topk = Bridge.column(
        new CollectTopK(Bridge.expression(pair), 10, false).toAggregateExpression())
      df.groupBy(col("query_id")).agg(topk.as("__tk"))
        .select(col("query_id"), posexplode(col("__tk")).as(Seq("__pos", "__p")))
        .select(col("query_id"), (-col("__p.__nid")).as("neighbor_id"),
          col("__p.score").as("score"), (col("__pos") + 1).cast("long").as("rank"))
    }

    def timed(name: String)(f: => DataFrame): Array[org.apache.spark.sql.Row] = {
      val t0 = System.nanoTime()
      val rows = f.collect()
      println(f"[topk] $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=${rows.length})")
      rows
    }
    // alternate to share cache/JIT warmth evenly; first pair discarded
    timed("warm-win") { windowForm(scored) }
    timed("warm-agg") { aggForm(scored) }
    val w1 = timed("window") { windowForm(scored) }
    val a1 = timed("agg") { aggForm(scored) }
    val w2 = timed("window") { windowForm(scored) }
    val a2 = timed("agg") { aggForm(scored) }
    // outputs must be identical row sets (the bit-parity contract)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"))
    require(w1.map(key).toSet == a1.map(key).toSet && w2.map(key).toSet == a2.map(key).toSet,
      "window and aggregate top-k diverged")
    println(s"[topk] outputs identical across forms (${w1.length} rows)")
    spark.stop()
  }
}
