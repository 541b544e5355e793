package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 scaling evidence for the §2.5 spread paths (VERDICT r13 item 7):
  * the sf0.1 fixtures are single-row-group files, so the pv-digest and
  * quantile spreads can never show a core-ratio there. This probe stages a
  * ×`mult` copy of `orders` in BOTH layouts —
  *
  *  - `one`: coalesce(1), a single parquet file under maxPartitionBytes =
  *    one scan split, the unsplittable shape the spread exists for;
  *  - `many`: 40 files = natively splittable, the shape where the r14
  *    splittability gate must SKIP the spread (no exchange);
  *
  * then times the spread consumers (hashedRows→noop digest projection,
  * statsDigest, Quantiles.grouped) at the env CPU count. Run it twice
  * (SPARK_GRAFT_CPUS=4 and =32): the `one`-layout times should scale with
  * cores (the spread fans the single split out), and the `many` layout
  * should match it without any exchange (native splits).
  *
  * Usage: SPARK_GRAFT_CPUS=N sbt "runMain graft.tools.SpreadProbe /root/testdata/sf0.1 /tmp/spreadprobe [mult]"
  */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.drop(1).headOption.getOrElse("/tmp/spreadprobe")
    val mult = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- stage: x`mult` orders with per-copy key offsets, two layouts ----
    val base = graft.core.Readers.fixture(spark, sfDir, "orders")
    val maxKey = base.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val copies = (0 until mult).map { i =>
      base.withColumn("o_orderkey", col("o_orderkey") + lit(i * maxKey))
    }.reduce(_ unionByName _)
    val oneDir = s"$work/orders_x${mult}_one"
    val manyDir = s"$work/orders_x${mult}_many"
    if (!new java.io.File(oneDir).exists())
      copies.coalesce(1).write.mode("overwrite").parquet(oneDir)
    if (!new java.io.File(manyDir).exists())
      copies.repartition(40).write.mode("overwrite").parquet(manyDir)

    val spec = graft.core.Fixtures.specs("orders")
    val cfg = graft.core.VerifyConfig()
    def timed(name: String)(f: => Unit): Unit = {
      // min-of-3: the documented 2-3x per-run sandbox variance
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[spread] cpus=$cpus $name%-28s min ${times.min}%7.2f s  (reps ${times.map(t => f"$t%.2f").mkString(" ")})")
    }

    for ((label, dir) <- Seq("one" -> oneDir, "many" -> manyDir)) {
      val df = spark.read.parquet(dir)
      println(s"[spread] layout=$label scanParts=${df.rdd.getNumPartitions} rows=${df.count()}")
      timed(s"$label/hashedRows")(
        graft.core.Fingerprints.hashedRows(df, spec, cfg)
          .write.format("noop").mode("overwrite").save())
      timed(s"$label/statsDigest")(
        graft.core.Fingerprints.statsDigest(df, spec, cfg))
      timed(s"$label/quantiles")(
        graft.operators.Quantiles.grouped(
          df.select(col("o_orderpriority").as("g"),
            (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("v")),
          "g", "v", Seq("p50" -> 0.5, "p90" -> 0.9))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
