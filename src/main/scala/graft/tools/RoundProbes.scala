package graft.tools

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Fingerprints, JdbcTarget, TableSpec, VerifyConfig}

/** Shared plumbing for the empirical probes whose numbers IMPLEMENTATION.md
  * records: local session shaped like Bench's, wall-clock timing, and a
  * driver-heap sampler for the probes whose point is driver memory.
  */
private[tools] object ProbeUtil {
  def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  /** Run `f` while sampling used driver heap every 50 ms; returns (result,
    * peak-used-bytes-over-baseline). GC before the baseline so the peak is
    * attributable to `f`, not leftover garbage.
    */
  def withPeakHeap[A](f: => A): (A, Long) = {
    System.gc(); Thread.sleep(100)
    val rt = Runtime.getRuntime
    def used(): Long = rt.totalMemory() - rt.freeMemory()
    val base = used()
    @volatile var peak = 0L
    @volatile var stop = false
    val sampler = new Thread(() => {
      while (!stop) { peak = math.max(peak, used() - base); Thread.sleep(50) }
    })
    sampler.setDaemon(true); sampler.start()
    try { val r = f; (r, peak) } finally { stop = true; sampler.join() }
  }
}

/** Does the partitioned JDBC read actually pay? Stages a 1M-row Derby table
  * (embedded, so all partitions contend on one in-process storage engine —
  * the pessimistic case for parallel pull; a networked PostgreSQL adds
  * per-connection wire throughput, the case the feature exists for) and
  * times the single-connection read against the PK range-split read.
  * Usage: sbt "runMain graft.tools.JdbcProbe [rows]"
  */
object JdbcProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(1000000)
    val url = "jdbc:derby:memory:jdbcprobe;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE bigt (id INT NOT NULL PRIMARY KEY, v INT, s VARCHAR(32))")
    val ps = conn.prepareStatement("INSERT INTO bigt VALUES (?, ?, ?)")
    conn.setAutoCommit(false)
    var i = 0
    while (i < rows) {
      ps.setInt(1, i); ps.setInt(2, i % 9973); ps.setString(3, s"payload-$i")
      ps.addBatch()
      i += 1
      if (i % 20000 == 0) { ps.executeBatch(); conn.commit() }
    }
    ps.executeBatch(); conn.commit(); ps.close()
    // catalog mirror (what a PG target publishes natively)
    st.execute("CREATE SCHEMA information_schema")
    st.execute("CREATE TABLE information_schema.tables (table_schema VARCHAR(128), " +
      "table_name VARCHAR(128), table_type VARCHAR(32))")
    st.execute("INSERT INTO information_schema.tables VALUES ('APP', 'BIGT', 'BASE TABLE')")
    st.execute("CREATE TABLE information_schema.columns (column_name VARCHAR(128), " +
      "data_type VARCHAR(64), table_schema VARCHAR(128), table_name VARCHAR(128), " +
      "is_generated VARCHAR(16), ordinal_position INT)")
    st.execute("INSERT INTO information_schema.columns VALUES " +
      "('id', 'integer', 'APP', 'BIGT', 'NEVER', 1), " +
      "('v', 'integer', 'APP', 'BIGT', 'NEVER', 2), " +
      "('s', 'character varying', 'APP', 'BIGT', 'NEVER', 3)")
    st.execute("CREATE TABLE information_schema.key_column_usage (column_name VARCHAR(128), " +
      "table_schema VARCHAR(128), table_name VARCHAR(128), constraint_name VARCHAR(128))")
    st.execute("INSERT INTO information_schema.key_column_usage VALUES " +
      "('id', 'APP', 'BIGT', 'bigt_pkey')")
    st.execute("CREATE TABLE information_schema.table_constraints " +
      "(constraint_name VARCHAR(128), constraint_type VARCHAR(32))")
    st.execute("INSERT INTO information_schema.table_constraints VALUES ('bigt_pkey', 'PRIMARY KEY')")
    conn.commit(); st.close(); conn.close()
    println(s"[probe] staged $rows rows in embedded Derby")

    val spark = ProbeUtil.session()
    def pull(parts: Int): Long =
      JdbcTarget(s"p$parts", url, readPartitions = parts)
        .read(spark, "APP.BIGT").agg(sum(col("V")), count(lit(1))).head().getLong(1)
    // warm both paths once (connection setup, codegen), then measure twice
    pull(1); pull(32)
    for (round <- 1 to 2; parts <- Seq(1, 8, 32)) {
      val n = ProbeUtil.timed(s"round$round jdbc read parts=$parts")(pull(parts))
      require(n == rows, s"read $n of $rows rows")
    }
    spark.stop()
  }
}

/** Exact-digest driver-memory probe: past `streamingCollectRowLimit` the
  * sorted hash column streams through toLocalIterator instead of collect().
  * Verifies the two paths produce the identical digest at >10M rows and
  * records wall time + peak driver heap of each.
  * Usage: sbt "runMain graft.tools.DigestProbe [rows]"
  */
object DigestProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(12000000L)
    val spark = ProbeUtil.session()
    val df = spark.range(rows).select(col("id"),
      concat(lit("payload-"), col("id")).as("s")).persist()
    df.count()
    val spec = TableSpec("t", Seq("id"))
    val base = VerifyConfig(fullModeRowLimit = Long.MaxValue)
    val (collectDigest, collectPeak) = ProbeUtil.withPeakHeap {
      ProbeUtil.timed("exact digest via collect()") {
        Fingerprints.fullDigest(df, spec, base.copy(streamingCollectRowLimit = Long.MaxValue))
      }
    }
    println(f"[probe]   collect peak driver heap: ${collectPeak / 1e6}%.0f MB")
    val (streamDigest, streamPeak) = ProbeUtil.withPeakHeap {
      ProbeUtil.timed("exact digest via toLocalIterator") {
        Fingerprints.fullDigest(df, spec, base.copy(streamingCollectRowLimit = 1L))
      }
    }
    println(f"[probe]   stream peak driver heap: ${streamPeak / 1e6}%.0f MB")
    require(collectDigest == streamDigest,
      s"digest mismatch: $collectDigest vs $streamDigest")
    println(s"[probe] digests identical: $collectDigest")
    spark.stop()
  }
}

/** Skewed-join evidence for the salted join: a fact table whose hot key holds
  * ~50% of all rows joined to a 1000-key dim with broadcast disabled (the
  * shuffle case salting exists for) and AQE's skew mitigation off, plain vs
  * salted. Usage: sbt "runMain graft.tools.SkewProbe [rows]"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(8000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // the probe targets the un-mitigated shuffle-join case
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fact = spark.range(rows).select(
      when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(1000L))).as("k"),
      col("id").as("x")).persist()
    fact.count()
    val dim = spark.range(1000).select(col("id").as("k"),
      concat(lit("dim-"), col("id")).as("d")).persist()
    dim.count()
    def agg(j: DataFrame): Long = j.agg(count(lit(1))).head().getLong(0)
    val plain = fact.join(dim, "k")
    val salted = graft.operators.SkewJoin.saltedJoin(fact, dim, "k", 32)
    val saltedPlan = salted.queryExecution.executedPlan.toString
    require(!saltedPlan.contains("BroadcastHashJoin"),
      "probe must exercise the shuffle join, not a broadcast")
    agg(plain); agg(salted) // warm
    for (round <- 1 to 2) {
      val a = ProbeUtil.timed(s"round$round plain shuffle join")(agg(plain))
      val b = ProbeUtil.timed(s"round$round salted join (salt=32)")(agg(salted))
      require(a == b, s"row counts diverge: $a vs $b")
    }
    spark.stop()
  }
}
