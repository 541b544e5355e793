package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.core.Readers
import graft.streaming.{EventStreams, IngestStreams}

/** Attribution probe for the two streaming twins far above the family's
  * ~1.6-2 s norm (r12 verdict item 3): `ev_attribution_stream` (5.64 s min)
  * and `corpus_contamination_stream` (5.99 s min). Decomposes each into
  *
  *  - '''floor''': a stateless passthrough stream over the same source and
  *    sink (schema-infer footer read, microbatch scheduling, memory sink,
  *    start/stop) — pure harness machinery;
  *  - '''batch-equivalent''': the identical relational program run as a
  *    plain batch query — the per-batch COMPUTE the stream must do at least
  *    once;
  *  - '''the registered pipeline''' itself, plus (for the interval join) a
  *    variant at fewer state partitions — a stream-stream join commits 4
  *    state stores per shuffle partition per microbatch, so partition count
  *    is a pure-overhead knob at local fixture scale.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StreamProbes"
  */
object StreamProbes {

  private def attributionBatch(spark: SparkSession, sfDir: String) = {
    val ev = Readers.fixture(spark, sfDir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    // 3600 s = EventQueries.AttributionUs (1 h click→purchase window)
    c.join(p, expr("c_user = p_user AND p_ts >= c_ts AND " +
        "p_ts <= c_ts + make_interval(0, 0, 0, 0, 0, 0, 3600)"))
      .select(col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
      .orderBy("click_id", "purchase_id")
  }

  private def contaminationBatch(spark: SparkSession, sfDir: String) = {
    // contaminationAlerts is source-agnostic — feeding it the batch frame
    // instead of the readStream frame runs the identical program unstated
    val docs = Readers.fixture(spark, sfDir, "documents")
    IngestStreams.contaminationAlerts(
        docs.filter(col("doc_id") % 100 =!= 7),
        docs.filter(col("doc_id") % 100 === 7), "doc_id", "text", shingleN = 3)
      .orderBy("doc_id")
  }

  private def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ProbeUtil.session()
    import ProbeUtil.timed

    val evDir = graft.queries.EventQueries.rawEventsDir(sfDir)
    val docDir = graft.queries.DedupQueries.rawDocsDir(sfDir)

    // one throwaway stream absorbs streaming-engine class-load/JIT so rep 1
    // is not a cold-start artifact
    EventStreams.runToBatch(
      EventStreams.readEvents(spark, evDir).select(col("event_id")),
      s"probe_warm_${System.nanoTime()}", OutputMode.Append).count()

    // an 8-partition sibling session: same SparkContext, its own SQLConf —
    // stream state partitioning is fixed at query start from the session's
    // shuffle partitions
    val spark8 = spark.newSession()
    spark8.conf.set("spark.sql.shuffle.partitions", "8")

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      timed("ev floor: passthrough stream")(
        EventStreams.runToBatch(
          EventStreams.readEvents(spark, evDir)
            .select(col("event_id"), col("user_id"), col("ts")),
          s"probe_evf_${System.nanoTime()}", OutputMode.Append).count())
      timed("ev batch-equivalent interval join")(
        noop(attributionBatch(spark, sfDir)))
      timed("ev_attribution_stream (registered, 32p)")(
        noop(graft.SparkEntry.queries("ev_attribution_stream")(spark, sfDir)))
      timed("ev_attribution_stream @8 state partitions")(
        noop(graft.SparkEntry.queries("ev_attribution_stream")(spark8, sfDir)))
      spark.catalog.clearCache()

      timed("docs floor: passthrough stream")(
        EventStreams.runToBatch(
          IngestStreams.readDocuments(spark, docDir).select(col("doc_id")),
          s"probe_docf_${System.nanoTime()}", OutputMode.Append).count())
      timed("corpus batch-equivalent contamination")(
        noop(contaminationBatch(spark, sfDir)))
      timed("corpus_contamination_stream (registered)")(
        noop(graft.SparkEntry.queries("corpus_contamination_stream")(spark, sfDir)))
      timed("corpus_contamination_stream @8 partitions")(
        noop(graft.SparkEntry.queries("corpus_contamination_stream")(spark8, sfDir)))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
