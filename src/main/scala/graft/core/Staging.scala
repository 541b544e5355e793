package graft.core

import java.util.concurrent.ConcurrentHashMap

import scala.util.Try

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session-keyed, fixture-dir-keyed memo of staged values — the one shared
  * implementation of the staging-cache pattern that had grown five
  * hand-rolled copies (DedupStaging, TextQueries' lrFeatCache, CorpusQueries'
  * dsirWeightsCache, AnalyticsQueries' purchaseEdgesCache, EventQueries'
  * stream-fixture memo), each re-implementing session-keyed compute +
  * localCheckpoint + (sometimes) release. Centralizing gives every memo the
  * same lifecycle contract:
  *
  *  - '''Session-keyed''': a localCheckpoint's blocks belong to the
  *    SparkSession that made them. A cache hit from a DIFFERENT session
  *    rebuilds — and, unlike the hand-rolled copies, first releases the
  *    replaced entry's checkpoint blocks (they were unreachable garbage
  *    reclaimed only by GC before).
  *  - '''Never evicted implicitly''': a localCheckpoint's lineage is
  *    truncated, so dropping its blocks while any live plan references them
  *    cannot recompute and fails the query. The cache is bounded by the
  *    number of distinct fixture dirs a JVM touches (one in the driver's
  *    Verify/Bench runs, one per spec suite).
  *  - '''Deterministic release''': [[Staging.release]] unpersists exactly the
  *    checkpoint blocks reachable from the staged value — found by walking
  *    the value (DataFrames, Products, collections) and collecting each
  *    frame's `LogicalRDD` leaves. No global before/after snapshot of
  *    `getPersistentRDDs`, so a concurrent build in another thread can never
  *    be captured and wrongly unpersisted.
  *
  * At 100 TB the staged frames are the persisted artifacts a real pipeline
  * writes once per corpus snapshot; the memo gives the multi-query bench the
  * same read-once contract.
  *
  * @param sessionScoped false for values with no Spark state (temp fixture
  *        dirs, driver-side arrays): a new session reuses them instead of
  *        rebuilding.
  */
final class Staging[V](sessionScoped: Boolean = true)(
    build: (SparkSession, String) => V) {

  private val cache = new ConcurrentHashMap[String, (SparkSession, V)]()

  def apply(spark: SparkSession, sfDir: String): V =
    cache.compute(sfDir, { (_, cur) =>
      if (cur != null && (!sessionScoped || (cur._1 eq spark))) cur
      else {
        // a stale entry's blocks belong to a replaced session: drop them
        // before building, else they linger unreleasable for the JVM's life
        if (cur != null) Staging.releaseValue(cur._2)
        (spark, build(spark, sfDir))
      }
    })._2

  /** Session-free access for `sessionScoped = false` memos whose build
    * ignores the session (temp fixture dirs, driver-side arrays).
    */
  def apply(sfDir: String): V = {
    require(!sessionScoped, "session-scoped staging needs the owning SparkSession")
    apply(null, sfDir)
  }

  /** Deterministically drop a fixture dir's staged value and the checkpoint
    * blocks reachable from it. Callers own the ordering: any query plan still
    * holding a released frame will fail (truncated lineage cannot recompute).
    */
  def release(sfDir: String): Unit = {
    val cur = cache.remove(sfDir)
    if (cur != null) Staging.releaseValue(cur._2)
  }
}

object Staging {

  /** Unpersist every checkpoint block reachable from `v`: walks DataFrames,
    * case classes / tuples, and collections; anything else holds no Spark
    * state. Unpersist failures (a stopped replaced session) are ignored —
    * release must never fail the caller.
    */
  private[core] def releaseValue(v: Any): Unit = v match {
    case ds: Dataset[_] =>
      checkpointRdds(ds).foreach(r => Try(r.unpersist(blocking = false)))
    case it: Iterable[_] => it.foreach(releaseValue)
    case p: Product => p.productIterator.foreach(releaseValue)
    case _ => ()
  }

  /** Release the checkpoint blocks reachable from ONE frame — the
    * deterministic-release seam for operators that localCheckpoint a
    * per-invocation intermediate (not a memo-staged artifact) and must not
    * leave its blocks to GC (r14: pageRank's co-partitioned edge frame).
    */
  def releaseFrame(ds: Dataset[_]): Unit =
    checkpointRdds(ds).foreach(r => Try(r.unpersist(blocking = false)))

  /** The RDDs behind a frame's `LogicalRDD` leaves — for a localCheckpoint-ed
    * frame (or anything derived from one) these are exactly the persisted
    * checkpoint RDDs; unpersisting a never-persisted LogicalRDD (e.g. a
    * `createDataFrame(rdd)` source) is a no-op.
    */
  private[core] def checkpointRdds(ds: Dataset[_]): Seq[org.apache.spark.rdd.RDD[_]] =
    ds.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
}
