package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.MinHashLSH
import graft.operators.TextAnalysis.{shinglesFromTokens, tokens}

/** Streaming ingest dedup — the online form of the MinHash-LSH banding join.
  *
  * Batch LSH finds near-duplicate candidates by self-joining band hashes; a
  * continuously-ingesting corpus can't re-run that join per arrival. The
  * streaming shape keeps the BAND INDEX as keyed state: each (band_idx,
  * band_hash) bucket remembers the doc ids that ever hashed into it, and a
  * new arrival emits one candidate pair per prior occupant of any of its
  * buckets — exactly the pairs the batch join would produce, discovered
  * incrementally. This is [[graft.operators.MinHashLSH.incrementalCandidates]]
  * with the persisted index moved into the state store, so ingest needs no
  * explicit index read/merge/write cycle at all: the checkpoint IS the index,
  * and exactly-once recovery replaces the sketch-parameter guard that the
  * file-based index needs ([[graft.operators.MinHashLSH.readSigIndex]]) —
  * a checkpoint can only ever be resumed by the same query.
  *
  * Scale shape (100 TB corpus, unbounded ingest): state is one row per
  * occupied bucket holding its occupant ids — in total `corpus × numBands`
  * longs, the same cardinality as the batch band index, held in the state
  * store (RocksDB-backed at scale) and sharded by bucket key across
  * executors. Per micro-batch work is `delta × numBands` state lookups plus
  * output-proportional pair emission — the banded join's property that
  * candidates, never the O(n²) pair space, bound the cost. A Zipf-hot bucket
  * (the boilerplate hash every shard of a crawl lands in) concentrates pairs
  * on one key, exactly as it concentrates them on one join cell in batch;
  * the mitigation is the same as there — tighter bands or a per-bucket
  * occupancy cap — and belongs to parameter tuning, not the operator.
  */
object IngestStreams {

  final case class BandRow(id: Long, bandIdx: Int, bandHash: String)
  final case class CandidatePair(doc_a: Long, doc_b: Long)

  /** File-source stream over a staged documents directory (footer-inferred
    * schema, same rationale as [[EventStreams.readEvents]]).
    */
  def readDocuments(spark: SparkSession, dir: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val fileSchema = spark.read.parquet(dir).schema
    val reader = spark.readStream.schema(fileSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(dir)
  }

  /** Stateless per-arrival banding: tokenize → shingle → MinHash signature →
    * band hashes, exploded to one row per (doc, band). Uses the per-row HOF
    * [[MinHashLSH.signature]] rather than the batch explode+groupBy
    * aggregate form: a groupBy on a stream would itself become stateful, and
    * the HOF's interpreted-eval cost is paid on delta-sized micro-batches,
    * not the corpus.
    */
  def bandRows(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int, numPerm: Int, numBands: Int): Dataset[BandRow] = {
    require(numPerm % numBands == 0,
      s"numPerm=$numPerm must be divisible by numBands=$numBands or trailing signature positions silently drop from banding")
    val rowsPerBand = numPerm / numBands
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        MinHashLSH.signature(
          shinglesFromTokens(tokens(col(textCol)), shingleN), numPerm).as("sig"))
      .select(col("id"),
        posexplode(MinHashLSH.bandHashes(col("sig"), numBands, rowsPerBand))
          .as(Seq("bandIdx", "bandHash")))
      .select(col("id"), col("bandIdx").cast("int").as("bandIdx"), col("bandHash"))
      .as[BandRow]
  }

  /** The stateful bucket join: emits each candidate pair at the arrival of
    * its LATER document. Pairs may repeat across bands (two docs agreeing on
    * several bands) and within-batch pairs may repeat across buckets — the
    * same multiplicity the batch band join produces before its `distinct()`;
    * dedup stays with the downstream consumer (the registered query, or at
    * scale the verification join, which is idempotent per pair).
    */
  def lshCandidates(bands: Dataset[BandRow]): Dataset[CandidatePair] = {
    val spark = bands.sparkSession
    import spark.implicits._
    bands.groupByKey(r => (r.bandIdx, r.bandHash))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(emitPairs)
  }

  private def emitPairs(key: (Int, String), rows: Iterator[BandRow],
                        state: GroupState[List[Long]]): Iterator[CandidatePair] = {
    val existing = state.getOption.getOrElse(Nil)
    // sort for deterministic emission order; distinct because a doc can land
    // in the same bucket only once per band but replays must stay idempotent
    val fresh = rows.map(_.id).toArray.distinct.sorted
    state.update(existing ++ fresh.toList)
    val cross = for {
      n <- fresh.iterator
      o <- existing.iterator if o != n
    } yield CandidatePair(math.min(o, n), math.max(o, n))
    val within = for {
      i <- fresh.indices.iterator
      j <- (i + 1 until fresh.length).iterator
    } yield CandidatePair(fresh(i), fresh(j))
    cross ++ within
  }
}
