package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryEntry
import graft.core.Readers
import graft.operators.Similarity

/** Similarity search over the `embeddings` fixture: exact brute-force cosine
  * top-k (baseline) and the random-hyperplane LSH bucketed ANN (scale path).
  */
object SimilarityQueries {

  private val K = 10
  private val NumPlanes = 8
  private val Dims = 64
  private lazy val planeMatrix = Similarity.planes(NumPlanes, Dims)

  val entries: Map[String, QueryEntry] = Map(

    // exact top-k: broadcast queries × full scan, windowed rank per query
    "sim_topk" -> QueryEntry(
      fn = (spark, sfDir) => {
        val e = Readers.fixture(spark, sfDir, "embeddings")
        Similarity.topK(e.filter(col("vec_id") < 8), e, K)
          .select("query_id", "neighbor_id", "cos_micro", "rank")
      },
      oracle = Some(
        s"""SELECT query_id, neighbor_id, cos_micro, rank FROM (
             SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                    ${Similarity.duckCosineScaled("q.embedding", "n.embedding")} AS cos_micro,
                    CAST(row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY ${Similarity.duckCosineScaled("q.embedding", "n.embedding")} DESC,
                               n.vec_id ASC) AS BIGINT) AS rank
             FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
             WHERE q.vec_id < 8) AS t
           WHERE rank <= $K ORDER BY query_id, rank""")),

    // IVF coarse quantization: fixed-k deterministic centroid sample (size
    // independent of n), nearest-cell assignment, probe-1 search — the
    // clustered ANN scale path
    "sim_ivf" -> QueryEntry(
      fn = (spark, sfDir) => {
        val e = Readers.fixture(spark, sfDir, "embeddings")
        Similarity.ivfTopK(e, col("vec_id") < 8, K, numCentroids = 20)
          .select("query_id", "neighbor_id", "cos_micro", "rank")
      },
      oracle = Some(Similarity.duckIvfTopK(K, 20, "q.vec_id < 8"))),

    // in-engine k-means training (2 unrolled Lloyd iterations): the trainer
    // for IVF centroids — deterministic hash init, floor-scaled cosine
    // assignment, ordered-fold means for cross-engine bit parity
    "sim_kmeans" -> QueryEntry(
      fn = (spark, sfDir) => graft.operators.KMeans.summary(
        Readers.fixture(spark, sfDir, "embeddings"), k = 8, iters = 2),
      oracle = Some(graft.operators.KMeans.duckSummary(k = 8, iters = 2, dims = Dims))),

    // cross-modal dedup cross-check: embedding cosine for every TEXT-LSH
    // candidate pair (documents and embeddings share ids) — the agreement
    // signal curation uses to decide whether text near-dups are also
    // semantic near-dups. Candidates come from the text pipeline; only the
    // (tiny) pair set joins the vector table, keyed by id
    "sim_text_crosscheck" -> QueryEntry(
      fn = (spark, sfDir) => {
        import graft.operators.MinHashLSH
        val docs = Readers.fixture(spark, sfDir, "documents")
        val pairs = MinHashLSH.candidatePairs(docs, "doc_id", "text", 3, 16, 4)
          .select("doc_a", "doc_b")
        val e = Readers.fixture(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            Similarity.norm(col("embedding")).as("nrm"))
        pairs
          .join(e.select(col("vec_id").as("doc_a"), col("embedding").as("va"),
            col("nrm").as("na")), "doc_a")
          .join(e.select(col("vec_id").as("doc_b"), col("embedding").as("vb"),
            col("nrm").as("nb")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            Similarity.cosineScaledWithNorms(col("va"), col("vb"), col("na"), col("nb"))
              .as("cos_micro"))
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some {
        import graft.operators.MinHashLSH
        s"""WITH cand AS (SELECT doc_a, doc_b FROM (${MinHashLSH.duckCandidatePairs(
              "documents", "doc_id", "text", 3, 16, 4)}) AS c)
           SELECT doc_a, doc_b,
                  ${Similarity.duckCosineScaled("a.embedding", "b.embedding")} AS cos_micro
           FROM cand JOIN embeddings a ON a.vec_id = cand.doc_a
                     JOIN embeddings b ON b.vec_id = cand.doc_b
           ORDER BY doc_a, doc_b"""
      }),

    // hard-negative mining: per query, the most-similar DIFFERENT-label
    // vectors — the wrong-class examples a contrastive trainer batches
    "sim_hard_negatives" -> QueryEntry(
      fn = (spark, sfDir) => {
        val e = Readers.fixture(spark, sfDir, "embeddings")
        Similarity.hardNegatives(e.filter(col("vec_id") < 8), e, K)
          .select("query_id", "neighbor_id", "cos_micro", "rank")
      },
      oracle = Some(Similarity.duckHardNegatives(K, "q.vec_id < 8"))),

    // int8-quantized exact top-k: the memory-bandwidth scale path — 8-bit
    // codes (4× less scan traffic than float32) scored in pure integer
    // arithmetic, so cross-engine parity is exact by construction
    "sim_topk_int8" -> QueryEntry(
      fn = (spark, sfDir) => {
        val e = Readers.fixture(spark, sfDir, "embeddings")
        Similarity.quantizedTopK(e.filter(col("vec_id") < 8), e, K)
          .select("query_id", "neighbor_id", "qdot", "rank")
      },
      oracle = Some(Similarity.duckQuantizedTopK(K, "q.vec_id < 8"))),

    // ANN: candidates restricted to the query's LSH bucket (deterministic
    // MD5-derived hyperplanes embedded as literals on both engines)
    "sim_ann_lsh" -> QueryEntry(
      fn = (spark, sfDir) => {
        val e = Readers.fixture(spark, sfDir, "embeddings")
        Similarity.annTopK(e.filter(col("vec_id") < 8), e, K, planeMatrix)
          .select("query_id", "neighbor_id", "cos_micro", "rank")
      },
      oracle = Some {
        val bucket = Similarity.duckLshBucket("embedding", planeMatrix)
        s"""WITH b AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings)
           SELECT query_id, neighbor_id, cos_micro, rank FROM (
             SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                    ${Similarity.duckCosineScaled("q.embedding", "n.embedding")} AS cos_micro,
                    CAST(row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY ${Similarity.duckCosineScaled("q.embedding", "n.embedding")} DESC,
                               n.vec_id ASC) AS BIGINT) AS rank
             FROM b q JOIN b n ON q.bucket = n.bucket AND n.vec_id <> q.vec_id
             WHERE q.vec_id < 8) AS t
           WHERE rank <= $K ORDER BY query_id, rank"""
      })
  )
}
