package graft

import org.apache.spark.sql.functions._

import graft.core.Readers
import graft.operators.{Corpus, Similarity, TextAnalysis, Vocab}

/** Behavior tests for the round-5 pipeline operators: TF-IDF / inverted
  * index consistency, sequence-packing invariants, int8 quantization bounds,
  * and salted-join equivalence. Cross-engine value parity is the oracle
  * gate's job; these pin the operator-level laws.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Readers.fixture(spark, sfDir, "documents")
  private lazy val emb = Readers.fixture(spark, sfDir, "embeddings")

  test("tf-idf: at most k ranked terms per doc, every term occurs in its doc") {
    val k = 3
    val top = Vocab.tfIdfTopK(docs, "doc_id", "text", k)
      .select("doc_id", "term", "rank").as[(Long, String, Long)].collect()
    val perDoc = top.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    assert(perDoc.values.forall(rs => rs == (1L to rs.size)), "ranks dense from 1")
    assert(perDoc.values.forall(_.size <= k))
    val texts = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toMap
    assert(top.forall { case (id, term, _) =>
      texts(id).split(" ").contains(term)
    }, "every ranked term tokenizes out of its document")
  }

  test("tf-idf: a corpus-unique term outranks a ubiquitous one") {
    // df(unique)=1 vs df(stopword)≈N ⇒ reciprocal-df dominates unless tf
    // compensates; spot-check on a doc containing a term with df == 1
    val tf = Vocab.tfIdfTopK(docs, "doc_id", "text", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    val dfs = docs
      .select(explode(array_distinct(TextAnalysis.tokens(col("text")))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    val nDocs = docs.count()
    // the top term is never one present in (almost) every document
    assert(tf.values.forall(t => dfs(t) < nDocs), "top tf-idf term is discriminative")
  }

  test("inverted index: df totals equal the exploded distinct-term count") {
    val idx = Vocab.invertedIndex(docs, "doc_id", "text")
    val dfSum = idx.agg(sum("df")).as[Long].head()
    val exploded = docs
      .select(explode(array_distinct(TextAnalysis.tokens(col("text")))))
      .count()
    assert(dfSum == exploded)
    // digests are well-formed md5 hex
    assert(idx.filter(!col("postings_md5").rlike("^[0-9a-f]{32}$")).count() == 0)
  }

  test("sequence packing conserves tokens and numbers sequences densely") {
    val packed = Corpus.packSequences(docs, "doc_id", "text", "lang",
      seqLen = 512, nShards = 4)
      .select("stratum", "shard", "seq_id", "n_docs", "n_tokens")
      .as[(String, Long, Long, Long, Long)].collect()
    val totalTokens = docs
      .select(size(TextAnalysis.tokens(col("text"))).cast("long")).as[Long]
      .collect().sum
    assert(packed.map(_._5).sum == totalTokens, "token count conserved")
    val totalDocs = docs.count()
    assert(packed.map(_._4).sum == totalDocs, "doc count conserved")
    packed.groupBy(p => (p._1, p._2)).foreach { case (_, seqs) =>
      val ids = seqs.map(_._3).sorted.toSeq
      assert(ids == (0L until ids.size), s"seq ids dense from 0: $ids")
    }
  }

  test("sequence membership is stable under corpus growth (prefix property)") {
    // packing a PREFIX of each partition yields identical assignments for
    // the prefix docs: cum-before only depends on earlier ids
    val all = Corpus.packSequences(docs, "doc_id", "text", "lang", 512, 4)
      .select("stratum", "shard", "seq_id", "first_doc").as[(String, Long, Long, Long)]
      .collect().toSet
    val cutoff = docs.agg(expr("percentile(doc_id, 0.5)")).as[Double].head().toLong
    val prefix = Corpus.packSequences(docs.filter(col("doc_id") <= cutoff),
      "doc_id", "text", "lang", 512, 4)
      .select("stratum", "shard", "seq_id", "first_doc").as[(String, Long, Long, Long)]
      .collect()
    // every fully-earlier prefix sequence appears identically in the full pack
    val fullFirsts = all.map(p => (p._1, p._2, p._3) -> p._4).toMap
    prefix.foreach { case (st, sh, sq, fd) =>
      assert(fullFirsts((st, sh, sq)) == fd, s"first_doc stable for ($st,$sh,$sq)")
    }
  }

  test("int8 quantization bounds codes to [-128, 127] and hits the extreme lane") {
    val q = Similarity.withQuantized(emb, "embedding", "qv")
    val bad = q.filter(exists(col("qv"), x => x > 127 || x < -128)).count()
    assert(bad == 0)
    // the max-|v| lane lands at the extreme (±127, or one code below from
    // the two double roundings in (x·127)/mx)
    val hasExtreme = q.filter(exists(col("qv"), x => abs(x) >= 126)).count()
    assert(hasExtreme == q.count(), "every vector has a near-extreme code")
  }

  test("quantized top-k ranks are dense, self-excluded, and score-ordered") {
    val r = Similarity.quantizedTopK(emb.filter(col("vec_id") < 4), emb, 5)
      .select("query_id", "neighbor_id", "qdot", "rank")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.forall { case (q, n, _, _) => q != n })
    r.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to rows.size))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }, "qdot non-increasing with rank")
    }
  }

  test("funnel stage counts are monotonically non-increasing") {
    val stages = SparkEntry.queries("ev_funnel")(spark, sfDir)
      .select("stage", "n_users").as[(String, Long)].collect().sortBy(_._1)
    assert(stages.map(_._1).toSeq == Seq("1_signup", "2_click", "3_purchase"))
    assert(stages.sliding(2).forall {
      case Array(a, b) => a._2 >= b._2
      case _ => true
    }, stages.mkString(", "))
  }

  test("retention offset-0 cells equal each cohort's size") {
    val cells = SparkEntry.queries("ev_retention")(spark, sfDir)
      .select("cohort_us", "offset_days", "n_users").as[(Long, Long, Long)].collect()
    val day0 = cells.filter(_._2 == 0L).map(c => c._1 -> c._3).toMap
    val cohortSizes = Readers.fixture(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .groupBy("user_id").agg(min("day_us").as("cohort_us"))
      .groupBy("cohort_us").count().as[(Long, Long)].collect().toMap
    // every user is active on their own cohort day by definition
    assert(day0 == cohortSizes)
  }

  test("sharded corpus sink bounds files per partition and round-trips rows") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val shards = 3
    val tagged = docs.withColumn("split",
      Corpus.splitAssign(col("doc_id"), 90, 5))
    Corpus.writeSharded(tagged, out, "doc_id", Seq("split", "lang"), shards)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty && dirs.forall(_.getName.startsWith("split=")))
    val leafFileCounts = dirs.flatMap(_.listFiles().filter(_.isDirectory)).map { langDir =>
      langDir.listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert(leafFileCounts.forall(n => n >= 1 && n <= shards), leafFileCounts.toSeq)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
  }

  test("salted join equals the plain join") {
    val li = Readers.fixture(spark, sfDir, "lineitem")
      .select(col("l_suppkey").as("suppkey"), col("l_orderkey"))
    val sup = Readers.fixture(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    val salted = graft.operators.SkewJoin.saltedJoin(li, sup, "suppkey", 8)
      .groupBy("s_nationkey").count().as[(Long, Long)].collect().toMap
    val plain = li.join(sup, "suppkey")
      .groupBy("s_nationkey").count().as[(Long, Long)].collect().toMap
    assert(salted == plain)
  }
}
