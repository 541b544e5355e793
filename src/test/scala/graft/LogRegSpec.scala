package graft

import org.apache.spark.sql.functions._

import graft.core.Readers
import graft.operators.LogReg

/** Invariants of the integer-sigmoid kernel and the logistic-regression
  * quality-filter trainer that the oracle's value-compare can't express.
  */
class LogRegSpec extends SparkSpec {

  test("integer micro-sigmoid: SQL form == Scala mirror, anchors exact, tracks the real sigmoid") {
    val spark2 = spark; import spark2.implicits._
    val zs = Seq(0L, 1L, -1L, 100L, -100L, 123456L, -123456L, 693147L,
      -693147L, 1000000L, -1000000L, 2500000L, -2500000L, 6931470L,
      -6931470L, 13999999L, 14000000L, -14000000L, 99999999L, -99999999L)
    val got = LogReg.withSigmoid(zs.toDF("z"), "z", "sigma")
      .select("z", "sigma").as[(Long, Long)].collect().toMap
    zs.foreach { z =>
      // the driver-side mirror supplies nothing yet, but like lnMicroLong
      // it's the spec anchor: any SQL/Scala drift would silently split a
      // future frozen-scorer stream from the batch oracle
      assert(LogReg.sigmoidMicroLong(z) == got(z),
        s"Scala mirror diverged at $z: ${LogReg.sigmoidMicroLong(z)} vs ${got(z)}")
      val want = 1e6 / (1.0 + math.exp(-z / 1e6))
      assert(math.abs(got(z) - want) <= 30.0,
        s"sigmoidMicro($z) = ${got(z)}, true ${want.toLong}")
      // exact symmetry by construction: p and 1e6 - p
      assert(got.getOrElse(-z, LogReg.sigmoidMicroLong(-z)) == 1000000L - got(z))
    }
    assert(got(0L) == 500000L) // the 0.5 threshold anchor
    assert(got(14000000L) == 1000000L) // saturated high
    assert(got(-14000000L) == 0L) // saturated low
    assert(got(99999999L) == 1000000L) // clamp region
  }

  test("integer exp kernel: SQL == Scala mirror, anchors exact, tracks e^-x") {
    val spark2 = spark; import spark2.implicits._
    val as = Seq(0L, 1L, 1000L, 123456L, 693147L, 1000000L, 2500000L,
      6931470L, 13999999L, 14000000L, 99999999L)
    val got = LogReg.withExpNeg(as.toDF("a"), "a", "e")
      .select("a", "e").as[(Long, Long)].collect().toMap
    as.foreach { a =>
      assert(LogReg.expNegMicroLong(a) == got(a),
        s"Scala mirror diverged at $a: ${LogReg.expNegMicroLong(a)} vs ${got(a)}")
      val want = math.exp(-a / 1e6) * 1e6
      assert(math.abs(got(a) - want) <= 30.0,
        s"expNegMicro($a) = ${got(a)}, true ${want.toLong}")
    }
    assert(got(0L) == 1000000L) // e^0 exactly
    assert(got(14000000L) == 0L) // saturated
    assert(got(99999999L) == 0L) // clamp region
  }

  test("DoReMi domain weights: softmax sums to ~1e6 and upweights hard domains monotonically") {
    val spark2 = spark; import spark2.implicits._
    val w = graft.operators.Corpus.doremiWeights(
      Readers.fixture(spark, sfDir, "documents"), "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long)].collect()
    val d = w.length
    assert(d > 1)
    val total = w.map(_._5).sum
    // truncating divisions lose at most a few micro per domain
    assert(math.abs(total - 1000000L) <= 2L * d, s"weights sum $total")
    // multiplicative-weights direction: weight strictly increases with
    // excess loss (hard domains get MORE mass — the DoReMi update)
    val byExcess = w.sortBy(_._4)
    byExcess.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._5 <= hi._5,
        s"weight not monotone in excess: $lo vs $hi")
    }
    // every above-mean-loss domain outweighs every below-mean one
    val (hard, easy) = w.partition(_._4 > 0)
    if (hard.nonEmpty && easy.nonEmpty)
      assert(hard.map(_._5).min >= easy.map(_._5).max)
  }

  test("GD fine-tune never regresses the NB init and beats the base rate") {
    val docs = Readers.fixture(spark, sfDir, "documents")
    val nDocs = docs.count()
    val x = LogReg.features(docs, "doc_id", "text", col("lang") === "en",
      queries.TextQueries.LrBuckets).localCheckpoint()
    val init = LogReg.nbInit(x, queries.TextQueries.LrBuckets)
    def correct(w: Array[Long]): Long =
      LogReg.score(spark, x, w).filter(col("y") === col("pred")).count()
    val initCorrect = correct(init)
    val w = LogReg.trainWeights(spark, x, nDocs, queries.TextQueries.LrBuckets,
      queries.TextQueries.LrSteps, queries.TextQueries.LrNum,
      queries.TextQueries.LrDen, init = Some(init))
    val finalCorrect = correct(w)
    val baseRate = math.max(
      docs.filter(col("lang") === "en").count(),
      docs.filter(col("lang") =!= "en").count())
    assert(finalCorrect >= initCorrect,
      s"fine-tune regressed: $initCorrect -> $finalCorrect")
    assert(finalCorrect > baseRate,
      s"trained filter no better than majority class: $finalCorrect <= $baseRate")
  }

  test("frozen scorer is stateless: staged two-file arrival equals the batch score row-for-row") {
    val spark2 = spark; import spark2.implicits._
    val docs = Readers.fixture(spark, sfDir, "documents")
    val nDocs = docs.count()
    val buckets = 64
    val x = LogReg.features(docs, "doc_id", "text", col("lang") === "en", buckets)
      .localCheckpoint()
    val w = LogReg.trainWeights(spark, x, nDocs, buckets, 2, 1L, 1L,
      init = Some(LogReg.nbInit(x, buckets)))
    // batch truth over the same corpus
    val batch = LogReg.scoreRows(docs, "doc_id", "text", w, buckets)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // stream the corpus in two file-batches; append mode — if the scorer
    // had any cross-batch state the split would change some score
    val dir = java.nio.file.Files.createTempDirectory("graft-lr-stream").toString
    val (a, b) = (docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
    a.coalesce(1).write.parquet(s"$dir/f1")
    b.coalesce(1).write.parquet(s"$dir/f2")
    val in = spark.readStream.schema(spark.read.parquet(s"$dir/f1").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val streamed = graft.streaming.EventStreams.runToBatch(
      LogReg.scoreRows(in, "doc_id", "text", w, buckets),
      s"lr_stream_spec_${System.nanoTime()}",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(streamed == batch)
  }

  test("char trigrams: exact windows, short-text empty, unicode character-indexed") {
    val spark2 = spark; import spark2.implicits._
    val got = Seq("hello", "hi", "", "abc", "héllo")
      .toDF("t").select(col("t"), LogReg.charTrigrams(col("t")).as("g"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("hello") == Seq("hel", "ell", "llo"))
    assert(got("hi") == Seq.empty) // sequence(1,0) counts DOWN without the guard
    assert(got("") == Seq.empty)
    assert(got("abc") == Seq("abc"))
    // character-indexed, not byte-indexed: é is one character
    assert(got("héllo") == Seq("hél", "éll", "llo"))
  }

  test("persisted model round-trips exactly and the feature-space guard fails loudly") {
    val docs = Readers.fixture(spark, sfDir, "documents")
    val buckets = 64
    val x = LogReg.features(docs, "doc_id", "text", col("lang") === "en", buckets)
      .localCheckpoint()
    val w = LogReg.trainWeights(spark, x, docs.count(), buckets, 2, 1L, 1L,
      init = Some(LogReg.nbInit(x, buckets)))
    val path = java.nio.file.Files
      .createTempDirectory("graft-lr-m").resolve("m").toString
    LogReg.writeModel(spark, path, w, buckets)
    // bit-exact round-trip: scoring from disk == scoring from memory
    assert(LogReg.readModel(spark, path, buckets).toSeq == w.toSeq)
    // mismatched feature space must fail loudly, not silently mis-score
    val e = intercept[IllegalArgumentException] {
      LogReg.readModel(spark, path, 128)
    }
    assert(e.getMessage.contains("buckets=64"))
    // an EMPTY model parquet must fail loudly too: the implied all-zero
    // vector scores every doc sigma=500000 and silently passes any gate
    val emptyPath = java.nio.file.Files
      .createTempDirectory("graft-lr-m0").resolve("m").toString
    LogReg.weightsTable(spark, w).filter(lit(false))
      .withColumn("buckets", lit(buckets))
      .withColumnRenamed("w_micro", "w")
      .write.mode("overwrite").parquet(emptyPath)
    val e0 = intercept[IllegalArgumentException] {
      LogReg.readModel(spark, emptyPath, buckets)
    }
    assert(e0.getMessage.contains("no weight rows"))
    // a TRUNCATED model (rows missing) is corruption, not a sparse vector
    val truncPath = java.nio.file.Files
      .createTempDirectory("graft-lr-mt").resolve("m").toString
    spark.read.parquet(path).limit(buckets / 2)
      .write.mode("overwrite").parquet(truncPath)
    val et = intercept[IllegalArgumentException] {
      LogReg.readModel(spark, truncPath, buckets)
    }
    assert(et.getMessage.contains("truncated"))
  }

  test("slice featurization: filtering the shared feature frame == featurizing the slice") {
    // the text_lr_incremental rewire's correctness argument: features are
    // per-(doc, bucket) rows, so a doc_id filter of the full frame IS the
    // slice's featurization — pinned directly, not just via the oracle
    val spark2 = spark; import spark2.implicits._
    val docs = Readers.fixture(spark, sfDir, "documents")
    val pred = col("doc_id") % 10 === 9
    val viaFilter = graft.queries.TextQueries.lrFeatures(spark, sfDir)
      .filter(pred)
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaSlice = LogReg.features(docs.filter(pred), "doc_id", "text",
      col("lang") === "en", graft.queries.TextQueries.LrBuckets)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaFilter == viaSlice)
    assert(viaFilter.nonEmpty)
  }

  test("trainWeights refuses an empty corpus slice at entry") {
    // nDocs=0 previously threw ArithmeticException mid-loop while the duck
    // twin's integer division yielded NULL weights — loud, at entry, now
    val docs = Readers.fixture(spark, sfDir, "documents")
    val x = LogReg.features(docs, "doc_id", "text", col("lang") === "en", 64)
    val e = intercept[IllegalArgumentException] {
      LogReg.trainWeights(spark, x, 0L, 64, 1, 1L, 1L)
    }
    assert(e.getMessage.contains("nDocs=0"))
  }

  test("weight table is buckets+1 rows regardless of vocabulary size") {
    val spark2 = spark; import spark2.implicits._
    // synthetic corpus with ~40k distinct tokens — orders of magnitude more
    // than the bucket count; nothing downstream may grow with it
    val docs = (1 to 200).map { d =>
      (d.toLong, (1 to 20).map(t => s"tok${d * 997 + t * 131}").mkString(" "),
        if (d % 3 == 0) "en" else "xx")
    }.toDF("doc_id", "text", "lang")
    val buckets = 64
    val x = LogReg.features(docs, "doc_id", "text", col("lang") === "en", buckets)
      .localCheckpoint()
    assert(x.select("bkt").distinct().count() <= buckets + 1)
    val w = LogReg.trainWeights(spark, x, 200L, buckets, 2, 1L, 1L,
      init = Some(LogReg.nbInit(x, buckets)))
    assert(w.length == buckets + 1)
    assert(LogReg.weightsTable(spark, w).count() == buckets + 1)
  }
}
