package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.{Fingerprints, TableSpec, VerifyConfig}

/** ScalaCheck properties from SURVEY.md §5(d): fingerprint invariance under
  * row order, sensitivity to any single-cell change, sparse determinism.
  * Raw ScalaCheck generators driven from a fixed seed (the scalatestplus
  * bridge isn't in the offline artifact cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val cfg = VerifyConfig(bookendLimit = 5)
  private val spec = TableSpec("t", Seq("id"))

  private val rowsGen: Gen[List[(Int, String, Double)]] = for {
    n <- Gen.choose(1, 12)
    rows <- Gen.listOfN(n, for {
      s <- Gen.alphaNumStr.map(_.take(6))
      d <- Gen.choose(-999, 999).map(_ / 100.0) // 2dp money-like
    } yield (s, d))
  } yield rows.zipWithIndex.map { case ((s, d), i) => (i, s, d) }

  private def samples(k: Int): Seq[List[(Int, String, Double)]] =
    (0 until k).flatMap(i => rowsGen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("isqrt SQL fix-up is exact on random longs, perfect squares, and their neighbors") {
    // the temperature-mix weights lean on floor(sqrt(double)) being within
    // ±1 of true isqrt below 2^52 and the CASE fix-up closing the gap; test
    // random values plus the adversarial band (k², k²±1 — exactly where a
    // misrounded double sqrt crosses an integer boundary)
    val rnd = new scala.util.Random(7)
    val randoms = List.fill(300)(math.abs(rnd.nextLong()) % (1L << 52))
    val squares = (0 until 100).map(_ => math.abs(rnd.nextLong()) % (1L << 26))
      .flatMap(k => Seq(k * k, math.max(k * k - 1, 0), k * k + 1))
    val xs = (randoms ++ squares ++ Seq(0L, 1L, 2L, 3L, (1L << 52) - 1)).distinct
    import org.apache.spark.sql.functions.{col, expr}
    val got = xs.toDF("x")
      .select(col("x"), expr(graft.operators.Corpus.isqrtSql("x")).as("s"))
      .as[(Long, Long)].collect()
    got.foreach { case (x, s) =>
      val exact = java.math.BigInteger.valueOf(x).sqrt().longValueExact()
      assert(s == exact, s"isqrt($x): got $s want $exact")
    }
  }

  test("integer sigmoid/exp SQL equals the Scala mirror on random micro inputs") {
    // the LR filter and the DoReMi softmax both lean on the SQL stage
    // templates computing the IDENTICAL integer as the driver-side mirrors
    // (lnMicroLong convention) — anchors are pinned in LogRegSpec; this is
    // the randomized sweep, concentrated where behavior changes (series
    // range, clamp edge, saturation) plus uniform noise
    val rnd = new scala.util.Random(11)
    val zs = (List.fill(200)(rnd.nextLong() % 20000000L) ++
      List.fill(100)(rnd.nextLong() % 693147L) ++ // within one ln2 window
      List.fill(50)(13999000L + rnd.nextInt(2000)) ++ // clamp edge band
      Seq(Long.MinValue + 1, 0L)).distinct
    import org.apache.spark.sql.functions.col
    val gotS = graft.operators.LogReg.withSigmoid(zs.toDF("z"), "z", "s")
      .select(col("z"), col("s")).as[(Long, Long)].collect()
    gotS.foreach { case (z, s) =>
      assert(s == graft.operators.LogReg.sigmoidMicroLong(z),
        s"sigmoid($z): SQL $s != mirror ${graft.operators.LogReg.sigmoidMicroLong(z)}")
      // exact complement law holds for every input by construction
      assert(graft.operators.LogReg.sigmoidMicroLong(-z) == 1000000L - s)
    }
    val as = zs.map(math.abs)
    val gotE = graft.operators.LogReg.withExpNeg(as.toDF("a"), "a", "e")
      .select(col("a"), col("e")).as[(Long, Long)].collect()
    gotE.foreach { case (a, e) =>
      assert(e == graft.operators.LogReg.expNegMicroLong(a),
        s"expNeg($a): SQL $e != mirror ${graft.operators.LogReg.expNegMicroLong(a)}")
      assert(e >= 0 && e <= 1000000L)
    }
    // monotone: e^-a never increases with a (truncating divisions included)
    gotE.sortBy(_._1).sliding(2).foreach { case Array((a1, e1), (a2, e2)) =>
      assert(e2 <= e1, s"expNeg not monotone: ($a1,$e1) -> ($a2,$e2)")
    }
  }

  test("priority sampling equals a plain-Scala reference on random weighted sets") {
    // independent reimplementation of the Duffield–Lund–Thorup key (md5 →
    // first 8 hex chars → unsigned 32-bit → ·2²⁰ integral-div weight) and
    // the (key, id) tiebreak — locks the exact integer formula the DuckDB
    // twin also reimplements
    def refKey(id: Long, w: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) * 1048576L) / w
    }
    val idsGen = for {
      n <- Gen.choose(5, 40)
      ids <- Gen.listOfN(n, Gen.choose(0L, 1000000L))
      ws <- Gen.listOfN(n, Gen.choose(1L, 5000000L))
    } yield ids.distinct.zip(ws)
    (0 until 5).foreach { i =>
      val rows = idsGen.apply(Gen.Parameters.default, Seed(77L + i)).get
      val k = math.max(1, rows.size / 2)
      val df = rows.toDF("doc_id", "wt")
      val got = graft.operators.Corpus.prioritySample(df, "doc_id",
          org.apache.spark.sql.functions.col("wt"), k)
        .select("doc_id", "priority")
        .as[(Long, Long)].collect().toSeq.sorted
      val want = rows.map { case (id, w) => (id, refKey(id, w)) }
        .sortBy { case (id, key) => (key, id) }.take(k).sorted
      assert(got == want, s"sample $i diverged: got=$got want=$want")
    }
  }

  test("pairRules equals a plain-Scala reference on random basket sets") {
    // independent reimplementation of support / confidence / two-step lift
    // (same truncating integer divisions) over random (basket, item) rows
    // with duplicates — locks the dedup, the apriori prune (a prune bug
    // would SHOW here as a missing or extra frequent pair), and the exact
    // integer arithmetic the DuckDB twin also reimplements
    val gen = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, for {
        b <- Gen.choose(1L, 8L)
        it <- Gen.oneOf("a", "b", "c", "d", "e")
      } yield (b, it))
    } yield rows
    (0 until 5).foreach { i =>
      val raw = gen.apply(Gen.Parameters.default, Seed(91L + i)).get
      val minSupport = 2L
      val rows = raw.distinct
      val nB = rows.map(_._1).distinct.size.toLong
      val itemN = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val freq = itemN.filter(_._2 >= minSupport)
      val byBasket = rows.filter(r => freq.contains(r._2)).groupBy(_._1)
      val pairN = byBasket.values.flatMap { rs =>
        val its = rs.map(_._2).sorted
        for (x <- its; y <- its if x < y) yield (x, y)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 >= minSupport)
      val want = pairN.toSeq.map { case ((a, b), pn) =>
        val (na, nb2) = (freq(a), freq(b))
        (a, b, pn, na, nb2, pn * 1000000L / na, pn * 1000000L / nb2,
          (pn * 1000000L / na) * nB / nb2)
      }.sorted
      val got = graft.operators.Itemsets.pairRules(raw.toDF("basket", "item"), minSupport)
        .as[(String, String, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq.sorted
      assert(got == want, s"sample $i diverged: got=$got want=$want")
    }
  }

  test("kCore equals a plain-Scala peel on random graphs") {
    val gen = for {
      n <- Gen.choose(3, 40)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L)
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.filter(e => e._1 != e._2).distinct
    def refPeel(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
      var e = edges
      var stable = false
      while (!stable) {
        val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val e2 = e.filter(p => keep(p._1) && keep(p._2))
        stable = e2.size == e.size
        e = e2
      }
      e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
    }
    (0 until 5).foreach { i =>
      val edges = gen.apply(Gen.Parameters.default, Seed(53L + i)).get
      if (edges.nonEmpty) (2 to 3).foreach { k =>
        val got = graft.operators.Graph.kCore(edges.toDF("a", "b"), k)
          .as[(Long, Long)].collect().toMap
        val want = refPeel(edges, k)
        assert(got == want, s"sample $i k=$k diverged: got=$got want=$want")
      }
    }
  }

  test("nodeSimilarity equals a plain-Scala set intersection on random graphs") {
    val gen = for {
      n <- Gen.choose(3, 40)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L)
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.filter(e => e._1 != e._2).distinct
    def ref(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      val adj = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      edges.map { case (a, b) =>
        val c = (adj(a) intersect adj(b)).size.toLong
        (a, b, c, c * 1000000L / (adj(a).size + adj(b).size - c))
      }.sorted
    }
    (0 until 5).foreach { i =>
      val edges = gen.apply(Gen.Parameters.default, Seed(97L + i)).get
      if (edges.nonEmpty) {
        val got = graft.operators.Graph.nodeSimilarity(edges.toDF("a", "b"))
          .as[(Long, Long, Long, Long)].collect().toSeq.sorted
        assert(got == ref(edges), s"sample $i diverged: got=$got want=${ref(edges)}")
      }
    }
  }

  test("full digest is invariant under row order") {
    for (rows <- samples(8)) {
      val a = Fingerprints.fullDigest(rows.toDF("id", "s", "d"), spec, cfg)
      val b = Fingerprints.fullDigest(
        new scala.util.Random(7).shuffle(rows).toDF("id", "s", "d"), spec, cfg)
      assert(a == b, s"rows=$rows")
    }
  }

  test("any single-cell change flips the full digest") {
    for ((rows, pick) <- samples(8).zipWithIndex) {
      val i = pick % rows.length
      val mutated = rows.updated(i, rows(i).copy(_2 = rows(i)._2 + "!"))
      val a = Fingerprints.fullDigest(rows.toDF("id", "s", "d"), spec, cfg)
      val b = Fingerprints.fullDigest(mutated.toDF("id", "s", "d"), spec, cfg)
      assert(a != b, s"rows=$rows i=$i")
    }
  }

  test("stats digest: order/partitioning-invariant; extremum or null-count changes flip it") {
    for ((rows, pick) <- samples(8).zipWithIndex) {
      val df = rows.toDF("id", "s", "d")
      val a = Fingerprints.statsDigest(df, spec, cfg)
      // invariant under shuffle AND repartition (pure commutative aggregates)
      assert(a == Fingerprints.statsDigest(
        new scala.util.Random(11).shuffle(rows).toDF("id", "s", "d").repartition(5), spec, cfg))
      // growing the string MAXIMUM flips it (suffix on the max-sorting cell)
      val i = rows.indexOf(rows.maxBy(_._2))
      val mutated = rows.updated(i, rows(i).copy(_2 = rows(i)._2 + "~"))
      assert(a != Fingerprints.statsDigest(mutated.toDF("id", "s", "d"), spec, cfg),
        s"rows=$rows i=$i")
      // nulling any one cell flips it (non-null count drops)
      val j = pick % rows.length
      val withNull = rows.zipWithIndex.map { case (r, k) =>
        (r._1, if (k == j) null else r._2, r._3)
      }
      assert(a != Fingerprints.statsDigest(withNull.toDF("id", "s", "d"), spec, cfg),
        s"rows=$rows j=$j")
    }
  }

  test("sparse samples a deterministic subset: mod=1 equals full, stable across partitionings") {
    for (rows <- samples(5)) {
      val df = rows.toDF("id", "s", "d")
      assert(Fingerprints.sparseDigest(df, spec, cfg.copy(sparseMod = 1))
        == Fingerprints.fullDigest(df, spec, cfg))
      assert(Fingerprints.sparseDigest(df, spec, cfg)
        == Fingerprints.sparseDigest(df.repartition(3), spec, cfg))
    }
  }

  test("semi-join sparse (J2 reference form) equals the direct-filter sparse") {
    for (rows <- samples(5)) {
      val df = rows.toDF("id", "s", "d")
      assert(Fingerprints.sparseDigestSemiJoin(df, spec, cfg)
        == Fingerprints.sparseDigest(df, spec, cfg))
    }
  }

  test("composite-PK sparse replicates the reference's per-column IN superset") {
    // small key domains force PK-column value collisions, so the per-column
    // IN form genuinely differs from the joint P7 filter
    val rows = (for { a <- 0 to 6; b <- 0 to 6 } yield (a, b, s"v$a-$b")).toList
    val df = rows.toDF("a", "b", "s")
    val cspec = TableSpec("t", Seq("a", "b"))
    // independent expectation: collect the jointly-sampled rows, then apply
    // the per-column membership semantics in plain Scala
    val sampled = df.filter(Fingerprints.sparseFilter(df, cspec, cfg))
      .select("a", "b").collect().map(r => (r.getInt(0), r.getInt(1)))
    val setA = sampled.map(_._1).toSet
    val setB = sampled.map(_._2).toSet
    val expectedRows = rows.filter(r => setA(r._1) && setB(r._2))
    assert(sampled.nonEmpty && expectedRows.size > sampled.length,
      s"fixture must exercise the superset: sampled=${sampled.length} expected=${expectedRows.size}")
    val expected = Fingerprints.fullDigest(expectedRows.toDF("a", "b", "s"), cspec, cfg)
    assert(Fingerprints.sparseDigestSemiJoin(df, cspec, cfg) == expected)
    // both production entry points route composite PKs through the faithful form
    assert(Fingerprints.sparseDigest(df, cspec, cfg) == expected)
    assert(Fingerprints.runModes(Seq(core.TestModes.Sparse), df, cspec, cfg)(core.TestModes.Sparse)
      == expected)
  }

  test("BPE merge trajectory equals an independent Scala reference, corpus-order-invariant") {
    // plain-Scala retraining: character-segmented word dict, position-counted
    // adjacent pairs weighted by word frequency, (count desc, l asc, r asc)
    // argmax, greedy leftmost non-overlapping merge fold — the semantics the
    // Column-expression fold and the DuckDB list_reduce twin both implement.
    // Applying the merge list step-by-step to the original dict reproduces
    // the whole trajectory, locking the fold against either engine drifting.
    def mergeSeg(seg: Vector[String], l: String, r: String): Vector[String] =
      seg.tail.foldLeft(Vector(seg.head)) { (acc, x) =>
        if (acc.last == l && x == r) acc.init :+ (l + r) else acc :+ x
      }
    def reference(words: Seq[String], maxIters: Int): Seq[(Long, String, String, Long)] = {
      var dict = words.groupBy(identity).toSeq.map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.length.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      for (it <- 1 to maxIters) {
        val pc = dict.flatMap { case (seg, n) =>
          seg.iterator.zip(seg.iterator.drop(1)).map(p => p -> n).toSeq
        }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
        if (pc.nonEmpty) {
          val ((l, r), n) = pc.minBy { case ((l, r), n) => (-n, l, r) }
          out += ((it.toLong, l, r, n))
          dict = dict.map { case (seg, cnt) => mergeSeg(seg, l, r) -> cnt }
            .groupBy(_._1).toSeq.map { case (s, xs) => s -> xs.map(_._2).sum }
        }
      }
      out.toSeq
    }
    val wordGen = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b")).map(_.mkString))
    val corpusGen = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, wordGen))
    val corpora = (0 until 6).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(99L + i)))
    for ((words, i) <- corpora.zipWithIndex) {
      val expect = reference(words, 3)
      if (expect.nonEmpty) {
        // shuffled + regrouped docs: the dict is order-invariant by construction
        val docs = new scala.util.Random(i).shuffle(words)
          .grouped(3).map(_.mkString(" ")).toSeq
        val got = graft.operators.Vocab.bpeMerges(docs.toDF("text"), "text", expect.length)
          .as[(Long, String, String, Long)].collect().toSeq
        assert(got == expect, s"words=$words")
      }
    }
  }

  test("full digest is invariant under column-name case (heterogeneous-target property)") {
    // the core per-target-discovery guarantee: the SAME data published under
    // an uppercase-folding and a lowercase-folding catalog must fingerprint
    // identically — requires the case-insensitive hash column order AND
    // case-aligned PK specs
    for (rows <- samples(8)) {
      val lower = rows.toDF("id", "s_col", "d_col")
      val upper = rows.toDF("ID", "S_COL", "D_COL")
      val a = Fingerprints.fullDigest(lower, TableSpec("t", Seq("id")), cfg)
      val b = Fingerprints.fullDigest(upper, TableSpec("t", Seq("ID")), cfg)
      assert(a == b, s"rows=$rows")
    }
  }

  test("sequence packing conserves docs/tokens and numbers densely for random configs") {
    import org.apache.spark.sql.functions.{col, size => asize}
    val docs = graft.core.Readers.fixture(spark, sfDir, "documents").limit(150).cache()
    val totalDocs = docs.count()
    val totalTokens = docs
      .select(asize(graft.operators.TextAnalysis.tokens(col("text"))).cast("long"))
      .as[Long].collect().sum
    val cfgGen = for {
      seqLen <- Gen.choose(32, 2048)
      shards <- Gen.choose(1, 16)
    } yield (seqLen, shards)
    val cfgs = (0 until 5).flatMap(i => cfgGen.apply(Gen.Parameters.default, Seed(11L + i)))
    for ((seqLen, shards) <- cfgs) {
      val packed = graft.operators.Corpus
        .packSequences(docs, "doc_id", "text", "lang", seqLen, shards)
        .select("stratum", "shard", "seq_id", "n_docs", "n_tokens")
        .as[(String, Long, Long, Long, Long)].collect()
      assert(packed.map(_._4).sum == totalDocs, s"docs conserved at ($seqLen, $shards)")
      assert(packed.map(_._5).sum == totalTokens, s"tokens conserved at ($seqLen, $shards)")
      packed.groupBy(p => (p._1, p._2)).foreach { case (part, seqs) =>
        val ids = seqs.map(_._3).sorted.toSeq
        assert(ids == (0L until ids.size), s"dense seq ids at $part ($seqLen, $shards)")
      }
    }
  }

  test("int8 quantization bounds random vectors; zero vectors quantize to zeros") {
    import org.apache.spark.sql.functions.{col, exists}
    val vecGen = for {
      n <- Gen.choose(1, 16)
      v <- Gen.listOfN(n, Gen.choose(-1e6.toInt, 1e6.toInt).map(_ / 1e3f))
    } yield v
    val vecs = (0 until 30).flatMap(i => vecGen.apply(Gen.Parameters.default, Seed(3L + i)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) } :+ (999L, List(0f, 0f, 0f))
    val df = vecs.toDF("vec_id", "embedding")
    val q = graft.operators.Similarity.withQuantized(df, "embedding", "qv")
    assert(q.filter(exists(col("qv"), x => x > 127 || x < -128)).count() == 0)
    val zeroRow = q.filter(col("vec_id") === 999L)
      .select("qv").as[Seq[Long]].head()
    assert(zeroRow.forall(_ == 0L), s"zero vector → zero codes: $zeroRow")
  }

  test("ExactSubstr coverage matches a plain-Scala reference on random corpora") {
    import graft.operators.ExactSubstr
    val k = 3
    // small alphabet + short docs → dense span collisions, the interesting
    // regime for island merging
    val corpusGen: Gen[List[String]] = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, for {
        n <- Gen.choose(0, 12)
        toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
      } yield toks.mkString(" "))
    } yield docs
    def reference(texts: List[String]): Map[Long, (Long, Long, Long, Long)] = {
      val toks = texts.map(_.split(" ").filter(_.nonEmpty).toList)
      val spans = toks.zipWithIndex.flatMap { case (tk, d) =>
        if (tk.length < k) Nil
        else (0 to tk.length - k).map(p => (d.toLong, p + 1, tk.slice(p, p + k).mkString(" ")))
      }
      val dup = spans.groupBy(_._3).filter(_._2.size > 1).keySet
      spans.filter(s => dup.contains(s._3)).groupBy(_._1).map { case (d, ss) =>
        val starts = ss.map(_._2).sorted
        // merge intervals [p, p+k-1]
        // plain interval union of [p, p+k-1]; merging adjacent intervals is
        // length-equivalent to the operator's gap>=k island split
        val covered = starts.foldLeft(List.empty[(Int, Int)]) { (acc, p) =>
          acc match {
            case (lo, hi) :: t if p <= hi + 1 => (lo, math.max(hi, p + k - 1)) :: t
            case _ => (p, p + k - 1) :: acc
          }
        }.map { case (lo, hi) => hi - lo + 1 }.sum
        val n = toks(d.toInt).length.toLong
        d -> ((n, starts.size.toLong, covered.toLong, 1000000L * covered / n))
      }
    }
    for (seedOff <- 0 until 10; corpus <- corpusGen.apply(Gen.Parameters.default, Seed(11L + seedOff))) {
      // split-on-space of an empty string yields one empty token in both
      // engines; restrict the property to non-degenerate docs
      val texts = corpus.filter(_.nonEmpty)
      if (texts.nonEmpty) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val got = ExactSubstr.coverage(df, "doc_id", "text", k)
          .select("id", "n_tokens", "n_dup_spans", "covered_tokens", "coverage_micro")
          .as[(Long, Long, Long, Long, Long)].collect()
          .map { case (id, n, d, c, m) => id -> ((n, d, c, m)) }.toMap
        assert(got == reference(texts), s"corpus=$texts")
      }
    }
  }

  test("chunking is a partition at stride==chunk and reassembles every token") {
    import graft.operators.Corpus
    val docGen: Gen[String] = for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("x", "y", "z", "w"))
    } yield toks.mkString(" ")
    val texts = (0 until 12)
      .flatMap(i => docGen.apply(Gen.Parameters.default, Seed(23L + i)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // stride == chunkTokens: chunks tile the doc exactly — concatenation in
    // chunk_idx order reproduces the original text
    val tiled = Corpus.chunk(df, "doc_id", "text", chunkTokens = 5, stride = 5)
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (d, cs) =>
        d -> cs.sortBy(_._2).map(_._3).mkString(" ")
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(tiled(i.toLong) == t, s"doc $i reassembly")
    }
    // overlapping stride: every token position is covered by some chunk and
    // consecutive chunks agree on their overlap
    val over = Corpus.chunk(df, "doc_id", "text", chunkTokens = 6, stride = 4)
      .select("doc_id", "start_pos", "n_chunk_tokens")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val n = t.split(" ").length
      val iv = over(i.toLong).map(c => (c._2, c._2 + c._3 - 1)).sortBy(_._1)
      assert(iv.head._1 == 1 && iv.last._2 == n, s"doc $i span range")
      iv.sliding(2).foreach {
        case Array((_, hiA), (loB, _)) => assert(loB <= hiA + 1, s"doc $i gap")
        case _ =>
      }
    }
  }

  test("prefix-filter Jaccard join equals brute force on random corpora") {
    // independent plain-Scala reference: same shingle semantics
    // (distinct word n-grams; short docs shingle to the whole text) and the
    // integer threshold/micro formulas, but ALL pairs — so any pair the
    // prefix pruning loses (or invents) fails the property
    val n = 3
    def sh(text: String): Set[String] = {
      val tk = text.split(" ", -1)
      if (tk.length >= n) tk.sliding(n).map(_.mkString(" ")).toSet
      else Set(tk.mkString(" "))
    }
    def brute(docs: Seq[(Long, String)], num: Int, den: Int): Seq[(Long, Long, Long)] =
      (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        inter = (sh(ta) & sh(tb)).size.toLong
        union = (sh(ta) | sh(tb)).size.toLong
        if inter * den >= union * num
      } yield (ia, ib, 1000000L * inter / union)).sorted
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox")
    val corpusGen = for {
      nd <- Gen.choose(6, 24)
      base <- Gen.listOfN(nd, Gen.choose(1, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
      // planted near-dups: copy some docs with one token appended
      dups <- Gen.someOf(base)
    } yield (base ++ dups.map(_ + " echo")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    (0 until 6).foreach { i =>
      val docs = corpusGen.apply(Gen.Parameters.default, Seed(91L + i)).get
      val (num, den) = if (i % 2 == 0) (1, 2) else (7, 10)
      val got = graft.operators.PrefixJaccard.pairs(
          docs.toDF("doc_id", "text"), "doc_id", "text", n, num, den)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      val want = brute(docs, num, den)
      assert(got == want, s"corpus $i (t=$num/$den) diverged:\n got=$got\n want=$want")
    }
  }

  test("CUSUM window identity holds on random series (vs the literal recursion)") {
    // the ev_cusum de-recursion: max(0, s+d) fold == c - min(0, prefix-min c)
    val seriesGen = for {
      n <- Gen.choose(1, 40)
      k <- Gen.choose(0L, 50L)
      xs <- Gen.listOfN(n, Gen.choose(0L, 200L))
    } yield (k, xs)
    (0 until 60).flatMap(i => seriesGen.apply(Gen.Parameters.default, Seed(99L + i)))
      .foreach { case (k, xs) =>
        val rec = xs.scanLeft(0L)((s, x) => math.max(0L, s + (x - k))).tail
        val c = xs.scanLeft(0L)((a, x) => a + (x - k)).tail
        val win = c.zipWithIndex.map { case (ci, i) =>
          ci - math.min(0L, c.take(i + 1).min)
        }
        assert(rec == win, s"k=$k xs=$xs")
      }
  }

  test("KS mirror: zero on self, symmetric, bounded by 1e6 on random samples") {
    val sampleGen = Gen.listOfN(30, Gen.choose(1L, 50L))
    def ecdfD(a: Seq[Long], b: Seq[Long]): Long = {
      val grid = (a ++ b).distinct.sorted
      grid.map { x =>
        math.abs(a.count(_ <= x) * 1000000L / a.size - b.count(_ <= x) * 1000000L / b.size)
      }.max
    }
    val samples = (0 until 30).flatMap(i =>
      sampleGen.apply(Gen.Parameters.default, Seed(123L + i))).grouped(2).toSeq
    samples.collect { case Seq(a, b) =>
      assert(ecdfD(a, a) == 0L)
      assert(ecdfD(a, b) == ecdfD(b, a))
      assert(ecdfD(a, b) >= 0L && ecdfD(a, b) <= 1000000L)
      // disjoint supports separate completely
      assert(ecdfD(a.map(_ + 1000), a) >= 1000000L - a.size * 2L)
    }
  }

  test("JSD mirror: zero on self, symmetric, bounded by ln 2 on random share vectors") {
    val Ln2 = graft.operators.Selection.Ln2Micro
    import graft.operators.Selection.lnMicroLong
    def jsd2(p: Seq[Long], q: Seq[Long]): Long =
      p.zip(q).map { case (pi, qi) =>
        pi * (Ln2 + lnMicroLong(pi + 1) - lnMicroLong(pi + qi + 2)) +
          qi * (Ln2 + lnMicroLong(qi + 1) - lnMicroLong(pi + qi + 2))
      }.sum
    // normalize to micro shares — the ln2 bound is a property of
    // DISTRIBUTIONS (Σp = 1e6), which is what the query feeds it
    def shares(v: Seq[Long]): Option[Seq[Long]] = {
      val t = v.sum
      if (t == 0) None else Some(v.map(_ * 1000000L / t))
    }
    val vecGen = Gen.listOfN(20, Gen.choose(0L, 100000L))
    val vecs = (0 until 40).flatMap(i =>
      vecGen.apply(Gen.Parameters.default, Seed(321L + i)))
    vecs.grouped(2).toSeq.collect { case Seq(v1, v2) =>
      for (p <- shares(v1); q <- shares(v2)) {
        assert(jsd2(p, p) == 0L, s"self-JSD nonzero for $p")
        assert(jsd2(p, q) == jsd2(q, p))
        val jsdMicro = math.max(jsd2(p, q), 0L) / 2000000L
        assert(jsdMicro >= 0L && jsdMicro <= Ln2)
      }
    }
  }

  test("week truncation lands on a Monday boundary for random timestamps") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampType
    val tsGen = Gen.choose(-4.0e15.toLong, 4.0e15.toLong) // ±~1970±127y in micros
    val micros = (0 until 40).flatMap(i => tsGen.apply(Gen.Parameters.default, Seed(7L + i)))
    val df = micros.map(us => Tuple1(new Timestamp(us / 1000))).toDF("t")
    val canon = df.select(graft.canon.Canon.canonCol(col("t"), TimestampType, "week"))
      .as[String].collect().map(_.toLong)
    val week = 7L * 86400 * 1000000
    val anchor = -259200000000L // Monday 1969-12-29T00:00Z
    canon.zip(micros).foreach { case (tr, orig) =>
      assert(Math.floorMod(tr - anchor, week) == 0, s"$tr not Monday-aligned")
      val inputMs = (orig / 1000) * 1000 // Timestamp ctor keeps ms precision
      assert(tr <= inputMs && inputMs - tr < week, s"$tr not the floor week of $inputMs")
    }
  }
}
