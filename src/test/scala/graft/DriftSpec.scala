package graft

import org.apache.spark.sql.functions._

import graft.core.Readers
import graft.operators.Selection.lnMicroLong
import graft.queries.DriftQueries

/** Distribution-statistics family: each query's integer score is recomputed
  * in the spec from first principles (collected fixture rows + the Scala
  * micro-ln mirror) and must match the distributed result EXACTLY — the
  * same discipline as the DSIR/xent specs.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = DriftQueries.entries(name).fn(spark, sfDir)

  test("ev_user_entropy: bands partition all users; exact vs driver-side mirror") {
    val ev = Readers.fixture(spark, sfDir, "events")
      .select(col("user_id"), col("event_type")).as[(Long, String)].collect()
    // mirror: per-user type counts -> integer entropy -> centinat band
    val expected = ev.groupBy(_._1).values.map { rows =>
      val counts = rows.groupBy(_._2).values.map(_.size.toLong).toSeq
      val nn = counts.sum
      val s = counts.map(n => n * lnMicroLong(n)).sum
      val h = math.max(lnMicroLong(nn) - s / nn, 0L)
      (h / 10000, nn)
    }.toSeq
    val expBands = expected.groupBy(_._1).map { case (b, xs) =>
      (b, (xs.size.toLong, xs.map(_._2).sum))
    }
    val got = run("ev_user_entropy")
      .as[(Long, Long, Long)].collect()
      .map { case (b, u, e) => (b, (u, e)) }.toMap
    assert(got == expBands)
    // entropy of a k-way distribution is bounded by ln k
    val nTypes = ev.map(_._2).distinct.size.toLong
    assert(got.keys.max <= lnMicroLong(nTypes) / 10000 + 1)
    assert(got.keys.min >= 0)
  }

  test("ev_psi_weekly: exact vs driver-side mirror; non-negative") {
    val WeekUs = 7L * 86400000000L
    val ev = Readers.fixture(spark, sfDir, "events")
      .select(expr(s"unix_micros(ts) div $WeekUs").as("w"), col("event_type"))
      .as[(Long, String)].collect()
    val cells = ev.groupBy(identity).map { case ((w, t), xs) => (w, t, xs.size.toLong) }
    val tots = cells.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._3).sum) }
    val share = cells.map { case (w, t, n) => ((w, t), n * 1000000L / tots(w)) }.toMap
    val weeks = tots.keys.toSeq.sorted
    val expected = weeks.sliding(2).collect {
      case Seq(w0, w1) if w1 == w0 + 1 =>
        val both = share.keys.collect { case (w, t) if w == w0 && share.contains((w1, t)) => t }
        val psi = both.toSeq.map { t =>
          val (p, q) = (share((w1, t)), share((w0, t)))
          (p - q) * (lnMicroLong(p + 1) - lnMicroLong(q + 1))
        }.sum / 1000000L
        (w1, (psi, both.size.toLong))
    }.toMap
    val got = run("ev_psi_weekly").as[(Long, Long, Long)].collect()
      .map { case (w, psi, n) => (w, (psi, n)) }.toMap
    assert(got == expected)
    assert(got.values.forall(_._1 >= 0))
  }

  test("corpus_ks_length: exact vs driver-side ECDF mirror; bounded by 1e6") {
    val docs = Readers.fixture(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
    val bySrc = docs.groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2)) }
    val grid = docs.map(_._2).distinct.sorted
    def ecdf(lengths: Array[Long]): Map[Long, Long] = {
      val n = lengths.length.toLong
      grid.map(x => x -> lengths.count(_ <= x) * 1000000L / n).toMap
    }
    val curves = bySrc.map { case (s, xs) => (s, (xs.length.toLong, ecdf(xs))) }
    val expected = (for {
      (sa, (na, fa)) <- curves; (sb, (nb, fb)) <- curves if sa < sb
    } yield (sa, sb) -> ((na, nb, grid.map(x => math.abs(fa(x) - fb(x))).max))).toMap
    val got = run("corpus_ks_length").as[(String, String, Long, Long, Long)].collect()
      .map { case (a, b, na, nb, d) => (a, b) -> ((na, nb, d)) }.toMap
    assert(got == expected)
    assert(got.values.forall { case (_, _, d) => d >= 0 && d <= 1000000L })
  }

  test("text_token_gini: exact vs driver-side mirror; in [0, 1e6)") {
    val docs = Readers.fixture(spark, sfDir, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
    val expected = docs.groupBy(_._1).map { case (src, xs) =>
      val tf = xs.flatMap(_._2.split(" ", -1)).groupBy(identity)
        .map { case (t, ts) => (t, ts.size.toLong) }
      val ranked = tf.toSeq.sortBy { case (t, f) => (f, t) }.zipWithIndex
      val n = ranked.size.toLong
      val total = tf.values.sum
      val wsum = ranked.map { case ((_, f), i0) => (2L * (i0 + 1) - 1) * f }.sum
      (src, (n, total, (wsum - n * total) * 1000000L / (n * total)))
    }
    val got = run("text_token_gini").as[(String, Long, Long, Long)].collect()
      .map { case (s, n, t, g) => (s, (n, t, g)) }.toMap
    assert(got == expected)
    assert(got.values.forall { case (_, _, g) => g >= 0 && g < 1000000L })
  }
}
