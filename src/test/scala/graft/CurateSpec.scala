package graft

import org.apache.spark.sql.functions._

/** graft-curate end-to-end: funnel monotonicity, stage agreement with the
  * oracle-checked queries, output layout, and flag parsing.
  */
class CurateSpec extends SparkSpec {

  test("curate pipeline funnel is monotone and matches the query-level stages") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate").toString
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = sfDir, outDir = out, minQuality = 0.45)).toMap
    assert(funnel("input") == spark.read.parquet(s"$sfDir/documents.parquet").count())
    // each stage can only drop documents
    val order = Seq("input", "exact_deduped", "near_deduped", "decontaminated", "quality_kept")
    order.sliding(2).foreach {
      case Seq(a, b) => assert(funnel(a) >= funnel(b), s"$a -> $b grew")
      case _ =>
    }
    assert(funnel("written") == funnel("quality_kept"), "write round-trips the kept set")
    // stage agreement: exact dedup count equals the dedup_exact distinct-hash count
    val wantExact = SparkEntry.queries("dedup_exact")(spark, sfDir).count()
    assert(funnel("exact_deduped") == wantExact)
    // output is hive-partitioned by split then lang
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("split=")), dirs.toSeq)
    val back = spark.read.parquet(out)
    assert(back.columns.toSet.contains("split") && back.columns.toSet.contains("lang"))
  }

  test("decontamination stage drops trigram-overlapping documents") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate-d").toString
    // decontaminating a corpus against itself leaves nothing (every doc
    // shares all its trigrams with itself)
    val funnel = Curate.run(spark, Curate.Config(
      docsDir = sfDir, outDir = out, decontaminateAgainst = Some(sfDir))).toMap
    assert(funnel("decontaminated") == 0L)
    assert(funnel("written") == 0L)
  }

  test("flag parsing: help, unknown flags, bad numerics, positional arity") {
    assert(Curate.parse(Seq("--help")) == Left(Curate.helpText))
    assert(Curate.parse(Seq("a", "b", "c")).isLeft)
    assert(Curate.parse(Seq("--min-quality", "high", "a", "b")).isLeft)
    assert(Curate.parse(Seq("--bogus", "1", "a", "b")).isLeft)
    assert(Curate.parse(Seq("--train-pct", "80", "--val-pct", "30", "a", "b")).isLeft)
    // negative pcts would silently route everything to the 'test' split
    assert(Curate.parse(Seq("--train-pct", "-10", "a", "b")).isLeft)
    assert(Curate.parse(Seq("--val-pct", "-1", "a", "b")).isLeft)
    val ok = Curate.parse(Seq("--min-quality=0.5", "--shards", "2", "in", "out"))
    assert(ok == Right(Curate.Config("in", "out", None, 0.5, 90, 5, 2)))
  }
}
