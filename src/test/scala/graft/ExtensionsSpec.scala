package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** GraftExtensions end-to-end: a session built with the extensions resolves
  * the custom codegen expressions by SQL name; IntDotProduct agrees with the
  * interpreted HOF reference it replaced.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("extensions session resolves graft_* SQL functions") {
    // getOrCreate returns the existing default session without applying
    // extensions, so clear (and afterwards restore) the singletons; the new
    // session shares the SparkContext — do NOT stop it
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = s2.sql(
        """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                  graft_int_dot(array(2L, -3L), array(5L, 7L)) AS i,
                  graft_int_l2sq(array(2L, -3L), array(5L, 7L)) AS l2,
                  graft_hex_signed64('ffffffffffffffff') AS h,
                  graft_nfc('cafe\u0301') AS n,
                  graft_cdc_cuts('abcabcabc', 3, 2) AS cdc""").head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getLong(1) == -11L)
      assert(row.getLong(2) == 109L) // 9 + 100
      assert(row.getLong(3) == -1L)
      assert(row.getString(4) == "caf\u00e9", "NFC must compose e + combining acute")
      assert(row.getSeq[Int](5).forall(e => e >= 3 && e <= 9),
        "cdc cuts must be window-end positions inside the string")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }

  test("IntDotProduct equals the interpreted HOF reference") {
    val vecs = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-127L, 127L), Seq(127L, 127L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(0L, 0L, 0L), Seq(1L, 2L, 3L)))
    val df = vecs.toDF("a", "b")
    val got = df.select(
      graft.functions.VectorFunctions.intDotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("hof"))
      .as[(Long, Long)].collect()
    got.foreach { case (native, hof) => assert(native == hof) }
  }

  test("dot products propagate NULL elements like the HOF reference") {
    // aggregate(zip_with(...)) folds NULL through the sum → NULL result;
    // the codegen expressions must match, not read garbage
    val df = Seq(
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)))
      .toDF("a", "b")
    val got = df.select(
      graft.functions.VectorFunctions.intDotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("hof"))
      .collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(got(1).getLong(0) == 11L && got(1).getLong(1) == 11L)

    val dbl = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](2.0, 3.0)))
      .toDF("a", "b")
    val gotD = dbl.select(
      graft.functions.VectorFunctions.dotProduct(col("a"), col("b")).as("native"))
      .collect()
    assert(gotD(0).isNullAt(0))
    assert(gotD(1).getDouble(0) == 8.0)
  }

  test("IntDotProduct rejects ragged inputs instead of truncating") {
    val df = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.VectorFunctions.intDotProduct(col("a"), col("b"))).head()
    }
    assert(e.getMessage != null)
  }

  test("IntL2Squared equals the interpreted HOF reference and handles NULLs/ragged") {
    val vecs = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 6L, 8L)),    // 9+16+25 = 50
      (Seq(-5L, 7L), Seq(5L, -7L)),          // 100+196 = 296
      (Seq.empty[Long], Seq.empty[Long]),    // 0
      (Seq(3L), Seq(3L)))                    // 0
    val df = vecs.toDF("a", "b")
    val got = df.select(
      graft.functions.VectorFunctions.intL2Squared(col("a"), col("b"))).as[Long].collect()
    val hof = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"))
      .as[Long].collect()
    assert(got.toSeq == Seq(50L, 296L, 0L, 0L) && got.toSeq == hof.toSeq, got.toSeq)
    // NULL element → NULL result, matching the HOF fold
    val withNull = Seq((Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.intL2Squared(col("a"), col("b")))
    assert(withNull.head().isNullAt(0))
    // ragged inputs must throw, not truncate
    val ragged = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
    val e = intercept[Exception] {
      ragged.select(graft.functions.VectorFunctions.intL2Squared(col("a"), col("b"))).head()
    }
    assert(e.getMessage != null)
  }
}
