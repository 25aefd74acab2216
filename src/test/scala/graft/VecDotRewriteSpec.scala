package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** [[graft.plans.VecDotRewrite]]: the idiomatic
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)`
  * dot product must fuse into the codegen'd vec_dot kernel — and ONLY
  * that exact pattern. */
class VecDotRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toD(c: Column) = c.cast("array<double>")
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(toD(a), toD(b), (x, y) => x * y), lit(0.0),
      (acc, x) => acc + x)

  test("the HOF dot product rewrites to vec_dot over a real scan") {
    val emb = graft.sources.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.select(hofDot(col("embedding"), col("embedding")).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("vecdot"), plan.take(600))
    assert(!plan.contains("aggregate(zip_with"), plan.take(600))
  }

  test("rewritten plan and commuted (unrewritten) fold agree bit-for-bit") {
    val emb = graft.sources.Tables.load(spark, TestSpark.sf0001, "embeddings")
    // y * x commutes bit-exactly in IEEE but misses the rewrite guard
    val unrewritten = aggregate(zip_with(toD(col("embedding")),
      toD(col("embedding")), (x, y) => y * x), lit(0.0), (acc, x) => acc + x)
    val rows = emb.select(hofDot(col("embedding"), col("embedding")).as("a"),
      unrewritten.as("b")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null element and length mismatch yield NULL through the rewrite") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(2.0), Some(3.0))),
      (2L, Seq[Option[Double]](Some(1.0)), Seq[Option[Double]](Some(2.0), Some(3.0))),
      (3L, Seq[Option[Double]](Some(2.0), Some(4.0)), Seq[Option[Double]](Some(3.0), Some(5.0))))
      .toDF("id", "a", "b")
    val out = df.select(col("id"), hofDot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1)) // null element
    assert(out(1).isNullAt(1)) // length mismatch
    assert(out(2).getDouble(1) == 26.0)
  }

  test("near-miss patterns are left alone") {
    val emb = graft.sources.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val wrongZero = aggregate(zip_with(toD(col("embedding")),
      toD(col("embedding")), (x, y) => x * y), lit(1.0), (acc, x) => acc + x)
    val wrongLambda = aggregate(zip_with(toD(col("embedding")),
      toD(col("embedding")), (x, y) => x + y), lit(0.0), (acc, x) => acc + x)
    // -0.0 seed: Scala numeric == calls it equal to 0.0, but an empty
    // array folds to the SEED itself, so rewriting would flip its sign
    // bit — the raw-bits guard must reject it
    val negZero = aggregate(zip_with(toD(col("embedding")),
      toD(col("embedding")), (x, y) => x * y), lit(-0.0), (acc, x) => acc + x)
    for (c <- Seq(wrongZero, wrongLambda, negZero)) {
      val plan = emb.select(c.as("d")).queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("vecdot"), plan.take(600))
    }
  }

  test("Similarity.dot (the library's generic HOF helper) gets the kernel") {
    val emb = graft.sources.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val plan = emb.select(Similarity.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("vecdot"), plan.take(600))
  }

  test("the LEGACY long fold rewrites to vec_dot_l and agrees " +
      "bit-for-bit, overflow wrap included") {
    // eval mode is baked into Multiply/Add at EXPRESSION CREATION from
    // the active conf — scope ANSI off around the fold construction so
    // the lambda arithmetic is LEGACY (wrapping), the one mode the
    // rewrite is allowed to fuse
    val before = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = spark.range(100).select(
        array(col("id") * 7 - 3, -col("id"), lit(Long.MaxValue)).as("a"),
        array(col("id") % 13, col("id") + 1, lit(2L)).as("b"))
      val fused = df.select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("d"))
      val plan = fused.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("vecdotl"), plan.take(600))
      // reference: COMMUTED multiply (y * x) misses the rewrite guard,
      // so it stays a real HOF fold — LEGACY long arithmetic wraps on
      // overflow (MaxValue * 2 = -2), and VecDotL must wrap identically
      val hof = df.select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => y * x), lit(0L), (acc, x) => acc + x).as("d"))
      val hofPlan = hof.queryExecution.executedPlan.toString
      assert(!hofPlan.toLowerCase.contains("vecdotl"), hofPlan.take(600))
      val f = fused.collect().map(_.getLong(0))
      val h = hof.collect().map(_.getLong(0))
      assert(f.sameElements(h))
    } finally spark.conf.set("spark.sql.ansi.enabled", before)
  }

  test("the LEGACY squared-L2 fold rewrites to vec_dist2 and agrees " +
      "bit-for-bit") {
    val before = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = spark.range(100).select(
        array(col("id") * 5 - 2, -col("id")).as("a"),
        array(col("id") % 7, col("id") * 3).as("b"))
      val fused = df.select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
        .as("d"))
      val plan = fused.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("vecdist2"), plan.take(600))
      // commuted factors miss the guard -> a real fold to compare with
      val hof = df.select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => (y - x) * (y - x)), lit(0L), (acc, v) => acc + v)
        .as("d"))
      assert(!hof.queryExecution.executedPlan.toString.toLowerCase
        .contains("vecdist2"))
      // (x-y)^2 == (y-x)^2 exactly on integers
      assert(fused.collect().map(_.getLong(0))
        .sameElements(hof.collect().map(_.getLong(0))))
    } finally spark.conf.set("spark.sql.ansi.enabled", before)
  }

  test("ANSI and near-miss long folds are left alone") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L), Array(3L, 4L))).toDF("a", "b")
    // under the session's ANSI default the lambda Multiply/Add THROW on
    // overflow while VecDotL wraps — the rewrite must not fire
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val ansiFold = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val wrongSeed = {
      val before = spark.conf.get("spark.sql.ansi.enabled")
      spark.conf.set("spark.sql.ansi.enabled", "false")
      try aggregate(zip_with(col("a"), col("b"),
        (x, y) => x * y), lit(1L), (acc, x) => acc + x)
      finally spark.conf.set("spark.sql.ansi.enabled", before)
    }
    for (c <- Seq(ansiFold, wrongSeed)) {
      val plan = df.select(c.as("d")).queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("vecdotl"), plan.take(600))
    }
  }
}
