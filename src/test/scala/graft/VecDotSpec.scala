package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VecDot
import graft.ops.Similarity

class VecDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vec_dot equals the higher-order-function form bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-1.5f, 2.5f, 0.125f))
    ).toDF("a", "b")
    // COMMUTED multiply (y * x): bit-identical values (IEEE multiply
    // commutes), but outside VecDotRewrite's exact-pattern guard — so
    // this compares the kernel against a REAL fold evaluation rather
    // than against its own rewrite
    def toD(c: org.apache.spark.sql.Column) = c.cast("array<double>")
    val hof = aggregate(zip_with(toD(col("a")), toD(col("b")),
      (x, y) => y * x), lit(0.0), (acc, x) => acc + x)
    val rows = df.select(
      VecDot.vecDot(spark, col("a"), col("b")).as("fused"),
      hof.as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_dot accepts double arrays and mixed types") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3f, 4f))).toDF("a", "b")
    val v = df.select(VecDot.vecDot(spark, col("a"), col("b")))
      .head().getDouble(0)
    assert(v == 11.0)
  }

  test("vec_dot rejects non-numeric-array inputs at analysis") {
    import spark.implicits._
    VecDot.register(spark)
    val df = Seq(("x", 1)).toDF("s", "i")
    val e = intercept[Exception](df.selectExpr("vec_dot(s, i)").collect())
    assert(e.getMessage.toLowerCase.contains("vec_dot"))
  }

  test("vec_dot is callable from SQL") {
    VecDot.register(spark)
    val v = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(10.0D, 20.0D)) AS d")
      .head().getDouble(0)
    assert(v == 50.0)
  }

  test("vec_dot participates in whole-stage codegen over a real scan") {
    // a local relation constant-folds before execution; a parquet scan
    // exercises the doGenCode path
    val emb = graft.sources.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.select(
      VecDot.vecDot(spark, col("embedding"), col("embedding")).as("d"))
    // the "*(n)" stage prefix marks WholeStageCodegen spans
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(400))
    assert(plan.contains("vecdot"), plan.take(600))
    // sanity: ||v||^2 > 0 for every fixture vector
    assert(q.collect().forall(_.getDouble(0) > 0))
  }

  test("null array yields null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Array(1f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(VecDot.vecDot(spark, col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("vec_dist2 equals the higher-order fold exactly and stays codegen'd") {
    import spark.implicits._
    import graft.functions.VecDist2
    // range-rooted (not a local literal Seq) so the projection is a
    // real codegen stage rather than a constant-folded LocalTableScan
    val df = spark.range(100).select(
      array(col("id"), col("id") * 3 - 7, -col("id")).as("a"),
      array(col("id") % 11, lit(5L), col("id") * 2).as("b"))
    val q = df.select(
      VecDist2.vecDist2(spark, col("a"), col("b")).as("fused"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)
        .as("hof"))
    q.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(400))
  }

  test("vec_dist2 rejects non-long-array inputs at analysis") {
    import spark.implicits._
    graft.functions.VecDist2.register(spark)
    val df = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
    val e = intercept[Exception](
      df.selectExpr("vec_dist2(a, b)").collect())
    assert(e.getMessage.toLowerCase.contains("vec_dist2"))
  }

  test("vec_dot_l equals the higher-order fold exactly and stays codegen'd") {
    import graft.functions.VecDotL
    // range-rooted so the projection is a real codegen stage
    val df = spark.range(100).select(
      array(col("id"), col("id") * 3 - 7, -col("id")).as("a"),
      array(col("id") % 11, lit(5L), col("id") * 2).as("b"))
    val q = df.select(
      VecDotL.vecDotL(spark, col("a"), col("b")).as("fused"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("hof"))
    q.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(400))
  }

  test("vec_dot_l: length mismatch and null elements yield NULL, " +
      "in both codegen and interpreted eval") {
    graft.functions.VecDotL.register(spark)
    // codegen path (range-rooted projection)
    val mism = spark.range(1).select(
      expr("vec_dot_l(array(id, 1L), array(id))").as("d"))
    assert(mism.head().isNullAt(0))
    val withNull = spark.range(1).select(
      expr("vec_dot_l(array(id, CAST(NULL AS BIGINT)), array(1L, 2L))")
        .as("d"))
    assert(withNull.head().isNullAt(0))
    // interpreted path: inside a higher-order lambda, doGenCode is not
    // used — nullSafeEval must agree
    val lam = spark.range(1).select(expr(
      """transform(array(array(1L, 2L), array(3L)),
           v -> vec_dot_l(v, array(10L, 100L)))""").as("ds"))
      .head().getSeq[Any](0)
    assert(lam == Seq(210L, null))
  }

  test("vec_dot_l rejects non-long-array inputs at analysis") {
    import spark.implicits._
    graft.functions.VecDotL.register(spark)
    val df = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
    val e = intercept[Exception](
      df.selectExpr("vec_dot_l(a, b)").collect())
    assert(e.getMessage.toLowerCase.contains("vec_dot_l"))
  }
}
