package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.LongSetCountExpr

class LongSetCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("equals size(array_intersect(arr, keys)) on distinct inputs, " +
      "over a real codegen stage") {
    val keys = Seq(3L, 7L, 11L, 100L, -5L)
    // range-rooted, per-row DISTINCT arrays (three distinct formulas)
    val df = spark.range(200).select(
      array(col("id"), col("id") * 2 + 1001, -col("id") - 1).as("a"))
    val q = df.select(
      LongSetCountExpr.longSetCount(spark, col("a"), keys).as("fused"),
      size(array_intersect(col("a"), typedLit(keys))).cast("long")
        .as("hof"))
    q.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(400))
    assert(plan.toLowerCase.contains("longsetcount"), plan.take(600))
  }

  test("null array yields NULL; null elements count as non-members; " +
      "duplicates count occurrences") {
    import spark.implicits._
    LongSetCountExpr.register(spark)
    val df = Seq(
      (1L, Some(Seq[Option[Long]](Some(3L), None, Some(3L), Some(9L)))),
      (2L, None: Option[Seq[Option[Long]]]))
      .toDF("id", "a")
    val out = df.select(col("id"),
      expr("long_set_count(a, array(3L, 7L))").as("n")).orderBy("id")
      .collect()
    assert(out(0).getLong(1) == 2L) // both 3s count, null and 9 don't
    assert(out(1).isNullAt(1))
  }

  test("SQL-callable; rejects non-foldable keys and wrong types") {
    LongSetCountExpr.register(spark)
    val n = spark.sql(
      "SELECT long_set_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS n")
      .head().getLong(0)
    assert(n == 2L)
    import spark.implicits._
    val df = Seq((Seq(1L), Seq(2L))).toDF("a", "b")
    val e = intercept[Exception](
      df.selectExpr("long_set_count(a, b)").collect())
    assert(e.getMessage.toLowerCase.contains("long_set_count"))
    // a NULL keys literal is resolved+foldable+type-correct — must
    // raise the clean message, not an NPE (same guard in kmeans_assign)
    val eNull = intercept[Exception](spark.sql(
      "SELECT long_set_count(array(1L), CAST(NULL AS ARRAY<BIGINT>))")
      .collect())
    assert(eNull.getMessage.toLowerCase.contains("long_set_count"),
      eNull.getMessage)
    val eNullK = intercept[Exception](spark.sql(
      "SELECT kmeans_assign(array(1L)," +
        " CAST(NULL AS ARRAY<ARRAY<BIGINT>>))").collect())
    assert(eNullK.getMessage.toLowerCase.contains("kmeans_assign"),
      eNullK.getMessage)
  }
}
