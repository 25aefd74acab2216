package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate sketch aggregates — the 100 TB substitutes for exact
  * distinct counts and percentiles. Engine-specific (HLL++ / KLL), so
  * they live outside the cross-engine hash gate; here they are held to
  * published error bounds against the exact answers. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("approx_count_distinct within 5% of exact on order keys") {
    val o = Tables.load(spark, dir, "orders")
    val exact = o.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = o.select(approx_count_distinct(col("o_custkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the exact median") {
    val li = Tables.load(spark, dir, "lineitem")
    val exact = li.select(percentile(col("l_extendedprice"), lit(0.5)))
      .head().getDouble(0)
    val approx = li.select(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    // KLL with accuracy 1000 on ~6k rows: within half a percentile step
    val p45 = li.select(percentile(col("l_extendedprice"), lit(0.45)))
      .head().getDouble(0)
    val p55 = li.select(percentile(col("l_extendedprice"), lit(0.55)))
      .head().getDouble(0)
    assert(approx >= p45 && approx <= p55, s"approx=$approx exact=$exact")
  }

  test("HLL sketches merge across partitions like the 2-phase agg") {
    val o = Tables.load(spark, dir, "orders")
    val whole = o.select(approx_count_distinct(col("o_custkey")))
      .head().getLong(0)
    val repartitioned = o.repartition(16)
      .select(approx_count_distinct(col("o_custkey"))).head().getLong(0)
    // partial sketches merge deterministically: partitioning must not
    // change the estimate
    assert(whole == repartitioned)
  }
}
