package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CountMinAgg

/** Count-Min contract: never under-counts, exact when collision-free,
  * estimate() mirrors the update hash family, and grids are mergeable
  * (partition layout cannot change the sketch).
  */
class CountMinAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = 4
  private val w = 64

  private val items =
    Seq.fill(30)("alpha") ++ Seq.fill(12)("beta") ++ Seq.fill(5)("gamma") ++
      Seq("delta")

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.agg(CountMinAgg.countMinAgg(spark, col("item"), d, w).as("sk"))
      .head().getAs[scala.collection.Seq[Long]]("sk").toSeq

  test("estimates never under-count and are exact without collisions") {
    val df = items.toDF("item")
    val sk = df.agg(CountMinAgg.countMinAgg(spark, col("item"), d, w)
      .as("sk"))
    val est = df.distinct()
      .crossJoin(broadcast(sk))
      .select(col("item"), CountMinAgg.estimate(col("sk"),
        col("item"), d, w).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size }
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k under-counted: ${est(k)} < $n")
      // 4 distinct items across 4 rows of 64 slots: collisions in ALL
      // rows simultaneously are effectively impossible
      assert(est(k) == n, s"$k: ${est(k)} != $n")
    }
    // total mass conservation per row: each row's counters sum to N
    val grid = sk.head().getAs[scala.collection.Seq[Long]]("sk")
    (0 until d).foreach { i =>
      assert(grid.slice(i * w, (i + 1) * w).sum == items.length)
    }
  }

  test("sketch is partition-layout invariant and merges by addition") {
    val one = sketchOf(items.toDF("item").coalesce(1))
    val many = sketchOf(items.toDF("item").repartition(7))
    assert(one == many)
    // explicit split-merge: sketches of two halves sum to the whole
    val (l, r) = items.splitAt(17)
    val summed = sketchOf(l.toDF("item")).zip(sketchOf(r.toDF("item")))
      .map { case (a, b) => a + b }
    assert(summed == one)
  }

  test("q44 entry: overcount column is all >= 0 and zero here") {
    val e = graft.queries.Analytics.entries.find(_.name == "q44_cms_freq").get
    val rows = e.run(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      assert(row.getAs[Long]("overcount") >= 0L)
      assert(row.getAs[Long]("overcount") == 0L) // 5 keys, 4x256 grid
    }
  }
}
