package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry
import graft.sources.Tables

/** Relational core: results on sf0.001 + the plan shapes that matter at
  * scale (broadcast for dims, pushdown + pruning reaching the scan). */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) =
    Registry.all.find(_.name == name).get.run(spark, dir)

  test("every registered query executes and is deterministic") {
    Registry.all.foreach { e =>
      val a = e.run(spark, dir).collect()
      val b = e.run(spark, dir).collect()
      assert(a.sameElements(b), s"${e.name} not deterministic")
    }
  }

  test("q01 projects only the selected columns from the scan") {
    val plan = run("q01_scan_project").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    // scan must not read the full 11-column lineitem schema
    assert(!plan.contains("l_extendedprice"), "scan reads unprojected column")
  }

  test("q02 pushes both predicates into the parquet scan") {
    // plan metadata strings truncate at spark.sql.maxMetadataStringLength
    // (default 100) — widen so every pushed filter is visible
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val plan = run("q02_filter").queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters"))
      assert(plan.contains("GreaterThanOrEqual(l_discount"), plan.take(500))
      assert(plan.contains("LessThan(l_quantity"), plan.take(1500))
    } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
  }

  test("q05 star join broadcasts both dimension tables") {
    val plan = run("q05_broadcast_join").queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(800))
  }

  test("q03 union is positional UNION ALL — counts add, nothing dedups") {
    val o = Tables.load(spark, dir, "orders")
    val n = o.count()
    val u = o.union(o)
    assert(u.count() == 2 * n)
  }

  test("q06 semi + anti partition the customers") {
    val semi = run("q06_semi_join").count()
    val anti = run("q06_anti_join").count()
    val total = Tables.load(spark, dir, "customer").count()
    assert(semi + anti == total)
  }

  test("q08 TPC-H Q1 shape: group count and additive totals") {
    val rows = run("q08_agg_tpch_q1").collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    val totalN = rows.map(_.getAs[Long]("n")).sum
    assert(totalN == Tables.load(spark, dir, "lineitem").count())
  }

  test("q09 rollup contains per-pair, per-region and grand-total rows") {
    val rows = run("q09_rollup").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val regions = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(regions.nonEmpty)
    val leaf = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.head.getAs[Long]("n_cust") ==
      leaf.map(_.getAs[Long]("n_cust")).sum)
  }

  test("q12 top-k emits at most 3 rows per customer, rank-ordered") {
    val rows = run("q12_topk_per_group").collect()
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(perCust.values.forall(_.length <= 3))
    perCust.values.foreach { rs =>
      val prices = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("price"))
      assert(prices.sameElements(prices.sortBy(-(_: Double))))
    }
  }

  test("q14 intersect/except are disjoint and within the O-side set") {
    val inter = run("q14_intersect").collect().map(_.getLong(0)).toSet
    val exc = run("q14_except").collect().map(_.getLong(0)).toSet
    assert(inter.intersect(exc).isEmpty)
    val oSide = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O").select("o_custkey")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(inter.union(exc) == oSide)
  }
}
