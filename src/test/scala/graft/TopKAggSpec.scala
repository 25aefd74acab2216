package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TopKAgg
import graft.sources.Tables

class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("heap aggregate equals the window top-k on the fixture") {
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaAgg = orders
      .groupBy("o_custkey")
      .agg(TopKAgg.topkAgg(spark, col("o_totalprice"), col("o_orderkey"), 3)
        .as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), col("col.id").as("o_orderkey"),
        (col("pos") + 1).cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("merge across partitions is repartition-invariant") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i % 17L, i * 0.37 % 100, i.toLong))
      .toDF("g", "score", "id")
    def run(d: org.apache.spark.sql.DataFrame) = d.groupBy("g")
      .agg(TopKAgg.topkAgg(spark, col("score"), col("id"), 5).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1)))).toMap
    assert(run(df) == run(df.repartition(13)))
  }

  test("NaN scores follow Spark's total order (NaN greatest) and keep " +
      "the result arrival-order independent") {
    // regression: IEEE > / == are both false against NaN, so the heap
    // rejected a NaN against any buffer AND any real score against a
    // buffered NaN — output depended on partition/merge order and
    // diverged from the row_number-over-desc window form (NaN first)
    import spark.implicits._
    val rows = Seq((1L, 5.0, 10L), (1L, Double.NaN, 20L), (1L, 7.0, 30L))
    def run(data: Seq[(Long, Double, Long)], parts: Int) =
      data.toDF("g", "score", "id").repartition(parts).groupBy("g")
        .agg(TopKAgg.topkAgg(spark, col("score"), col("id"), 2).as("t"))
        .select(explode(col("t"))).select("col.id")
        .collect().map(_.getLong(0)).toSeq
    // NaN ranks first (Spark total order), then 7.0 — for every
    // arrival order and partitioning
    for (perm <- rows.permutations; p <- Seq(1, 3))
      assert(run(perm, p) == Seq(20L, 30L),
        s"order-dependent top-k for $perm at $p partitions")
    // parity with the window form on the same data
    val w = Window.partitionBy("g").orderBy(desc("score"), asc("id"))
    val viaWindow = rows.toDF("g", "score", "id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .orderBy("rn").select("id").collect().map(_.getLong(0)).toSeq
    assert(viaWindow == Seq(20L, 30L), s"window form read $viaWindow")
  }

  test("score ties break toward the smaller id") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 30L), (1L, 5.0, 10L), (1L, 5.0, 20L))
      .toDF("g", "score", "id")
    val top = df.groupBy("g")
      .agg(TopKAgg.topkAgg(spark, col("score"), col("id"), 2).as("t"))
      .select(explode(col("t"))).select("col.id")
      .collect().map(_.getLong(0))
    assert(top.sameElements(Array(10L, 20L)))
  }

  test("heap aggregate equals sort-take-k on random groups with ties") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // few distinct scores force dense ties; duplicate ids (and exact
    // duplicate (score, id) pairs) occur — the heap must reproduce the
    // reference sort-by-(score desc, id asc)-take-k on all of them
    val rowGen = for {
      g <- Gen.chooseNum(1L, 3L)
      sc <- Gen.oneOf(1.0, 2.0, 3.0)
      id <- Gen.chooseNum(0L, 20L)
    } yield (g, sc, id)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(8).withWorkers(1)
    val r = SCTest.check(params, Prop.forAll(Gen.nonEmptyListOf(rowGen)) {
      rows =>
        val want = rows.groupBy(_._1).map { case (g, rs) =>
          g -> rs.map(t => (t._2, t._3)).sortBy(t => (-t._1, t._2)).take(3)
        }
        val got = rows.toDF("g", "score", "id").repartition(5)
          .groupBy("g")
          .agg(TopKAgg.topkAgg(spark, col("score"), col("id"), 3).as("t"))
          .collect().map(r => r.getLong(0) ->
            r.getSeq[org.apache.spark.sql.Row](1)
              .map(x => (x.getDouble(0), x.getLong(1))).toList).toMap
        got == want
    })
    assert(r.passed, r.status.toString)
  }

  test("aggregate plan has partial aggregation before the shuffle") {
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    val plan = orders.groupBy("o_custkey")
      .agg(TopKAgg.topkAgg(spark, col("o_totalprice"), col("o_orderkey"), 3)
        .as("t"))
      .queryExecution.executedPlan.toString
    // two aggregate operators around the exchange = map-side partials
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2,
      plan.take(800))
  }
}
