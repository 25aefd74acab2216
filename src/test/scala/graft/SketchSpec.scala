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

  test("q33 two-level hll union estimates within 3 rse of exact distinct") {
    val o = Tables.load(spark, dir, "orders")
    val exact = o.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.queries.Registry.all
      .find(_.name == "q33_hll_distinct").get.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    // portable raw-HLL estimator at m = 256 buckets: rse = 1.04/sqrt(m)
    // = 6.5%; 3x rse = 19.5% is the against-bad-luck bound (the
    // DataSketches builtin the estimator is pinned against above is
    // tighter only because it switches estimators at low fill)
    exact.foreach { case (p, n) =>
      assert(math.abs(approx(p) - n) / n < 3 * 1.04 / math.sqrt(256.0),
        s"$p: approx=${approx(p)} exact=$n")
    }
  }

  test("q34 approx quantiles land between the +/-5pp exact percentiles") {
    val li = Tables.load(spark, dir, "lineitem")
    val bounds = li.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.45)).as("lo50"),
        percentile(col("l_extendedprice"), lit(0.55)).as("hi50"),
        percentile(col("l_extendedprice"), lit(0.90)).as("lo95"),
        percentile(col("l_extendedprice"), lit(1.00)).as("hi95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    graft.queries.Registry.all
      .find(_.name == "q34_approx_quantile").get.run(spark, dir)
      .collect().foreach { r =>
        val (lo50, hi50, lo95, hi95) = bounds(r.getString(0))
        assert(r.getDouble(1) >= lo50 && r.getDouble(1) <= hi50)
        assert(r.getDouble(2) >= lo95 && r.getDouble(2) <= hi95)
      }
  }

  test("Misra-Gries is exact when capacity covers the universe, " +
    "under any partitioning") {
    import spark.implicits._
    val items = (1 to 500).map(i => s"t${i % 7}") // 7 distinct items
    val out = items.toDF("x").repartition(13)
      .agg(graft.functions.MisraGriesAgg.mgSummary(spark, col("x"), 16))
      .head().getSeq[org.apache.spark.sql.Row](0)
    val got = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = items.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(got == exact)
    // eval order is the documented (est desc, item asc) total order
    val keys = out.map(r => (-r.getLong(1), r.getString(0)))
    assert(keys == keys.sorted)
  }

  test("Misra-Gries guarantee under decrement pressure: " +
    "undercount-only, heavy hitters always kept") {
    import spark.implicits._
    // 2 heavy items + 40 singletons, capacity 3: decrements fire in
    // update (partition summaries overflow) AND the merge trim fires
    // (7 partials of up to 3 entries collapse to 3)
    val stream = Seq.fill(60)("A") ++ Seq.fill(35)("B") ++
      (1 to 40).map(i => s"z$i")
    val cap = 3
    val bound = stream.length.toDouble / (cap + 1)
    val out = stream.toDF("x").repartition(7)
      .agg(graft.functions.MisraGriesAgg.mgSummary(spark, col("x"), cap))
      .head().getSeq[org.apache.spark.sql.Row](0)
    val got = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = stream.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(out.length <= cap)
    got.foreach { case (k, est) =>
      assert(est <= exact(k), s"$k overcounted: $est > ${exact(k)}")
      assert(est >= exact(k) - bound,
        s"$k below the N/(k+1) floor: $est < ${exact(k)} - $bound")
    }
    // anything with true frequency > N/(cap+1) must survive
    exact.filter(_._2 > bound).keys
      .foreach(k => assert(got.contains(k), s"heavy hitter $k dropped"))
  }

  test("Misra-Gries GROUPED: per-group partial merges fire the trim, " +
    "per-group guarantee holds") {
    import spark.implicits._
    // two groups with DIFFERENT streams, each overflowing capacity 3 in
    // every partition so the groupBy's partial-merge path (not just
    // update) trims: group g1 = heavy A + singleton tail, group g2 =
    // heavy B/C + a different tail. 11 partitions ensure each group's
    // final summary merges ~11 capacity-sized partials.
    val g1 = (Seq.fill(50)("A") ++ (1 to 30).map(i => s"u$i")).map(("g1", _))
    val g2 = (Seq.fill(40)("B") ++ Seq.fill(25)("C") ++
      (1 to 30).map(i => s"v$i")).map(("g2", _))
    val cap = 3
    val out = (g1 ++ g2).toDF("g", "x").repartition(11)
      .groupBy("g")
      .agg(graft.functions.MisraGriesAgg.mgSummary(spark, col("x"), cap)
        .as("mg"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => p.getString(0) -> p.getLong(1)).toMap)
      .toMap
    val streams = Map("g1" -> g1.map(_._2), "g2" -> g2.map(_._2))
    streams.foreach { case (g, stream) =>
      val exact = stream.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val bound = stream.length.toDouble / (cap + 1)
      val got = out(g)
      assert(got.size <= cap)
      got.foreach { case (k, est) =>
        assert(est <= exact(k), s"$g/$k overcounted")
        assert(est >= exact(k) - bound, s"$g/$k below the floor")
      }
      exact.filter(_._2 > bound).keys.foreach(k =>
        assert(got.contains(k), s"$g heavy hitter $k dropped"))
    }
    // group isolation: g1's summary never contains g2's tail items
    assert(!out("g1").keys.exists(_.startsWith("v")))
    assert(!out("g2").keys.exists(_.startsWith("u")))
  }
}
