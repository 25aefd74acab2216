package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.{Analytics, Registry}

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def run(name: String) =
    Registry.all.find(_.name == name).get.run(spark, sf)

  test("skyline edge cases: empty input, identical points, dominance") {
    import spark.implicits._
    // empty frontier
    assert(graft.ops.Skyline.frontier(
      Seq.empty[(Double, Long)].toDF("price", "size"),
      "price", "size").count() == 0)
    // duplicates collapse to one frontier point
    val dup = Seq((1.0, 5L), (1.0, 5L), (1.0, 5L)).toDF("price", "size")
    assert(graft.ops.Skyline.frontier(dup, "price", "size")
      .collect().toSeq.map(r => (r.getDouble(0), r.getLong(1)))
      == Seq((1.0, 5L)))
    // same price, larger size dominates; cheaper-equal-size dominates
    val pts = Seq((1.0, 5L), (1.0, 7L), (2.0, 7L), (2.0, 9L))
      .toDF("price", "size")
    val got = graft.ops.Skyline.frontier(pts, "price", "size")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(got == Set((1.0, 7L), (2.0, 9L)))
  }

  test("q54 fuzzy blocks never cross brands and count exact subset") {
    val rows = run("q54_fuzzy_match").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2)) // n_fuzzy >= n_exact
    }
  }

  test("q10b ntile is within [1,4] and pct_rank/cdist within [0,1]") {
    val rows = run("q10b_window_fns").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tile = r.getLong(2)
      assert(tile >= 1 && tile <= 4)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q29 grouping sets emits exactly the three declared sets") {
    val rows = run("q29_grouping_sets").collect()
    val byShape = rows.groupBy(r => (r.isNullAt(0), r.isNullAt(1)))
    // (r_name,n_name) detail rows, (n_name)-only rows, one grand total
    assert(byShape((true, true)).length == 1)
    assert(byShape((true, false)).nonEmpty)  // n_name set
    assert(byShape((false, false)).nonEmpty) // full detail
    assert(!byShape.contains((false, true))) // (r_name) alone not declared
    val grand = byShape((true, true)).head.getLong(2)
    assert(grand == byShape((false, false)).map(_.getLong(2)).sum)
  }

  test("q30 unpivot emits two metric rows per part") {
    val parts = spark.read.parquet(s"$sf/part.parquet").count()
    val out = run("q30_unpivot")
    assert(out.count() == 2 * parts)
    assert(out.select("metric").distinct().count() == 2)
  }

  test("w1 partitioned sink read-back prunes partitions on l_returnflag") {
    val plan = run("w1_partitioned_sink").queryExecution.executedPlan.toString
    // the filter must land in the scan's partition filters, not a
    // post-scan Filter over all partitions
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"), plan.take(2000))
  }

  test("s1 csv roundtrip re-infers integer schema from csv text") {
    val tmp = s"/tmp/graft_spec/s1_csv"
    spark.read.parquet(s"$sf/nation.parquet").write.mode("overwrite")
      .option("header", "true").csv(tmp)
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(tmp).schema
    assert(inferred("n_nationkey").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("x6 sampling is deterministic and rate-stratified by lang") {
    val a = run("x6_sample").collect().map(r => r.getString(0) -> r.getLong(1))
    val b = run("x6_sample").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(a.sameElements(b))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = a.toMap.map { case (l, n) => l -> n.toDouble / docs(l) }
    // en sampled at ~1/2, everything else at ~1/4 (loose bounds — the
    // fixture slices are small)
    assert(rates("en") > 0.3)
  }

  test("q35's bucketed tables join with zero shuffle exchange") {
    run("q35_bucketed_join").collect() // creates the bucketed tables
    val (liTable, oTable, _) = Analytics.q35Tables(spark, sf)
    // the fixture dims are small enough to broadcast, which would hide
    // the bucketing: force the sort-merge path the join takes at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bare = spark.table(liTable)
        .join(spark.table(oTable),
          col("l_orderkey") === col("o_orderkey"))
      assert(graft.ops.Bucketing.isExchangeFree(bare),
        bare.queryExecution.executedPlan.toString.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("covar_samp/covar_pop equal the q17e co-moment formulas") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = li.agg(
      count(lit(1)).as("n"),
      sum(col("l_quantity") * col("l_extendedprice")).as("sxy"),
      sum("l_quantity").as("sx"),
      sum("l_extendedprice").as("sy"),
      covar_samp("l_quantity", "l_extendedprice").as("cs"),
      covar_pop("l_quantity", "l_extendedprice").as("cp")).head()
    val (n, sxy, sx, sy) =
      (r.getLong(0).toDouble, r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(math.abs(r.getDouble(4) - (sxy - sx * sy / n) / (n - 1))
      / math.abs(r.getDouble(4)) < 1e-9)
    assert(math.abs(r.getDouble(5) - (sxy / n - (sx / n) * (sy / n)))
      / math.abs(r.getDouble(5)) < 1e-9)
  }

  test("t_tfidf ranks by rounded score with term tiebreak") {
    val rows = run("t_tfidf").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val scores = sorted.map(_.getDouble(5))
      assert(scores.sameElements(scores.sortBy(-(_: Double))))
      assert(sorted.length <= 3)
    }
  }

  test("q67_scd2 matches a per-customer Scala run fold") {
    // brute force: sort each customer's orders by (date, key), collapse
    // consecutive equal priorities into runs, chain valid_to
    val raw = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(o_orderdate AS STRING) AS d", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val expected = raw.groupBy(_._1).flatMap { case (cust, rows) =>
      // ISO timestamp strings are fixed-width: lexicographic = temporal
      val sorted = rows.sortBy(t => (t._3, t._2))
      val runs = sorted.foldLeft(
        Vector.empty[(String, String, Long)]) { case (acc, o) =>
        if (acc.nonEmpty && acc.last._1 == o._4)
          acc.init :+ ((acc.last._1, acc.last._2, acc.last._3 + 1))
        else acc :+ ((o._4, o._3, 1L))
      }
      runs.zipWithIndex.map { case ((pri, from, n), i) =>
        val to = if (i + 1 < runs.length) runs(i + 1)._2 else "NULL"
        (cust, (i + 1).toLong, pri, from, to, n)
      }
    }.toSet
    val got = run("q67_scd2")
      .selectExpr("o_custkey", "run_id", "priority",
        "CAST(valid_from AS STRING) AS vf", "CAST(valid_to AS STRING) AS vt",
        "n_orders")
      .collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        Option(r.getString(4)).getOrElse("NULL"), r.getLong(5))
    }.toSet
    assert(got == expected)
    // runs tile the history: per-customer n_orders sums to order count
    val perCust =
      got.groupBy(_._1).view.mapValues(_.toSeq.map(_._6).sum).toMap
    val cnts = raw.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(perCust == cnts)
  }

  test("x31_mad_outliers matches a Scala median/MAD brute force") {
    def interp(sorted: Array[Double]): Double = {
      val pos = 0.5 * (sorted.length - 1)
      val lo = pos.toInt
      if (lo == pos) sorted(lo)
      else sorted(lo) + (sorted(lo + 1) - sorted(lo)) * (pos - lo)
    }
    val raw = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = raw.groupBy(_._2).flatMap { case (_, rows) =>
      val med = interp(rows.map(_._3).sorted)
      val mad = interp(rows.map(t => math.abs(t._3 - med)).sorted)
      if (mad > 0) rows.toSeq.filter(t => math.abs(t._3 - med) > 3 * mad)
        .map(t => t._1 -> (med, mad))
      else Seq.empty[(Long, (Double, Double))]
    }.toMap
    val got = run("x31_mad_outliers").collect()
      .map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (m, d)) =>
      assert(math.abs(m - expected(id)._1) < 1e-9)
      assert(math.abs(d - expected(id)._2) < 1e-9)
    }
  }
}
