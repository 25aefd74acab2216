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

  test("q70_skew_report matches an exact-integer Scala brute force") {
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").collect().map(_.getLong(0))
    val cnts = users.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nRows = users.length.toLong
    val nKeys = cnts.size.toLong
    val maxCnt = cnts.values.max
    val expected = cnts.toSeq.sortBy { case (u, c) => (-c, u) }.take(5)
      .map { case (u, c) =>
        (u, c, 1000000L * c / nRows, nRows, nKeys,
          1000000L * maxCnt * nKeys / nRows)
      }
    val got = run("q70_skew_report").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("q71_chi2 matches an exact-integer Scala brute force over the " +
    "full grid incl. zero cells") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cont = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val srcs = rows.map(_._1).distinct
    val langs = rows.map(_._2).distinct
    val rTot = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cTot = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val chi2e4 = (for (sr <- srcs; lg <- langs) yield {
      val o = cont.getOrElse((sr, lg), 0L)
      val d = o * n - rTot(sr) * cTot(lg)
      10000L * d * d / (rTot(sr) * cTot(lg) * n)
    }).sum
    val r = run("q71_chi2").head()
    assert(r.getLong(0) == chi2e4)
    assert(r.getLong(1) == (srcs.length - 1).toLong * (langs.length - 1))
    assert(r.getLong(2) == n)
  }

  test("q72_profile matches per-column Scala aggregates") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
    val rows = df.collect()
    val names = df.columns
    val got = run("q72_profile").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.getString(4)), Option(r.getString(5)))))
      .toMap
    assert(got.keySet == names.toSet)
    names.foreach { c =>
      val i = df.columns.indexOf(c)
      val vals = rows.map(_.get(i)).filter(_ != null)
      val (n, nn, nd, mn, mx) = got(c)
      assert(n == rows.length.toLong, c)
      assert(nn == (rows.length - vals.length).toLong, c)
      assert(nd == vals.distinct.length.toLong, c)
      if (c == "o_totalprice") { assert(mn.isEmpty && mx.isEmpty) }
      else {
        // native-type min/max, stringified in the engines' shared cast
        // format (timestamps print "yyyy-MM-dd HH:mm:ss", not ISO-T)
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss")
        val (emn, emx) = rows.head.get(i) match {
          case _: java.lang.Long =>
            val ls = vals.map(_.asInstanceOf[Long])
            (ls.min.toString, ls.max.toString)
          case _: java.time.LocalDateTime =>
            // fixed-width format: lexicographic order = temporal order
            val ts = vals.map(_.asInstanceOf[java.time.LocalDateTime]
              .format(fmt))
            (ts.min, ts.max)
          case _ =>
            val ss = vals.map(_.toString)
            (ss.min, ss.max)
        }
        assert(mn.contains(emn), s"$c min: $mn vs $emn")
        assert(mx.contains(emx), s"$c max: $mx vs $emx")
      }
    }
  }
}
