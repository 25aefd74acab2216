package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Bucketing, Skew}
import graft.sources.Tables

/** Scale patterns: salting preserves semantics while splitting hot keys;
  * bucketing removes the join shuffle entirely. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("saltedJoin returns exactly the plain join's rows") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin stays exact on byte-identical hot rows (the salt " +
      "is round-robin, not a row-content hash)") {
    import spark.implicits._
    // 500 identical rows on one hot key: a full-row-hash salt put all
    // of them on ONE (key, salt) reducer — zero skew relief (review
    // find); round-robin spreads them while the row set stays exact
    val left = Seq.fill(500)((1L, "dup")).toDF("k", "v")
    val right = Seq((1L, "r1"), (2L, "r2")).toDF("rk", "rv")
    val got = Skew.saltedJoin(left, right, "k", "rk", 4, minLeftBytes = 0L)
      .groupBy("rv").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("r1", 500L)))
  }

  test("salted join key includes the salt in the join condition") {
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey")
    val o = Tables.load(spark, dir, "orders").select("o_orderkey")
    // minLeftBytes = 0 forces the salted form regardless of input size
    val plan = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", 4,
        minLeftBytes = 0L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), plan.take(800))
  }

  test("salted join size gate skips salting below the threshold") {
    // the fixture left side is far below the default 1 GiB gate — the
    // rewrite must plan the PLAIN equi-join (no salt column, no
    // replicated right side), the AQE-style skip
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey")
    val o = Tables.load(spark, dir, "orders").select("o_orderkey")
    val plan = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", 4)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("__salt"), plan.take(800))
  }

  test("saltedSumCount equals plain groupBy aggregation") {
    val events = Tables.load(spark, dir, "events")
    val plain = events.groupBy("event_type")
      .agg(round(sum("value"), 4).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(events, "event_type", "value", 8)
      .select(col("event_type"), round(col("sum_value"), 4).as("s"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("bucketed-by-key join plans with zero exchange") {
    val base = java.nio.file.Files.createTempDirectory("bucketed")
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_b", s"$base/li", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_b", s"$base/o", "o_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      assert(Bucketing.isExchangeFree(joined),
        joined.queryExecution.executedPlan.toString.take(1200))
      assert(joined.count() == li.count()) // every lineitem has its order
      // the same join on unbucketed parquet DOES shuffle both sides
      val unbucketed = li.join(o, col("l_orderkey") === col("o_orderkey"))
      assert(!Bucketing.isExchangeFree(unbucketed))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
