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

  test("saltedJoin stays exact on byte-identical hot rows (deterministic " +
      "content-hash salt; see Skew object doc for the duplicate caveat)") {
    import spark.implicits._
    // 500 identical rows on one hot key: the deterministic content-hash
    // salt puts them all on one (key, salt) reducer — no spread, but the
    // row set stays exact and any stage retry recomputes identical salts
    // (the round-robin predecessor could lose/duplicate rows on a
    // shuffle-fetch retry — round-14 review find)
    val left = Seq.fill(500)((1L, "dup")).toDF("k", "v")
    val right = Seq((1L, "r1"), (2L, "r2")).toDF("rk", "rv")
    val got = Skew.saltedJoin(left, right, "k", "rk", 4, minLeftBytes = 0L)
      .groupBy("rv").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("r1", 500L)))
  }

  test("saltedJoin saltBy spreads identical-content hot rows across " +
      "salts deterministically") {
    import spark.implicits._
    // the pre-dedup corpus shape: same payload, unique id — saltBy(id)
    // gives a perfect deterministic spread where content hashing cannot
    val left = (0L until 512L).map(i => (i, 1L, "dup")).toDF("id", "k", "v")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col("id")), lit(4L)))
    val perSalt = salted.groupBy("__salt").count()
      .collect().map(_.getLong(1))
    assert(perSalt.length == 4 && perSalt.forall(_ > 64),
      perSalt.mkString(","))
    val right = Seq((1L, "r1"), (2L, "r2")).toDF("rk", "rv")
    val got = Skew.saltedJoin(left, right, "k", "rk", 4,
        minLeftBytes = 0L, saltBy = Some(col("id")))
      .groupBy("rv").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("r1", 512L)))
  }

  test("saltedJoin content-hash salt tolerates map-typed columns " +
      "(they are excluded from the hash)") {
    import spark.implicits._
    // xxhash64 rejects MapType; the default salt must skip map columns
    // instead of failing at plan time (round-14 review find)
    val left = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
      .withColumn("m", map(col("v"), col("v")))
    val right = Seq((1L, "r1")).toDF("rk", "rv")
    val got = Skew.saltedJoin(left, right, "k", "rk", 4,
      minLeftBytes = 0L)
    assert(got.count() == 2)
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
