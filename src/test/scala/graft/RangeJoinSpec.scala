package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin
import graft.sources.Tables

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bandJoin matches rows strictly before ts within the band") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, t("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, t("2024-01-01 09:49:59"), 1.0), // outside 10-min band
      (1L, t("2024-01-01 09:50:00"), 2.0), // exactly band edge: included
      (1L, t("2024-01-01 09:59:00"), 3.0), // inside
      (1L, t("2024-01-01 10:00:00"), 4.0), // not strictly before: excluded
      (2L, t("2024-01-01 09:59:00"), 5.0)  // other key
    ).toDF("user_id", "ts", "value")
    val got = RangeJoin.bandJoin(left, right, "user_id", "ts", 600L,
      Seq("value")).select("r_value").collect().map(_.getDouble(0)).sorted
    assert(got.sameElements(Array(2.0, 3.0)))
  }

  test("bandJoin equals the naive inequality join on the fixture") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        col("value").as("cv"))
    val naive = errors.join(clicks,
        col("user_id") === col("cu") &&
          col("cts") >= col("ts") - expr("INTERVAL 600 SECONDS") &&
          col("cts") < col("ts"))
      .groupBy("event_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = RangeJoin.bandJoin(errors, clicks.select(
        col("cu").as("user_id"), col("cts").as("ts"), col("cv").as("value")),
        "user_id", "ts", 600L, Seq("value"))
      .groupBy("event_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive)
  }

  test("banded plan shuffles on (key, bin) — no nested loop") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val l = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    val r = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    val plan = RangeJoin.bandJoin(l, r, "user_id", "ts", 600L, Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("intervalOverlapJoin equals the naive inequality join") {
    import spark.implicits._
    // crafted cases: multi-bucket spans (must not duplicate via the
    // first-shared-bucket dedup), exact boundary touch (half-open: NO
    // match when l.end == r.start), containment, disjoint, cross-key
    val left = Seq(
      (1L, 10L, 100L, 700L),   // spans buckets 0-2 at W=300
      (1L, 11L, 650L, 660L),
      (2L, 20L, 100L, 200L),
      (1L, 12L, 900L, 910L))
      .toDF("k", "lid", "ls", "le")
    val right = Seq(
      (1L, 50L, 550L),    // overlaps lid=10 across buckets 0-1
      (1L, 690L, 950L),   // overlaps lid=10 (at 690-700) and lid=12
      (1L, 700L, 800L),   // touches lid=10 exactly at its end: NO match
      (2L, 150L, 160L),   // inside lid=20
      (3L, 0L, 1000L))    // wrong key
      .toDF("k", "rs", "re")
      .withColumn("rv", col("rs"))
    val naive = left.join(right.select(col("k").as("k2"), col("rs"),
          col("re"), col("rv")),
        col("k") === col("k2") && col("ls") < col("re") &&
          col("rs") < col("le"))
      .select("lid", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val banded = RangeJoin.intervalOverlapJoin(left, right, "k",
        "ls", "le", "rs", "re", bucketSeconds = 300L, Seq("rv"))
      .select(col("lid"), col("r_rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(banded == naive, s"banded=$banded naive=$naive")
    assert(naive.nonEmpty && naive.size == 4)
  }
}
