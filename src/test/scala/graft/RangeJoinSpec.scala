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
}
