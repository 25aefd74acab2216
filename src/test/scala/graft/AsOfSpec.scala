package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asofJoin attaches the latest right value at or before ts") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L),
      (1L, t("2024-01-01 12:00:00"), 101L),
      (1L, t("2024-01-01 09:00:00"), 102L),  // before any right row
      (2L, t("2024-01-01 10:30:00"), 200L)
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, t("2024-01-01 09:30:00"), 5.0),
      (1L, t("2024-01-01 10:00:00"), 7.0),   // exactly at a left ts
      (1L, t("2024-01-01 11:00:00"), 9.0),
      (2L, t("2024-01-01 10:00:00"), 4.0),
      (3L, t("2024-01-01 10:00:00"), 1.0)    // key with no left rows
    ).toDF("user_id", "ts", "value")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", Seq("value"))
      .select("event_id", "asof_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(
      100L -> Some(7.0),  // ties: state at 10:00 visible to lookup at 10:00
      101L -> Some(9.0),
      102L -> None,       // no prior purchase
      200L -> Some(4.0)))
  }

  test("right rows tied on ts resolve to the max value tuple, " +
      "independent of partitioning (review find: the untied window " +
      "picked a partition-order-dependent row)") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, t("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val tied = Seq(
      (1L, t("2024-01-01 09:00:00"), 3.0),
      (1L, t("2024-01-01 09:00:00"), 9.0),
      (1L, t("2024-01-01 09:00:00"), 5.0))
    for (perm <- tied.permutations.toSeq; parts <- Seq(1, 3)) {
      val right = perm.toDF("user_id", "ts", "value").repartition(parts)
      val got = AsOf.asofJoin(left, right, "user_id", "ts", Seq("value"))
        .select("asof_value").head().getDouble(0)
      assert(got == 9.0, s"tie broke to $got for $perm at $parts parts")
    }
  }

  test("asofJoin plan is one shuffle + window, not a pair join") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, t("2024-01-01 10:00:00"), 1L)).toDF("k", "ts", "id")
    val r = Seq((1L, t("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val plan = AsOf.asofJoin(l, r, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(500))
    assert(!plan.contains("NestedLoop"), plan.take(800))
    assert(!plan.contains("Join"), plan.take(800))
  }
}
