package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry
import graft.sources.Tables

class TimeWindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001

  private def run(name: String) =
    Registry.all.find(_.name == name).get.run(spark, dir)

  test("tumbling windows conserve the event count") {
    val total = Tables.load(spark, dir, "events").count()
    val sum = run("q21_tumbling_window").agg(org.apache.spark.sql.functions
      .sum("n")).head().getLong(0)
    assert(sum == total)
  }

  test("sliding windows count every event exactly 5 times (10min/2min)") {
    val total = Tables.load(spark, dir, "events").count()
    val sum = run("q22_sliding_window")
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(sum == 5 * total)
  }

  test("session windows: strictly-greater-than-gap starts a new session") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(ms: Long) = new java.sql.Timestamp(base.getTime + ms)
    val gap = 30 * 60000L
    val events = Seq(
      (1L, ts(0)), (1L, ts(10 * 60000L)), // session A
      (1L, ts(10 * 60000L + gap)),        // exactly at A's end => EXTENDS A
      (1L, ts(10 * 60000L + 2 * gap + 1)), // 1ms past the end => new session
      (2L, ts(0))
    ).toDF("user_id", "ts")
    val sessions = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select("user_id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sessions.count(_._1 == 1L) == 2)
    assert(sessions.filter(_._1 == 1L).map(_._2).sorted.sameElements(Array(1L, 3L)))
    assert(sessions.count(_._1 == 2L) == 1)
  }

  test("session window count conserves events on the fixture") {
    val total = Tables.load(spark, dir, "events").count()
    val sum = run("q23_session_window")
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(sum == total)
  }
}
