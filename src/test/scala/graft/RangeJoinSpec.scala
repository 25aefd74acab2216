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

  test("intervalOverlapJoin property: equals the naive predicate on " +
      "random intervals incl. degenerate cases") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // random intervals covering every degenerate shape the banded form
    // must survive: zero-length [s,s), INVERTED (end < start — must
    // yield no candidates, never a descending-sequence fan-out), ends
    // exactly on a bucket boundary (W=7; multiples of 7 occur often in
    // [0,40]), spans of many buckets, duplicate endpoints, key misses.
    // Reference semantics: nonempty intersection, i.e. the naive
    // `ls < re && rs < le` over WELL-FORMED intervals only (an
    // empty/inverted interval intersects nothing — the naive formula
    // itself mis-fires on inverted input, which is exactly why the
    // operator filters them).
    val ivalGen = for {
      k <- Gen.chooseNum(1L, 3L)
      st <- Gen.chooseNum(0L, 40L)
      len <- Gen.frequency((1, Gen.const(0L)), (1, Gen.chooseNum(-9L, -1L)),
        (6, Gen.chooseNum(1L, 40L)))
    } yield (k, st, st + len)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(8).withWorkers(1)
    val r = SCTest.check(params, Prop.forAll(
        Gen.nonEmptyListOf(ivalGen), Gen.nonEmptyListOf(ivalGen)) {
      (ls, rs) =>
        val left = ls.zipWithIndex.map { case ((k, s0, e0), i) =>
          (k, i.toLong, s0, e0) }.toDF("k", "lid", "ls", "le")
        val right = rs.zipWithIndex.map { case ((k, s0, e0), i) =>
          (k, i.toLong, s0, e0) }.toDF("k", "rid", "rs", "re")
        val want = (for {
          ((lk, ls0, le0), li) <- ls.zipWithIndex
          ((rk, rs0, re0), ri) <- rs.zipWithIndex
          if lk == rk && le0 > ls0 && re0 > rs0 && ls0 < re0 && rs0 < le0
        } yield (li.toLong, ri.toLong)).sorted
        val got = RangeJoin.intervalOverlapJoin(left, right, "k",
            "ls", "le", "rs", "re", bucketSeconds = 7L, Seq("rid"))
          .select(col("lid"), col("r_rid"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        got == want
    })
    assert(r.passed, r.status.toString)
  }
}
