package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Packing

/** Sequence packing: hand-computed next-fit semantics, per-shard reset,
  * oversized-document isolation, and partitioning-independence of the
  * deterministic bin assignment. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pack(rows: Seq[(String, Long, Long)], cap: Long,
      parts: Int = 4): Map[(String, Long), Long] = {
    import spark.implicits._
    Packing.nextFitPack(spark,
      rows.toDF("src", "id", "tk").repartition(parts),
      "src", "id", "tk", cap)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
  }

  test("next-fit packs in id order and opens a bin at capacity") {
    // cap 10, toks 4,5,3,10,2: [4,5]=9 | [3] then 10 alone | [2]
    val got = pack(Seq(("a", 1L, 4L), ("a", 2L, 5L), ("a", 3L, 3L),
      ("a", 4L, 10L), ("a", 5L, 2L)), 10)
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("a", 4L) -> 2L, ("a", 5L) -> 3L))
  }

  test("bin ids reset at shard boundaries") {
    val got = pack(Seq(("a", 1L, 9L), ("a", 2L, 9L), ("b", 1L, 9L)), 10)
    assert(got(("a", 2L)) == 1L)
    assert(got(("b", 1L)) == 0L) // fresh shard, fresh bin
  }

  test("oversized documents get a bin of their own") {
    val got = pack(Seq(("a", 1L, 25L), ("a", 2L, 1L), ("a", 3L, 25L)), 10)
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 1L, ("a", 3L) -> 2L))
  }

  test("assignment is independent of upstream partitioning") {
    val rows = (1 to 200).map(i => (s"s${i % 7}", i.toLong, (i % 13 + 1).toLong))
    assert(pack(rows, 20, parts = 1) == pack(rows, 20, parts = 16))
  }

  test("packStats aggregates fill and utilization per bin") {
    import spark.implicits._
    val asg = Packing.nextFitPack(spark,
      Seq(("a", 1L, 4L), ("a", 2L, 5L), ("a", 3L, 3L)).toDF("src", "id", "tk"),
      "src", "id", "tk", 10L)
    val stats = Packing.packStats(asg, 10L).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(stats(("a", 0L)) == ((2L, 9L, 0.9)))
    assert(stats(("a", 1L)) == ((1L, 3L, 0.3)))
  }
}
