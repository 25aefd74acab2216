package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.sources.Tables

class HammingJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sigs = Dedup.simhashAgg(
    Dedup.tokenSets(Tables.load(spark, TestSpark.sf0001, "documents"),
      "text", "doc_id", "source"), "doc_id")

  test("naive hamming join is rewritten off the nested-loop path") {
    val a = sigs.select(col("doc_id").as("d1"), col("simhash").as("h1"))
    val b = sigs.select(col("doc_id").as("d2"), col("simhash").as("h2"))
    val naive = a.join(b,
      bit_count(col("h1").bitwiseXOR(col("h2"))) <= 6 &&
        col("d1") < col("d2"))
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
    assert(plan.contains("posexplode"), plan.take(1500))
  }

  test("rewritten join returns exactly the pigeonhole operator's pairs") {
    val a = sigs.select(col("doc_id").as("d1"), col("simhash").as("h1"))
    val b = sigs.select(col("doc_id").as("d2"), col("simhash").as("h2"))
    val naive = a.join(b,
        bit_count(col("h1").bitwiseXOR(col("h2"))) <= 6 &&
          col("d1") < col("d2"))
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = Dedup.simhashNearDupPairs(sigs, "doc_id", 6)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(naive.length == expected.length) // no duplicate band emissions
    assert(naive.toSet == expected.toSet)
    assert(naive.nonEmpty)
  }

  test("joins that already have an equality key are left alone") {
    val a = sigs.select(col("doc_id").as("d1"), col("simhash").as("h1"))
    val b = sigs.select(col("doc_id").as("d2"), col("simhash").as("h2"))
    val keyed = a.join(b, col("h1") === col("h2") &&
      bit_count(col("h1").bitwiseXOR(col("h2"))) <= 6 &&
      col("d1") < col("d2"))
    val plan = keyed.queryExecution.executedPlan.toString
    assert(!plan.contains("posexplode"), plan.take(1500))
    // sanity: h1 === h2 means hamming 0 <= 6, so pairs = identical sigs
    val expectedPairs = sigs.groupBy("simhash").count()
      .filter(col("count") > 1)
      .select(coalesce(sum(col("count") * (col("count") - 1)), lit(0L))
        .cast("long"))
      .head().getLong(0) / 2
    assert(keyed.count() == expectedPairs)
  }
}
