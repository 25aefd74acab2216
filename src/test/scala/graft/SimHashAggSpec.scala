package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup
import graft.sources.Tables

class SimHashAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("imperative simhash equals the 64-sum-columns form bit-for-bit") {
    val sets = Dedup.tokenSets(
      Tables.load(spark, TestSpark.sf0001, "documents"),
      "text", "doc_id", "source")
    val declarative = Dedup.simhash(sets, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val imperative = Dedup.simhashAgg(sets, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(imperative == declarative)
  }

  test("partial counters merge across partitions (repartition-invariant)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 7L, s"tok_${i % 50}"))
      .toDF("doc_id", "tok")
    val whole = Dedup.simhashAgg(df, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val split = Dedup.simhashAgg(df.repartition(13), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(whole == split)
  }

  test("null tokens vote the seed's bits, matching the declarative form") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (1L, None), (2L, None))
      .toDF("doc_id", "tok")
    val declarative = Dedup.simhash(df, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val imperative = Dedup.simhashAgg(df, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(imperative == declarative)
  }

  test("simhash_agg is SQL-callable after registration") {
    graft.functions.SimHashAgg.register(spark)
    import spark.implicits._
    Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("id", "tok")
      .createOrReplaceTempView("sh_toks")
    val out = spark.sql(
      "SELECT id, simhash_agg(tok) AS sh FROM sh_toks GROUP BY id ORDER BY id")
      .collect()
    assert(out.length == 2)
    // single-token group: signature must equal the token's full hash bits
    // turned into sign votes — i.e. exactly the hash's set bits
    val single = out(1).getLong(1)
    assert(single != 0L)
  }
}
