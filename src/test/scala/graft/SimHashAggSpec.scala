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

  test("raw-bits long mode equals the declarative two-plane portable form") {
    import org.apache.spark.sql.functions._
    val sets = Dedup.tokenSets(
      Tables.load(spark, TestSpark.sf0001, "documents"),
      "text", "doc_id", "source")
    // the declarative portable form simhashPortable replaced: 64
    // independent sum(when(...)) vote columns over the two md5 words
    val hex = md5(col("tok"))
    val staged = sets.select(col("doc_id"),
      conv(substring(hex, 1, 8), 16, 10).cast("long").as("wlo"),
      conv(substring(hex, 9, 8), 16, 10).cast("long").as("whi"))
    def votes(word: String, pre: String) = (0 until 32).map(j =>
      sum(when(shiftright(col(word), j).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as(s"$pre$j"))
    val aggs = votes("wlo", "lo") ++ votes("whi", "hi")
    def plane(pre: String) = (0 until 32).map(j =>
      when(col(s"$pre$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val declarative = staged.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (shiftleft(plane("hi"), 32).bitwiseOR(plane("lo"))).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rawBits = Dedup.simhashPortable(sets, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rawBits == declarative)
  }

  test("fused row-local kernel equals the exploded portable form") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val sets = Dedup.tokenSets(docs, "text", "doc_id", "source")
    val exploded = Dedup.simhashPortable(sets, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = Dedup.simhashPortableFused(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == exploded)
  }

  test("fused kernel: null token votes raw-bits zero; duplicates dedup") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // (a, a, null) must equal (a, null): duplicate tokens vote once,
    // the null votes all-minus-one (raw-bits 0) exactly once
    val toks = Seq((1L, Seq(Some("a"), Some("a"), None)),
      (2L, Seq(Some("a"), None))).toDF("doc_id", "toks")
    val sig = toks.select(col("doc_id"),
      graft.functions.TokenKernelFns.simhashMd5Sig(spark, col("toks"))
        .as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
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
