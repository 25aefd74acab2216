package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.sources.Tables

class MinHashAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("imperative sketch equals the k-min-columns form bit-for-bit") {
    val sets = Dedup.tokenSets(
      Tables.load(spark, TestSpark.sf0001, "documents"),
      "text", "doc_id", "source")
    val declarative = Dedup.minhashSignatures(sets, "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val imperative = Dedup.minhashSignaturesAgg(sets, "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(imperative.keySet == declarative.keySet)
    declarative.foreach { case (id, sig) =>
      assert(imperative(id) == sig, s"doc $id signatures differ")
    }
  }

  test("partial sketches merge across partitions (repartition-invariant)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 7L, s"tok_${i % 50}"))
      .toDF("doc_id", "tok")
    val whole = Dedup.minhashSignaturesAgg(df, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val split = Dedup.minhashSignaturesAgg(df.repartition(13), "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(whole == split)
  }

  test("null tokens keep declarative parity (xxhash64 skips null " +
      "children: a null contributes the bare seed, not an absent row)") {
    // regression: update() used to DROP null tokens, while
    // min(xxhash64(lit(i), tok)) sees them as hashInt(i, 42) — a
    // non-null min candidate — so signatures (and LSH candidates)
    // silently diverged on nullable token columns
    import spark.implicits._
    val df = Seq((1L, Option("a")), (1L, Option("b")), (1L, None),
      (2L, None)).toDF("doc_id", "tok")
    val declarative = Dedup.minhashSignatures(df, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val imperative = Dedup.minhashSignaturesAgg(df, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(imperative == declarative,
      s"null-token signatures diverge: $imperative vs $declarative")
  }

  test("minhash_agg is SQL-callable after registration") {
    graft.functions.MinHashAgg.register(spark)
    import spark.implicits._
    Seq((1L, "a"), (1L, "b")).toDF("id", "tok")
      .createOrReplaceTempView("mh_toks")
    val sig = spark.sql(
      "SELECT minhash_agg(tok, 4) AS sig FROM mh_toks GROUP BY id")
      .head().getSeq[Long](0)
    assert(sig.length == 4)
  }
}
