package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** The bloom-prefiltered decontamination must be EXACTLY the exact
  * form: false positives are re-rejected by the verification join and
  * bloom filters have no false negatives, so the two operators are
  * output-identical by construction. This spec pins that equivalence
  * (the DuckDB gate then pins both against the oracle).
  */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def entry(name: String) =
    TextOps.entries.find(_.name == name).get

  test("t_decontam_bloom ≡ t_decontaminate at sf0.001") {
    val exact = entry("t_decontaminate").run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = entry("t_decontam_bloom").run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture produced no contaminated docs")
    assert(bloom == exact)
  }

  test("bloom_filter_agg/might_contain: no false negatives, sane sketch") {
    graft.functions.BloomFn.register(spark)
    import spark.implicits._
    (1L to 1000L).toDF("k").createOrReplaceTempView("bloom_in")
    // every inserted key must test positive (bloom contract)
    val misses = spark.sql(
      """SELECT count(*) AS miss FROM bloom_in
         WHERE NOT might_contain(
           (SELECT bloom_filter_agg(k, 1000L, 8000L) FROM bloom_in), k)""")
      .head().getLong(0)
    assert(misses == 0L)
    // non-members mostly test negative (fpp at 8 bits/key is ~2%)
    val fps = spark.sql(
      """SELECT count(*) AS fp
         FROM (SELECT k + 1000000 AS k2 FROM bloom_in)
         WHERE might_contain(
           (SELECT bloom_filter_agg(k, 1000L, 8000L) FROM bloom_in), k2)""")
      .head().getLong(0)
    assert(fps < 100L, s"implausible false-positive count $fps/1000")
  }
}
