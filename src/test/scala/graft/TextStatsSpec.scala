package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TextStats

class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("token counts: whitespace vs BPE-ish") {
    val r = one("hello world, 42 tests!")
      .select(TextStats.tokenCount(col("text")),
        TextStats.bpeTokenCount(col("text"))).head()
    assert(r.getLong(0) == 4)
    // hello | world | , | 42 | tests | !
    assert(r.getLong(1) == 6)
  }

  test("langId picks scripts and function words") {
    val cases = Seq(
      "the quick brown fox" -> "en",
      "der hund ist nicht hier" -> "de",
      "le chat est dans le jardin" -> "fr",
      "la casa es que grande" -> "es")
    cases.foreach { case (txt, want) =>
      val got = one(txt).select(TextStats.langId(col("text"))).head().getString(0)
      assert(got == want, s"'$txt' -> $got, want $want")
    }
  }

  test("quality columns compute the declared ratios") {
    val r = TextStats.qualityColumns(one("the cat sat"), "text").head()
    assert(r.getAs[Long]("n_tok") == 3)
    // 11 chars / 3 tokens
    assert(math.abs(r.getAs[Double]("mean_tok_len") - 3.6667) < 1e-4)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.3333) < 1e-4)
    assert(r.getAs[Double]("symbol_ratio") == 0.0)
  }

  test("fused quality kernel equals the built-in column forms") {
    // the pre-kernel expression forms qualityColumns replaced — every
    // count and ratio must stay bit-identical, including the empty
    // string, doubled spaces (empty tokens), trailing space,
    // non-ASCII symbols, and tab/newline (all inside [^A-Za-z0-9 ])
    val texts = Seq("the cat sat", "", " ", "a  b", "trailing ",
      "the the THE the", "ünïcödé tëxt!", "tab\tand\nnewline",
      "a of to in and is it that an the", "1 22 333 ,,,")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val t = col("text")
    val toks = split(t, " ")
    val legacy = df.select(col("id"),
        size(toks).cast("long").as("n_tok"),
        round(length(t).cast("double")
          / greatest(size(toks).cast("long"), lit(1L)), 4).as("mean_tok_len"),
        round(size(filter(toks, x => x.isInCollection(Seq("the", "a",
          "an", "of", "to", "in", "and", "is", "it", "that"))))
          .cast("long").cast("double")
          / greatest(size(toks).cast("long"), lit(1L)), 4).as("stopword_ratio"),
        round(size(regexp_extract_all(t, lit("[^A-Za-z0-9 ]"), lit(0)))
          .cast("double") / greatest(length(t).cast("long"), lit(1L)), 4)
          .as("symbol_ratio"),
        (size(array_distinct(toks)) / size(toks)).as("distinct_ratio"))
      .orderBy("id").collect().toSeq
    val qc = graft.functions.TokenKernelFns.textQualityCounts(spark, t)
    val fused = TextStats.qualityColumns(df, "text")
      .withColumn("distinct_ratio",
        qc.getField("n_distinct") / qc.getField("n_tok"))
      .select("id", "n_tok", "mean_tok_len", "stopword_ratio",
        "symbol_ratio", "distinct_ratio")
      .orderBy("id").collect().toSeq
    assert(fused == legacy)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val a = one("a b c").select(TextStats.fingerprint(col("text"))).head().getLong(0)
    val b = one("c b a").select(TextStats.fingerprint(col("text"))).head().getLong(0)
    val a2 = one("a b c").select(TextStats.fingerprint(col("text"))).head().getLong(0)
    assert(a == a2 && a != b)
  }

  test("t_entropy: hand-computed values and bounds") {
    val e = graft.queries.TextOps.entries.find(_.name == "t_entropy").get
    val dir = java.nio.file.Files.createTempDirectory("entropy").toString
    Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "a a b b"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = e.run(spark, dir).orderBy("doc_id").collect()
    // uniform single token -> 0; 4 distinct of 4 -> ln 4; 2x2 -> ln 2
    assert(rows(0).getDouble(3) == 0.0)
    assert(math.abs(rows(1).getDouble(3) - math.log(4)) < 1e-3)
    assert(math.abs(rows(2).getDouble(3) - math.log(2)) < 1e-3)
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 4L, 2L))
  }

  test("t_bm25: length normalization ranks shorter docs higher at equal tf") {
    val e = graft.queries.TextOps.entries.find(_.name == "t_bm25").get
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    // 'rare' appears once in both docs; doc 2 is much longer, so its
    // BM25 for 'rare' must be strictly lower. Both docs share the
    // same 3-token vocabulary (equal df everywhere) so all three make
    // each doc's top-3 and the comparison isolates length.
    Seq((1L, "rare x y"),
        (2L, "rare " + ("x y " * 20).trim))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val byDoc = e.run(spark, dir).collect()
      .filter(_.getString(2) == "rare")
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(byDoc(1L) > byDoc(2L))
  }

  test("t_oov_rate reuses one physical exchange for vocab and oov sides") {
    val e = graft.queries.TextOps.entries.find(_.name == "t_oov_rate").get
    val df = e.run(spark, TestSpark.sf0001)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") ||
      plan.contains("TableCacheQueryStage") ||
      plan.contains("ReusedQueryStage"),
      s"(source, tok) aggregate not shared:\n${plan.take(1500)}")
  }
}
