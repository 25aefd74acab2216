package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{CorpusClean, DataSplit}
import graft.sources.Tables

class DataPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("hash split is disjoint, exhaustive, and repartition-stable") {
    val docs = Tables.load(spark, dir, "documents")
    val (train, test) = DataSplit.trainTest(docs, "text", 0.2)
    assert(train.count() + test.count() == docs.count())
    assert(train.join(test, Seq("doc_id"), "inner").count() == 0)
    // membership survives a relayout
    val (train2, _) = DataSplit.trainTest(docs.repartition(7), "text", 0.2)
    assert(train2.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(train.select("doc_id").collect().map(_.getLong(0)).sorted))
    // keyed by TEXT: duplicate contents never straddle the split
    val frac = test.count().toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"test fraction $frac")
  }

  test("fold assignment covers 0..k-1 roughly evenly") {
    val docs = Tables.load(spark, dir, "documents")
    val counts = docs.select(DataSplit.foldColumn("text", 5).as("fold"))
      .groupBy("fold").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L until 5L).toSet)
    val n = docs.count().toDouble
    counts.values.foreach(c => assert(c / n > 0.1 && c / n < 0.3))
  }

  test("stratified sample respects per-stratum fractions") {
    val docs = Tables.load(spark, dir, "documents")
    val sampled = DataSplit.stratifiedSample(docs, "lang", "text",
      Map("en" -> 0.5, "de" -> 1.0))
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("de", 0L) == totals("de"))  // keep all
    val enFrac = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(enFrac > 0.3 && enFrac < 0.7, s"en fraction $enFrac")
    assert(!byLang.contains("fr")) // unlisted stratum dropped
  }

  test("corpus clean composes filters and dedup with a faithful audit") {
    val docs = Tables.load(spark, dir, "documents")
    val (cleaned, audit) = CorpusClean.clean(docs, "text", "doc_id")
    val stages = audit.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // chained: every stage's input is the previous stage's output
    assert(stages("quality_filter")._1 == docs.count())
    assert(stages("decontaminate")._1 == stages("quality_filter")._2)
    assert(stages("exact_dedup")._1 == stages("decontaminate")._2)
    assert(stages("near_dedup")._1 == stages("exact_dedup")._2)
    assert(cleaned.count() == stages("near_dedup")._2)
    // monotone non-increasing, and dedup actually dropped something on
    // this duplicate-heavy corpus
    assert(stages("near_dedup")._2 < docs.count())
    // cleaning is idempotent: a second pass drops nothing further
    val (cleaned2, _) = CorpusClean.clean(cleaned, "text", "doc_id")
    assert(cleaned2.count() == cleaned.count())
  }

  test("corpus clean redacts digits and decontaminates vs a benchmark") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, dir, "documents")
    val bench = docs.filter(col("source") === "src0")
    val train = docs.filter(col("source") =!= "src0")
    val cfg = CorpusClean.Config(redactDigits = true,
      benchmark = Some(bench), minDistinctRatio = 0.1)
    val (cleaned, audit) = CorpusClean.clean(train, "text", "doc_id", cfg)
    val stages = audit.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the fixture corpus shares shingles across sources, so the
    // decontamination stage must drop something
    assert(stages("decontaminate")._2 < stages("decontaminate")._1)
    // redaction happened before dedup: no digit runs survive
    assert(cleaned.filter(col("text").rlike("[0-9]")).count() == 0)
  }

  test("decontamination sees through digit masking when redacting") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // training doc copies a digit-heavy benchmark item verbatim except
    // for the digits — after masking both sides, the shingles align
    val bench = Seq((100L, "call the number 111 222 333 now please today"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "call the number 999 888 777 now please today"),
      (2L, "a completely different text with no benchmark overlap here"))
      .toDF("doc_id", "text")
    val cfg = CorpusClean.Config(minTokens = 1, maxStopwordRatio = 1.0,
      redactDigits = true, benchmark = Some(bench))
    val (cleaned, _) = CorpusClean.clean(train, "text", "doc_id", cfg)
    val kept = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L), s"kept $kept — digit-masked copy not dropped")
  }

  test("maxShingleDf: boilerplate shingles stop counting as contamination") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // "terms of service apply here" is boilerplate shared by EVERY
    // training doc and the benchmark; doc 1 additionally copies real
    // benchmark content. Uncapped, the boilerplate alone (3 shingles)
    // marks all docs contaminated; capped, only the true copy drops.
    val boiler = "terms of service apply here"
    val bench = Seq(
      (100L, s"unique eval question about quarks and gluons $boiler"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, s"unique eval question about quarks and gluons $boiler"),
      (2L, s"ordinary training text one nothing shared $boiler"),
      (3L, s"ordinary training text two nothing shared $boiler"),
      (4L, s"ordinary training text three nothing shared $boiler"))
      .toDF("doc_id", "text")
    def keptWith(cfg: CorpusClean.Config): Set[Long] =
      CorpusClean.clean(train, "text", "doc_id", cfg)._1
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val base = CorpusClean.Config(minTokens = 1, maxStopwordRatio = 1.0,
      benchmark = Some(bench), nearDedup = false)
    // uncapped: the shared boilerplate (>= 3 shingles) nukes everything
    assert(keptWith(base) == Set.empty,
      "expected uncapped boilerplate to mark all docs contaminated")
    // capped at df <= 3: boilerplate (df 4) is cut, the verbatim copy
    // still shares >= 3 RARE shingles and is the only drop
    assert(keptWith(base.copy(maxShingleDf = 3L)) == Set(2L, 3L, 4L))
  }
}
