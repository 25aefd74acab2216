package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.CorpusIngest

case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** Streaming corpus ingest: quality gate, watermark-bounded digest
  * dedup, literal-set decontamination flag — and stream/batch parity
  * (every stage but the dedup is a stateless projection). */
class CorpusIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int) =
    java.sql.Timestamp.from(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").toInstant
        .plusSeconds(min * 60L))

  private val goodA = "the quick brown fox jumps over the lazy dog"
  private val goodB = "pack my box with five dozen fresh liquor jugs"
  private val short = "too short" // fails the >=5-token gate
  // verbatim copy of the benchmark item below — must flag
  private val leaked = "alpha beta gamma delta epsilon zeta eta theta"

  private lazy val benchKeys: Seq[Long] = {
    import spark.implicits._
    CorpusIngest.benchShingleKeys(
      Seq(leaked).toDF("text"), "text").toSeq
  }

  private def runStream(stream: MemoryStream[Doc],
      plan: org.apache.spark.sql.DataFrame,
      batches: Seq[Seq[Doc]]): Seq[org.apache.spark.sql.Row] = {
    val name = s"ingest_sink_${System.nanoTime()}"
    val q = plan.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b =>
        stream.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).collect().toSeq
  }

  test("stream ingest gates quality, dedups within the watermark, " +
      "and flags benchmark leaks") {
    import spark.implicits._
    val stream = MemoryStream[Doc](spark)
    val plan = CorpusIngest.ingest(stream.toDF(), "text", "doc_id", "ts",
      benchShingles = benchKeys, watermark = "1 hour")
    val rows = runStream(stream, plan, Seq(
      Seq(Doc(1, ts(1), goodA), Doc(2, ts(2), short)),
      Seq(Doc(3, ts(3), goodA),          // duplicate within watermark
        Doc(4, ts(4), goodB),
        Doc(5, ts(5), leaked))))
    val byId = rows.map(r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shared_shingles"), r.getAs[Boolean]("contaminated")))
      .toMap
    // 2 fails quality, 3 is a duplicate of 1 — survivors are 1, 4, 5
    assert(byId.keySet == Set(1L, 4L, 5L))
    assert(byId(1L) == (0L, false) && byId(4L) == (0L, false))
    // 8 tokens -> 6 distinct 3-gram shingles, all shared with the bench
    assert(byId(5L) == (6L, true))
  }

  test("the same plan runs on a batch frame and agrees row-for-row") {
    import spark.implicits._
    val docs = Seq(
      Doc(1, ts(1), goodA), Doc(2, ts(2), short), Doc(3, ts(3), goodA),
      Doc(4, ts(4), goodB), Doc(5, ts(5), leaked)).toDF()
    val out = CorpusIngest.ingest(docs, "text", "doc_id", "ts",
        benchShingles = benchKeys)
      .select("doc_id", "shared_shingles", "contaminated")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 4L, 5L))
    assert(out.map(_.getBoolean(2)).toSeq == Seq(false, false, true))
  }

  test("shared-shingle count matches the batch shingle-join count") {
    import spark.implicits._
    // partial overlap: first 5 tokens of the benchmark item + a fresh
    // tail -> exactly the 3 shingles inside the shared prefix
    val partial = "alpha beta gamma delta epsilon nine ten eleven twelve"
    val docs = Seq(Doc(7, ts(1), partial)).toDF()
    val streamed = CorpusIngest.ingest(docs, "text", "doc_id", "ts",
      benchShingles = benchKeys).select("doc_id", "shared_shingles")
    val batch = graft.ops.Dedup
      .shingleHashTokens(docs, "text", "doc_id", 3)
      .join(Seq(leaked).toDF("text")
        .select(explode(graft.functions.TokenKernelFns.ngramXx64Set(
          spark, split(col("text"), " "), 3)).as("k")).distinct(), Seq("k"))
      .groupBy("doc_id").agg(count(lit(1)).as("shared"))
    val s = streamed.head()
    val b = batch.head()
    assert(s.getLong(1) == b.getLong(1))
    assert(s.getLong(1) == 3L)
  }

  test("batch-twin plan carries exactly ONE shuffle exchange — the " +
      "digest-keyed keeper window") {
    // quality gate, redaction, and the decontam flag must stay
    // row-local projections: the scale contract (SURVEY §7.4b P9 row)
    // is that only the dedup exchanges data
    val docs = graft.sources.Tables.load(spark, TestSpark.sf0001,
      "documents")
    val plan = graft.streaming.CorpusIngest.ingest(docs, "text",
        "doc_id", tsCol = "n_chars", benchShingles = benchKeys)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange (hash|range)partitioning".r
      .findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n" +
      plan.take(1500))
    assert(plan.toLowerCase.contains("longsetcount"), plan.take(800))
  }

  test("streaming ingest runs unchanged under the RocksDB state store") {
    // the 100 TB state backend for the digest-dedup store (the one
    // stateful operator): same output, disk-backed state
    import spark.implicits._
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Doc](spark)
      val plan = CorpusIngest.ingest(stream.toDF(), "text", "doc_id",
        "ts", benchShingles = benchKeys, watermark = "1 hour")
      val rows = runStream(stream, plan, Seq(
        Seq(Doc(1, ts(1), goodA)),
        Seq(Doc(3, ts(3), goodA), Doc(5, ts(5), leaked))))
      val ids = rows.map(_.getAs[Long]("doc_id")).sorted
      assert(ids == Seq(1L, 5L)) // 3 deduped against RocksDB state
    } finally prev match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("batch twin equals a plain-Scala brute force on random corpora") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val words = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f")))
    val corpus = Gen.choose(3, 14).flatMap(n => Gen.listOfN(n, words))
      .map(_.map(_.mkString(" ")))
    val prop = Prop.forAll(corpus, corpus) { (docsW, benchW) =>
      // force duplicates so the keeper path always exercises
      val texts = docsW ++ docsW.take(2)
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, ts(i), t) }
        .toDF("doc_id", "ts", "text")
      val keys = CorpusIngest.benchShingleKeys(
        benchW.toDF("text"), "text")
      val got = CorpusIngest.ingest(df, "text", "doc_id", "ts",
          benchShingles = keys.toSeq, minTokens = 2)
        .select("doc_id", "shared_shingles").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force replicating the engine's exact edges: the quality
      // gate counts "a" as a STOPWORD (round(nStop/nTok, 4) <= 0.9 —
      // an all-"a" doc is gated); the ngram kernel emits ONE TRUNCATED
      // gram for docs under 3 tokens (TokenKernels.ngramXx64Set:165);
      // symbol ratio is always 0 on this alphabet. Min-id per text,
      // distinct shared gram STRINGS vs the bench's distinct grams.
      def grams(t: String) = {
        val w = t.split(" ").toSeq
        if (w.length < 3) Set(w.mkString(" "))
        else w.sliding(3).map(_.mkString(" ")).toSet
      }
      def passesGate(t: String) = {
        val w = t.split(" ")
        val stopRatio = BigDecimal(w.count(_ == "a").toDouble / w.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        w.length >= 2 && stopRatio <= BigDecimal("0.9")
      }
      val benchG = benchW.flatMap(grams).toSet
      val expect = texts.zipWithIndex
        .filter(d => passesGate(d._1))
        .groupBy(_._1).map { case (_, g) => g.minBy(_._2) }
        .map { case (t, i) =>
          i.toLong -> (grams(t) & benchG).size.toLong }
      got == expect
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(r.passed, r.status.toString)
  }

  test("empty benchmark set disables the decontamination stage") {
    import spark.implicits._
    val docs = Seq(Doc(1, ts(1), leaked)).toDF()
    val out = CorpusIngest.ingest(docs, "text", "doc_id", "ts").head()
    assert(out.getAs[Long]("shared_shingles") == 0L)
    assert(!out.getAs[Boolean]("contaminated"))
  }
}
