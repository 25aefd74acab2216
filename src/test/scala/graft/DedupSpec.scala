package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d", "s1"),
    (2L, "a b c d", "s1"),      // exact dup of 1
    (3L, "a b c e", "s1"),      // 3/5 jaccard vs 1
    (4L, "x y z w", "s1"),      // unrelated
    (5L, "a b c d", "s2")       // exact dup, other block
  ).toDF("doc_id", "text", "source")

  test("exact dedup keeps min id per distinct text") {
    val kept = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L, 4L)))
  }

  test("exactStats counts duplicates") {
    val stats = Dedup.exactStats(docs, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(stats.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("dup_cnt")))
      .toSeq == Seq((1L, 3L), (3L, 1L), (4L, 1L)))
  }

  test("jaccardPairs computes exact within-block similarity") {
    val sets = Dedup.tokenSets(docs, "text", "doc_id", "source")
    val pairs = Dedup.jaccardPairs(sets, "doc_id", "source", 0.5)
      .orderBy("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // within s1: (1,2)=1.0, (1,3)=(2,3)=3/5=0.6; (4,*) below threshold;
    // 5 is in s2 so never pairs with 1/2 despite identical text
    assert(pairs.toSeq == Seq((1L, 2L, 1.0), (1L, 3L, 0.6), (2L, 3L, 0.6)))
  }

  test("shingleSets emits n-grams, short docs collapse to one gram") {
    val grams = Dedup.shingleSets(
      Seq((1L, "a b c d", "s")).toDF("doc_id", "text", "source"),
      "text", "doc_id", "source", 3)
      .select("tok").as[String].collect().sorted
    assert(grams.sameElements(Array("a b c", "b c d")))
    val short = Dedup.shingleSets(
      Seq((1L, "a b", "s")).toDF("doc_id", "text", "source"),
      "text", "doc_id", "source", 3)
      .select("tok").as[String].collect()
    assert(short.sameElements(Array("a b")))
  }

  test("identical docs get identical minhash signatures; candidates catch them") {
    val sets = Dedup.tokenSets(docs, "text", "doc_id", "source")
    val sigs = Dedup.minhashSignatures(sets, "doc_id", 16)
    val bySig = sigs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(bySig(1L) == bySig(2L) && bySig(1L) == bySig(5L))
    assert(bySig(1L) != bySig(4L))
    val cands = Dedup.lshCandidates(sigs, "doc_id", 4, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)) && cands.contains((1L, 5L)))
  }

  test("jaccardOnPairs scores only the given pairs") {
    val sets = Dedup.tokenSets(docs, "text", "doc_id", "source")
    val pairs = Seq((1L, 3L), (1L, 4L)).toDF("d1", "d2")
    val out = Dedup.jaccardOnPairs(pairs, sets, "doc_id", 0.0)
      .orderBy("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 3L, 0.6), (1L, 4L, 0.0)))
  }

  test("minhashLshDedup assigns near-dups to the min-id keeper") {
    val out = Dedup.minhashLshDedup(docs, "text", "doc_id", 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 2 and 5 are exact dups of 1 — dropped in the exact pre-pass, so the
    // only near-dup assignment left is 3 -> keeper 1 (J = 0.6)
    assert(out == Set((1L, 3L, 0.6)))
  }

  test("simhash: identical texts match, near texts are hamming-close") {
    val sets = Dedup.tokenSets(docs, "text", "doc_id", "source")
    val sig = Dedup.simhash(sets, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sig(1L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) <
      java.lang.Long.bitCount(sig(1L) ^ sig(4L)))
  }

  test("prefix-filtered Jaccard equals the plain all-pairs result") {
    val dir = TestSpark.sf0001
    val sets = Dedup.tokenSets(
      graft.sources.Tables.load(spark, dir, "documents"),
      "text", "doc_id", "source")
    val plain = Dedup.jaccardPairs(sets, "doc_id", "source", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val prefix = Dedup.jaccardPairsPrefix(sets, "doc_id", "source", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prefix == plain && plain.nonEmpty)
  }

  test("pigeonhole-banded simhash pairs equal the brute-force result") {
    val dir = TestSpark.sf0001
    val sets = Dedup.tokenSets(
      graft.sources.Tables.load(spark, dir, "documents"),
      "text", "doc_id", "source")
    val sigs = Dedup.simhash(sets, "doc_id")
    val banded = Dedup.simhashNearDupPairs(sigs, "doc_id", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = sigs.select(col("doc_id").as("d1"), col("simhash").as("h1"))
    val b = sigs.select(col("doc_id").as("d2"), col("simhash").as("h2"))
    val brute = a.join(b, col("d1") < col("d2"))
      .withColumn("dist", Dedup.hamming(col("h1"), col("h2")))
      .filter(col("dist") <= 6)
      .select(col("d1"), col("d2"), col("dist").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute && banded.nonEmpty)
  }

  test("banded simhash plans an equi-join, not a nested loop") {
    val sets = Dedup.tokenSets(docs, "text", "doc_id", "source")
    val plan = Dedup.simhashNearDupPairs(Dedup.simhash(sets, "doc_id"),
      "doc_id", 6).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("containment catches a small doc pasted inside a big one " +
      "that jaccard misses — the operator's motivating case") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma", "s"),
      // contains doc 1 verbatim among 13 distinct tokens
      (2L, "alpha beta gamma t4 t5 t6 t7 t8 t9 t10 t11 t12 t13", "s"))
      .toDF("doc_id", "text", "source")
    val sets = Dedup.tokenSets(df, "text", "doc_id", "source")
    // J = 3 / (3 + 13 - 3) ~= 0.23 -> the jaccard gate at 0.6 is blind
    assert(Dedup.jaccardPairs(sets, "doc_id", "source", 0.6).count() == 0)
    val cont = Dedup.containmentPairs(sets, "doc_id", "source", 0.9)
      .collect()
    assert(cont.length == 1)
    assert(cont.head.getLong(0) == 1L && cont.head.getLong(1) == 2L)
    assert(cont.head.getLong(2) == 10000L) // fully contained
  }

  test("resolveClusters collapses keeper chains to their root") {
    import spark.implicits._
    // chain: 5 -> 3, 3 -> 1; separate pair: 10 -> 9
    val assign = Seq((3L, 5L), (1L, 3L), (9L, 10L)).toDF("d1", "d2")
    val roots = Dedup.resolveClusters(assign)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots == Map(5L -> 1L, 3L -> 1L, 10L -> 9L))
  }

  test("resolveClusters on the LSH assignment yields self-free roots") {
    val out = Dedup.minhashLshDedup(docs, "text", "doc_id", 16, 4, 0.5)
    val roots = Dedup.resolveClusters(out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every resolved root must not itself be assigned elsewhere
    val assigned = out.collect().map(_.getLong(1)).toSet
    assert(roots.values.forall(r => !assigned.contains(r)))
  }

  test("dedup is idempotent") {
    val once = Dedup.exact(docs, "text", "doc_id")
    val twice = Dedup.exact(once, "text", "doc_id")
    assert(once.count() == twice.count())
  }

  test("minhashCalibration: estimator within MinHash error bounds, " +
    "exact-equal token sets estimate exactly 1e6") {
    val dir = TestSpark.sf0001
    val rows = Dedup.minhashCalibration(
      graft.sources.Tables.load(spark, dir, "documents"),
      "text", "doc_id", 32, 8)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (est, exact, err) =>
      assert(est >= 0L && est <= 1000000L)
      assert(exact >= 0L && exact <= 1000000L)
      assert(err == est - exact)
      // identical token sets => identical signatures, est exactly 1e6
      if (exact == 1000000L) assert(est == 1000000L)
    }
    // k=32 => estimator sd <= sqrt(0.25/32) ~ 0.088; candidate pairs
    // are band-biased upward, so allow generous but diagnostic bounds:
    // mean |err| under ~1.2 sd, max under ~6 sd
    val absErr = rows.map(t => math.abs(t._3))
    assert(absErr.sum / absErr.length < 110000L,
      s"mean |err| ${absErr.sum / absErr.length}")
    assert(absErr.max < 530000L, s"max |err| ${absErr.max}")
  }
}
