package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.BpeTrain
import graft.ops.BpeTrain.{EndOfWord, Merge}

/** BpeTrain vs a straight-line in-memory replay of the same algorithm —
  * merge selection and greedy fusion are exact integer/string
  * computations, so the comparison is strict equality, step for step.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replayFuse(syms: List[String], a: String,
      b: String): List[String] =
    syms.foldLeft(List.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b)
        acc.init :+ (a + b)
      else acc :+ s
    }

  private def replayFit(corpus: Seq[String], steps: Int,
      minCount: Long): List[Merge] = {
    val words = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var table = words.map { case (w, f) =>
      (w.map(_.toString).toList :+ EndOfWord, f)
    }.toList
    var out = List.empty[Merge]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      // tie-break in UTF-8 BINARY order (the engine contract) — Java's
      // String compareTo is UTF-16 order, which diverges for
      // supplementary-plane characters
      implicit val utf8Order: Ordering[String] = (a: String, b: String) => {
        val (ab, bb) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
        val n = math.min(ab.length, bb.length)
        var i = 0
        var c = 0
        while (i < n && c == 0) {
          c = java.lang.Integer.compare(ab(i) & 0xff, bb(i) & 0xff)
          i += 1
        }
        if (c != 0) c else java.lang.Integer.compare(ab.length, bb.length)
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best.filter(_._2 >= minCount) match {
        case None => done = true
        case Some(((a, b), n)) =>
          out ::= Merge(step.toLong, a, b, n)
          table = table.map { case (syms, f) => (replayFuse(syms, a, b), f) }
          step += 1
      }
    }
    out.reverse
  }

  private val corpus = Seq(
    "low lower lowest low low",
    "new newer newest new lower",
    "wide wider widest new low")

  test("fit equals the in-memory replay, step for step") {
    val df = corpus.toDF("text").repartition(3)
    val got = BpeTrain.fit(df, "text", steps = 10, minCount = 2L)
    val want = replayFit(corpus, steps = 10, minCount = 2L)
    assert(got == want)
    assert(got.nonEmpty)
    // counts are non-increasing is NOT guaranteed by BPE, but the top
    // merge must reflect the dominant 'low'/'new' families
    assert(got.head.n >= 7L)
  }

  test("minCount stops training before the step budget") {
    val df = Seq("ab cd ef").toDF("text")
    // every pair occurs once -> no merge reaches minCount=2
    assert(BpeTrain.fit(df, "text", steps = 5, minCount = 2L).isEmpty)
  }

  test("maxWords caps the fit's word table deterministically") {
    val df = corpus.toDF("text")
    // replay on the top-3 words by (freq desc, word asc): 'low' (5),
    // 'new' (4), then the freq-1 tie block starts at 'lower' (2)...
    // compute the expected capped corpus from the same counting rule
    val counts = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    val top = counts.toSeq.sortBy { case (w, f) => (-f, w) }.take(3)
    val cappedCorpus = top.flatMap { case (w, f) =>
      Seq.fill(f.toInt)(w)
    }.mkString(" ")
    val got = BpeTrain.fit(df, "text", steps = 6, minCount = 2L,
      maxWords = 3)
    val want = replayFit(Seq(cappedCorpus), steps = 6, minCount = 2L)
    assert(got == want)
    assert(got.nonEmpty)
    // and the cap genuinely binds: the uncapped fit differs
    assert(got != BpeTrain.fit(df, "text", steps = 6, minCount = 2L))
  }

  test("applyMerges replays learned merges in order on new text") {
    val df = corpus.toDF("text")
    val merges = BpeTrain.fit(df, "text", steps = 8, minCount = 2L)
    // Spark hands back mutable.ArraySeq — type with collection.Seq
    val toks = Seq("low lowest").toDF("text")
      .select(BpeTrain.applyMerges(col("text"), merges).as("t"))
      .head()
      .getAs[scala.collection.Seq[scala.collection.Seq[String]]](0)
    // in-memory tokenization of the same words with the same merges
    val want = Seq("low", "lowest").map { w =>
      merges.foldLeft(w.map(_.toString).toList :+ EndOfWord) {
        (syms, m) => replayFuse(syms, m.left, m.right)
      }
    }
    assert(toks.map(_.toList).toList == want)
    // the dominant whole word fused to a single boundary-aware token
    assert(toks.head.toList == List("low" + EndOfWord))
  }
}
