package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.BpeTrain
import graft.ops.BpeTrain.EndOfWord
import graft.queries.CorpusOps

/** t_bpe_encode is rows-only at the gate (its merges come from the
  * iterative fit), so this spec pins the encode content exactly: the
  * registry entry's per-doc (n_words, n_tokens, md5-of-token-stream)
  * must equal an independent in-memory tokenizer run with the same
  * learned merges.
  */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replayFuse(syms: List[String], a: String,
      b: String): List[String] =
    syms.foldLeft(List.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b)
        acc.init :+ (a + b)
      else acc :+ s
    }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("t_bpe_encode matches an in-memory tokenizer, doc for doc") {
    val docs = Seq(
      (1L, "low low lower lowest", "a"),
      (2L, "new newer newest new", "a"),
      (3L, "low new low new", "b"),
      (4L, "wider widest wide", "b"),
      (5L, "low", "c"))
    val dir = java.nio.file.Files.createTempDirectory("bpeenc").toString
    docs.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = CorpusOps.entries.find(_.name == "t_bpe_encode").get
      .run(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    // independent replay: same fit call, in-memory greedy encode
    val merges = BpeTrain.fit(docs.toDF("doc_id", "text", "source"),
      "text", steps = 8, minCount = 2L)
    assert(merges.nonEmpty, "fixture learned no merges")
    val want = docs.map { case (id, text, _) =>
      val words = text.split(" ").filter(_.nonEmpty).toList
      val toks = words.map { w =>
        merges.foldLeft(w.map(_.toString).toList :+ EndOfWord) {
          (syms, m) => replayFuse(syms, m.left, m.right)
        }
      }
      val flat = toks.flatten
      id -> ((words.length.toLong, flat.length.toLong,
        md5hex(flat.mkString(" "))))
    }.toMap
    assert(got == want)
  }

  test("t_fertility equals the per-source rollup of t_bpe_encode stats") {
    val docs = Seq(
      (1L, "low low lower lowest", "a"),
      (2L, "new newer newest new", "a"),
      (3L, "low new low new", "b"),
      (4L, "wider widest wide", "b"),
      (5L, "low", "c"))
    val dir = java.nio.file.Files.createTempDirectory("bpefert").toString
    docs.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val perDoc = CorpusOps.entries.find(_.name == "t_bpe_encode").get
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val srcOf = docs.map(d => d._1 -> d._3).toMap
    val want = perDoc.groupBy { case (id, _) => srcOf(id) }
      .map { case (src, m) =>
        val nw = m.values.map(_._1).sum
        val nt = m.values.map(_._2).sum
        src -> ((nw, nt, 1000000L * nt / nw))
      }
    val got = CorpusOps.entries.find(_.name == "t_fertility").get
      .run(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    // BPE never merges across words: pieces >= words, fertility >= 1e6
    got.values.foreach { case (_, _, f) => assert(f >= 1000000L) }
  }
}
