package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.queries.CorpusOps

/** Hand-computed checks for the round-4 corpus operators (the DuckDB
  * hash gate proves cross-engine parity; these prove the SEMANTICS are
  * the intended ones on inputs small enough to verify by hand).
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def entry(name: String) =
    CorpusOps.entries.find(_.name == name).get

  private def docsView(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("corpusops").toString
    rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("p3_chunk: stride-24 windows of 32 cover every token exactly") {
    val words60 = (1 to 60).map(i => s"w$i").mkString(" ")
    val words10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val dir = docsView(Seq((1L, words60, "a"), (2L, words10, "a")))
    val out = entry("p3_chunk").run(spark, dir)
      .select("doc_id", "chunk_id", "n_tok").collect().toSeq
    // doc 1 (60 toks): starts 0/24/48 -> sizes 32, 32, 12
    // doc 2 (10 toks): one short chunk
    assert(out == Seq(Row(1L, 0L, 32L), Row(1L, 1L, 32L), Row(1L, 2L, 12L),
      Row(2L, 0L, 10L)))
  }

  test("p3_chunk: boundary doc of exactly 32 tokens is one full chunk") {
    val words32 = (1 to 32).map(i => s"w$i").mkString(" ")
    val dir = docsView(Seq((1L, words32, "a")))
    val out = entry("p3_chunk").run(spark, dir)
      .select("chunk_id", "n_tok").collect().toSeq
    assert(out == Seq(Row(0L, 32L)))
  }

  test("p4_dup_spans: shared windows found, unique docs excluded") {
    val shared = (1 to 40).map(i => s"tok$i").mkString(" ")
    val dir = docsView(Seq(
      (1L, shared, "a"), (2L, shared, "a"),
      (3L, (1 to 40).map(i => s"other$i").mkString(" "), "a")))
    val out = entry("p4_dup_spans").run(spark, dir).collect()
    // docs 1+2 share both stride windows (starts 0 and 24); doc 3's
    // windows are unique and must not appear
    assert(out.length == 2)
    assert(out.forall(r => r.getAs[Long]("n_docs") == 2L &&
      r.getAs[Long]("n_occ") == 2L))
  }

  test("t_boilerplate: shingle document-frequency threshold") {
    // "a b c d" in 5 docs -> its shingles "a b c"/"b c d" have df=5+1=6
    // and 5 respectively (doc 6 shares "a b c" via "a b c x").
    val common = (1 to 5).map(i => (i.toLong, "a b c d", "s"))
    val dir = docsView(common :+ (6L, "a b c x", "s"))
    val out = entry("t_boilerplate").run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 1-5: 2 distinct shingles, both df>=5 (abc: 6 docs, bcd: 5)
    assert(out(1L) == (2L, 2L))
    // doc 6: shingles "a b c" (df 6, boiler) + "b c x" (df 1)
    assert(out(6L) == (2L, 1L))
  }

  test("x7_mixture: small sources kept whole, big sources thresholded") {
    val small = Seq((1L, "tiny doc here", "s_small"))
    val big = (1 to 60).map(i =>
      (100L + i, (1 to 10).map(j => s"tok${i}_$j").mkString(" "), "s_big"))
    val dir = docsView(small ++ big)
    val out = entry("x7_mixture").run(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // s_small: 3 tokens <= 500 budget -> everything sampled
    assert(out("s_small").getAs[Long]("n_sampled") == 1L)
    assert(out("s_small").getAs[Long]("toks_sampled") == 3L)
    // s_big: 600 tokens -> rate 5/6; threshold keeps a strict subset
    val bigRow = out("s_big")
    assert(bigRow.getAs[Long]("n_sampled") < 60L)
    assert(bigRow.getAs[Long]("n_sampled") > 30L)
    // selection is deterministic: rerun matches exactly
    val again = entry("x7_mixture").run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_sampled")).toMap
    assert(again("s_big") == bigRow.getAs[Long]("n_sampled"))
  }

  test("x8_fold_split: folds are exhaustive, in range, and layout-stable") {
    val docs = (1 to 40).map(i =>
      (i.toLong, s"doc number $i with tokens", if (i % 3 == 0) "a" else "b"))
    val dir = docsView(docs)
    val out = entry("x8_fold_split").run(spark, dir).collect()
    val folds = out.map(_.getLong(0)).toSet
    assert(folds.subsetOf((0L to 4L).toSet))
    assert(out.map(_.getAs[Long]("n_docs")).sum == 40L)
    // layout stability: rewrite the same docs across 11 INPUT partitions
    // (fold assignment is content-hashed, so the aggregates must match)
    val dir11 = java.nio.file.Files
      .createTempDirectory("corpusops11").toString
    spark.read.parquet(s"$dir/documents.parquet").repartition(11)
      .write.mode("overwrite").parquet(s"$dir11/documents.parquet")
    val again = entry("x8_fold_split").run(spark, dir11)
      .collect().sortBy(r => (r.getLong(0), r.getString(1)))
    assert(again.map(r => (r.getLong(0), r.getString(1),
      r.getAs[Long]("n_docs"))).toSeq ==
      out.sortBy(r => (r.getLong(0), r.getString(1)))
        .map(r => (r.getLong(0), r.getString(1),
          r.getAs[Long]("n_docs"))).toSeq)
  }

  test("t_bigram_lm: scaled conditional-probability sums by hand") {
    // corpus bigrams: doc1 "a b a b" -> (a,b) x2, (b,a) x1
    //                 doc2 "a b c"   -> (a,b), (b,c)
    // c12: (a,b)=3 (b,a)=1 (b,c)=1 ; c1: a=3, b=2
    // p-scaled: (a,b)=floor(1e6*3/3)=1000000, (b,a)=floor(1e6*1/2)=500000,
    //           (b,c)=500000
    val dir = docsView(Seq((1L, "a b a b", "s"), (2L, "a b c", "s")))
    val out = entry("t_bigram_lm").run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("lm_score"))).toMap
    assert(out(1L) == (3L, 2500000L)) // 1e6 + 5e5 + 1e6
    assert(out(2L) == (2L, 1500000L)) // 1e6 + 5e5
  }

  test("x9_quantize: affine int8 codes and error sums by hand") {
    import org.apache.spark.sql.functions.col
    // vector [0, 0.5, 1]: mn=0, scale=1/255; codes floor(v*255) =
    // [0, 127, 255] (0.5*255 = 127.5); recon err = [0, 0.5/255, 0]
    val dir = java.nio.file.Files.createTempDirectory("corpusq").toString
    Seq((1L, Array(0.0f, 0.5f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.CorpusOps.entries.find(_.name == "x9_quantize")
      .get.run(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("qsum") == 382L) // 0 + 127 + 255
    // err: only the middle element, 0.5 - 127/255 = 0.5/255 = 0.00196...
    assert(out(0).getAs[Long]("esum") == 1960L) // floor(1e6 * 0.5/255)
  }

  test("t_qscore_linear: score is bias + sum of bucket weights") {
    // bucket("aa") = (97*31 + 2) % 64 = 3009 % 64 = 1; QW(1) = ((7+3)%11)-5 = 5
    // bucket("b")  = (98*31 + 1) % 64 = 3039 % 64 = 31; QW(31) = ((220)%11)-5 = -5
    val dir = docsView(Seq((1L, "aa b aa", "s")))
    val out = entry("t_qscore_linear").run(spark, dir).collect()
    assert(out.length == 1)
    // 2 (bias) + 5 - 5 + 5 = 7, keep = 1
    assert(out(0).getLong(1) == 7L)
    assert(out(0).getLong(2) == 1L)
  }

  test("x29_weighted_sample matches the A-ES key brute force") {
    // 40 docs with lengths spread 1..200 chars so weights differ widely
    val docs = (1L to 40L).map { i =>
      (i, ("tok" + i + " ") * (1 + (i.toInt * 5) % 50) + i, "s" + i % 4)
    }
    val dir = docsView(docs)
    def key(text: String, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      math.log((java.lang.Long.parseLong(hex, 16) + 1.0) / 4503599627370496.0) / w
    }
    val expected = docs.map { case (id, text, _) =>
      (id, key(text, text.length.toLong))
    }.sortBy { case (id, k) => (-k, id) }.take(20).map(_._1)
    val got = entry("x29_weighted_sample").run(spark, dir).collect()
      .map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  private def cdcChunks(text: String): Seq[Seq[String]] = {
    // reference fold: boundary token (md5w % 16 == 0) closes its chunk
    val words = text.split(" ").toSeq
    words.foldLeft((Vector.empty[Vector[String]], Vector.empty[String])) {
      case ((done, cur), w) =>
        val nxt = cur :+ w
        if (graft.functions.PortableHash
          .md5wBytes(w.getBytes("UTF-8")) % 16 == 0) (done :+ nxt, Vector())
        else (done, nxt)
    } match { case (done, cur) => done ++ (if (cur.nonEmpty) Seq(cur) else Nil) }
  }

  test("p6_cdc_chunk matches the sequential boundary fold") {
    val text = (1 to 120).map(i => s"w$i").mkString(" ")
    val dir = docsView(Seq((1L, text, "a"), (2L, "w1 w2 w3", "a")))
    val got = entry("p6_cdc_chunk").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    Seq(1L -> text, 2L -> "w1 w2 w3").foreach { case (id, t) =>
      val exp = cdcChunks(t)
      assert(got.keys.count(_._1 == id) == exp.length, s"doc $id chunk count")
      exp.zipWithIndex.foreach { case (chunk, i) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(chunk.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(got((id, i.toLong)) == ((chunk.length.toLong, h)),
          s"doc $id chunk $i")
      }
    }
  }

  test("p6_cdc_chunk re-cuts only the edited chunk on a head insertion") {
    // the CDC contract p3's fixed grid cannot give: prepending a token
    // changes the FIRST chunk only — every later boundary is a token
    // property, so later chunks keep their content hashes verbatim
    val text = (1 to 120).map(i => s"w$i").mkString(" ")
    val orig = cdcChunks(text)
    assert(orig.length >= 3, "fixture must produce several chunks")
    val edited = cdcChunks("inserted " + text)
    assert(edited.tail == orig.tail)
    assert(edited.head == "inserted" +: orig.head)
  }

  test("p10: row-local cdc_chunks kernel matches the sequential " +
      "boundary fold (the p6 semantics, no window)") {
    import org.apache.spark.sql.functions._
    val texts = Seq((1 to 120).map(i => s"w$i").mkString(" "),
      "w1 w2 w3", "single")
    val got = texts.toDF("text")
      .select(CorpusOps.cdcChunks(spark, col("text")).as("chs"))
      .collect().map(_.getSeq[String](0).toList)
    val want = texts.map(t => cdcChunks(t).map(_.mkString(" ")).toList)
    assert(got.toList == want.toList)
  }

  test("cdc_chunks kernel matches p6's window derivation on empty-token " +
      "edges (double/trailing spaces) and boundary-dense text") {
    import org.apache.spark.sql.functions._
    def isB(w: String) = graft.functions.PortableHash
      .md5wBytes(w.getBytes("UTF-8")) % 16 == 0
    val b = (1 to 300).map(i => s"s$i").filter(isB)
    // double space, trailing space, leading space, boundary runs —
    // every token the regex split emits (incl. empties) must land in
    // exactly the chunk p6's prefix-sum window puts it in
    val texts = Seq(
      s"a  b ${b(0)} c", s"${b(0)} ${b(1)} x", s" lead", "tail ",
      s"${b(0)}", "only plain words here")
    val dir = docsView(texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "a") })
    val fromP6 = entry("p6_cdc_chunk").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3).toList }
    val fromKernel = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        CorpusOps.cdcChunks(spark, col("text")).as("chs"))
      .collect().map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
        r.getLong(0) -> r.getSeq[String](1).map(c =>
          md.digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString)
          .toList
      }.toMap
    assert(fromKernel == fromP6)
  }

  test("p10 catches a span duplicated at a NON-grid offset that p4 " +
      "misses (round-13 verdict #4)") {
    import org.apache.spark.sql.functions._
    // boundary words found on the SAME hash the chunker cuts on
    def isB(w: String) = graft.functions.PortableHash
      .md5wBytes(w.getBytes("UTF-8")) % 16 == 0
    val cands = (1 to 300).map(i => s"s$i")
    val b = cands.filter(isB)
    val f = cands.filterNot(isB)
    assert(b.length >= 2, "fixture needs two boundary words")
    // 30-token span with interior boundaries at positions 11 and 21:
    // the chunk BETWEEN them (f(10..18) + b(1), 10 tokens) sits fully
    // inside the span, so it is byte-identical wherever the span lands
    val span = (f.take(10) :+ b(0)) ++ (f.slice(10, 19) :+ b(1)) ++
      f.slice(19, 28)
    assert(span.length == 30)
    val sharedChunk = (f.slice(10, 19) :+ b(1)).mkString(" ")
    // same span injected at offsets 20 and 23 — neither a multiple of
    // the p3/p4 stride (24), and different phases in the two docs
    val docA = ((1 to 20).map(i => s"fa$i") ++ span ++
      (1 to 12).map(i => s"ta$i")).mkString(" ")
    val docB = ((1 to 23).map(i => s"fb$i") ++ span ++
      (1 to 9).map(i => s"tb$i")).mkString(" ")
    val dir = docsView(Seq((1L, docA, "a"), (2L, docB, "b")))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // p4's fixed-grid form: no 32-token window of either doc is shared
    // (the span is shorter than a window and sits at different grid
    // phases), so the grid detector returns NOTHING
    val p4Style = CorpusOps.spanGrid(docs)
      .select(col("doc_id"), md5(array_join(col("chunk"), " ")).as("h"))
      .groupBy("h").agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") >= 2)
    assert(p4Style.collect().isEmpty, "p4 should miss the non-grid span")
    // p10's content-defined chunks align on content: the interior
    // chunk is reported as shared by both docs
    val p10 = entry("p10_cdc_dup_spans").run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val wantH = md.digest(sharedChunk.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(p10.get(wantH).contains(2L),
      s"p10 must report the interior span chunk shared by 2 docs; got $p10")
  }

  test("p11_span_scrub removes the duplicated chunk from the non-owner " +
      "only; the owner round-trips byte-identically") {
    // same non-grid-offset fixture as the p10 test: a 30-token span
    // injected at offsets 20 and 23 of two otherwise-unique docs
    def isB(w: String) = graft.functions.PortableHash
      .md5wBytes(w.getBytes("UTF-8")) % 16 == 0
    val cands = (1 to 300).map(i => s"s$i")
    val b = cands.filter(isB)
    val f = cands.filterNot(isB)
    val span = (f.take(10) :+ b(0)) ++ (f.slice(10, 19) :+ b(1)) ++
      f.slice(19, 28)
    val docA = ((1 to 20).map(i => s"fa$i") ++ span ++
      (1 to 12).map(i => s"ta$i")).mkString(" ")
    val docB = ((1 to 23).map(i => s"fb$i") ++ span ++
      (1 to 9).map(i => s"tb$i")).mkString(" ")
    val dir = docsView(Seq((1L, docA, "a"), (2L, docB, "b")))
    val out = entry("p11_span_scrub").run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val chunksA = cdcChunks(docA).map(_.mkString(" "))
    val chunksB = cdcChunks(docB).map(_.mkString(" "))
    val shared = chunksA.toSet intersect chunksB.toSet
    assert(shared.nonEmpty, "fixture must share at least one CDC chunk")
    // doc 1 owns every shared chunk (smaller doc_id): unchanged
    assert(out(1L) == ((docA, 0L)))
    // doc 2 loses EXACTLY the shared chunks, stitched in order
    val keptB = chunksB.filterNot(shared)
    val scrToks = chunksB.filter(shared)
      .map(_.split(" ").length.toLong).sum
    assert(out(2L) == ((keptB.mkString(" "), scrToks)))
  }

  test("p11_span_scrub is the identity on a dup-free corpus, " +
      "including empty-token edges") {
    val texts = Seq("a  b c ", " lead x", "only plain words here")
    val dir = docsView(texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "a") })
    val out = entry("p11_span_scrub").run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(out(i.toLong) == ((t, 0L)),
        s"doc $i must round-trip byte-identically") }
  }

  test("x33_score_norm: per-source percentiles, tie ranks, " +
    "single-doc source kept") {
    // lengths engineered: source a has a tie (two 10-char docs),
    // source b is a single doc
    val docs = Seq(
      (1L, "aaaaaaaaaa", "a"), (2L, "aaaaaaaaaa", "a"),
      (3L, "aaaaa", "a"), (4L, "aaaaaaaaaaaaaaa", "a"),
      (5L, "bbbb", "b"))
    val dir = docsView(docs)
    val got = entry("x33_score_norm").run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getInt(4)))).toMap
    // source a ranks by length: doc3 (5ch) rk=1, docs 1,2 (10ch) rk=2
    // (tie), doc4 (15ch) rk=4; n=4 -> pct = 1e6*(rk-1)/3
    val exp = Map(
      3L -> ((0L, 0)), 1L -> ((333333L, 1)), 2L -> ((333333L, 1)),
      4L -> ((1000000L, 1)), 5L -> ((1000000L, 1)))
    assert(got == exp)
  }

  test("p7_length_buckets: pow2 caps and exact waste accounting") {
    val dir = docsView(Seq(
      (1L, "w", "a"),           // 1 tok  -> cap 1, waste 0
      (2L, "a b", "a"),         // 2      -> cap 2, waste 0
      (3L, "a b c", "a"),       // 3      -> cap 4, waste 1
      (4L, "a b c d", "a"),     // 4      -> cap 4, waste 0
      (5L, "a b c d e", "a")))  // 5      -> cap 8, waste 3
    val got = entry("p7_length_buckets").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 0L, 0L),
      (2L, 1L, 2L, 0L, 0L),
      (4L, 2L, 7L, 1L, 125000L), // waste 1 over 2 docs * cap 4 = 8 slots
      (8L, 1L, 5L, 3L, 375000L)))
  }

  test("p8_epoch_shuffle: each epoch is a full permutation and " +
    "epochs decorrelate") {
    val docs = (1L to 40L).map(i => (i, s"text $i", "a"))
    val dir = docsView(docs)
    val rows = entry("p8_epoch_shuffle").run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    (0 to 1).foreach { e =>
      val mine = rows.filter(_._1 == e)
      // permutation: every doc exactly once across shards
      assert(mine.map(_._4).sorted.toSeq == (1L to 40L))
      // positions are 1..count within each shard, no gaps
      mine.groupBy(_._2).foreach { case (_, sh) =>
        assert(sh.map(_._3).sorted.toSeq == (1L to sh.length))
      }
    }
    // decorrelation: the (shard, pos) slot of docs differs across epochs
    val slot = rows.groupBy(r => (r._1, r._4)).view
      .mapValues(r => (r.head._2, r.head._3))
    val moved = (1L to 40L).count(d => slot((0, d)) != slot((1, d)))
    assert(moved > 30, s"only $moved of 40 docs moved between epochs")
    // determinism: a rerun lands every doc in the identical slot
    val again = entry("p8_epoch_shuffle").run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sorted.toSeq == rows.sorted.toSeq)
  }

  test("p6_cdc_chunk rollup reuses the window's doc-keyed exchange") {
    // HashPartitioning(doc_id) clusters (doc_id, chunk_id): the plan
    // must carry exactly ONE shuffle for window + rollup combined
    val dir = docsView(Seq((1L, (1 to 50).map("w" + _).mkString(" "), "a")))
    val plan = entry("p6_cdc_chunk").run(spark, dir)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 exchange, got $n:\n${plan.take(1500)}")
  }
}
