package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.ml.RelationalML
import graft.ops.Dedup

/** Property-based invariants (SURVEY §5.3) — scalacheck generators over
  * small in-memory frames; few cases per property (each runs Spark
  * jobs). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8).withWorkers(1)

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  private val wordsGen =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))

  test("cdc_chunks kernel: chunks rejoin to the exact text, boundaries " +
      "close chunks, all interior tokens non-boundary") {
    import spark.implicits._
    def isB(w: String) = graft.functions.PortableHash
      .md5wBytes(w.getBytes("UTF-8")) % 16 == 0
    // mod 16 rarely fires on a 6-word vocab; salt the generator with
    // KNOWN boundary words so chunk structure is actually exercised
    val bWords = (1 to 300).map(i => s"s$i").filter(isB).take(3)
    val tokGen = Gen.nonEmptyListOf(
      Gen.oneOf(Seq("a", "b", "cc", "ddd", "e", "f") ++ bWords))
    check(Prop.forAll(tokGen) { toks =>
      val text = toks.mkString(" ")
      val chunks = Seq(text).toDF("text")
        .select(graft.queries.CorpusOps.cdcChunks(spark, col("text")))
        .head().getSeq[String](0)
      // partition property: chunks joined with single spaces ARE the
      // input (nothing dropped, nothing reordered, separators intact)
      val rejoin = chunks.mkString(" ") == text
      // boundary property: every chunk's interior tokens are
      // non-boundary, and every chunk except possibly the last ENDS
      // on a boundary token (the boundary closes its chunk)
      val split = chunks.map(_.split(" ", -1).toSeq)
      val closed = split.dropRight(1).forall(c => isB(c.last)) &&
        split.forall(c => c.dropRight(1).forall(w => !isB(w)))
      rejoin && closed
    })
  }

  test("union is positional UNION ALL: counts always add") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-100L, 100L)),
        Gen.listOf(Gen.chooseNum(-100L, 100L))) { (xs, ys) =>
      val a = xs.toDF("v"); val b = ys.toDF("v")
      a.union(b).count() == xs.length + ys.length
    })
  }

  test("indexer fit is a bijection onto 0..n-1; unseen maps to null") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z", "w"))) {
      vals =>
        val df = vals.toDF("v")
        val fit = RelationalML.stringIndexerFit(df, "v").collect()
        val idxs = fit.map(_.getAs[Long]("idx")).sorted
        val bijective = idxs.sameElements(0L until vals.distinct.length.toLong)
        val unseen = RelationalML.stringIndexerTransform(
          Seq("NOPE").toDF("v"), "v",
          RelationalML.stringIndexerFit(df, "v"), "idx")
          .head().isNullAt(1)
        bijective && unseen
    })
  }

  test("scaling already-unit-variance data is an identity (tolerance)") {
    import spark.implicits._
    check(Prop.forAll(
        Gen.listOfN(8, Gen.chooseNum(-50.0, 50.0)).suchThat(xs =>
          xs.distinct.length > 1)) { xs =>
      val df = xs.toDF("x")
      val once = RelationalML.scalerTransform(df,
        RelationalML.scalerFit(df, Seq("x"))).select("x_scaled")
        .as[Double].collect().sorted
      val df2 = once.toSeq.toDF("x")
      val twice = RelationalML.scalerTransform(df2,
        RelationalML.scalerFit(df2, Seq("x"))).select("x_scaled")
        .as[Double].collect().sorted
      once.zip(twice).forall { case (a, b) => math.abs(a - b) < 1e-9 }
    })
  }

  test("exact dedup is idempotent and keeps one row per distinct text") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(wordsGen.map(_.mkString(" ")))) {
      texts =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val once = Dedup.exact(df, "text", "doc_id")
        once.count() == texts.distinct.length &&
          Dedup.exact(once, "text", "doc_id").count() == once.count()
    })
  }

  test("jaccard pairs are symmetric-free (d1 < d2) and within [t, 1]") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(6, wordsGen.map(_.mkString(" ")))) {
      texts =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "b") }
          .toDF("doc_id", "text", "source")
        val sets = Dedup.tokenSets(df, "text", "doc_id", "source")
        val pairs = Dedup.jaccardPairs(sets, "doc_id", "source", 0.3)
          .collect()
        pairs.forall { r =>
          r.getLong(0) < r.getLong(1) &&
            r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0
        }
    })
  }

  test("containment pairs: cont_e4 in [9000, 10000], ordered, and " +
      "implied by any jaccard pair at the same threshold") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(6, wordsGen.map(_.mkString(" ")))) {
      texts =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "b") }
          .toDF("doc_id", "text", "source")
        val sets = Dedup.tokenSets(df, "text", "doc_id", "source")
        val cont = Dedup.containmentPairs(sets, "doc_id", "source", 0.9)
          .collect()
        val contKeys = cont.map(r => (r.getLong(0), r.getLong(1))).toSet
        // J(A,B) >= t implies c/min >= t (c/min >= c/(|A|+|B|-c) = J)
        val jac = Dedup.jaccardPairs(sets, "doc_id", "source", 0.9)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        cont.forall { r =>
          r.getLong(0) < r.getLong(1) &&
            r.getLong(2) >= 9000L && r.getLong(2) <= 10000L
        } && jac.forall(contKeys.contains)
    })
  }

  test("skyline sweep equals the quadratic dominance definition") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(
        Gen.zip(Gen.chooseNum(0, 20), Gen.chooseNum(0, 20)))) { pts0 =>
      val pts = pts0.map { case (p, sz) => (p.toDouble, sz.toLong) }
      // reference: a distinct point survives iff nothing dominates it
      val d = pts.distinct
      val want = d.filter(p => !d.exists(q =>
        q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2)))
        .sorted
      // exercise the PRODUCTION sweep (the q52 path), small bucket count
      // so multi-point buckets actually occur at test sizes
      val out = graft.ops.Skyline.frontier(
          pts.toDF("price", "size"), "price", "size", buckets = 4)
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toList.sorted
      out == want
    })
  }

  test("fused simhash kernel equals the exploded portable form on random docs") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(wordsGen.map(_.mkString(" ")))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") }
        .toDF("doc_id", "text", "source")
      val exploded = Dedup.simhashPortable(
          Dedup.tokenSets(df, "text", "doc_id", "source"), "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fused = Dedup.simhashPortableFused(df, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      fused == exploded
    })
  }

  test("ordered_pairs equals the nested-lambda HOF on random long arrays") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-5L, 5L))) { vs =>
      val df = Seq(Tuple1(vs)).toDF("vs")
      val hof = df.select(expr(
        """flatten(transform(vs, (x, i) ->
          |  transform(slice(vs, i + 2, size(vs)),
          |            y -> struct(x AS u, y AS w))))""".stripMargin))
        .head().getSeq[org.apache.spark.sql.Row](0)
      val fused = df.select(
          graft.functions.TokenKernelFns.orderedPairs(spark, col("vs")))
        .head().getSeq[org.apache.spark.sql.Row](0)
      fused == hof
    })
  }

  test("ngram_xx64_set equals the gramsOf+xxhash64 HOF on random docs") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "d", "")),
        Gen.chooseNum(1, 4)) { (toks, n) =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val hof = df.select(transform(
          array_distinct(transform(
            sequence(lit(0), greatest(size(col("t")) - n, lit(0))),
            i => concat_ws(" ", slice(col("t"), i + 1, lit(n))))),
          g => xxhash64(g)))
        .head().getSeq[Long](0)
      val fused = df.select(graft.functions.TokenKernelFns
          .ngramXx64Set(spark, col("t"), n))
        .head().getSeq[Long](0)
      fused == hof
    })
  }

  test("adjacent_str_pairs equals BpeTrain.adjacentPairs on random docs") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOf(Gen.oneOf("a", "bb", "c", ""))) { toks =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val hof = df.select(graft.ops.BpeTrain.adjacentPairs(col("t")))
        .head().getSeq[org.apache.spark.sql.Row](0)
      val fused = df.select(graft.functions.TokenKernelFns
          .adjacentStrPairs(spark, col("t")))
        .head().getSeq[org.apache.spark.sql.Row](0)
      fused == hof
    })
  }

  test("quality-count kernel equals the built-in forms on random text") {
    import spark.implicits._
    // char palette stresses every branch: alnum, space runs, symbols,
    // tab/newline, non-ASCII, stopwords
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar), (3, Gen.const(' ')), (1, Gen.const('\t')),
      (1, Gen.const('\n')), (1, Gen.const(',')), (1, Gen.const('é')),
      (1, Gen.const('の')))
    val textGen = Gen.frequency(
      (4, Gen.listOf(charGen).map(_.mkString)),
      (1, Gen.const("the a an of to in and is it that")),
      (1, Gen.const("")))
    check(Prop.forAll(textGen) { txt =>
      val df = Seq((1L, txt)).toDF("id", "text")
      val t = col("text")
      val toks = split(t, " ")
      val legacy = df.select(
          size(toks).cast("long"),
          size(filter(toks, x => x.isInCollection(Seq("the", "a", "an",
            "of", "to", "in", "and", "is", "it", "that")))).cast("long"),
          size(regexp_extract_all(t, lit("[^A-Za-z0-9 ]"), lit(0)))
            .cast("long"),
          length(t).cast("long"),
          size(array_distinct(toks)).cast("long"))
        .head().toSeq
      val qc = graft.functions.TokenKernelFns.textQualityCounts(spark, t)
      val fused = df.select(qc.getField("n_tok"), qc.getField("n_stop"),
          qc.getField("n_sym"), qc.getField("n_char"),
          qc.getField("n_distinct"))
        .head().toSeq
      fused == legacy
    })
  }

  test("asofJoin equals per-row latest-at-or-before on random series") {
    import spark.implicits._
    import graft.ops.AsOf
    // keys 1..3, epoch seconds in a small range so cross-key misses,
    // exact-tie lookups (ASOF >= semantics: a state change at exactly
    // t is visible at t), DUPLICATE right timestamps per key (the
    // tie-break: among right rows tied on ts, the max value tuple
    // wins — round-13 review fix; before it these inputs were
    // nondeterministic and the generator had to dedupe them away),
    // and no-match-yet rows all occur.
    val evGen = for {
      k <- Gen.chooseNum(1L, 3L)
      s <- Gen.chooseNum(0L, 30L)
    } yield (k, s)
    check(Prop.forAll(Gen.nonEmptyListOf(evGen),
        Gen.nonEmptyListOf(evGen)) { (ls, rsRaw) =>
      val rs = rsRaw.zipWithIndex
        .map { case ((k, s), i) => (k, s, 1000L + i) }
      val left = ls.zipWithIndex.map { case ((k, s), i) =>
        (k, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)),
          i.toLong) }.toDF("k", "ts", "lid")
      val right = rs.map { case (k, s, v) =>
        (k, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)), v)
      }.toDF("k", "ts", "v")
      val want = ls.zipWithIndex.map { case ((lk, lts), li) =>
        val cands = rs.filter { case (rk, rts, _) => rk == lk && rts <= lts }
        (li.toLong,
          // latest ts wins; among tied ts, the max value — the
          // operator's pinned deterministic rule
          if (cands.isEmpty) None
          else Some(cands.maxBy(c => (c._2, c._3))._3))
      }.sorted
      val got = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
        .select(col("lid"), col("asof_v"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sorted
      got == want
    })
  }

  test("bandJoin equals the naive band predicate on random series") {
    import spark.implicits._
    import graft.ops.RangeJoin
    // band W=7 with timestamps in [0, 30]: bin-boundary-exact rows,
    // r.ts == l.ts - W (included) and r.ts == l.ts (excluded, strictly
    // before) all occur; pairs must come out exactly once even when
    // left and right share a timestamp grid
    val evGen = for {
      k <- Gen.chooseNum(1L, 2L)
      s <- Gen.chooseNum(0L, 30L)
    } yield (k, s)
    check(Prop.forAll(Gen.nonEmptyListOf(evGen),
        Gen.nonEmptyListOf(evGen)) { (ls, rs) =>
      def t(s: Long) =
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
      val left = ls.zipWithIndex.map { case ((k, s), i) =>
        (k, t(s), i.toLong) }.toDF("k", "ts", "lid")
      val right = rs.zipWithIndex.map { case ((k, s), i) =>
        (k, t(s), i.toLong) }.toDF("k", "ts", "rid")
      val want = (for {
        ((lk, lts), li) <- ls.zipWithIndex
        ((rk, rts), ri) <- rs.zipWithIndex
        if lk == rk && rts >= lts - 7L && rts < lts
      } yield (li.toLong, ri.toLong)).sorted
      val got = RangeJoin.bandJoin(left, right, "k", "ts", 7L, Seq("rid"))
        .select(col("lid"), col("r_rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      got == want
    })
  }

  test("nextFitPack equals the sequential next-fit fold on random docs") {
    import spark.implicits._
    import graft.ops.Packing
    // token counts up to cap+4: oversized docs (tk > cap) must land in
    // singleton bins exactly where the sequential fold puts them;
    // multiple shards reset bin ids independently; assignment must not
    // depend on the 3-way input repartition
    val cap = 10L
    val docGen = for {
      src <- Gen.oneOf("a", "b")
      tk <- Gen.chooseNum(1L, cap + 4L)
    } yield (src, tk)
    check(Prop.forAll(Gen.nonEmptyListOf(docGen)) { docs =>
      val rows = docs.zipWithIndex.map { case ((src, tk), i) =>
        (src, i.toLong, tk) }
      val want = rows.groupBy(_._1).flatMap { case (_, shard) =>
        var bin = 0L; var fill = 0L
        shard.sortBy(_._2).map { case (src, id, tk) =>
          if (fill > 0 && fill + tk > cap) { bin += 1; fill = 0 }
          fill += tk
          (src, id) -> bin
        }
      }.toMap
      val got = Packing.nextFitPack(spark,
          rows.toDF("src", "id", "tk").repartition(3),
          "src", "id", "tk", cap)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
        .toMap
      got == want
    })
  }

  test("x33 percentiles equal the competition-rank reference on " +
    "random corpora") {
    import spark.implicits._
    // doc lengths 1..30 with heavy tie probability; 1-3 sources so
    // singleton sources occur
    val docsGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1, 30), Gen.oneOf("s0", "s1", "s2")))
    check(Prop.forAll(docsGen) { specs =>
      val docs = specs.zipWithIndex.map { case ((len, src), i) =>
        (i.toLong, "x" * len, src)
      }
      val dir = java.nio.file.Files
        .createTempDirectory("x33prop").toString
      docs.toDF("doc_id", "text", "source")
        .selectExpr("doc_id", "text", "'en' AS lang", "source",
          "CAST(length(text) AS BIGINT) AS n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val want = docs.groupBy(_._3).flatMap { case (_, ds) =>
        val lens = ds.map(_._2.length.toLong)
        val n = ds.length.toLong
        ds.map { case (id, text, _) =>
          val rk = lens.count(_ < text.length) + 1L
          val p = if (n > 1) 1000000L * (rk - 1) / (n - 1) else 1000000L
          id -> ((p, if (p >= 100000L) 1 else 0))
        }
      }.toMap
      val got = graft.queries.Registry.all
        .find(_.name == "x33_score_norm").get.run(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getInt(4)))).toMap
      got == want
    })
  }

  test("x35 winsorization equals the sort-based brute force on " +
    "random corpora") {
    import spark.implicits._
    // lengths with heavy ties; 1-3 sources so tiny/singleton sources
    // exercise the nearest-rank edge (ceil(q*n) = 1 when n is small)
    val docsGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1, 25), Gen.oneOf("s0", "s1", "s2")))
    check(Prop.forAll(docsGen) { specs =>
      val docs = specs.zipWithIndex.map { case ((len, src), i) =>
        (i.toLong, "x" * len, src)
      }
      val dir = java.nio.file.Files
        .createTempDirectory("x35prop").toString
      docs.toDF("doc_id", "text", "source")
        .selectExpr("doc_id", "text", "'en' AS lang", "source",
          "CAST(length(text) AS BIGINT) AS n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val want = docs.groupBy(_._3).map { case (src, ds) =>
        // brute force: sort (len, id), nearest-rank bound = element at
        // index ceil(q*n) - 1, then clip and count
        val sorted = ds.map(d => (d._2.length.toLong, d._1)).sorted
        val n = sorted.length.toLong
        def bound(q: Long) =
          sorted(((q * n + 99) / 100 - 1).toInt)._1
        val (p05, p95) = (bound(5), bound(95))
        val lens = ds.map(_._2.length.toLong)
        src -> ((p05, p95, n, lens.count(_ < p05).toLong,
          lens.count(_ > p95).toLong,
          lens.map(v => math.max(math.min(v, p95), p05)).sum))
      }
      val got = graft.queries.Registry.all
        .find(_.name == "x35_winsorize").get.run(spark, dir)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
        .toMap
      got == want
    })
  }

  test("x36 semantic decontam equals the quantized brute force on " +
    "random embeddings") {
    import spark.implicits._
    // dim-8 vectors with components in [-0.5, 0.5] (the fixture range);
    // the entry's lambdas are dimension-agnostic
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-500, 500))
    check(Prop.forAll(Gen.listOfN(3, vecGen), Gen.nonEmptyListOf(vecGen)) {
      (evs, corp) =>
        val all = evs.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
          corp.zipWithIndex.map { case (v, i) => ((25 + i).toLong, v) }
        val dir = java.nio.file.Files
          .createTempDirectory("x36prop").toString
        all.map { case (id, v) => (id, v.map(_ / 1000f).toArray, 0) }
          .toDF("vec_id", "embedding", "label")
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        // brute force replicating the entry's arithmetic chain exactly:
        // float -> double -> *1000 -> HALF_UP round (Spark's Round on
        // doubles), integer dot/norms, one double divide per pair
        def quant(v: List[Int]): List[Long] = v.map { k =>
          java.math.BigDecimal.valueOf((k / 1000f).toDouble * 1000)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue
        }
        def n2(q: List[Long]) = q.map(x => x * x).sum
        val evq = evs.zipWithIndex.map { case (v, i) =>
          (i.toLong, quant(v))
        }
        val want = corp.zipWithIndex.flatMap { case (v, i) =>
          val qv = quant(v); val na2 = n2(qv)
          val hits = evq.map { case (eid, qe) =>
            val dp = qv.zip(qe).map { case (x, y) => x * y }.sum
            (eid, dp, n2(qe))
          }.filter { case (_, dp, nb2) =>
            dp > 0 &&
              dp.toDouble * dp.toDouble >= 9e-2 * (na2.toDouble * nb2.toDouble)
          }
          if (hits.isEmpty) None else {
            val (eid, dp, nb2) = hits.maxBy { case (eid, dp, nb2) =>
              (dp.toDouble * dp.toDouble / (na2.toDouble * nb2.toDouble),
                -eid)
            }
            val c = dp.toDouble * dp.toDouble / (na2.toDouble * nb2.toDouble)
            Some(((25 + i).toLong, (hits.size.toLong,
              java.math.BigDecimal.valueOf(math.sqrt(c) * 10000)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue,
              eid)))
          }
        }.toMap
        val got = graft.queries.Registry.all
          .find(_.name == "x36_semantic_decontam").get.run(spark, dir)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
            r.getLong(3))))
          .toMap
        got == want
    })
  }

  test("x37 stratified sample: k rows per stratum, dense ranks, " +
    "deterministic") {
    import spark.implicits._
    val docsGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1, 40), Gen.oneOf("s0", "s1", "s2")))
    check(Prop.forAll(docsGen) { specs =>
      val docs = specs.zipWithIndex.map { case ((len, src), i) =>
        (i.toLong, s"d$i" + "x" * len, src)
      }
      val dir = java.nio.file.Files
        .createTempDirectory("x37prop").toString
      docs.toDF("doc_id", "text", "source")
        .selectExpr("doc_id", "text", "'en' AS lang", "source",
          "CAST(length(text) AS BIGINT) AS n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val entry = graft.queries.Registry.all
        .find(_.name == "x37_group_sample").get
      def run() = entry.run(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val got = run()
      val bySrc = docs.groupBy(_._3)
      val sized = got.groupBy(_._1).forall { case (src, rows) =>
        rows.length == math.min(3, bySrc(src).length) &&
          rows.map(_._2).sorted.sameElements(1L to rows.length.toLong) &&
          rows.forall(r => bySrc(src).exists(_._1 == r._3))
      } && got.map(_._1).distinct.length == bySrc.size
      sized && run().sameElements(got)
    })
  }

  test("x38 KS drift equals the grid brute force on random corpora") {
    import spark.implicits._
    val docsGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1, 200), Gen.oneOf("s0", "s1", "s2")))
    check(Prop.forAll(docsGen) { specs =>
      val docs = specs.zipWithIndex.map { case ((len, src), i) =>
        (i.toLong, "x" * len, src)
      }
      val dir = java.nio.file.Files
        .createTempDirectory("x38prop").toString
      docs.toDF("doc_id", "text", "source")
        .selectExpr("doc_id", "text", "'en' AS lang", "source",
          "CAST(length(text) AS BIGINT) AS n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val bySrc = specs.groupBy(_._2)
      val srcs = bySrc.keys.toList.sorted
      val buckets = specs.map(_._1.toLong / 32).distinct.sorted
      def cum(src: String): List[Long] = {
        val bs = bySrc(src).map(_._1.toLong / 32)
        buckets.map(b => bs.count(_ <= b).toLong)
      }
      val want = (for { a <- srcs; b <- srcs if a < b } yield {
        val na = bySrc(a).length.toLong; val nb = bySrc(b).length.toLong
        val d = cum(a).zip(cum(b))
          .map { case (x, y) => (x * nb - y * na).abs }.max
        (a, b, na, nb, 1000000L * d / (na * nb))
      }).toSet
      val got = graft.queries.Registry.all
        .find(_.name == "x38_ks_drift").get.run(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      got == want
    })
  }

  test("x39 vocab overlap equals the set brute force on random corpora") {
    import spark.implicits._
    // few-word alphabet so vocabularies overlap heavily and ties/full
    // containment both occur
    val docGen = Gen.nonEmptyListOf(Gen.oneOf("a", "bb", "ccc", "d", "ee"))
    val docsGen = Gen.nonEmptyListOf(Gen.zip(
      docGen, Gen.oneOf("s0", "s1", "s2")))
    check(Prop.forAll(docsGen) { specs =>
      val docs = specs.zipWithIndex.map { case ((ws, src), i) =>
        (i.toLong, ws.mkString(" "), src)
      }
      val dir = java.nio.file.Files
        .createTempDirectory("x39prop").toString
      docs.toDF("doc_id", "text", "source")
        .selectExpr("doc_id", "text", "'en' AS lang", "source",
          "CAST(length(text) AS BIGINT) AS n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val vocab = specs.groupBy(_._2).view
        .mapValues(_.flatMap(_._1).toSet).toMap
      val srcs = vocab.keys.toList.sorted
      val want = (for {
        a <- srcs; b <- srcs if a < b
        sh = (vocab(a) & vocab(b)).size.toLong if sh > 0
      } yield {
        val (na, nb) = (vocab(a).size.toLong, vocab(b).size.toLong)
        (a, b, na, nb, sh, 1000000L * sh / (na + nb - sh),
          1000000L * sh / math.min(na, nb))
      }).toSet
      val got = graft.queries.Registry.all
        .find(_.name == "x39_vocab_overlap").get.run(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .toSet
      got == want
    })
  }

  test("q71 chi-square equals the full-grid integer brute force on " +
    "random contingency tables") {
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("s0", "s1", "s2"), Gen.oneOf("en", "de", "fr", "zh")))
    check(Prop.forAll(rowsGen) { pairs =>
      val docs = pairs.zipWithIndex.map { case ((src, lg), i) =>
        (i.toLong, s"t$i", lg, src)
      }
      val dir = java.nio.file.Files
        .createTempDirectory("q71prop").toString
      docs.toDF("doc_id", "text", "lang", "source")
        .selectExpr("doc_id", "text", "lang", "source",
          "CAST(length(text) AS BIGINT) AS n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val srcs = pairs.map(_._1).distinct
      val langs = pairs.map(_._2).distinct
      val cont = pairs.groupBy(identity).view.mapValues(_.size.toLong)
      val rT = pairs.groupBy(_._1).view.mapValues(_.size.toLong)
      val cT = pairs.groupBy(_._2).view.mapValues(_.size.toLong)
      val n = pairs.length.toLong
      val chi = (for (s <- srcs; l <- langs) yield {
        val o = cont.getOrElse((s, l), 0L)
        val d = o * n - rT(s) * cT(l)
        10000L * d * d / (rT(s) * cT(l) * n)
      }).sum
      val r = graft.queries.Registry.all
        .find(_.name == "q71_chi2").get.run(spark, dir).head()
      r.getLong(0) == chi &&
        r.getLong(1) == (srcs.length - 1).toLong * (langs.length - 1) &&
        r.getLong(2) == n
    })
  }

  test("p8 epoch shuffle is a per-epoch permutation at any corpus size") {
    import spark.implicits._
    check(Prop.forAll(Gen.chooseNum(1, 60)) { nDocs =>
      val docs = (0 until nDocs).map(i => (i.toLong, s"t$i"))
      val dir = java.nio.file.Files
        .createTempDirectory("p8prop").toString
      docs.toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
          "CAST(length(text) AS BIGINT) AS n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = graft.queries.Registry.all
        .find(_.name == "p8_epoch_shuffle").get.run(spark, dir)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      (0 to 1).forall { e =>
        val mine = rows.filter(_._1 == e)
        mine.map(_._4).sorted.toSeq == (0L until nDocs.toLong) &&
          mine.groupBy(_._2).values.forall(sh =>
            sh.map(_._3).sorted.toSeq == (1L to sh.length))
      }
    })
  }

  test("Misra-Gries holds its bound on random streams and capacities") {
    import spark.implicits._
    val streamGen = Gen.nonEmptyListOf(
      Gen.frequency(5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
        2 -> Gen.oneOf((1 to 20).map(i => s"c$i"))))
    check(Prop.forAll(streamGen, Gen.chooseNum(1, 6),
        Gen.chooseNum(1, 5)) { (xs, cap, parts) =>
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = xs.length.toDouble / (cap + 1)
      val out = xs.toDF("x").repartition(parts)
        .agg(graft.functions.MisraGriesAgg.mgSummary(spark, col("x"), cap))
        .head().getSeq[org.apache.spark.sql.Row](0)
      val got = out.map(r => r.getString(0) -> r.getLong(1)).toMap
      got.size <= cap &&
        got.forall { case (k, est) =>
          est <= exact(k) && est >= exact(k) - bound } &&
        exact.forall { case (k, c) => c <= bound || got.contains(k) }
    })
  }

  // reference CDC fold (the CorpusOpsSpec helper): boundary token
  // (md5w % 16 == 0) CLOSES its chunk
  private def cdcFold(text: String): Seq[String] = {
    val words = text.split(" ").toSeq
    words.foldLeft((Vector.empty[Vector[String]], Vector.empty[String])) {
      case ((done, cur), w) =>
        val nxt = cur :+ w
        if (graft.functions.PortableHash
          .md5wBytes(w.getBytes("UTF-8")) % 16 == 0) (done :+ nxt, Vector())
        else (done, nxt)
    } match {
      case (done, cur) => (done ++ (if (cur.nonEmpty) Seq(cur) else Nil))
        .map(_.mkString(" "))
    }
  }

  test("span scrub equals the set-theoretic brute force on random " +
      "dup-heavy corpora (ownership, stitching, scrub counts)") {
    import spark.implicits._
    def isB(w: String) = graft.functions.PortableHash
      .md5wBytes(w.getBytes("UTF-8")) % 16 == 0
    val bWords = (1 to 300).map(i => s"s$i").filter(isB).take(3)
    // tiny salted vocab => heavy cross-doc chunk collisions, within-doc
    // repeats, and occasionally fully-scrubbed docs
    val docGen = Gen.nonEmptyListOf(
      Gen.oneOf(Seq("a", "b", "cc", "e") ++ bWords)).map(_.mkString(" "))
    check(Prop.forAll(Gen.chooseNum(2, 7).flatMap(n =>
        Gen.listOfN(n, docGen))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val occ = docs.flatMap { case (id, t) =>
        cdcFold(t).zipWithIndex.map { case (c, i) => (id, i.toLong, c) } }
      val byContent = occ.groupBy(_._3)
      val dup = byContent.filter(_._2.map(_._1).distinct.size >= 2).keySet
      val owner = byContent.view.filterKeys(dup)
        .mapValues(_.map(o => (o._1, o._2)).min).toMap
      val want = docs.map { case (id, t) =>
        val ch = cdcFold(t).zipWithIndex
        val (kept, dropped) = ch.partition { case (c, i) =>
          !dup(c) || owner(c) == ((id, i.toLong)) }
        id -> ((kept.map(_._1).mkString(" "),
          dropped.map(_._1.split(" ").length.toLong).sum))
      }.toMap
      val got = Dedup.scrubDupSpans(
          docs.toDF("doc_id", "text"), "text", "doc_id")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      got == want
    })
  }

  test("near-dup gate batch twin equals the per-bucket brute force " +
      "(portable signature family re-derived locally)") {
    import spark.implicits._
    import graft.functions.PortableHash
    val k = 32
    val bands = 8
    val r = k / bands
    def sigOf(text: String): IndexedSeq[Long] = {
      val ws = text.split(" ").distinct.toIndexedSeq
        .map(w => PortableHash.md5wBytes(w.getBytes("UTF-8")) % PortableHash.M)
      (0 until k).map(i =>
        ws.map(w => (PortableHash.a(i) * w + PortableHash.b(i))
          % PortableHash.P).min)
    }
    def bucketsOf(sig: IndexedSeq[Long]): IndexedSeq[Long] =
      (0 until bands).map(b =>
        sig.slice(b * r, b * r + r)
          .foldLeft(0L)((acc, x) => (acc * 1000003L + x) % 1000000007L))
    // overlapping word pools => real near-dups AND real non-matches
    val docGen = Gen.nonEmptyListOf(
      Gen.oneOf("a", "b", "cc", "e", "zz", "q")).map(_.mkString(" "))
    check(Prop.forAll(Gen.chooseNum(2, 6).flatMap(n =>
        Gen.listOfN(n, docGen))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val sigs = docs.map { case (id, t) => id -> sigOf(t) }.toMap
      val rows = docs.flatMap { case (id, t) =>
        bucketsOf(sigs(id)).zipWithIndex.map { case (bk, b) =>
          (b.toLong, bk, id) } }
      val want = rows.groupBy(x => (x._1, x._2)).toSeq.flatMap {
        case ((band, _), members) =>
          val keeper = members.map(_._3).min
          members.map(_._3).distinct.filter(_ != keeper).flatMap { d =>
            val eq = sigs(keeper).zip(sigs(d)).count(p => p._1 == p._2)
            val est = 1000000L * eq / k
            if (est >= 500000L) Some((keeper, d, band, est)) else None
          }
      }.sorted
      val got = graft.streaming.NearDupGate.batchVerdicts(
          docs.toDF("doc_id", "text"), "text", "doc_id")
        .collect()
        .map(v => (v.getLong(0), v.getLong(1), v.getLong(2), v.getLong(3)))
        .toSeq.sorted
      got == want
    })
  }
}
