package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.ops.PageRank
import graft.queries.GraphLayout

/** Hand-computed checks for the round-5 graph/layout operators: the
  * DuckDB gate proves cross-engine parity; these prove the semantics
  * (the exact-integer PageRank recurrence, the Morton bit interleave)
  * are the intended ones on inputs small enough to verify by hand.
  */
class GraphLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def entry(name: String) =
    GraphLayout.entries.find(_.name == name).get

  test("PageRank.run: 3 exact-integer iterations on a hand-traced graph") {
    // 1 -> 3, 2 -> 3, 3 -> 4, 5 -> 3, 5 -> 4  (outdeg: 1,2,3 = 1; 5 = 2)
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L), (5L, 3L), (5L, 4L))
      .toDF("src", "dst")
    val got = PageRank.run(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sources never receive mass: base only
    assert(got(1L) == 150000L && got(2L) == 150000L && got(5L) == 150000L)
    // node 3 reaches its fixpoint under constant feeders:
    // sum = 150000 + 150000 + 150000 div 2 = 375000
    // r = 150000 + (85 * 375000) div 100 = 468750
    assert(got(3L) == 468750L)
    // node 4 at step 3: sum = r2(3) + r2(5) div 2 = 468750 + 75000
    // r = 150000 + floor(85 * 543750 / 100) = 150000 + 462187  (the
    // .5 the floor drops is the integer-arithmetic contract in action)
    assert(got(4L) == 612187L)
  }

  test("PageRank.run: zero iterations returns the uniform base scale") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = PageRank.run(edges, iters = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("PageRank.run: an empty edge frame yields an empty rank frame") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.run(edges, iters = 3).collect().isEmpty)
  }

  private def lineitemDir(rows: Seq[(Long, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graphlayout").toString
    rows.toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q48_zorder: Morton interleave routes known keys to known buckets") {
    // bucket = z >> 15; z bits: x on even positions, y on odd.
    //  (0, 0)       -> z 0        -> bucket 0
    //  (0, 128)     -> y bit7 -> z bit15         -> bucket 1
    //  (512, 0)     -> x bit9 -> z bit18         -> bucket 8
    //  (512, 128)   -> bits 18+15               -> bucket 9
    //  (1023, 1023) -> z = 2^20 - 1              -> bucket 31
    val dir = lineitemDir(Seq((0L, 0L), (0L, 128L), (512L, 0L),
      (512L, 128L), (1023L, 1023L)))
    val got = entry("q48_zorder").run(spark, dir).collect().toSeq
    assert(got == Seq(
      Row(0L, 1L, 0L, 0L, 0L, 0L),
      Row(1L, 1L, 0L, 0L, 128L, 128L),
      Row(8L, 1L, 512L, 512L, 0L, 0L),
      Row(9L, 1L, 512L, 512L, 128L, 128L),
      Row(31L, 1L, 1023L, 1023L, 1023L, 1023L)))
  }

  test("q48_zorder: per-bucket bounding boxes are curve-bounded at sf0.001") {
    // top-5 z-bits fix x bits 8-9 and y bits 7-9: any bucket's bounding
    // box spans at most 256 in x and 128 in y — the data-skipping
    // property the layout exists for.
    val out = entry("q48_zorder").run(spark, TestSpark.sf0001).collect()
    val n = out.map(_.getLong(1)).sum
    val total = spark.read
      .parquet(s"${TestSpark.sf0001}/lineitem.parquet").count()
    assert(n == total)
    out.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 255L,
        s"x spread too wide in bucket ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) <= 127L,
        s"y spread too wide in bucket ${r.getLong(0)}")
    }
  }

  test("q45_pagerank: mass flows up the link hierarchy at sf0.001") {
    val out = entry("q45_pagerank").run(spark, TestSpark.sf0001).collect()
    val byLevel = out.groupBy(r => r.getLong(0) % 4)
      .map { case (lvl, rs) => lvl -> rs.map(_.getLong(1)) }
    // customers (tag 0) never receive an edge: all at the base 150000
    assert(byLevel(0L).forall(_ == 150000L))
    // every non-source level receives mass (avg above base). Which
    // level holds the MAX depends on where the initial-mass pulse sits
    // at the cutoff iteration (it travels one hop per step), so that is
    // deliberately not asserted — exact values are the oracle's job.
    def avg(xs: Array[Long]) = xs.sum.toDouble / xs.length
    assert(avg(byLevel(1L)) > 150000L)
    assert(avg(byLevel(2L)) > 150000L)
    assert(avg(byLevel(3L)) > 150000L)
  }

  test("zOrder column equals a reference Morton interleave on random keys") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.functions.col
    def ref(x: Long, y: Long): Long =
      (0 until 10).map(j =>
        (((x >> j) & 1L) << (2 * j)) + (((y >> j) & 1L) << (2 * j + 1))).sum
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(8).withWorkers(1)
    val xyGen = Gen.zip(Gen.chooseNum(0L, 1023L), Gen.chooseNum(0L, 1023L))
    val r = SCTest.check(params, Prop.forAll(Gen.nonEmptyListOf(xyGen)) {
      pts =>
        val got = pts.toDF("x", "y")
          .select(GraphLayout.zOrder(col("x"), col("y")).as("z"))
          .collect().map(_.getLong(0)).toSeq
        got == pts.map { case (x, y) => ref(x, y) }
    })
    assert(r.passed, r.status.toString)
  }

  test("triangleCensus equals the quadratic brute force on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // Random DIRECTED preference lists over <= 8 vertices: mirrored
    // picks (both endpoints list each other — collect_set must dedup),
    // one-sided picks, and duplicate rows all occur. The operator's
    // domain is loop-free lists (u != w), which the q51 pair pipeline
    // guarantees by construction (u < w before mirroring).
    val edgeGen = for {
      u <- Gen.chooseNum(1L, 8L)
      d <- Gen.chooseNum(1L, 7L)
    } yield (u, (u + d - 1L) % 8L + 1L) // w != u, uniform over the rest
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(8).withWorkers(1)
    val r = SCTest.check(params, Prop.forAll(Gen.nonEmptyListOf(edgeGen)) {
      ds =>
        val undirected = ds.map { case (u, w) =>
          (math.min(u, w), math.max(u, w)) }.toSet
        val nEdges = undirected.size.toLong
        val deg = undirected.toSeq.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (_, vs) => vs.size.toLong }
        val nWedges = deg.map(d => d * (d - 1) / 2).sum
        val nTri = (for {
          (a, b) <- undirected; (b2, c) <- undirected
          if b2 == b && undirected.contains((a, c))
        } yield (a, b, c)).size.toLong
        val gcc = 3000000L * nTri / math.max(nWedges, 1L)
        val got = GraphLayout.triangleCensus(spark,
          ds.toDF("u", "w")).head()
        spark.catalog.clearCache()
        (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
          ((nEdges, nWedges, nTri, gcc))
    })
    assert(r.passed, r.status.toString)
  }
}
