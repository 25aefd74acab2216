package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.KMeans

/** Exact-integer k-means semantics: correct partition on separated
  * blobs, deterministic (distance, centroid-id) tie-break, empty-cluster
  * centroid carry, and the quantization widening contract.
  */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("id", "vec")

  test("separates two obvious blobs and converges") {
    // blob A around (0, 0, ...), blob B around (10, 10, ...); ids
    // interleaved so init (2 smallest ids) seeds one centroid per blob
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      val jit = (i % 5) * 0.01f
      (i.toLong, Seq.fill(4)(base + jit))
    }
    val (cents, assign) = KMeans.fit(vecs(rows), "vec", "id", k = 2,
      iters = 3)
    val out = assign.orderBy("id").collect()
    val clusters = out.map(r => (r.getLong(0), r.getInt(1))).toMap
    // even ids (blob A) together, odd ids (blob B) together
    assert((0 until 20 by 2).map(i => clusters(i.toLong)).distinct.size == 1)
    assert((1 until 20 by 2).map(i => clusters(i.toLong)).distinct.size == 1)
    assert(clusters(0L) != clusters(1L))
    // converged centroids sit near the blob means (quantized 1e4 scale)
    val a = cents(clusters(0L).toInt)
    assert(math.abs(a.head - 200L) < 500, s"blob-A centroid: ${a.head}")
    val b = cents(clusters(1L).toInt)
    assert(math.abs(b.head - 100200L) < 500, s"blob-B centroid: ${b.head}")
  }

  test("tie-break assigns to the smallest centroid id") {
    // two identical init vectors (ids 0, 1) -> identical centroids;
    // every point ties and must land on centroid 0
    val rows = Seq((0L, Seq(1.0f, 1.0f)), (1L, Seq(1.0f, 1.0f)),
      (2L, Seq(1.5f, 1.5f)), (3L, Seq(0.5f, 0.5f)))
    val (_, assign) = KMeans.fit(vecs(rows), "vec", "id", k = 2,
      iters = 1)
    assert(assign.select("cluster").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(0))
  }

  test("empty clusters keep their previous centroid") {
    // centroid 1 inits on an outlier id but every point sits at the
    // origin: after one update cluster 1 is empty and must keep its
    // init coordinates rather than NaN/collapse
    val rows = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(100.0f, 100.0f)),
      (2L, Seq(0.1f, 0.1f)), (3L, Seq(0.2f, 0.1f)))
    val (cents, _) = KMeans.fit(vecs(rows), "vec", "id", k = 2,
      iters = 3)
    // cluster 1 seeded from id=1 at (100, 100): only id=1 is ever
    // nearer to it, so it stays pinned there
    assert(cents(1).head == 1000000L, s"centroid 1 drifted: ${cents(1)}")
  }

  test("quantize widens float to double before scaling") {
    // a float whose f32*10000 product rounds ABOVE the integer while
    // the exact f64 product sits below it: float math floors to n+1,
    // double math to n — the engine/oracle divergence the widening
    // exists to prevent (KMeans.quantize doc)
    val x = 0.005f // f32 product 50.0 exactly; f64 product 49.999...
    val viaFloat = math.floor((x * 10000.0f).toDouble).toLong
    val viaDouble = math.floor(x.toDouble * 10000.0).toLong
    assume(viaFloat != viaDouble, "fixture no longer straddles the ulp")
    val q = vecs(Seq((0L, Seq(x))))
      .select(KMeans.quantize(col("vec"), 10000).as("v"))
      .head().getSeq[Long](0)
    assert(q.head == viaDouble, s"quantize used float math: $q")
  }

  test("fused kmeans_assign matches the composed vec_dist2 argmin form") {
    // real fixture embeddings at several k, plus edge vectors: the
    // kernel must reproduce the composed form's integers, FIRST-index
    // tie-break, and null propagation exactly
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), KMeans.quantize(col("embedding"), 10000)
        .as("v"))
    for (k <- Seq(1, 3, 8)) {
      val cents = emb.orderBy("vec_id").limit(k)
        .select("v").collect().map(_.getSeq[Long](0).toIndexedSeq).toSeq
      val (cl, d) = KMeans.composedAssignCols(spark, cents)
      val both = emb
        .withColumn("__a", graft.functions.KMeansAssignExpr
          .assign(spark, col("v"), cents))
        .select(col("vec_id"),
          col("__a.cluster").as("fc"), col("__a.dist").as("fd"),
          cl.as("cc"), d.as("cd"))
      val bad = both.filter(
        not(col("fc") <=> col("cc")) || not(col("fd") <=> col("cd")))
        .count()
      assert(bad == 0, s"kernel/composed mismatch at k=$k")
    }
  }

  test("kmeans_assign tie-break keeps the smallest centroid id") {
    import spark.implicits._
    // two identical centroids: composed array_position picks the FIRST
    val df = Seq((1L, Seq(5L, 5L))).toDF("id", "v")
    val cents = Seq(Seq(0L, 0L), Seq(0L, 0L), Seq(5L, 5L), Seq(5L, 5L))
    val r = df.select(graft.functions.KMeansAssignExpr
      .assign(spark, col("v"), cents).as("a"))
      .select("a.cluster", "a.dist").head()
    assert(r.getInt(0) == 2 && r.getLong(1) == 0L)
  }

  test("kmeans_assign nulls on length mismatch like the composed form") {
    import spark.implicits._
    val df = Seq((1L, Seq(5L, 5L, 5L))).toDF("id", "v") // 3 dims vs 2
    val cents = Seq(Seq(0L, 0L))
    val (cl, d) = KMeans.composedAssignCols(spark, cents)
    val r = df.select(
      graft.functions.KMeansAssignExpr.assign(spark, col("v"), cents)
        .as("a"), cl.as("cc"), d.as("cd")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
