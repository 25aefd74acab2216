package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.SignGd

/** SignGd vs an independent in-memory replay of the same algorithm —
  * the distributed aggregation path must land on exactly the weights a
  * straight-line Scala loop computes (everything is exact integers, so
  * equality is strict, no tolerance).
  */
class SignGdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows: Seq[(Long, Long, Long)] = Seq(
    (2L, 1L, 9L), (5L, 2L, 21L), (1L, 3L, 8L), (7L, 1L, 30L),
    (3L, 2L, 14L), (6L, 3L, 27L), (4L, 1L, 17L), (2L, 2L, 10L))

  private def replay(steps: Int): Seq[SignGd.Step] = {
    var w = Seq(0L, 0L, 0L)
    (1 to steps).map { i =>
      val feats = rows.map { case (x1, x2, _) => Seq(1L, x1, x2) }
      val ys = rows.map(_._3)
      val resid = feats.zip(ys).map { case (f, y) =>
        f.zip(w).map { case (x, wj) => x * wj }.sum - y
      }
      val g = (0 until 3).map(j =>
        resid.zip(feats).map { case (r, f) => r * f(j) }.sum)
      val sse = resid.map(r => r * r).sum
      w = w.zip(g).map { case (wj, gj) => wj - java.lang.Long.signum(gj) }
      SignGd.Step(i.toLong, sse, w)
    }
  }

  test("distributed steps equal the in-memory replay exactly") {
    val df = rows.toDF("x1", "x2", "y").repartition(3)
    val got = SignGd.fit(df, Seq(col("x1"), col("x2")), col("y"), 5)
    assert(got == replay(5))
  }

  test("loss shrinks from the zero model on this fixture") {
    val df = rows.toDF("x1", "x2", "y")
    val got = SignGd.fit(df, Seq(col("x1"), col("x2")), col("y"), 6)
    // step 1's sse is the loss at w=0; by step 6 sign updates have
    // walked the weights toward y ~ 4*x1 + ...
    assert(got.last.sse < got.head.sse)
  }
}
