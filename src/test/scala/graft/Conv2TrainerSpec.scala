package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Conv2Trainer
import graft.ml.Conv2Trainer.Conv2Weights

/** Stacked-conv trainer correctness: analytic gradients vs finite
  * differences for one entry of every tensor (the two levels of argmax
  * routing — global over conv2 positions, local within each pool
  * window — are the parts worth distrusting), and learning the
  * position-invariant bump task through the full stack.
  */
class Conv2TrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // T=8 (the minimum for k=3 stacked: P1=6 -> J=3 -> P2=1); class 1 has
  // a [low, HIGH, low] bump at a varying position, class 0 is flat
  private lazy val df = {
    val rows = (0 until 24).map { i =>
      val pos = (i / 2) % 6
      val base = 0.1 + 0.02 * (i % 3)
      val s =
        if (i % 2 == 1) Seq.fill(8)(base).updated(pos + 1, 1.0)
        else Seq.fill(8)(base + 0.15)
      (s(0), s(1), s(2), s(3), s(4), s(5), s(6), s(7), i % 2)
    }
    rows.toDF("x1", "x2", "x3", "x4", "x5", "x6", "x7", "x8", "y")
  }
  private val xs = (1 to 8).map(t => col(s"x$t"))

  private def w0 = Conv2Trainer.init(f1 = 2, f2 = 2, kernel = 3,
    classes = 2, seed = 31L)

  test("stacked-conv gradients match finite differences for all tensors") {
    val eps = 1e-5
    val g = Conv2Trainer.gradients(df, xs, col("y"), w0)
    def lossAt(w: Conv2Weights): Double =
      Conv2Trainer.gradients(df, xs, col("y"), w).loss
    def fd(up: Conv2Weights, dn: Conv2Weights): Double =
      (lossAt(up) - lossAt(dn)) / (2 * eps)

    def bw1(d: Double) = w0.copy(w1 =
      w0.w1.updated(1, w0.w1(1).updated(2, w0.w1(1)(2) + d)))
    val fw1 = fd(bw1(eps), bw1(-eps))
    assert(math.abs(fw1 - g.w1(1)(2)) < 1e-6, s"w1: $fw1 vs ${g.w1(1)(2)}")

    val fb1 = fd(w0.copy(b1 = w0.b1.updated(0, w0.b1(0) + eps)),
      w0.copy(b1 = w0.b1.updated(0, w0.b1(0) - eps)))
    assert(math.abs(fb1 - g.b1(0)) < 1e-6, s"b1: $fb1 vs ${g.b1(0)}")

    def bw2(d: Double) = w0.copy(w2 = w0.w2.updated(1,
      w0.w2(1).updated(2, w0.w2(1)(2).updated(0, w0.w2(1)(2)(0) + d))))
    val fw2 = fd(bw2(eps), bw2(-eps))
    assert(math.abs(fw2 - g.w2(1)(2)(0)) < 1e-6,
      s"w2: $fw2 vs ${g.w2(1)(2)(0)}")

    val fb2 = fd(w0.copy(b2 = w0.b2.updated(1, w0.b2(1) + eps)),
      w0.copy(b2 = w0.b2.updated(1, w0.b2(1) - eps)))
    assert(math.abs(fb2 - g.b2(1)) < 1e-6, s"b2: $fb2 vs ${g.b2(1)}")

    def bwh(d: Double) = w0.copy(wh =
      w0.wh.updated(0, w0.wh(0).updated(1, w0.wh(0)(1) + d)))
    val fwh = fd(bwh(eps), bwh(-eps))
    assert(math.abs(fwh - g.wh(0)(1)) < 1e-6, s"wh: $fwh vs ${g.wh(0)(1)}")

    val fbh = fd(w0.copy(bh = w0.bh.updated(1, w0.bh(1) + eps)),
      w0.copy(bh = w0.bh.updated(1, w0.bh(1) - eps)))
    assert(math.abs(fbh - g.bh(1)) < 1e-6, s"bh: $fbh vs ${g.bh(1)}")
  }

  test("stacked-conv gradients are partition-layout invariant") {
    val g1 = Conv2Trainer.gradients(df.repartition(7), xs, col("y"), w0)
    val g2 = Conv2Trainer.gradients(df.coalesce(1), xs, col("y"), w0)
    def flat(g: Conv2Trainer.Conv2Grads) =
      g.w1.flatten ++ g.b1 ++ g.w2.flatten.flatten ++ g.b2 ++
        g.wh.flatten ++ g.bh :+ g.loss
    flat(g1).zip(flat(g2)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12)
    }
  }

  test("stacked-conv training learns the bump task through the stack") {
    val (w, losses) = Conv2Trainer.fit(df, xs, col("y"), w0,
      epochs = 400, lr = 1.0)
    assert(losses.last < losses.head * 0.5,
      s"loss ${losses.head} -> ${losses.last}")
    val scored = Conv2Trainer.predictStaged(df, Seq(col("y")), xs, w,
      "pred")
    val acc = scored.select((col("pred") === col("y")).cast("double")
      .as("ok")).agg(avg("ok")).head().getDouble(0)
    assert(acc >= 0.9, s"accuracy $acc")
  }
}
