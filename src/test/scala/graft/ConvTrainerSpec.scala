package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.ConvTrainer
import graft.ml.ConvTrainer.ConvWeights

/** Conv trainer correctness: analytic gradients vs finite differences
  * of its own loss for every tensor, and learning a translation-
  * invariant "is there a bump anywhere in the sequence" task that is
  * exactly what a convolution + global pooling can represent.
  */
class ConvTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // T=6 sequences; class 1 has a [low, HIGH, low] bump at a VARYING
  // position, class 0 is flat — position-invariant by construction
  private lazy val df = {
    val rows = (0 until 24).map { i =>
      // (i / 2) decouples position from the i % 2 class selector, so
      // class-1 bumps land at all four positions, not just odd ones
      val pos = (i / 2) % 4
      val base = 0.1 + 0.02 * (i % 3)
      if (i % 2 == 1) {
        val s = Seq.fill(6)(base).updated(pos + 1, 1.0)
        (s(0), s(1), s(2), s(3), s(4), s(5), 1)
      } else {
        val s = Seq.fill(6)(base + 0.15)
        (s(0), s(1), s(2), s(3), s(4), s(5), 0)
      }
    }
    rows.toDF("x1", "x2", "x3", "x4", "x5", "x6", "y")
  }
  private val xs = (1 to 6).map(t => col(s"x$t"))

  private def w0 = ConvTrainer.init(filters = 3, kernel = 3, classes = 2,
    seed = 19L)

  test("conv gradients match finite differences for all tensors") {
    val eps = 1e-5
    val g = ConvTrainer.gradients(df, xs, col("y"), w0)
    def lossAt(w: ConvWeights): Double =
      ConvTrainer.gradients(df, xs, col("y"), w).loss
    def fd(up: ConvWeights, dn: ConvWeights): Double =
      (lossAt(up) - lossAt(dn)) / (2 * eps)

    def bumpW(d: Double) = w0.copy(w =
      w0.w.updated(1, w0.w(1).updated(2, w0.w(1)(2) + d)))
    val fw = fd(bumpW(eps), bumpW(-eps))
    assert(math.abs(fw - g.w(1)(2)) < 1e-6, s"w: $fw vs ${g.w(1)(2)}")

    val fb = fd(w0.copy(b = w0.b.updated(0, w0.b(0) + eps)),
      w0.copy(b = w0.b.updated(0, w0.b(0) - eps)))
    assert(math.abs(fb - g.b(0)) < 1e-6, s"b: $fb vs ${g.b(0)}")

    def bumpW2(d: Double) = w0.copy(w2 =
      w0.w2.updated(0, w0.w2(0).updated(1, w0.w2(0)(1) + d)))
    val fw2 = fd(bumpW2(eps), bumpW2(-eps))
    assert(math.abs(fw2 - g.w2(0)(1)) < 1e-6, s"w2: $fw2 vs ${g.w2(0)(1)}")

    val fb2 = fd(w0.copy(b2 = w0.b2.updated(1, w0.b2(1) + eps)),
      w0.copy(b2 = w0.b2.updated(1, w0.b2(1) - eps)))
    assert(math.abs(fb2 - g.b2(1)) < 1e-6, s"b2: $fb2 vs ${g.b2(1)}")
  }

  test("conv training learns the position-invariant bump task") {
    val (w, losses) = ConvTrainer.fit(df, xs, col("y"), w0,
      epochs = 400, lr = 1.5)
    assert(losses.last < losses.head * 0.5,
      s"loss ${losses.head} -> ${losses.last}")
    val scored = ConvTrainer.predictStaged(df, Seq(col("y")), xs, w, "pred")
    val acc = scored.select((col("pred") === col("y")).cast("double")
      .as("ok")).agg(avg("ok")).head().getDouble(0)
    assert(acc >= 0.9, s"accuracy $acc")
  }

  test("MAX-pool gradients match finite differences (argmax routing)") {
    val eps = 1e-5
    val g = ConvTrainer.gradients(df, xs, col("y"), w0,
      ConvTrainer.MaxPool)
    def lossAt(w: ConvWeights): Double =
      ConvTrainer.gradients(df, xs, col("y"), w, ConvTrainer.MaxPool).loss
    def fd(up: ConvWeights, dn: ConvWeights): Double =
      (lossAt(up) - lossAt(dn)) / (2 * eps)

    def bumpW(d: Double) = w0.copy(w =
      w0.w.updated(1, w0.w(1).updated(2, w0.w(1)(2) + d)))
    val fw = fd(bumpW(eps), bumpW(-eps))
    assert(math.abs(fw - g.w(1)(2)) < 1e-6, s"w: $fw vs ${g.w(1)(2)}")

    val fb = fd(w0.copy(b = w0.b.updated(0, w0.b(0) + eps)),
      w0.copy(b = w0.b.updated(0, w0.b(0) - eps)))
    assert(math.abs(fb - g.b(0)) < 1e-6, s"b: $fb vs ${g.b(0)}")

    def bumpW2(d: Double) = w0.copy(w2 =
      w0.w2.updated(0, w0.w2(0).updated(1, w0.w2(0)(1) + d)))
    val fw2 = fd(bumpW2(eps), bumpW2(-eps))
    assert(math.abs(fw2 - g.w2(0)(1)) < 1e-6, s"w2: $fw2 vs ${g.w2(0)(1)}")
  }

  test("MAX-pool training learns the bump task (reference's pooling)") {
    // max pooling only backpropagates through each filter's single
    // argmax position, so a filter whose every activation starts
    // relu-clipped never recovers (dead filter) — start biases
    // positive, the standard conv-init move for sparse-routing pools
    val w0m = w0.copy(b = w0.b.map(_.abs + 0.1))
    val (w, losses) = ConvTrainer.fit(df, xs, col("y"), w0m,
      epochs = 400, lr = 1.5, pool = ConvTrainer.MaxPool)
    assert(losses.last < losses.head * 0.5,
      s"loss ${losses.head} -> ${losses.last}")
    val scored = ConvTrainer.predictStaged(df, Seq(col("y")), xs, w,
      "pred", ConvTrainer.MaxPool)
    val acc = scored.select((col("pred") === col("y")).cast("double")
      .as("ok")).agg(avg("ok")).head().getDouble(0)
    assert(acc >= 0.9, s"accuracy $acc")
  }
}
