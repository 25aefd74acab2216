package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.LstmTrainer
import graft.ml.LstmTrainer.{GateW, LstmWeights}

/** LSTM BPTT correctness: the analytic gradient of every tensor in
  * every gate must match finite differences of the trainer's own loss
  * (the gated backward pass — dc chaining through f_{t+1}, the four
  * coupled dz's — is the part worth distrusting), gradients must be
  * partition-layout invariant, and GD must learn an order-sensitive
  * task.
  */
class LstmTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // T=5 sequences; label = does the tail outweigh the head (the
  // RnnTrainerSpec order-dependent rule)
  private lazy val df = {
    val rows = (0 until 24).map { i =>
      val a = 0.2 + 0.05 * (i % 7)
      val b = 0.9 - 0.05 * (i % 5)
      if (i % 2 == 0) (a, a, 0.5, b, b, if (2 * b > 2 * a) 1 else 0)
      else (b, b, 0.5, a, a, if (2 * a > 2 * b) 1 else 0)
    }
    rows.toDF("x1", "x2", "x3", "x4", "x5", "y")
  }
  private val xs = (1 to 5).map(t => col(s"x$t"))

  private def w0 = LstmTrainer.init(units = 3, classes = 2, seed = 19L)

  test("LSTM BPTT gradients match finite differences for all tensors") {
    val eps = 1e-5
    val g = LstmTrainer.gradients(df, xs, col("y"), w0)
    def lossAt(w: LstmWeights): Double =
      LstmTrainer.gradients(df, xs, col("y"), w).loss
    def fd(up: LstmWeights, dn: LstmWeights): Double =
      (lossAt(up) - lossAt(dn)) / (2 * eps)

    // every gate: one wx, one recurrent u, one bias entry
    def withGate(w: LstmWeights, x: String, g2: GateW): LstmWeights =
      x match {
        case "i" => w.copy(i = g2); case "f" => w.copy(f = g2)
        case "g" => w.copy(g = g2); case "o" => w.copy(o = g2)
      }
    def gateOf(w: LstmWeights, x: String): GateW = x match {
      case "i" => w.i; case "f" => w.f; case "g" => w.g; case "o" => w.o
    }
    for (x <- Seq("i", "f", "g", "o")) {
      val ga: GateW = x match {
        case "i" => g.i; case "f" => g.f; case "g" => g.g; case "o" => g.o
      }
      def bump(f: GateW => GateW) =
        withGate(w0, x, f(gateOf(w0, x)))
      val fwx = fd(bump(gt => gt.copy(wx = gt.wx.updated(1, gt.wx(1) + eps))),
        bump(gt => gt.copy(wx = gt.wx.updated(1, gt.wx(1) - eps))))
      assert(math.abs(fwx - ga.wx(1)) < 1e-6, s"$x.wx: $fwx vs ${ga.wx(1)}")
      def bu(d: Double) = bump(gt =>
        gt.copy(u = gt.u.updated(2, gt.u(2).updated(0, gt.u(2)(0) + d))))
      val fu = fd(bu(eps), bu(-eps))
      assert(math.abs(fu - ga.u(2)(0)) < 1e-6, s"$x.u: $fu vs ${ga.u(2)(0)}")
      val fb = fd(bump(gt => gt.copy(b = gt.b.updated(0, gt.b(0) + eps))),
        bump(gt => gt.copy(b = gt.b.updated(0, gt.b(0) - eps))))
      assert(math.abs(fb - ga.b(0)) < 1e-6, s"$x.b: $fb vs ${ga.b(0)}")
    }

    def bumpW2(d: Double) = w0.copy(w2 =
      w0.w2.updated(1, w0.w2(1).updated(2, w0.w2(1)(2) + d)))
    val fw2 = fd(bumpW2(eps), bumpW2(-eps))
    assert(math.abs(fw2 - g.w2(1)(2)) < 1e-6, s"w2: $fw2 vs ${g.w2(1)(2)}")

    val fb2 = fd(w0.copy(b2 = w0.b2.updated(1, w0.b2(1) + eps)),
      w0.copy(b2 = w0.b2.updated(1, w0.b2(1) - eps)))
    assert(math.abs(fb2 - g.b2(1)) < 1e-6, s"b2: $fb2 vs ${g.b2(1)}")
  }

  test("LSTM gradients are partition-layout invariant") {
    val g1 = LstmTrainer.gradients(df.repartition(7), xs, col("y"), w0)
    val g2 = LstmTrainer.gradients(df.coalesce(1), xs, col("y"), w0)
    def fg(g: GateW) = g.wx ++ g.u.flatten ++ g.b
    def flat(g: LstmTrainer.LstmGrads) =
      fg(g.i) ++ fg(g.f) ++ fg(g.g) ++ fg(g.o) ++
        g.w2.flatten ++ g.b2 :+ g.loss
    flat(g1).zip(flat(g2)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12)
    }
  }

  test("LSTM BPTT learns the order-sensitive task") {
    val (w, losses) = LstmTrainer.fit(df, xs, col("y"), w0,
      epochs = 150, lr = 1.0)
    assert(losses.last < losses.head * 0.5,
      s"loss ${losses.head} -> ${losses.last}")
    val scored = LstmTrainer.predictStaged(df, Seq(col("y")), xs, w, "pred")
    val acc = scored.select((col("pred") === col("y")).cast("double")
      .as("ok")).agg(avg("ok")).head().getDouble(0)
    assert(acc >= 0.9, s"accuracy $acc")
  }
}
