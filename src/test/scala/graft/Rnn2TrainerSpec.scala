package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Rnn2Trainer
import graft.ml.Rnn2Trainer.W

/** Stacked-BPTT correctness: the analytic gradient of every tensor in
  * BOTH layers must match finite differences of the trainer's own loss
  * — the cross-layer term (dh1 fed by layer 2 at t AND layer 1 at t+1)
  * is the new math worth distrusting — plus layout invariance and
  * learning on the order-sensitive task, with and without dropout.
  */
class Rnn2TrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

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

  private def w0 = Rnn2Trainer.init(u1 = 2, u2 = 3, classes = 2,
    seed = 19L)

  private def fdCheck(w0: W, g: Rnn2Trainer.G,
      lossAt: W => Double): Unit = {
    val eps = 1e-5
    def fd(up: W, dn: W): Double = (lossAt(up) - lossAt(dn)) / (2 * eps)
    def ck(name: String, got: Double, up: W, dn: W): Unit = {
      val want = fd(up, dn)
      assert(math.abs(want - got) < 1e-6, s"$name: fd=$want analytic=$got")
    }
    ck("wx1", g.wx1(1),
      w0.copy(wx1 = w0.wx1.updated(1, w0.wx1(1) + eps)),
      w0.copy(wx1 = w0.wx1.updated(1, w0.wx1(1) - eps)))
    def bWh1(d: Double) = w0.copy(wh1 =
      w0.wh1.updated(1, w0.wh1(1).updated(0, w0.wh1(1)(0) + d)))
    ck("wh1", g.wh1(1)(0), bWh1(eps), bWh1(-eps))
    ck("b1", g.b1(0),
      w0.copy(b1 = w0.b1.updated(0, w0.b1(0) + eps)),
      w0.copy(b1 = w0.b1.updated(0, w0.b1(0) - eps)))
    def bWx2(d: Double) = w0.copy(wx2 =
      w0.wx2.updated(2, w0.wx2(2).updated(1, w0.wx2(2)(1) + d)))
    ck("wx2", g.wx2(2)(1), bWx2(eps), bWx2(-eps))
    def bWh2(d: Double) = w0.copy(wh2 =
      w0.wh2.updated(0, w0.wh2(0).updated(2, w0.wh2(0)(2) + d)))
    ck("wh2", g.wh2(0)(2), bWh2(eps), bWh2(-eps))
    ck("b2", g.b2(1),
      w0.copy(b2 = w0.b2.updated(1, w0.b2(1) + eps)),
      w0.copy(b2 = w0.b2.updated(1, w0.b2(1) - eps)))
    def bW3(d: Double) = w0.copy(w3 =
      w0.w3.updated(1, w0.w3(1).updated(2, w0.w3(1)(2) + d)))
    ck("w3", g.w3(1)(2), bW3(eps), bW3(-eps))
    ck("b3", g.b3(1),
      w0.copy(b3 = w0.b3.updated(1, w0.b3(1) + eps)),
      w0.copy(b3 = w0.b3.updated(1, w0.b3(1) - eps)))
  }

  test("stacked BPTT gradients match finite differences, all 8 tensors") {
    val g = Rnn2Trainer.gradients(df, xs, col("y"), w0)
    fdCheck(w0, g, w => Rnn2Trainer.gradients(df, xs, col("y"), w).loss)
  }

  private lazy val dfRk = df.withColumn("rk",
    xxhash64(col("x1"), col("x2"), col("x3"), col("x4"), col("x5"),
      col("y")))

  test("stacked BPTT gradients match finite differences WITH dropout") {
    def gv(w: W) = Rnn2Trainer.gradientsVal(dfRk, xs, col("y"),
      col("rk"), w, epoch = 2, dropout = 0.3, isVal = lit(false))._1
    fdCheck(w0, gv(w0), w => gv(w).loss)
  }

  test("gradients are partition-layout invariant") {
    val g1 = Rnn2Trainer.gradients(df.repartition(7), xs, col("y"), w0)
    val g2 = Rnn2Trainer.gradients(df.coalesce(1), xs, col("y"), w0)
    def flat(g: Rnn2Trainer.G) =
      g.wx1 ++ g.wh1.flatten ++ g.b1 ++ g.wx2.flatten ++
        g.wh2.flatten ++ g.b2 ++ g.w3.flatten ++ g.b3 :+ g.loss
    flat(g1).zip(flat(g2)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12)
    }
  }

  test("stacked BPTT learns the order-sensitive task") {
    // positive initial biases keep both relu layers alive (the
    // ConvTrainerSpec dead-filter note applies per stacked layer:
    // a layer-2 unit whose pre-activation starts negative on every row
    // has zero gradient forever)
    val wi = w0
    val wAlive = wi.copy(b1 = wi.b1.map(_.abs + 0.1),
      b2 = wi.b2.map(_.abs + 0.1))
    // lr 0.5, not the single-layer spec's 1.0: two stacked relu layers
    // double the effective step through the chain rule, and 1.0
    // overshoots into the uniform-prediction attractor on some seeds
    val (w, losses) = Rnn2Trainer.fit(df, xs, col("y"), wAlive,
      epochs = 150, lr = 0.5)
    assert(losses.last < losses.head * 0.5,
      s"loss ${losses.head} -> ${losses.last}")
    val scored = Rnn2Trainer.predictStaged(df, Seq(col("y")), xs, w,
      "pred")
    val acc = scored.select((col("pred") === col("y")).cast("double")
      .as("ok")).agg(avg("ok")).head().getDouble(0)
    assert(acc >= 0.9, s"accuracy $acc")
  }

  test("early stopping halts at patience and restores best weights") {
    val iv = pmod(col("rk"), lit(4)) === 0
    val es = Rnn2Trainer.fitEs(dfRk, xs, col("y"), w0, maxEpochs = 30,
      lr = 1.0, rowKey = col("rk"), dropout = 0.0, isVal = iv,
      patience = 3)
    assert(es.stoppedEpoch <= 30 && es.bestEpoch <= es.stoppedEpoch)
    assert(es.valLosses.nonEmpty)
    // restored weights really are the best epoch's: their val loss
    // equals the minimum observed val loss
    assert(math.abs(es.valLosses.min -
      es.valLosses(es.bestEpoch - 1)) < 1e-12)
  }
}
