package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Lstm2Trainer
import graft.ml.Lstm2Trainer.W

/** Stacked gated-BPTT correctness: finite-difference checks for a
  * representative cell of EVERY tensor family in the stack — all four
  * gates of both layers (input / recurrent / bias each), the relu dense
  * layer, and the head — with and without dropout; layout invariance;
  * learning on the order-sensitive task.
  */
class Lstm2TrainerSpec extends AnyFunSuite {
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

  private def w0 = Lstm2Trainer.init(u1 = 2, u2 = 2, d = 3, classes = 2,
    seed = 31L)

  private def fdCheck(w0: W, g: Lstm2Trainer.G,
      lossAt: W => Double): Unit = {
    val eps = 1e-5
    def ck(name: String, got: Double, up: W, dn: W): Unit = {
      val want = (lossAt(up) - lossAt(dn)) / (2 * eps)
      assert(math.abs(want - got) < 1e-6, s"$name: fd=$want analytic=$got")
    }
    // layer-1 gates: wx[1], u[1][0], b[0] of each gate
    for (x <- Seq("i", "f", "g", "o")) {
      def upd1(d: Double, f: Lstm2Trainer.Gate1 => Lstm2Trainer.Gate1) =
        w0.copy(l1 = w0.l1.updated(x, f(w0.l1(x))))
      ck(s"l1.$x.wx", g.l1(x).wx(1),
        upd1(eps, gt => gt.copy(wx = gt.wx.updated(1, gt.wx(1) + eps))),
        upd1(-eps, gt => gt.copy(wx = gt.wx.updated(1, gt.wx(1) - eps))))
      def bumpU(d: Double) = upd1(d, gt => gt.copy(u =
        gt.u.updated(1, gt.u(1).updated(0, gt.u(1)(0) + d))))
      ck(s"l1.$x.u", g.l1(x).u(1)(0), bumpU(eps), bumpU(-eps))
      ck(s"l1.$x.b", g.l1(x).b(0),
        upd1(eps, gt => gt.copy(b = gt.b.updated(0, gt.b(0) + eps))),
        upd1(-eps, gt => gt.copy(b = gt.b.updated(0, gt.b(0) - eps))))
    }
    // layer-2 gates: wx[1][0] (vector input!), u[0][1], b[1]
    for (x <- Seq("i", "f", "g", "o")) {
      def upd2(f: Lstm2Trainer.Gate2 => Lstm2Trainer.Gate2) =
        w0.copy(l2 = w0.l2.updated(x, f(w0.l2(x))))
      def bumpWx(d: Double) = upd2(gt => gt.copy(wx =
        gt.wx.updated(1, gt.wx(1).updated(0, gt.wx(1)(0) + d))))
      ck(s"l2.$x.wx", g.l2(x).wx(1)(0), bumpWx(eps), bumpWx(-eps))
      def bumpU(d: Double) = upd2(gt => gt.copy(u =
        gt.u.updated(0, gt.u(0).updated(1, gt.u(0)(1) + d))))
      ck(s"l2.$x.u", g.l2(x).u(0)(1), bumpU(eps), bumpU(-eps))
      def bumpB(d: Double) = upd2(gt => gt.copy(b =
        gt.b.updated(1, gt.b(1) + d)))
      ck(s"l2.$x.b", g.l2(x).b(1), bumpB(eps), bumpB(-eps))
    }
    // dense + head
    def bumpWd(d: Double) = w0.copy(wd =
      w0.wd.updated(1, w0.wd(1).updated(0, w0.wd(1)(0) + d)))
    ck("wd", g.wd(1)(0), bumpWd(eps), bumpWd(-eps))
    ck("bd", g.bd(0),
      w0.copy(bd = w0.bd.updated(0, w0.bd(0) + eps)),
      w0.copy(bd = w0.bd.updated(0, w0.bd(0) - eps)))
    def bumpW3(d: Double) = w0.copy(w3 =
      w0.w3.updated(1, w0.w3(1).updated(1, w0.w3(1)(1) + d)))
    ck("w3", g.w3(1)(1), bumpW3(eps), bumpW3(-eps))
    ck("b3", g.b3(1),
      w0.copy(b3 = w0.b3.updated(1, w0.b3(1) + eps)),
      w0.copy(b3 = w0.b3.updated(1, w0.b3(1) - eps)))
  }

  test("stacked gated-BPTT gradients match finite differences") {
    val g = Lstm2Trainer.gradients(df, xs, col("y"), w0)
    fdCheck(w0, g, w => Lstm2Trainer.gradients(df, xs, col("y"), w).loss)
  }

  private lazy val dfRk = df.withColumn("rk",
    xxhash64(col("x1"), col("x2"), col("x3"), col("x4"), col("x5"),
      col("y")))

  test("stacked gated-BPTT gradients match finite differences WITH dropout") {
    def gv(w: W) = Lstm2Trainer.gradientsVal(dfRk, xs, col("y"),
      col("rk"), w, epoch = 2, dropout = 0.3, isVal = lit(false))._1
    fdCheck(w0, gv(w0), w => gv(w).loss)
  }

  test("gradients are partition-layout invariant") {
    val g1 = Lstm2Trainer.gradients(df.repartition(7), xs, col("y"), w0)
    val g2 = Lstm2Trainer.gradients(df.coalesce(1), xs, col("y"), w0)
    def flatG1(g: Map[String, Lstm2Trainer.Gate1]) =
      Seq("i", "f", "g", "o").flatMap(x =>
        g(x).wx ++ g(x).u.flatten ++ g(x).b)
    def flatG2(g: Map[String, Lstm2Trainer.Gate2]) =
      Seq("i", "f", "g", "o").flatMap(x =>
        g(x).wx.flatten ++ g(x).u.flatten ++ g(x).b)
    def flat(g: Lstm2Trainer.G) =
      flatG1(g.l1) ++ flatG2(g.l2) ++ g.wd.flatten ++ g.bd ++
        g.w3.flatten ++ g.b3 :+ g.loss
    flat(g1).zip(flat(g2)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12)
    }
  }

  test("stacked gated BPTT learns the order-sensitive task") {
    // a 2/2-unit double sigmoid-gated bottleneck escapes the ln(2)
    // saddle slowly on 24 rows: the deterministic full-batch trajectory
    // reaches 0.92 accuracy with a small-but-strict loss descent at 150
    // epochs (the single-layer spec's 2x plunge needs ~3x the epochs
    // here — not worth the suite time; descent + accuracy is the
    // learning evidence, gradient EXACTNESS is the FD tests above)
    val (w, losses) = Lstm2Trainer.fit(df, xs, col("y"), w0,
      epochs = 150, lr = 2.0)
    assert(losses.last < losses.head - 2e-3,
      s"loss ${losses.head} -> ${losses.last}")
    val scored = Lstm2Trainer.predictStaged(df, Seq(col("y")), xs, w,
      "pred")
    val acc = scored.select((col("pred") === col("y")).cast("double")
      .as("ok")).agg(avg("ok")).head().getDouble(0)
    assert(acc >= 0.9, s"accuracy $acc")
  }
}
