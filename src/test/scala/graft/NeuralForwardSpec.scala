package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.NeuralForward
import graft.ml.NeuralForward.{Gate, LstmWeights}

/** Hand-computed and reference-implementation checks for the
  * fixed-weight forward passes (reference `models/cnn_model.py:21-32`,
  * `models/rnn_model.py:19-26`, `models/lstm_model.py:19-26`). A plain
  * Scala implementation of each layer lives in this spec; the engine's
  * expression-tree output must match it to 1e-9 on fixed inputs, and the
  * small hand-computed cases pin the Keras shape conventions (valid
  * padding, dropped pool tail, position-major flatten, tie-first argmax,
  * zero initial recurrent state).
  */
class NeuralForwardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run1(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("one").select(c.as("r")).head.get(0)
  }

  private def seqDouble(a: Any): Seq[Double] =
    a.asInstanceOf[scala.collection.Seq[Double]].toSeq

  private def seqSeqDouble(a: Any): Seq[Seq[Double]] =
    a.asInstanceOf[scala.collection.Seq[scala.collection.Seq[Double]]]
      .map(_.toSeq).toSeq

  private def arr(xs: Double*) = array(xs.map(lit): _*)
  private def arr2(xss: Seq[Double]*) =
    array(xss.map(xs => array(xs.map(lit): _*)): _*)

  // ---- plain-Scala reference layers (the spec's independent oracle) ----
  private def refAct(name: String)(x: Double): Double = name match {
    case "relu" => math.max(x, 0.0); case "tanh" => math.tanh(x)
    case "linear" => x
  }
  private def refConv(in: Seq[Seq[Double]], w: Seq[Seq[Seq[Double]]],
      b: Seq[Double], a: String): Seq[Seq[Double]] = {
    val k = w.head.length
    (0 to in.length - k).map(p => w.indices.map(f =>
      refAct(a)(b(f) + (for (j <- 0 until k; c <- w(f)(j).indices)
        yield in(p + j)(c) * w(f)(j)(c)).sum)))
  }
  private def refPool(in: Seq[Seq[Double]], pool: Int): Seq[Seq[Double]] =
    (0 until in.length / pool).map(q =>
      in(q * pool).indices.map(ch =>
        (0 until pool).map(r => in(q * pool + r)(ch)).max))
  private def refDense(in: Seq[Double], w: Seq[Seq[Double]],
      b: Seq[Double], a: String): Seq[Double] =
    w.indices.map(o => refAct(a)(
      b(o) + w(o).indices.map(i => in(i) * w(o)(i)).sum))
  private def refRnn(in: Seq[Seq[Double]], wx: Seq[Seq[Double]],
      wh: Seq[Seq[Double]], b: Seq[Double], a: String): Seq[Double] =
    in.foldLeft(Seq.fill(wx.length)(0.0)) { (h, x) =>
      wx.indices.map(u => refAct(a)(b(u) +
        wx(u).indices.map(c => x(c) * wx(u)(c)).sum +
        wh(u).indices.map(v => h(v) * wh(u)(v)).sum))
    }
  private def sigm(x: Double) = 1.0 / (1.0 + math.exp(-x))
  private def refLstm(in: Seq[Seq[Double]], w: LstmWeights): Seq[Double] = {
    val units = w.i.b.length
    def pre(g: Gate, x: Seq[Double], h: Seq[Double], u: Int): Double =
      g.b(u) + g.w(u).indices.map(c => x(c) * g.w(u)(c)).sum +
        g.u(u).indices.map(v => h(v) * g.u(u)(v)).sum
    in.foldLeft((Seq.fill(units)(0.0), Seq.fill(units)(0.0))) {
      case ((h, c), x) =>
        val cN = (0 until units).map(u =>
          sigm(pre(w.f, x, h, u)) * c(u) +
            sigm(pre(w.i, x, h, u)) * math.tanh(pre(w.c, x, h, u)))
        val hN = (0 until units).map(u =>
          sigm(pre(w.o, x, h, u)) * math.tanh(cN(u)))
        (hN, cN)
    }._1
  }

  private def assertClose(got: Seq[Double], want: Seq[Double]): Unit = {
    assert(got.length == want.length, s"$got vs $want")
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-9, s"$got vs $want")
    }
  }

  test("conv1d valid padding, relu, hand-computed") {
    // in [1,2,3,4] single-channel, k=2, filters ((1,-1) b 0, (.5,.5) b 1):
    // f0 pre-relu = -1 everywhere -> 0; f1 = 2.5, 3.5, 4.5
    val in = NeuralForward.singleChannel(arr(1, 2, 3, 4))
    val out = seqSeqDouble(run1(NeuralForward.conv1d(in,
      Seq(Seq(Seq(1.0), Seq(-1.0)), Seq(Seq(0.5), Seq(0.5))), Seq(0.0, 1.0))))
    assert(out == Seq(Seq(0.0, 2.5), Seq(0.0, 3.5), Seq(0.0, 4.5)))
  }

  test("conv1d/maxPool1d on inputs shorter than kernel/pool yield zero positions") {
    // sequence(0, negative) would descend and feed invalid element_at
    // indices — the guard must emit an empty result instead of crashing
    // (ANSI) or reading end-relative garbage (non-ANSI)
    val short = NeuralForward.singleChannel(arr(1, 2))
    val conv = seqSeqDouble(run1(NeuralForward.conv1d(short,
      Seq(Seq(Seq(1.0), Seq(1.0), Seq(1.0))), Seq(0.0))))
    assert(conv.isEmpty)
    val pool = seqSeqDouble(run1(NeuralForward.maxPool1d(
      arr2(Seq(1.0, 2.0)), 2)))
    assert(pool.isEmpty)
  }

  test("maxPool1d drops the odd tail (Keras parity)") {
    val in = arr2(Seq(0.0, 2.5), Seq(1.0, 3.5), Seq(9.0, 4.5))
    val out = seqSeqDouble(run1(NeuralForward.maxPool1d(in, 2)))
    assert(out == Seq(Seq(1.0, 3.5))) // 3rd position dropped
  }

  test("flatten is position-major; dense matches hand-compute") {
    val flat = seqDouble(run1(NeuralForward.flatten1d(
      arr2(Seq(1.0, 2.0), Seq(3.0, 4.0)))))
    assert(flat == Seq(1.0, 2.0, 3.0, 4.0))
    // dense on [0, 3.5]: w rows (2,0|0,2|1,1), b (1,0,-3.5) -> [1, 7, 0]
    val out = seqDouble(run1(NeuralForward.dense(arr(0.0, 3.5),
      Seq(Seq(2.0, 0.0), Seq(0.0, 2.0), Seq(1.0, 1.0)),
      Seq(1.0, 0.0, -3.5), "linear")))
    assert(out == Seq(1.0, 7.0, 0.0))
  }

  test("softmax normalizes and preserves order; argmax ties -> first") {
    val sm = seqDouble(run1(NeuralForward.softmax(arr(1.0, 3.0, 2.0))))
    assert(math.abs(sm.sum - 1.0) < 1e-12)
    assert(sm(1) > sm(2) && sm(2) > sm(0))
    assert(run1(NeuralForward.argmax(arr(1.0, 3.0, 2.0))) == 1L)
    assert(run1(NeuralForward.argmax(arr(5.0, 1.0, 5.0))) == 0L)
  }

  test("full CNN stack matches the plain-Scala reference implementation") {
    // 8-long input through conv(k3,f4,relu) -> pool2 -> conv(k2,f3,relu)
    // -> pool2 -> flatten -> dense(2, linear): the q37 registry shape.
    val feats = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val w1 = Seq.tabulate(4, 3, 1)((f, j, _) => ((f * 5 + j * 3 + 1) % 5) - 2.0)
    val b1 = Seq.tabulate(4)(f => (f % 3) - 1.0)
    val w2 = Seq.tabulate(3, 2, 4)((f, j, c) => ((f * 7 + j * 5 + c * 3 + 2) % 5) - 2.0)
    val b2 = Seq.tabulate(3)(f => (f % 2).toDouble)
    val wd = Seq.tabulate(2, 3)((o, i) => ((o * 3 + i * 2 + 1) % 5) - 2.0)
    val bd = Seq.tabulate(2)(_.toDouble)

    val want = refDense(refPool(refConv(refPool(refConv(
      feats.map(Seq(_)), w1, b1, "relu"), 2), w2, b2, "relu"), 2).flatten,
      wd, bd, "linear")

    val c = NeuralForward.dense(NeuralForward.flatten1d(
      NeuralForward.maxPool1d(NeuralForward.conv1d(
        NeuralForward.maxPool1d(NeuralForward.conv1d(
          NeuralForward.singleChannel(arr(feats: _*)), w1, b1), 2),
        w2, b2), 2)), wd, bd, "linear")
    assertClose(seqDouble(run1(c)), want)
    assert(want.exists(_ != 0.0), "fixture collapsed to zeros — weak test")
  }

  test("simpleRnn: linear identity recurrence accumulates; relu/tanh match ref") {
    // wx=1, wh=1, b=0, linear: h_t = x_t + h_{t-1} -> running sum
    val lin = seqDouble(run1(NeuralForward.simpleRnn(
      NeuralForward.singleChannel(arr(1, 2, 3)),
      Seq(Seq(1.0)), Seq(Seq(1.0)), Seq(0.0), "linear")))
    assert(lin == Seq(6.0))

    val in = Seq(Seq(0.5, -1.0), Seq(2.0, 0.25), Seq(-0.75, 1.0))
    val wx = Seq(Seq(0.5, -0.25), Seq(1.0, 0.75), Seq(-0.5, 0.25))
    val wh = Seq(Seq(0.25, 0.5, -0.25), Seq(0.0, 0.5, 0.25), Seq(0.5, -0.5, 0.0))
    val b = Seq(0.1, -0.2, 0.3)
    for (a <- Seq("relu", "tanh")) {
      val got = seqDouble(run1(NeuralForward.simpleRnn(
        arr2(in: _*), wx, wh, b, a)))
      assertClose(got, refRnn(in, wx, wh, b, a))
    }
  }

  test("lstm matches the plain-Scala reference implementation") {
    val in = Seq(Seq(1.0), Seq(-0.5), Seq(2.0))
    def g(seedW: Double, seedU: Double, seedB: Double) = Gate(
      Seq(Seq(seedW), Seq(-seedW)), // 2 units x 1 channel
      Seq(Seq(seedU, -0.1), Seq(0.2, seedU)),
      Seq(seedB, -seedB))
    val w = LstmWeights(g(0.5, 0.1, 0.05), g(-0.25, 0.2, 0.1),
      g(1.0, -0.3, 0.0), g(0.75, 0.15, -0.05))
    val got = seqDouble(run1(NeuralForward.lstm(arr2(in: _*), w)))
    val want = refLstm(in, w)
    assertClose(got, want)
    assert(want.exists(v => math.abs(v) > 1e-3), "degenerate LSTM fixture")
  }

  test("lstmStaged equals the HOF lstm and the plain-Scala reference") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val in = Seq(Seq(0.8), Seq(-0.4), Seq(1.2), Seq(0.1))
    def g(seedW: Double, seedU: Double, seedB: Double) = Gate(
      Seq(Seq(seedW), Seq(-seedW)),
      Seq(Seq(seedU, -0.1), Seq(0.2, seedU)),
      Seq(seedB, -seedB))
    val w = LstmWeights(g(0.5, 0.1, 0.05), g(-0.25, 0.2, 0.1),
      g(1.0, -0.3, 0.0), g(0.75, 0.15, -0.05))
    val df = Seq((in(0).head, in(1).head, in(2).head, in(3).head))
      .toDF("x0", "x1", "x2", "x3")
    val xs = (0 until 4).map(t => Seq(col(s"x$t")))
    val (staged, h) = NeuralForward.lstmStaged(df, Seq.empty, xs, w)
    val got = staged.select(h(0).as("h0"), h(1).as("h1")).head()
    val viaHof = seqDouble(run1(NeuralForward.lstm(arr2(in: _*), w)))
    val want = refLstm(in, w)
    assertClose(Seq(got.getDouble(0), got.getDouble(1)), viaHof)
    assertClose(Seq(got.getDouble(0), got.getDouble(1)), want)
  }

  test("static-unrolled layers are value-equal to the HOF forms") {
    // the registry entries use the static (whole-stage-codegen) forms;
    // this pins them to the HOF forms the earlier tests validated
    val feats = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val w1 = Seq.tabulate(4, 3, 1)((f, j, _) => ((f * 5 + j * 3 + 1) % 5) - 2.0)
    val b1 = Seq.tabulate(4)(f => (f % 3) - 1.0)
    val wd = Seq.tabulate(2, 12)((o, i) => ((o * 3 + i * 2 + 1) % 5) - 2.0)
    val bd = Seq(0.0, 1.0)

    val hof = NeuralForward.dense(NeuralForward.flatten1d(
      NeuralForward.maxPool1d(NeuralForward.conv1d(
        NeuralForward.singleChannel(arr(feats: _*)), w1, b1), 2)),
      wd, bd, "linear")
    val static = NeuralForward.denseStatic(NeuralForward.flattenStatic(
      NeuralForward.maxPool1dStatic(NeuralForward.conv1dStatic(
        feats.map(f => Seq(lit(f): org.apache.spark.sql.Column)), w1, b1), 2)),
      wd, bd, "linear")
    val got = seqDouble(run1(array(static: _*)))
    assertClose(got, seqDouble(run1(hof)))

    // recurrence: 8 steps of rnnCell == one aggregate-fold simpleRnn
    val wx = Seq(Seq(1.0), Seq(-1.0), Seq(2.0))
    val wh = Seq(Seq(1.0, 0.0, -1.0), Seq(0.0, 1.0, 1.0), Seq(-1.0, 1.0, 0.0))
    val rb = Seq(0.0, 1.0, -1.0)
    val hofR = seqDouble(run1(NeuralForward.simpleRnn(
      NeuralForward.singleChannel(arr(feats: _*)), wx, wh, rb, "relu")))
    val staticR = feats.foldLeft(Seq.fill(3)(lit(0.0): org.apache.spark.sql.Column)) {
      (h, x) => NeuralForward.rnnCell(Seq(lit(x)), h, wx, wh, rb, "relu")
    }
    assertClose(seqDouble(run1(array(staticR: _*))), hofR)
  }

  test("neural scoring composes with Structured Streaming (stateless projection)") {
    // The forward pass is a stateless narrow projection, so it runs
    // unchanged behind readStream — the engine-side form of the
    // reference's score-incoming-flows path (M5 with true conv
    // semantics instead of the MLP stand-in).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val w = Seq(Seq(Seq(1.0), Seq(-1.0)), Seq(Seq(0.5), Seq(0.5)))
    val b = Seq(0.0, 1.0)
    def score(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), NeuralForward.denseStatic(NeuralForward.flattenStatic(
        NeuralForward.conv1dStatic(
          (1 to 4).map(i => Seq(col(s"f$i"))), w, b)),
        Seq(Seq(1.0, 0.0, 1.0, 0.0, 1.0, 0.0)), Seq(0.0), "linear")(0)
        .as("score"))
    val stream = MemoryStream[(Long, Double, Double, Double, Double)](spark)
    val in = stream.toDF().toDF("id", "f1", "f2", "f3", "f4")
    val name = s"nf_sink_${System.nanoTime()}"
    val q = score(in).writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      stream.addData((1L, 1.0, 2.0, 3.0, 4.0), (2L, 4.0, 3.0, 2.0, 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // batch parity is the assertion that matters
    val want = score(Seq((1L, 1.0, 2.0, 3.0, 4.0), (2L, 4.0, 3.0, 2.0, 1.0))
      .toDF("id", "f1", "f2", "f3", "f4")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
    assert(got.values.exists(_ != 0.0))
  }

  test("all-zero LSTM weights give zero output (zero initial state)") {
    val z = Gate(Seq(Seq(0.0)), Seq(Seq(0.0)), Seq(0.0))
    val got = seqDouble(run1(NeuralForward.lstm(
      NeuralForward.singleChannel(arr(1, 2, 3)), LstmWeights(z, z, z, z))))
    assert(got == Seq(0.0))
  }
}
