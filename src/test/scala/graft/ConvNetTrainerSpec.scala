package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.ConvNetTrainer
import graft.ml.ConvNetTrainer.NetWeights

/** The 3-block conv net's correctness case: finite differences of its
  * own loss against the analytic gradient for EVERY tensor family
  * (three conv kernels + biases through two levels of max routing, the
  * dense layer through the flatten, the head through the dropout
  * mask), with and without dropout; plus layout invariance and
  * end-to-end learning through the full stack.
  */
class ConvNetTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = 22
  // the ConvTrainerSpec bump task stretched to T=22: class 1 has a
  // [low, HIGH, low] bump at a varying position, class 0 is flat —
  // position-invariant, exactly what conv + max pooling represents
  // (a ramp-slope task was tried first and plateaued at ln 2: large
  // mixed-sign inputs dead-relu'd the tiny stack)
  private lazy val df = {
    val rows = (0 until 24).map { i =>
      val pos = 1 + (i / 2) % 16
      val base = 0.1 + 0.02 * (i % 3)
      val xs =
        if (i % 2 == 1) Seq.fill(T)(base).updated(pos, 1.0)
        else Seq.fill(T)(base + 0.15)
      (xs, i % 2, i.toLong)
    }
    // >22 columns: build from a Seq column and unpack (Scala tuples cap
    // at 22)
    val seqDf = rows.toDF("xs", "y", "rk")
    seqDf.select((0 until T).map(t =>
      element_at(col("xs"), t + 1).as(s"x${t + 1}")) ++
      Seq(col("y"), col("rk")): _*)
  }
  private val xs = (1 to T).map(t => col(s"x$t"))

  private def w0 = ConvNetTrainer.init(T, filters = Seq(2, 2, 2),
    kernel = 3, dense = 3, classes = 2, seed = 23L)

  private def gAt(w: NetWeights, drop: Double = 0.0) =
    ConvNetTrainer.gradientsVal(df, xs, col("y"), col("rk"), w,
      epoch = 2, dropout = drop, lit(false))._1

  private def fdCheck(drop: Double): Unit = {
    val eps = 1e-5
    val g = gAt(w0, drop)
    def lossAt(w: NetWeights): Double = gAt(w, drop).loss
    def fd(up: NetWeights, dn: NetWeights): Double =
      (lossAt(up) - lossAt(dn)) / (2 * eps)
    def bump4(w: Seq[Seq[Seq[Seq[Double]]]], b: Int, f: Int, j: Int,
        c: Int, d: Double) =
      w.updated(b, w(b).updated(f, w(b)(f).updated(j,
        w(b)(f)(j).updated(c, w(b)(f)(j)(c) + d))))
    // one representative coordinate per conv block
    for (b <- 0 until 3) {
      val c = if (b == 0) 0 else 1
      val fw = fd(w0.copy(convW = bump4(w0.convW, b, 1, 2, c, eps)),
        w0.copy(convW = bump4(w0.convW, b, 1, 2, c, -eps)))
      assert(math.abs(fw - g.convW(b)(1)(2)(c)) < 1e-6,
        s"convW b=$b drop=$drop: $fw vs ${g.convW(b)(1)(2)(c)}")
      def bumpB(d: Double) = w0.copy(convB =
        w0.convB.updated(b, w0.convB(b).updated(0, w0.convB(b)(0) + d)))
      val fb = fd(bumpB(eps), bumpB(-eps))
      assert(math.abs(fb - g.convB(b)(0)) < 1e-6,
        s"convB b=$b drop=$drop: $fb vs ${g.convB(b)(0)}")
    }
    def bumpD(d: Double) = w0.copy(denseW =
      w0.denseW.updated(1, w0.denseW(1).updated(1, w0.denseW(1)(1) + d)))
    val fdw = fd(bumpD(eps), bumpD(-eps))
    assert(math.abs(fdw - g.denseW(1)(1)) < 1e-6,
      s"denseW drop=$drop: $fdw vs ${g.denseW(1)(1)}")
    val fdb = fd(w0.copy(denseB = w0.denseB.updated(2, w0.denseB(2) + eps)),
      w0.copy(denseB = w0.denseB.updated(2, w0.denseB(2) - eps)))
    assert(math.abs(fdb - g.denseB(2)) < 1e-6, s"denseB drop=$drop")
    def bumpH(d: Double) = w0.copy(headW =
      w0.headW.updated(1, w0.headW(1).updated(2, w0.headW(1)(2) + d)))
    val fhw = fd(bumpH(eps), bumpH(-eps))
    assert(math.abs(fhw - g.headW(1)(2)) < 1e-6, s"headW drop=$drop")
    val fhb = fd(w0.copy(headB = w0.headB.updated(0, w0.headB(0) + eps)),
      w0.copy(headB = w0.headB.updated(0, w0.headB(0) - eps)))
    assert(math.abs(fhb - g.headB(0)) < 1e-6, s"headB drop=$drop")
  }

  test("gradients match finite differences for all tensor families") {
    fdCheck(0.0)
  }

  test("gradients match finite differences WITH dropout active") {
    fdCheck(0.5)
  }

  test("gradients are partition-layout invariant") {
    def flat(g: ConvNetTrainer.NetGrads) =
      g.convW.flatten.flatten.flatten ++ g.convB.flatten ++
        g.denseW.flatten ++ g.denseB ++ g.headW.flatten ++ g.headB :+
        g.loss
    val g1 = ConvNetTrainer.gradientsVal(df.repartition(5), xs, col("y"),
      col("rk"), w0, 1, 0.5, lit(false))._1
    val g2 = ConvNetTrainer.gradientsVal(df.coalesce(1), xs, col("y"),
      col("rk"), w0, 1, 0.5, lit(false))._1
    flat(g1).zip(flat(g2)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12) }
  }

  test("the full stack learns the bump task") {
    val (w, losses) = ConvNetTrainer.fit(df, xs, col("y"), w0,
      epochs = 60, lr = 0.5)
    assert(losses.last < losses.head * 0.6,
      s"loss ${losses.head} -> ${losses.last}")
    val scored = ConvNetTrainer.predictStaged(df, Seq(col("y")), xs, w,
      "pred")
    val acc = scored.select((col("pred") === col("y")).cast("double")
      .as("ok")).agg(avg("ok")).head().getDouble(0)
    assert(acc >= 0.9, s"accuracy $acc")
  }

  test("fitEs stops on a worsening val slice and restores best") {
    // val rows (rk < 4) get INVERTED labels: val loss must rise as the
    // train rule is learned -> early stop fires
    val adv = df.withColumn("y2",
      when(col("rk") < 4, lit(1) - col("y")).otherwise(col("y")))
    val es = ConvNetTrainer.fitEs(adv, xs, col("y2"), w0,
      maxEpochs = 40, lr = 0.5, rowKey = col("rk"), dropout = 0.0,
      isVal = col("rk") < 4, patience = 3)
    assert(es.stoppedEpoch < 40, s"expected early stop: ${es.valLosses}")
    assert(es.stoppedEpoch == es.bestEpoch + 3)
  }
}
