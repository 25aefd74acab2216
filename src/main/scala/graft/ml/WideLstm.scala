package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-WIDTH execution path for [[LstmTrainer]] — the
  * single-layer gated member of the wide-twin family (see [[WideNet]]
  * for the representation rationale): the same gated-BPTT math as
  * per-partition imperative accumulation + one O(params) treeAggregate
  * per epoch, the honest execution form at the reference's real widths
  * (`models/lstm_model.py:19-26`: LSTM(64)). [[LstmTrainer]] exposes no
  * dropout/val surface (the stacked [[Lstm2Trainer]]/[[WideLstm2]] pair
  * carries those), so the twin mirrors its plain `gradients`/`fit`
  * contract. WideSinglesSpec pins gradient-for-gradient equivalence
  * for all 14 tensors.
  */
object WideLstm {
  import LstmTrainer.{LstmWeights, LstmGrads, GateW}
  import WideNet.Sample

  private final class Packed(w: LstmWeights) extends Serializable {
    // gate order i, f, g, o — indexed 0..3 throughout
    val wx: Array[Array[Double]] =
      Array(w.i, w.f, w.g, w.o).map(_.wx.toArray)
    val uu: Array[Array[Array[Double]]] =
      Array(w.i, w.f, w.g, w.o).map(_.u.map(_.toArray).toArray)
    val b: Array[Array[Double]] =
      Array(w.i, w.f, w.g, w.o).map(_.b.toArray)
    val w2: Array[Array[Double]] = w.w2.map(_.toArray).toArray
    val b2: Array[Double] = w.b2.toArray
    val units: Int = w.units
    val kc: Int = w.classes
  }

  /** Buffer layout per gate X in i,f,g,o: wx (u), u (u,u), b (u); then
    * w2 (kc,u), b2 (kc), then [loss sum, count]. */
  private final class Layout(p: Packed) extends Serializable {
    val gateSize: Int = p.units + p.units * p.units + p.units
    def wxOff(x: Int): Int = x * gateSize
    def uOff(x: Int): Int = x * gateSize + p.units
    def bOff(x: Int): Int = x * gateSize + p.units + p.units * p.units
    val w2Off: Int = 4 * gateSize
    val b2Off: Int = w2Off + p.kc * p.units
    val statsOff: Int = b2Off + p.kc
    val size: Int = statsOff + 2
  }

  private def sig(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** One row's contribution — line-for-line the staged
    * [[LstmTrainer.gradients]] columns (Keras gate order, dc chained
    * through f_{t+1}, dh_{t<T} summed over all four gates' recurrent
    * matrices). */
  private def accumulate(s: Sample, p: Packed, ly: Layout,
      g: Array[Double]): Unit = {
    val T = s.x.length
    val un = p.units
    // gates (t)(x)(u), cell c, tanh(c), hidden h
    val gate = Array.ofDim[Double](T + 1, 4, un)
    val c = Array.ofDim[Double](T + 1, un)
    val tc = Array.ofDim[Double](T + 1, un)
    val h = Array.ofDim[Double](T + 1, un)
    var t = 1
    while (t <= T) {
      val xt = s.x(t - 1)
      var x = 0
      while (x < 4) {
        var u = 0
        while (u < un) {
          var acc = xt * p.wx(x)(u) + p.b(x)(u)
          val uu = p.uu(x)(u)
          var v = 0
          while (v < un) { acc += h(t - 1)(v) * uu(v); v += 1 }
          gate(t)(x)(u) = if (x == 2) math.tanh(acc) else sig(acc)
          u += 1
        }
        x += 1
      }
      var u = 0
      while (u < un) {
        c(t)(u) = gate(t)(1)(u) * c(t - 1)(u) +
          gate(t)(0)(u) * gate(t)(2)(u)
        tc(t)(u) = math.tanh(c(t)(u))
        h(t)(u) = gate(t)(3)(u) * tc(t)(u)
        u += 1
      }
      t += 1
    }
    val z2 = new Array[Double](p.kc)
    var o = 0
    while (o < p.kc) {
      var acc = p.b2(o)
      val wo = p.w2(o)
      var v = 0
      while (v < un) { acc += h(T)(v) * wo(v); v += 1 }
      z2(o) = acc; o += 1
    }
    var mx = z2(0); o = 1
    while (o < p.kc) { if (z2(o) > mx) mx = z2(o); o += 1 }
    var denom = 0.0; o = 0
    while (o < p.kc) { denom += math.exp(z2(o) - mx); o += 1 }
    g(ly.statsOff) += math.log(denom) + mx - z2(s.y)
    g(ly.statsOff + 1) += 1.0
    val dzo = new Array[Double](p.kc)
    o = 0
    while (o < p.kc) {
      dzo(o) = math.exp(z2(o) - mx) / denom - (if (s.y == o) 1.0 else 0.0)
      g(ly.b2Off + o) += dzo(o)
      var v = 0
      while (v < un) {
        g(ly.w2Off + o * un + v) += dzo(o) * h(T)(v)
        v += 1
      }
      o += 1
    }
    // backward: dz (t)(x)(u) for the four gate pre-activation deltas
    val dz = Array.ofDim[Double](T + 2, 4, un)
    val dc = Array.ofDim[Double](T + 2, un)
    t = T
    while (t >= 1) {
      var u = 0
      while (u < un) {
        var dh = 0.0
        if (t == T) {
          o = 0
          while (o < p.kc) { dh += dzo(o) * p.w2(o)(u); o += 1 }
        } else {
          var x = 0
          while (x < 4) {
            var v = 0
            while (v < un) { dh += dz(t + 1)(x)(v) * p.uu(x)(v)(u); v += 1 }
            x += 1
          }
        }
        var dcu = dh * gate(t)(3)(u) * (1.0 - tc(t)(u) * tc(t)(u))
        if (t < T) dcu += dc(t + 1)(u) * gate(t + 1)(1)(u)
        dc(t)(u) = dcu
        val iu = gate(t)(0)(u); val fu = gate(t)(1)(u)
        val gu = gate(t)(2)(u); val ou = gate(t)(3)(u)
        dz(t)(0)(u) = dcu * gu * iu * (1.0 - iu)
        dz(t)(1)(u) = dcu * c(t - 1)(u) * fu * (1.0 - fu)
        dz(t)(2)(u) = dcu * iu * (1.0 - gu * gu)
        dz(t)(3)(u) = dh * tc(t)(u) * ou * (1.0 - ou)
        u += 1
      }
      t -= 1
    }
    var x = 0
    while (x < 4) {
      var u = 0
      while (u < un) {
        var swx = 0.0; var sb = 0.0
        var t2 = 1
        while (t2 <= T) {
          swx += dz(t2)(x)(u) * s.x(t2 - 1); sb += dz(t2)(x)(u); t2 += 1
        }
        g(ly.wxOff(x) + u) += swx
        g(ly.bOff(x) + u) += sb
        var v = 0
        while (v < un) {
          var sw = 0.0
          t2 = 1
          while (t2 <= T) { sw += dz(t2)(x)(u) * h(t2 - 1)(v); t2 += 1 }
          g(ly.uOff(x) + u * un + v) += sw
          v += 1
        }
        u += 1
      }
      x += 1
    }
  }

  /** One full-batch gated-BPTT pass — the [[LstmTrainer.gradients]]
    * contract on the treeAggregate path. */
  def gradients(df: DataFrame, xs: Seq[Column], label: Column,
      w: LstmWeights): LstmGrads =
    gradientsRdd(WideNet.sampleRdd(df, xs, label, lit(0L), lit(false)), w)

  /** [[gradients]] over pre-decoded typed rows — the fit loops call
    * this against ONE cached RDD instead of re-planning/re-decoding a
    * fresh DataFrame per epoch ([[WideNet.withSamples]]). */
  private def gradientsRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: LstmWeights): LstmGrads = {
    val spark = org.apache.spark.sql.SparkSession.active
    val packed = new Packed(w)
    val ly = new Layout(packed)
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = rows.treeAggregate(new Array[Double](ly.size))(
      seqOp = (buf, s) => {
        val (p, l) = bc.value
        accumulate(s, p, l, buf); buf
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    bc.destroy()
    val n = g(ly.statsOff + 1)
    require(n > 0, "WideLstm.gradients: empty training input")
    val un = packed.units; val kc = packed.kc
    def gateGrad(x: Int) = GateW(
      Seq.tabulate(un)(u => g(ly.wxOff(x) + u) / n),
      Seq.tabulate(un, un)((u, v) => g(ly.uOff(x) + u * un + v) / n),
      Seq.tabulate(un)(u => g(ly.bOff(x) + u) / n))
    LstmGrads(gateGrad(0), gateGrad(1), gateGrad(2), gateGrad(3),
      Seq.tabulate(kc, un)((o, u) => g(ly.w2Off + o * un + u) / n),
      Seq.tabulate(kc)(o => g(ly.b2Off + o) / n),
      g(ly.statsOff) / n)
  }

  /** Full-batch gated-BPTT GD on the wide path ([[LstmTrainer.fit]]
    * contract). */
  def fit(df: DataFrame, xs: Seq[Column], label: Column, w0: LstmWeights,
      epochs: Int, lr: Double): (LstmWeights, Seq[Double]) =
    WideNet.withSamples(df, xs, label, lit(0L), lit(false)) { rows =>
      var w = w0
      val losses = (1 to epochs).map { _ =>
        val gr = gradientsRdd(rows, w)
        w = LstmTrainer.applyStep(w, gr, lr)
        gr.loss
      }
      (w, losses)
    }

  /** [[fit]] with pluggable optimizer (the reference's Adam) and
    * optional deterministic hash mini-batching (no validation slice on
    * this twin — batches are plain row-local filters); sgd +
    * nBatches=1 reproduces [[fit]]. Full-batch runs on the cached-RDD
    * path; the batched form keeps per-batch DataFrame filters
    * (membership is a (keys, epoch) hash — it changes every epoch). */
  def fitOpt(df: DataFrame, xs: Seq[Column], label: Column,
      w0: LstmWeights, epochs: Int, opt: TrainerCommon.Optimizer,
      batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): (LstmWeights, Seq[Double]) =
    if (nBatches == 1)
      WideNet.withSamples(df, xs, label, lit(0L), lit(false)) { rows =>
        var w = w0
        val losses = (1 to epochs).map { _ =>
          val gr = gradientsRdd(rows, w)
          w = LstmTrainer.applyOpt(w, gr, opt)
          gr.loss
        }
        (w, losses)
      }
    else
      TrainerCommon.fitLoop(df, epochs, batchKeys, nBatches, w0) { (dfb, w) =>
        val gr = gradients(dfb, xs, label, w)
        (LstmTrainer.applyOpt(w, gr, opt), gr.loss)
      }
}
