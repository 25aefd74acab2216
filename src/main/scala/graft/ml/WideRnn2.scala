package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-WIDTH execution path for [[Rnn2Trainer]] — the stacked
  * SimpleRNN member of the [[WideNet]]/[[WideLstm2]] family (see
  * WideNet for the representation rationale): identical stacked-BPTT
  * math as per-partition imperative accumulation + one O(params)
  * treeAggregate per epoch, for the reference's real widths
  * (`models/rnn_model.py:19-26`: SimpleRNN(64) → SimpleRNN(128)).
  * WideRnn2Spec pins gradient-for-gradient equivalence against the
  * staged trainer, dropout masks included.
  */
object WideRnn2 {
  import Rnn2Trainer.{W, G}
  import WideNet.{Sample, dropMaskLocal}

  private final class Packed(w: W) extends Serializable {
    val u1: Int = w.u1
    val u2: Int = w.u2
    val kc: Int = w.classes
    val wx1: Array[Double] = w.wx1.toArray
    val wh1: Array[Array[Double]] = w.wh1.map(_.toArray).toArray
    val b1: Array[Double] = w.b1.toArray
    val wx2: Array[Array[Double]] = w.wx2.map(_.toArray).toArray
    val wh2: Array[Array[Double]] = w.wh2.map(_.toArray).toArray
    val b2: Array[Double] = w.b2.toArray
    val w3: Array[Array[Double]] = w.w3.map(_.toArray).toArray
    val b3: Array[Double] = w.b3.toArray
  }

  private final class Layout(p: Packed) extends Serializable {
    val wx1Off: Int = 0
    val wh1Off: Int = wx1Off + p.u1
    val b1Off: Int = wh1Off + p.u1 * p.u1
    val wx2Off: Int = b1Off + p.u1
    val wh2Off: Int = wx2Off + p.u2 * p.u1
    val b2Off: Int = wh2Off + p.u2 * p.u2
    val w3Off: Int = b2Off + p.u2
    val b3Off: Int = w3Off + p.kc * p.u2
    val statsOff: Int = b3Off + p.kc
    val size: Int = statsOff + 4
  }

  private def accumulate(s: Sample, p: Packed, ly: Layout, epoch: Int,
      dropout: Double, g: Array[Double]): Unit = {
    val T = s.x.length
    val u1 = p.u1; val u2 = p.u2
    val h1 = Array.ofDim[Double](T + 1, u1)
    val a1 = Array.ofDim[Double](T + 1, u1)
    val m1v = Array.ofDim[Double](T + 1, u1)
    val h2 = Array.ofDim[Double](T + 1, u2)
    var t = 1
    while (t <= T) {
      val xt = s.x(t - 1)
      var u = 0
      while (u < u1) {
        var acc = xt * p.wx1(u) + p.b1(u)
        val wu = p.wh1(u)
        var v = 0
        while (v < u1) { acc += h1(t - 1)(v) * wu(v); v += 1 }
        h1(t)(u) = if (acc > 0) acc else 0.0
        m1v(t)(u) = dropMaskLocal(s.iv, s.rk, epoch, (t - 1) * u1 + u,
          dropout)
        a1(t)(u) = h1(t)(u) * m1v(t)(u)
        u += 1
      }
      u = 0
      while (u < u2) {
        var acc = p.b2(u)
        val wxu = p.wx2(u)
        var v = 0
        while (v < u1) { acc += a1(t)(v) * wxu(v); v += 1 }
        val whu = p.wh2(u)
        v = 0
        while (v < u2) { acc += h2(t - 1)(v) * whu(v); v += 1 }
        h2(t)(u) = if (acc > 0) acc else 0.0
        u += 1
      }
      t += 1
    }
    val m2v = new Array[Double](u2)
    val a2 = new Array[Double](u2)
    var u = 0
    while (u < u2) {
      m2v(u) = dropMaskLocal(s.iv, s.rk, epoch, T * u1 + u, dropout)
      a2(u) = h2(T)(u) * m2v(u); u += 1
    }
    val z3 = new Array[Double](p.kc)
    var o = 0
    while (o < p.kc) {
      var acc = p.b3(o)
      val wo = p.w3(o)
      var v = 0
      while (v < u2) { acc += a2(v) * wo(v); v += 1 }
      z3(o) = acc; o += 1
    }
    var mx = z3(0); o = 1
    while (o < p.kc) { if (z3(o) > mx) mx = z3(o); o += 1 }
    var denom = 0.0; o = 0
    while (o < p.kc) { denom += math.exp(z3(o) - mx); o += 1 }
    val loss = math.log(denom) + mx - z3(s.y)
    if (s.iv) {
      g(ly.statsOff + 2) += loss; g(ly.statsOff + 3) += 1.0
      return
    }
    g(ly.statsOff) += loss; g(ly.statsOff + 1) += 1.0
    val dzo = new Array[Double](p.kc)
    o = 0
    while (o < p.kc) {
      dzo(o) = math.exp(z3(o) - mx) / denom - (if (s.y == o) 1.0 else 0.0)
      o += 1
    }
    val dz1 = Array.ofDim[Double](T + 2, u1)
    val dz2 = Array.ofDim[Double](T + 2, u2)
    t = T
    while (t >= 1) {
      var u3 = 0
      while (u3 < u2) {
        val dh2 =
          if (t == T) {
            var acc = 0.0
            o = 0
            while (o < p.kc) { acc += dzo(o) * p.w3(o)(u3); o += 1 }
            acc * m2v(u3)
          } else {
            var acc = 0.0
            var v = 0
            while (v < u2) { acc += dz2(t + 1)(v) * p.wh2(v)(u3); v += 1 }
            acc
          }
        dz2(t)(u3) = dh2 * (if (h2(t)(u3) > 0) 1.0 else 0.0)
        u3 += 1
      }
      var u4 = 0
      while (u4 < u1) {
        var fromL2 = 0.0
        var v = 0
        while (v < u2) { fromL2 += dz2(t)(v) * p.wx2(v)(u4); v += 1 }
        fromL2 *= m1v(t)(u4)
        var dh1 = fromL2
        if (t < T) {
          v = 0
          while (v < u1) { dh1 += dz1(t + 1)(v) * p.wh1(v)(u4); v += 1 }
        }
        dz1(t)(u4) = dh1 * (if (h1(t)(u4) > 0) 1.0 else 0.0)
        u4 += 1
      }
      t -= 1
    }
    var u5 = 0
    while (u5 < u1) {
      var swx = 0.0; var sb = 0.0
      var t2 = 1
      while (t2 <= T) {
        swx += dz1(t2)(u5) * s.x(t2 - 1); sb += dz1(t2)(u5); t2 += 1
      }
      g(ly.wx1Off + u5) += swx
      g(ly.b1Off + u5) += sb
      var v = 0
      while (v < u1) {
        var sw = 0.0
        t2 = 1
        while (t2 <= T) { sw += dz1(t2)(u5) * h1(t2 - 1)(v); t2 += 1 }
        g(ly.wh1Off + u5 * u1 + v) += sw
        v += 1
      }
      u5 += 1
    }
    var u6 = 0
    while (u6 < u2) {
      var sb = 0.0
      var t2 = 1
      while (t2 <= T) { sb += dz2(t2)(u6); t2 += 1 }
      g(ly.b2Off + u6) += sb
      var v = 0
      while (v < u1) {
        var sw = 0.0
        t2 = 1
        while (t2 <= T) { sw += dz2(t2)(u6) * a1(t2)(v); t2 += 1 }
        g(ly.wx2Off + u6 * u1 + v) += sw
        v += 1
      }
      v = 0
      while (v < u2) {
        var sw = 0.0
        t2 = 1
        while (t2 <= T) { sw += dz2(t2)(u6) * h2(t2 - 1)(v); t2 += 1 }
        g(ly.wh2Off + u6 * u2 + v) += sw
        v += 1
      }
      u6 += 1
    }
    o = 0
    while (o < p.kc) {
      g(ly.b3Off + o) += dzo(o)
      var v = 0
      while (v < u2) { g(ly.w3Off + o * u2 + v) += dzo(o) * a2(v); v += 1 }
      o += 1
    }
  }

  /** One full-batch pass — the [[Rnn2Trainer.gradientsVal]] contract on
    * the treeAggregate path. */
  def gradientsVal(df: DataFrame, xs: Seq[Column], label: Column,
      rowKey: Column, w: W, epoch: Int, dropout: Double,
      isVal: Column): (G, Option[Double]) = {
    require(dropout >= 0.0 && dropout < 1.0, "dropout in [0, 1)")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = new Packed(w)
    val ly = new Layout(packed)
    val ds = df.select(
      array(xs.map(_.cast("double")): _*).as("x"),
      label.cast("int").as("y"), rowKey.cast("long").as("rk"),
      isVal.cast("boolean").as("iv")).as[Sample]
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = ds.rdd.treeAggregate(new Array[Double](ly.size))(
      seqOp = (buf, s) => {
        val (p, l) = bc.value
        accumulate(s, p, l, epoch, dropout, buf); buf
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    bc.destroy()
    val n = g(ly.statsOff + 1)
    require(n > 0, "WideRnn2.gradients: empty training input")
    val nVal = g(ly.statsOff + 3)
    val u1 = packed.u1; val u2 = packed.u2
    (G(
      Seq.tabulate(u1)(u => g(ly.wx1Off + u) / n),
      Seq.tabulate(u1, u1)((u, v) => g(ly.wh1Off + u * u1 + v) / n),
      Seq.tabulate(u1)(u => g(ly.b1Off + u) / n),
      Seq.tabulate(u2, u1)((u, v) => g(ly.wx2Off + u * u1 + v) / n),
      Seq.tabulate(u2, u2)((u, v) => g(ly.wh2Off + u * u2 + v) / n),
      Seq.tabulate(u2)(u => g(ly.b2Off + u) / n),
      Seq.tabulate(packed.kc, u2)((o, u) => g(ly.w3Off + o * u2 + u) / n),
      Seq.tabulate(packed.kc)(o => g(ly.b3Off + o) / n),
      g(ly.statsOff) / n),
      if (nVal > 0) Some(g(ly.statsOff + 2) / nVal) else None)
  }

  /** Mean validation loss at `w` over the val rows ALONE — the trailing
    * early-stop pass's only consumed number
    * ([[TrainerCommon.earlyStop]]'s evalPass). Forward-only by
    * construction ([[accumulate]] early-returns for val rows after the
    * loss tally) and bit-identical to [[gradientsVal]]'s val output:
    * narrow filter (same partitions, same in-partition order), val rows
    * run inference semantics (keep-all masks), same treeAggregate
    * combine order. */
  def valLoss(df: DataFrame, xs: Seq[Column], label: Column,
      rowKey: Column, w: W, isVal: Column): Double = {
    val spark = df.sparkSession
    import spark.implicits._
    val packed = new Packed(w)
    val ly = new Layout(packed)
    val ds = df.filter(isVal).select(
      array(xs.map(_.cast("double")): _*).as("x"),
      label.cast("int").as("y"), rowKey.cast("long").as("rk"),
      lit(true).as("iv")).as[Sample]
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = ds.rdd.treeAggregate(new Array[Double](ly.size))(
      seqOp = (buf, s) => {
        val (p, l) = bc.value
        accumulate(s, p, l, epoch = 0, dropout = 0.0, buf); buf
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    bc.destroy()
    val nVal = g(ly.statsOff + 3)
    require(nVal > 0, "WideRnn2.valLoss: empty validation slice")
    g(ly.statsOff + 2) / nVal
  }

  /** Full-batch stacked-BPTT GD on the wide path. */
  def fit(df: DataFrame, xs: Seq[Column], label: Column, w0: W,
      epochs: Int, lr: Double, rowKey: Column = lit(0L),
      dropout: Double = 0.0): (W, Seq[Double]) = {
    var w = w0
    val losses = (1 to epochs).map { e =>
      val (gr, _) = gradientsVal(df, xs, label, rowKey, w, e, dropout,
        lit(false))
      w = Rnn2Trainer.step(w, gr, lr)
      gr.loss
    }
    (w, losses)
  }

  /** [[fit]] under Keras EarlyStopping ([[TrainerCommon.earlyStop]]). */
  def fitEs(df: DataFrame, xs: Seq[Column], label: Column, w0: W,
      maxEpochs: Int, lr: Double, rowKey: Column, dropout: Double,
      isVal: Column, patience: Int = 5): TrainerCommon.EsResult[W] =
    TrainerCommon.earlyStop(w0, maxEpochs, patience,
        evalPass = Some(wc => valLoss(df, xs, label, rowKey, wc, isVal))) {
      (w, e) =>
      val (gr, vl) = gradientsVal(df, xs, label, rowKey, w, e, dropout,
        isVal)
      (Rnn2Trainer.step(w, gr, lr), gr.loss,
        vl.getOrElse(sys.error("fitEs: empty validation slice")))
    }

  /** [[fitEs]] with pluggable optimizer + hash mini-batching
    * ([[TrainerCommon.batchedEpoch]]); sgd + nBatches=1 reproduces
    * [[fitEs]]. */
  def fitEsOpt(df: DataFrame, xs: Seq[Column], label: Column, w0: W,
      maxEpochs: Int, opt: TrainerCommon.Optimizer, rowKey: Column,
      dropout: Double, isVal: Column, patience: Int = 5,
      batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): TrainerCommon.EsResult[W] =
    TrainerCommon.earlyStop(w0, maxEpochs, patience,
        evalPass = Some(wc => valLoss(df, xs, label, rowKey, wc, isVal))) {
      (w, e) =>
      TrainerCommon.batchedEpoch(df, isVal, batchKeys, nBatches, e, w,
          evalOnly = e > maxEpochs) {
        (dfb, ivb, wc) =>
          val (gr, vl) = gradientsVal(dfb, xs, label, rowKey, wc, e,
            dropout, ivb)
          (Rnn2Trainer.applyOpt(wc, gr, opt), gr.loss, vl)
      }
    }
}
