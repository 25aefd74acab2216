package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-WIDTH execution path for [[Lstm2Trainer]] — the stacked
  * LSTM twin of [[WideNet]] (see that file for the full rationale): the
  * staged-expression stack is the oracle-checkable representation at
  * fixture widths, but its plan grows as O((u1 + u2)^2) expression nodes
  * and the reference's real widths (`models/lstm_model.py:19-26`:
  * LSTM(64) → LSTM(128) → Dense(64)) need the treeAggregate shape —
  * per-partition imperative gated BPTT over typed rows, weights
  * broadcast, one O(params) reduction per epoch.
  *
  * EQUIVALENCE CONTRACT: gradients, losses, inter-layer and head dropout
  * masks ([[TrainerCommon.dropMask]] replayed via [[WideNet]]'s XXH64
  * twin with the same unit-index seeding: (t-1)*u1+u for the sequence
  * mask, T*u1+u for the head mask), and early-stop trajectories match
  * [[Lstm2Trainer.gradientsVal]] number for number at any tractable
  * width — WideLstm2Spec pins it tensor for tensor.
  */
object WideLstm2 {
  import Lstm2Trainer.{W, G, Gate1, Gate2}
  import WideNet.{Sample, dropMaskLocal}

  private val Gates = Array("i", "f", "g", "o")

  /** Packed weights: gate-major arrays, O(1) hot-loop access. Gate order
    * i/f/g/o throughout. */
  private final class Packed(w: W) extends Serializable {
    val u1: Int = w.u1
    val u2: Int = w.u2
    val d: Int = w.d
    val kc: Int = w.classes
    // layer 1: wx1(x)(u), uu1(x)(u)(v), b1(x)(u)
    val wx1: Array[Array[Double]] = Gates.map(x => w.l1(x).wx.toArray)
    val uu1: Array[Array[Array[Double]]] =
      Gates.map(x => w.l1(x).u.map(_.toArray).toArray)
    val b1: Array[Array[Double]] = Gates.map(x => w.l1(x).b.toArray)
    // layer 2: wx2(x)(u)(v over u1), uu2(x)(u)(v over u2), b2(x)(u)
    val wx2: Array[Array[Array[Double]]] =
      Gates.map(x => w.l2(x).wx.map(_.toArray).toArray)
    val uu2: Array[Array[Array[Double]]] =
      Gates.map(x => w.l2(x).u.map(_.toArray).toArray)
    val b2: Array[Array[Double]] = Gates.map(x => w.l2(x).b.toArray)
    val wd: Array[Array[Double]] = w.wd.map(_.toArray).toArray
    val bd: Array[Double] = w.bd.toArray
    val w3: Array[Array[Double]] = w.w3.map(_.toArray).toArray
    val b3: Array[Double] = w.b3.toArray
  }

  /** Gradient buffer layout (gate-major, mirroring Packed). */
  private final class Layout(p: Packed) extends Serializable {
    val wx1Off: Int = 0                                  // 4 * u1
    val uu1Off: Int = wx1Off + 4 * p.u1                  // 4 * u1 * u1
    val b1Off: Int = uu1Off + 4 * p.u1 * p.u1            // 4 * u1
    val wx2Off: Int = b1Off + 4 * p.u1                   // 4 * u2 * u1
    val uu2Off: Int = wx2Off + 4 * p.u2 * p.u1           // 4 * u2 * u2
    val b2Off: Int = uu2Off + 4 * p.u2 * p.u2            // 4 * u2
    val wdOff: Int = b2Off + 4 * p.u2                    // d * u2
    val bdOff: Int = wdOff + p.d * p.u2                  // d
    val w3Off: Int = bdOff + p.d                         // kc * d
    val b3Off: Int = w3Off + p.kc * p.d                  // kc
    val statsOff: Int = b3Off + p.kc                     // 4
    val size: Int = statsOff + 4
  }

  private def sigm(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** One row's contribution — line for line the staged columns of
    * [[Lstm2Trainer.gradientsVal]]. */
  private def accumulate(s: Sample, p: Packed, ly: Layout, epoch: Int,
      dropout: Double, g: Array[Double]): Unit = {
    val T = s.x.length
    val u1 = p.u1; val u2 = p.u2
    // forward state, (t, u); t index 1..T, 0 = zero init
    def mk(n: Int) = Array.ofDim[Double](T + 1, n)
    val i1 = mk(u1); val f1 = mk(u1); val g1 = mk(u1); val o1 = mk(u1)
    val c1 = mk(u1); val tc1 = mk(u1); val h1 = mk(u1); val a1 = mk(u1)
    val i2 = mk(u2); val f2 = mk(u2); val g2 = mk(u2); val o2 = mk(u2)
    val c2 = mk(u2); val tc2 = mk(u2); val h2 = mk(u2)
    val m1v = mk(u1)
    var t = 1
    while (t <= T) {
      val xt = s.x(t - 1)
      var u = 0
      while (u < u1) {
        var x = 0
        val pre = new Array[Double](4)
        while (x < 4) {
          var acc = xt * p.wx1(x)(u) + p.b1(x)(u)
          val uv = p.uu1(x)(u)
          var v = 0
          while (v < u1) { acc += h1(t - 1)(v) * uv(v); v += 1 }
          pre(x) = acc; x += 1
        }
        i1(t)(u) = sigm(pre(0)); f1(t)(u) = sigm(pre(1))
        g1(t)(u) = math.tanh(pre(2)); o1(t)(u) = sigm(pre(3))
        c1(t)(u) = f1(t)(u) * c1(t - 1)(u) + i1(t)(u) * g1(t)(u)
        tc1(t)(u) = math.tanh(c1(t)(u))
        h1(t)(u) = o1(t)(u) * tc1(t)(u)
        m1v(t)(u) = dropMaskLocal(s.iv, s.rk, epoch, (t - 1) * u1 + u,
          dropout)
        a1(t)(u) = h1(t)(u) * m1v(t)(u)
        u += 1
      }
      u = 0
      while (u < u2) {
        var x = 0
        val pre = new Array[Double](4)
        while (x < 4) {
          var acc = p.b2(x)(u)
          val wxv = p.wx2(x)(u)
          var v = 0
          while (v < u1) { acc += a1(t)(v) * wxv(v); v += 1 }
          val uv = p.uu2(x)(u)
          v = 0
          while (v < u2) { acc += h2(t - 1)(v) * uv(v); v += 1 }
          pre(x) = acc; x += 1
        }
        i2(t)(u) = sigm(pre(0)); f2(t)(u) = sigm(pre(1))
        g2(t)(u) = math.tanh(pre(2)); o2(t)(u) = sigm(pre(3))
        c2(t)(u) = f2(t)(u) * c2(t - 1)(u) + i2(t)(u) * g2(t)(u)
        tc2(t)(u) = math.tanh(c2(t)(u))
        h2(t)(u) = o2(t)(u) * tc2(t)(u)
        u += 1
      }
      t += 1
    }
    // head: dropped h2_T -> relu Dense(d) -> softmax
    val m2v = new Array[Double](u2)
    val a2 = new Array[Double](u2)
    var u = 0
    while (u < u2) {
      m2v(u) = dropMaskLocal(s.iv, s.rk, epoch, T * u1 + u, dropout)
      a2(u) = h2(T)(u) * m2v(u); u += 1
    }
    val zd = new Array[Double](p.d)
    val ad = new Array[Double](p.d)
    var j = 0
    while (j < p.d) {
      var acc = p.bd(j)
      val wj = p.wd(j)
      var v = 0
      while (v < u2) { acc += a2(v) * wj(v); v += 1 }
      zd(j) = acc; ad(j) = if (acc > 0) acc else 0.0; j += 1
    }
    val z3 = new Array[Double](p.kc)
    var o = 0
    while (o < p.kc) {
      var acc = p.b3(o)
      val wo = p.w3(o)
      var j2 = 0
      while (j2 < p.d) { acc += ad(j2) * wo(j2); j2 += 1 }
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
    val dzd = new Array[Double](p.d)
    j = 0
    while (j < p.d) {
      var acc = 0.0
      o = 0
      while (o < p.kc) { acc += dzo(o) * p.w3(o)(j); o += 1 }
      dzd(j) = acc * (if (zd(j) > 0) 1.0 else 0.0); j += 1
    }
    // backward through time; dz per gate at (t, u)
    val dz1 = Array.ofDim[Double](4, T + 1, u1)
    val dz2 = Array.ofDim[Double](4, T + 1, u2)
    val dc1 = Array.ofDim[Double](T + 2, u1)
    val dc2 = Array.ofDim[Double](T + 2, u2)
    t = T
    while (t >= 1) {
      var u3 = 0
      while (u3 < u2) {
        val dh2 =
          if (t == T) {
            var acc = 0.0
            var j2 = 0
            while (j2 < p.d) { acc += dzd(j2) * p.wd(j2)(u3); j2 += 1 }
            acc * m2v(u3)
          } else {
            var acc = 0.0
            var x = 0
            while (x < 4) {
              var v = 0
              while (v < u2) { acc += dz2(x)(t + 1)(v) * p.uu2(x)(v)(u3); v += 1 }
              x += 1
            }
            acc
          }
        val local = dh2 * o2(t)(u3) * (1.0 - tc2(t)(u3) * tc2(t)(u3))
        val dc = if (t == T) local else local + dc2(t + 1)(u3) * f2(t + 1)(u3)
        dc2(t)(u3) = dc
        dz2(0)(t)(u3) = dc * g2(t)(u3) * i2(t)(u3) * (1.0 - i2(t)(u3))
        dz2(1)(t)(u3) = dc * c2(t - 1)(u3) * f2(t)(u3) * (1.0 - f2(t)(u3))
        dz2(2)(t)(u3) = dc * i2(t)(u3) * (1.0 - g2(t)(u3) * g2(t)(u3))
        dz2(3)(t)(u3) = dh2 * tc2(t)(u3) * o2(t)(u3) * (1.0 - o2(t)(u3))
        u3 += 1
      }
      var u4 = 0
      while (u4 < u1) {
        var da1 = 0.0
        var x = 0
        while (x < 4) {
          var v = 0
          while (v < u2) { da1 += dz2(x)(t)(v) * p.wx2(x)(v)(u4); v += 1 }
          x += 1
        }
        da1 *= m1v(t)(u4)
        val dh1 =
          if (t == T) da1
          else {
            var acc = da1
            var x2 = 0
            while (x2 < 4) {
              var v = 0
              while (v < u1) { acc += dz1(x2)(t + 1)(v) * p.uu1(x2)(v)(u4); v += 1 }
              x2 += 1
            }
            acc
          }
        val local = dh1 * o1(t)(u4) * (1.0 - tc1(t)(u4) * tc1(t)(u4))
        val dc = if (t == T) local else local + dc1(t + 1)(u4) * f1(t + 1)(u4)
        dc1(t)(u4) = dc
        dz1(0)(t)(u4) = dc * g1(t)(u4) * i1(t)(u4) * (1.0 - i1(t)(u4))
        dz1(1)(t)(u4) = dc * c1(t - 1)(u4) * f1(t)(u4) * (1.0 - f1(t)(u4))
        dz1(2)(t)(u4) = dc * i1(t)(u4) * (1.0 - g1(t)(u4) * g1(t)(u4))
        dz1(3)(t)(u4) = dh1 * tc1(t)(u4) * o1(t)(u4) * (1.0 - o1(t)(u4))
        u4 += 1
      }
      t -= 1
    }
    // gradient accumulation (sum over t; mean over rows happens at the end)
    var x = 0
    while (x < 4) {
      var u5 = 0
      while (u5 < u1) {
        var swx = 0.0; var sb = 0.0
        var t2 = 1
        while (t2 <= T) {
          swx += dz1(x)(t2)(u5) * s.x(t2 - 1)
          sb += dz1(x)(t2)(u5)
          t2 += 1
        }
        g(ly.wx1Off + x * u1 + u5) += swx
        g(ly.b1Off + x * u1 + u5) += sb
        var v = 0
        while (v < u1) {
          var su = 0.0
          t2 = 1
          while (t2 <= T) { su += dz1(x)(t2)(u5) * h1(t2 - 1)(v); t2 += 1 }
          g(ly.uu1Off + (x * u1 + u5) * u1 + v) += su
          v += 1
        }
        u5 += 1
      }
      var u6 = 0
      while (u6 < u2) {
        var sb = 0.0
        var t2 = 1
        while (t2 <= T) { sb += dz2(x)(t2)(u6); t2 += 1 }
        g(ly.b2Off + x * u2 + u6) += sb
        var v = 0
        while (v < u1) {
          var swx = 0.0
          t2 = 1
          while (t2 <= T) { swx += dz2(x)(t2)(u6) * a1(t2)(v); t2 += 1 }
          g(ly.wx2Off + (x * u2 + u6) * u1 + v) += swx
          v += 1
        }
        v = 0
        while (v < u2) {
          var su = 0.0
          t2 = 1
          while (t2 <= T) { su += dz2(x)(t2)(u6) * h2(t2 - 1)(v); t2 += 1 }
          g(ly.uu2Off + (x * u2 + u6) * u2 + v) += su
          v += 1
        }
        u6 += 1
      }
      x += 1
    }
    j = 0
    while (j < p.d) {
      g(ly.bdOff + j) += dzd(j)
      var v = 0
      while (v < u2) { g(ly.wdOff + j * u2 + v) += dzd(j) * a2(v); v += 1 }
      j += 1
    }
    o = 0
    while (o < p.kc) {
      g(ly.b3Off + o) += dzo(o)
      var j2 = 0
      while (j2 < p.d) { g(ly.w3Off + o * p.d + j2) += dzo(o) * ad(j2); j2 += 1 }
      o += 1
    }
  }

  /** One full-batch pass — the [[Lstm2Trainer.gradientsVal]] contract on
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
    require(n > 0, "WideLstm2.gradients: empty training input")
    val nVal = g(ly.statsOff + 3)
    val u1 = packed.u1; val u2 = packed.u2
    (G(
      Gates.zipWithIndex.map { case (name, x) => name -> Gate1(
        Seq.tabulate(u1)(u => g(ly.wx1Off + x * u1 + u) / n),
        Seq.tabulate(u1, u1)((u, v) =>
          g(ly.uu1Off + (x * u1 + u) * u1 + v) / n),
        Seq.tabulate(u1)(u => g(ly.b1Off + x * u1 + u) / n)) }.toMap,
      Gates.zipWithIndex.map { case (name, x) => name -> Gate2(
        Seq.tabulate(u2, u1)((u, v) =>
          g(ly.wx2Off + (x * u2 + u) * u1 + v) / n),
        Seq.tabulate(u2, u2)((u, v) =>
          g(ly.uu2Off + (x * u2 + u) * u2 + v) / n),
        Seq.tabulate(u2)(u => g(ly.b2Off + x * u2 + u) / n)) }.toMap,
      Seq.tabulate(packed.d, u2)((j, u) => g(ly.wdOff + j * u2 + u) / n),
      Seq.tabulate(packed.d)(j => g(ly.bdOff + j) / n),
      Seq.tabulate(packed.kc, packed.d)((o, j) =>
        g(ly.w3Off + o * packed.d + j) / n),
      Seq.tabulate(packed.kc)(o => g(ly.b3Off + o) / n),
      g(ly.statsOff) / n),
      if (nVal > 0) Some(g(ly.statsOff + 2) / nVal) else None)
  }

  /** Mean validation loss at `w` over the val rows ALONE — the trailing
    * early-stop pass's only consumed number
    * ([[TrainerCommon.earlyStop]]'s evalPass). Forward-only by
    * construction: [[accumulate]] early-returns for val rows right
    * after the loss tally, so filtering the frame to the val slice
    * skips the train rows' backward + gradient-accumulation work the
    * full trailing pass used to compute and then discard. Bit-identical
    * to [[gradientsVal]]'s val output: the filter is narrow (same
    * partitions, same in-partition row order), val rows run inference
    * semantics (keep-all masks — epoch and dropout never reach their
    * arithmetic), and the per-partition loss sums combine in the same
    * treeAggregate order. */
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
    require(nVal > 0, "WideLstm2.valLoss: empty validation slice")
    g(ly.statsOff + 2) / nVal
  }

  /** Full-batch gated-BPTT GD on the wide path. */
  def fit(df: DataFrame, xs: Seq[Column], label: Column, w0: W,
      epochs: Int, lr: Double, rowKey: Column = lit(0L),
      dropout: Double = 0.0): (W, Seq[Double]) = {
    var w = w0
    val losses = (1 to epochs).map { e =>
      val (gr, _) = gradientsVal(df, xs, label, rowKey, w, e, dropout,
        lit(false))
      w = Lstm2Trainer.step(w, gr, lr)
      gr.loss
    }
    (w, losses)
  }

  /** [[fit]] with pluggable optimizer (the reference's Adam); sgd
    * reproduces [[fit]]. */
  def fitOpt(df: DataFrame, xs: Seq[Column], label: Column, w0: W,
      epochs: Int, opt: TrainerCommon.Optimizer,
      rowKey: Column = lit(0L),
      dropout: Double = 0.0): (W, Seq[Double]) = {
    var w = w0
    val losses = (1 to epochs).map { e =>
      val (gr, _) = gradientsVal(df, xs, label, rowKey, w, e, dropout,
        lit(false))
      w = Lstm2Trainer.applyOpt(w, gr, opt)
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
      (Lstm2Trainer.step(w, gr, lr), gr.loss,
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
          (Lstm2Trainer.applyOpt(wc, gr, opt), gr.loss, vl)
      }
    }
}
