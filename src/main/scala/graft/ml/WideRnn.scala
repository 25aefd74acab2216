package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-WIDTH execution path for [[RnnTrainer]] — the single-layer
  * SimpleRNN member of the wide-twin family (see [[WideNet]] for the
  * representation rationale): the same BPTT math as per-partition
  * imperative accumulation + one O(params) treeAggregate per epoch, the
  * honest execution form at the reference's real widths
  * (`models/rnn_model.py:19-26`: SimpleRNN(64)). WideSinglesSpec pins
  * gradient-for-gradient equivalence against
  * [[RnnTrainer.gradientsVal]], the post-recurrence dropout mask and
  * the val slice included.
  */
object WideRnn {
  import RnnTrainer.{RnnWeights, RnnGrads}
  import WideNet.{Sample, dropMaskLocal}

  private final class Packed(w: RnnWeights) extends Serializable {
    val wx: Array[Double] = w.wx.toArray
    val wh: Array[Array[Double]] = w.wh.map(_.toArray).toArray
    val b: Array[Double] = w.b.toArray
    val w2: Array[Array[Double]] = w.w2.map(_.toArray).toArray
    val b2: Array[Double] = w.b2.toArray
    val units: Int = w.units
    val kc: Int = w.classes
  }

  /** Buffer layout: wx (u), wh (u,u), b (u), w2 (kc,u), b2 (kc), then
    * [train loss sum, train count, val loss sum, val count]. */
  private final class Layout(p: Packed) extends Serializable {
    val wxOff: Int = 0
    val whOff: Int = wxOff + p.units
    val bOff: Int = whOff + p.units * p.units
    val w2Off: Int = bOff + p.units
    val b2Off: Int = w2Off + p.kc * p.units
    val statsOff: Int = b2Off + p.kc
    val size: Int = statsOff + 4
  }

  /** One row's contribution — line-for-line the staged
    * [[RnnTrainer.gradientsVal]] columns: relu recurrence, dropout on
    * h_T only (the post-recurrence Keras position), softmax head, and
    * the dh_{t-1} = whT dz_t backward chain. */
  private def accumulate(s: Sample, p: Packed, ly: Layout, epoch: Int,
      dropout: Double, g: Array[Double]): Unit = {
    val T = s.x.length
    val un = p.units
    val h = Array.ofDim[Double](T + 1, un)
    var t = 1
    while (t <= T) {
      val xt = s.x(t - 1)
      var u = 0
      while (u < un) {
        var acc = xt * p.wx(u) + p.b(u)
        val wu = p.wh(u)
        var v = 0
        while (v < un) { acc += h(t - 1)(v) * wu(v); v += 1 }
        h(t)(u) = if (acc > 0) acc else 0.0
        u += 1
      }
      t += 1
    }
    val mask = new Array[Double](un)
    val aT = new Array[Double](un)
    var u = 0
    while (u < un) {
      mask(u) = dropMaskLocal(s.iv, s.rk, epoch, u, dropout)
      aT(u) = h(T)(u) * mask(u); u += 1
    }
    val z2 = new Array[Double](p.kc)
    var o = 0
    while (o < p.kc) {
      var acc = p.b2(o)
      val wo = p.w2(o)
      var v = 0
      while (v < un) { acc += aT(v) * wo(v); v += 1 }
      z2(o) = acc; o += 1
    }
    var mx = z2(0); o = 1
    while (o < p.kc) { if (z2(o) > mx) mx = z2(o); o += 1 }
    var denom = 0.0; o = 0
    while (o < p.kc) { denom += math.exp(z2(o) - mx); o += 1 }
    val loss = math.log(denom) + mx - z2(s.y)
    if (s.iv) {
      g(ly.statsOff + 2) += loss; g(ly.statsOff + 3) += 1.0
      return
    }
    g(ly.statsOff) += loss; g(ly.statsOff + 1) += 1.0
    val dzo = new Array[Double](p.kc)
    o = 0
    while (o < p.kc) {
      dzo(o) = math.exp(z2(o) - mx) / denom - (if (s.y == o) 1.0 else 0.0)
      g(ly.b2Off + o) += dzo(o)
      var v = 0
      while (v < un) { g(ly.w2Off + o * un + v) += dzo(o) * aT(v); v += 1 }
      o += 1
    }
    // backward: dz_t = dh_t * relu'(h_t); dh_T crosses the dropout mask
    val dz = Array.ofDim[Double](T + 2, un)
    t = T
    while (t >= 1) {
      var u2 = 0
      while (u2 < un) {
        var dh = 0.0
        if (t == T) {
          o = 0
          while (o < p.kc) { dh += dzo(o) * p.w2(o)(u2); o += 1 }
          dh *= mask(u2)
        } else {
          var v = 0
          while (v < un) { dh += dz(t + 1)(v) * p.wh(v)(u2); v += 1 }
        }
        dz(t)(u2) = dh * (if (h(t)(u2) > 0) 1.0 else 0.0)
        u2 += 1
      }
      t -= 1
    }
    u = 0
    while (u < un) {
      var swx = 0.0; var sb = 0.0
      var t2 = 1
      while (t2 <= T) {
        swx += dz(t2)(u) * s.x(t2 - 1); sb += dz(t2)(u); t2 += 1
      }
      g(ly.wxOff + u) += swx
      g(ly.bOff + u) += sb
      var v = 0
      while (v < un) {
        var sw = 0.0
        t2 = 1
        while (t2 <= T) { sw += dz(t2)(u) * h(t2 - 1)(v); t2 += 1 }
        g(ly.whOff + u * un + v) += sw
        v += 1
      }
      u += 1
    }
  }

  /** One full-batch BPTT pass — the [[RnnTrainer.gradientsVal]]
    * contract on the treeAggregate path. */
  def gradientsVal(df: DataFrame, xs: Seq[Column], label: Column,
      rowKey: Column, w: RnnWeights, epoch: Int, dropout: Double,
      isVal: Column): (RnnGrads, Option[Double]) =
    gradientsValRdd(WideNet.sampleRdd(df, xs, label, rowKey, isVal),
      w, epoch, dropout)

  /** [[gradientsVal]] over pre-decoded typed rows — the fit loops call
    * this against ONE cached RDD instead of re-planning/re-decoding a
    * fresh DataFrame per epoch ([[WideNet.withSamples]]). */
  private def gradientsValRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: RnnWeights, epoch: Int,
      dropout: Double): (RnnGrads, Option[Double]) = {
    require(dropout >= 0.0 && dropout < 1.0, "dropout in [0, 1)")
    val spark = org.apache.spark.sql.SparkSession.active
    val packed = new Packed(w)
    val ly = new Layout(packed)
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = rows.treeAggregate(new Array[Double](ly.size))(
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
    require(n > 0, "WideRnn.gradients: empty training input")
    val nVal = g(ly.statsOff + 3)
    val un = packed.units; val kc = packed.kc
    (RnnGrads(
      Seq.tabulate(un)(u => g(ly.wxOff + u) / n),
      Seq.tabulate(un, un)((u, v) => g(ly.whOff + u * un + v) / n),
      Seq.tabulate(un)(u => g(ly.bOff + u) / n),
      Seq.tabulate(kc, un)((o, u) => g(ly.w2Off + o * un + u) / n),
      Seq.tabulate(kc)(o => g(ly.b2Off + o) / n),
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
      rowKey: Column, w: RnnWeights, isVal: Column): Double =
    valLossRdd(WideNet.sampleRdd(
      df.filter(isVal), xs, label, rowKey, lit(true)), w)

  /** [[valLoss]] over pre-decoded VAL rows (a narrow filter of the
    * cached fit RDD — same partitions, same order). */
  private def valLossRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: RnnWeights): Double = {
    val spark = org.apache.spark.sql.SparkSession.active
    val packed = new Packed(w)
    val ly = new Layout(packed)
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = rows.treeAggregate(new Array[Double](ly.size))(
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
    require(nVal > 0, "WideRnn.valLoss: empty validation slice")
    g(ly.statsOff + 2) / nVal
  }

  /** Full-batch BPTT GD on the wide path ([[RnnTrainer.fit]] contract). */
  def fit(df: DataFrame, xs: Seq[Column], label: Column, w0: RnnWeights,
      epochs: Int, lr: Double, rowKey: Column = lit(0L),
      dropout: Double = 0.0): (RnnWeights, Seq[Double]) =
    WideNet.withSamples(df, xs, label, rowKey, lit(false)) { rows =>
      var w = w0
      val losses = (1 to epochs).map { e =>
        val (gr, _) = gradientsValRdd(rows, w, e, dropout)
        w = RnnTrainer.applyStep(w, gr, lr)
        gr.loss
      }
      (w, losses)
    }

  /** [[fit]] under Keras EarlyStopping ([[TrainerCommon.earlyStop]]). */
  def fitEs(df: DataFrame, xs: Seq[Column], label: Column,
      w0: RnnWeights, maxEpochs: Int, lr: Double, rowKey: Column,
      dropout: Double, isVal: Column,
      patience: Int = 5): TrainerCommon.EsResult[RnnWeights] =
    WideNet.withSamples(df, xs, label, rowKey, isVal) { rows =>
      val valRows = rows.filter(_.iv)
      TrainerCommon.earlyStop(w0, maxEpochs, patience,
          evalPass = Some(wc => valLossRdd(valRows, wc))) { (w, e) =>
        val (gr, vl) = gradientsValRdd(rows, w, e, dropout)
        (RnnTrainer.applyStep(w, gr, lr), gr.loss,
          vl.getOrElse(sys.error("fitEs: empty validation slice")))
      }
    }

  /** [[fitEs]] with the reference's `compile/fit` semantics: pluggable
    * optimizer (`TrainerCommon.Optimizer.adam(0.001)` =
    * `rnn_model.py:28-34`) + deterministic hash mini-batching
    * ([[TrainerCommon.batchedEpoch]]); sgd + nBatches=1 reproduces
    * [[fitEs]] (OptimizerStepSpec / AdamSpec). */
  def fitEsOpt(df: DataFrame, xs: Seq[Column], label: Column,
      w0: RnnWeights, maxEpochs: Int, opt: TrainerCommon.Optimizer,
      rowKey: Column, dropout: Double, isVal: Column,
      patience: Int = 5, batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): TrainerCommon.EsResult[RnnWeights] =
    if (nBatches == 1)
      WideNet.withSamples(df, xs, label, rowKey, isVal) { rows =>
        val valRows = rows.filter(_.iv)
        TrainerCommon.earlyStop(w0, maxEpochs, patience,
            evalPass = Some(wc => valLossRdd(valRows, wc))) { (w, e) =>
          val (gr, vl) = gradientsValRdd(rows, w, e, dropout)
          (RnnTrainer.applyOpt(w, gr, opt), gr.loss,
            vl.getOrElse(sys.error("fitEsOpt: empty validation slice")))
        }
      }
    else
      TrainerCommon.earlyStop(w0, maxEpochs, patience,
          evalPass = Some(wc => valLoss(df, xs, label, rowKey, wc, isVal))) {
        (w, e) =>
        TrainerCommon.batchedEpoch(df, isVal, batchKeys, nBatches, e, w,
            evalOnly = e > maxEpochs) {
          (dfb, ivb, wc) =>
            val (gr, vl) = gradientsVal(dfb, xs, label, rowKey, wc, e,
              dropout, ivb)
            (RnnTrainer.applyOpt(wc, gr, opt), gr.loss, vl)
        }
      }
}
