package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-WIDTH execution path for [[Mlp3Trainer]] — the stacked-MLP
  * member of the [[WideNet]]/[[WideRnn2]]/[[WideLstm2]] twin family
  * (see WideNet for the representation rationale): identical math as
  * per-partition imperative gradient accumulation + one O(params)
  * treeAggregate per pass. The staged-expression form is the
  * FD-checkable source of truth but cannot express 256/128-wide layers
  * without quadratic plan blowup; this is the execution form that
  * REACHES the reference's `models/mlp_model.py:19-26` widths
  * (Dense 256 → Dropout .3 → Dense 128 → Dropout .3 → Dense 64 →
  * softmax). Mlp3TrainerSpec pins gradient-for-gradient equivalence
  * against [[Mlp3Trainer.gradientsVal]] at narrow widths, dropout
  * masks and the val slice included, and trains the reference widths
  * end-to-end.
  */
object WideMlp3 {
  import Mlp3Trainer.{W, G}
  import WideNet.{Sample, dropMaskLocal}

  private final class Packed(w: W) extends Serializable {
    val ws: Array[Array[Array[Double]]] =
      w.ws.map(_.map(_.toArray).toArray).toArray
    val bs: Array[Array[Double]] = w.bs.map(_.toArray).toArray
    val L: Int = ws.length - 1 // hidden layer count
    val kc: Int = ws(L).length
    val d: Int = ws(0)(0).length
    /** Per-hidden-layer mask-unit offsets (cumulative hidden widths —
      * the [[Mlp3Trainer]] scheme, so the two paths draw IDENTICAL
      * masks). */
    val offs: Array[Int] = {
      val o = new Array[Int](L)
      var acc = 0; var l = 0
      while (l < L) { o(l) = acc; acc += ws(l).length; l += 1 }
      o
    }
  }

  /** Buffer layout: per layer l (0..L): w (out×in) then b (out);
    * trailing [train loss sum, train count, val loss sum, val count]. */
  private final class Layout(p: Packed) extends Serializable {
    val wOff: Array[Int] = new Array[Int](p.L + 1)
    val bOff: Array[Int] = new Array[Int](p.L + 1)
    val statsOff: Int = {
      var acc = 0; var l = 0
      while (l <= p.L) {
        wOff(l) = acc; acc += p.ws(l).length * p.ws(l)(0).length
        bOff(l) = acc; acc += p.ws(l).length
        l += 1
      }
      acc
    }
    val size: Int = statsOff + 4
  }

  /** One row's contribution — line-for-line
    * [[Mlp3Trainer.gradientsVal]]'s staged columns: z_l = W_l a_{l-1} +
    * b_l, a_l = relu(z_l) * mask_l, max-shifted softmax CE,
    * dz_l = (W_{l+1}ᵀ dz_{l+1}) * mask_l * relu'(z_l). */
  private def accumulate(s: Sample, p: Packed, ly: Layout, epoch: Int,
      drops: Array[Double], g: Array[Double]): Unit = {
    val L = p.L
    // forward
    val z = new Array[Array[Double]](L)
    val a = new Array[Array[Double]](L)
    val mask = new Array[Array[Double]](L)
    var prev: Array[Double] = s.x
    var l = 0
    while (l < L) {
      val width = p.ws(l).length
      z(l) = new Array[Double](width)
      a(l) = new Array[Double](width)
      mask(l) = new Array[Double](width)
      var u = 0
      while (u < width) {
        var acc = p.bs(l)(u)
        val wu = p.ws(l)(u)
        var i = 0
        while (i < prev.length) { acc += prev(i) * wu(i); i += 1 }
        z(l)(u) = acc
        mask(l)(u) = dropMaskLocal(s.iv, s.rk, epoch, p.offs(l) + u,
          drops(l))
        a(l)(u) = (if (acc > 0) acc else 0.0) * mask(l)(u)
        u += 1
      }
      prev = a(l)
      l += 1
    }
    // head
    val zo = new Array[Double](p.kc)
    var o = 0
    while (o < p.kc) {
      var acc = p.bs(L)(o)
      val wo = p.ws(L)(o)
      var u = 0
      while (u < prev.length) { acc += prev(u) * wo(u); u += 1 }
      zo(o) = acc; o += 1
    }
    var mx = zo(0); o = 1
    while (o < p.kc) { if (zo(o) > mx) mx = zo(o); o += 1 }
    var denom = 0.0; o = 0
    while (o < p.kc) { denom += math.exp(zo(o) - mx); o += 1 }
    val loss = math.log(denom) + mx - zo(s.y)
    if (s.iv) {
      g(ly.statsOff + 2) += loss; g(ly.statsOff + 3) += 1.0
      return // val rows contribute loss only, never gradients
    }
    g(ly.statsOff) += loss; g(ly.statsOff + 1) += 1.0
    // head gradients + dz for the top hidden layer's input
    val dzo = new Array[Double](p.kc)
    o = 0
    while (o < p.kc) {
      dzo(o) = math.exp(zo(o) - mx) / denom - (if (s.y == o) 1.0 else 0.0)
      g(ly.bOff(L) + o) += dzo(o)
      val inW = prev.length
      var u = 0
      while (u < inW) {
        g(ly.wOff(L) + o * inW + u) += dzo(o) * prev(u)
        u += 1
      }
      o += 1
    }
    // backward through hidden layers
    var dzUpper: Array[Double] = dzo
    l = L - 1
    while (l >= 0) {
      val width = p.ws(l).length
      val upper = p.ws(l + 1) // (upperWidth × width)
      val dz = new Array[Double](width)
      var u = 0
      while (u < width) {
        var acc = 0.0
        var v = 0
        while (v < dzUpper.length) { acc += dzUpper(v) * upper(v)(u); v += 1 }
        dz(u) = acc * mask(l)(u) * (if (z(l)(u) > 0) 1.0 else 0.0)
        g(ly.bOff(l) + u) += dz(u)
        val ins = if (l == 0) s.x else a(l - 1)
        var i = 0
        while (i < ins.length) {
          g(ly.wOff(l) + u * ins.length + i) += dz(u) * ins(i)
          i += 1
        }
        u += 1
      }
      dzUpper = dz
      l -= 1
    }
  }

  /** One full-batch pass — the [[Mlp3Trainer.gradientsVal]] contract on
    * the treeAggregate path: weights broadcast once, one O(params)
    * reduction, mean TRAIN gradients + mean train loss + mean val loss
    * (None when the isVal slice is empty). */
  def gradientsVal(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w: W, epoch: Int, drops: Seq[Double],
      isVal: Column): (G, Option[Double]) = {
    require(w.ws.headOption.map(_.headOption.fold(0)(_.length))
      .contains(features.length), "feature count != weight width")
    gradientsValRdd(WideNet.sampleRdd(df, features, label, rowKey, isVal),
      w, epoch, drops)
  }

  /** [[gradientsVal]] over pre-decoded typed rows — the fit loops call
    * this against ONE cached RDD instead of re-planning/re-decoding a
    * fresh DataFrame per epoch ([[WideNet.withSamples]]). */
  private def gradientsValRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: W, epoch: Int, drops: Seq[Double]): (G, Option[Double]) = {
    val L = w.nLayers - 1
    require(drops.length == L, s"drops must give one rate per hidden " +
      s"layer ($L), got ${drops.length}")
    require(drops.forall(p => p >= 0.0 && p < 1.0), "dropout in [0, 1)")
    val spark = org.apache.spark.sql.SparkSession.active
    val packed = new Packed(w)
    val ly = new Layout(packed)
    val dropsArr = drops.toArray
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = rows.treeAggregate(new Array[Double](ly.size))(
      seqOp = (buf, s) => {
        val (p, l) = bc.value
        accumulate(s, p, l, epoch, dropsArr, buf); buf
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    bc.destroy()
    val n = g(ly.statsOff + 1)
    require(n > 0, "WideMlp3.gradients: empty training input")
    val nVal = g(ly.statsOff + 3)
    def outW(l: Int) = packed.ws(l).length
    def inW(l: Int) = packed.ws(l)(0).length
    (G(
      (0 to L).map(l => Seq.tabulate(outW(l), inW(l))((u, i) =>
        g(ly.wOff(l) + u * inW(l) + i) / n)),
      (0 to L).map(l => Seq.tabulate(outW(l))(u =>
        g(ly.bOff(l) + u) / n)),
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
  def valLoss(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w: W, isVal: Column): Double = {
    require(w.ws.headOption.map(_.headOption.fold(0)(_.length))
      .contains(features.length), "feature count != weight width")
    valLossRdd(WideNet.sampleRdd(
      df.filter(isVal), features, label, rowKey, lit(true)), w)
  }

  /** [[valLoss]] over pre-decoded VAL rows (a narrow filter of the
    * cached fit RDD — same partitions, same order). */
  private def valLossRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: W): Double = {
    val spark = org.apache.spark.sql.SparkSession.active
    val packed = new Packed(w)
    val ly = new Layout(packed)
    val noDrops = new Array[Double](w.nLayers - 1)
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = rows.treeAggregate(new Array[Double](ly.size))(
      seqOp = (buf, s) => {
        val (p, l) = bc.value
        accumulate(s, p, l, epoch = 0, noDrops, buf); buf
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    bc.destroy()
    val nVal = g(ly.statsOff + 3)
    require(nVal > 0, "WideMlp3.valLoss: empty validation slice")
    g(ly.statsOff + 2) / nVal
  }

  /** Fixed-epoch full-batch GD on the wide path ([[Mlp3Trainer.fit]]
    * contract). */
  def fit(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w0: W, epochs: Int, lr: Double,
      drops: Seq[Double]): (W, Seq[Double]) =
    WideNet.withSamples(df, features, label, rowKey, lit(false)) { rows =>
      var w = w0
      val opt = TrainerCommon.Optimizer.sgd(lr)
      val losses = (1 to epochs).map { e =>
        val (gr, _) = gradientsValRdd(rows, w, e, drops)
        w = Mlp3Trainer.applyOpt(w, gr, opt)
        gr.loss
      }
      (w, losses)
    }

  /** [[Mlp3Trainer.fitEsOpt]] on the treeAggregate path — Keras ES +
    * pluggable optimizer (Adam for reference parity) + deterministic
    * hash mini-batching via the shared [[TrainerCommon]] walkers.
    * Full-batch runs on the cached-RDD path; the batched form keeps
    * per-batch DataFrame filters (membership is a (keys, epoch) hash —
    * it changes every epoch). */
  def fitEsOpt(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w0: W, maxEpochs: Int,
      opt: TrainerCommon.Optimizer, drops: Seq[Double], isVal: Column,
      patience: Int = 5, batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): TrainerCommon.EsResult[W] =
    if (nBatches == 1)
      WideNet.withSamples(df, features, label, rowKey, isVal) { rows =>
        val valRows = rows.filter(_.iv)
        TrainerCommon.earlyStop(w0, maxEpochs, patience,
            evalPass = Some(wc => valLossRdd(valRows, wc))) { (w, e) =>
          val (gr, vl) = gradientsValRdd(rows, w, e, drops)
          (Mlp3Trainer.applyOpt(w, gr, opt), gr.loss,
            vl.getOrElse(sys.error("fitEsOpt: empty validation slice")))
        }
      }
    else
      TrainerCommon.earlyStop(w0, maxEpochs, patience, evalPass =
          Some(wc => valLoss(df, features, label, rowKey, wc, isVal))) {
        (w, e) =>
        TrainerCommon.batchedEpoch(df, isVal, batchKeys, nBatches, e, w,
            evalOnly = e > maxEpochs) {
          (dfb, ivb, wc) =>
            val (gr, vl) = gradientsVal(dfb, features, label, rowKey, wc,
              e, drops, ivb)
            (Mlp3Trainer.applyOpt(wc, gr, opt), gr.loss, vl)
        }
      }
}
