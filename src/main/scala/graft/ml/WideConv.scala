package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-WIDTH execution path for [[ConvTrainer]] — the flat
  * Conv1D member of the wide-twin family (see [[WideNet]] for the
  * representation rationale): identical math as per-partition
  * imperative accumulation + one O(params) treeAggregate per epoch.
  * Both pooling modes are supported; MaxPool replays the staged
  * first-argmax gradient routing exactly (position p routes iff
  * a[p] == pool and every earlier a[q] < pool). WideSinglesSpec pins
  * gradient-for-gradient equivalence against
  * [[ConvTrainer.gradientsVal]] for both pool modes, dropout and the
  * val slice included.
  */
object WideConv {
  import ConvTrainer.{ConvWeights, ConvGrads, Pooling, AvgPool, MaxPool}
  import WideNet.{Sample, dropMaskLocal}

  private final class Packed(w: ConvWeights) extends Serializable {
    val cw: Array[Array[Double]] = w.w.map(_.toArray).toArray
    val cb: Array[Double] = w.b.toArray
    val w2: Array[Array[Double]] = w.w2.map(_.toArray).toArray
    val b2: Array[Double] = w.b2.toArray
    val nf: Int = w.filters
    val k: Int = w.kernel
    val kc: Int = w.classes
  }

  /** Buffer layout: w (nf,k), b (nf), w2 (kc,nf), b2 (kc), then
    * [train loss sum, train count, val loss sum, val count]. */
  private final class Layout(p: Packed) extends Serializable {
    val wOff: Int = 0
    val bOff: Int = wOff + p.nf * p.k
    val w2Off: Int = bOff + p.nf
    val b2Off: Int = w2Off + p.kc * p.nf
    val statsOff: Int = b2Off + p.kc
    val size: Int = statsOff + 4
  }

  /** One row's contribution — line-for-line the staged
    * [[ConvTrainer.gradientsVal]] columns. */
  private def accumulate(s: Sample, p: Packed, ly: Layout, epoch: Int,
      dropout: Double, maxPool: Boolean, g: Array[Double]): Unit = {
    val T = s.x.length
    val P = T - p.k + 1
    val nf = p.nf
    // conv + relu, (p, f)
    val a = Array.ofDim[Double](P, nf)
    var pos = 0
    while (pos < P) {
      var f = 0
      while (f < nf) {
        var acc = p.cb(f)
        val wf = p.cw(f)
        var j = 0
        while (j < p.k) { acc += s.x(pos + j) * wf(j); j += 1 }
        a(pos)(f) = if (acc > 0) acc else 0.0
        f += 1
      }
      pos += 1
    }
    // global pool + dropout on the pooled features
    val poolV = new Array[Double](nf)
    val mask = new Array[Double](nf)
    val dp = new Array[Double](nf)
    var f = 0
    while (f < nf) {
      if (maxPool) {
        var m = a(0)(f)
        var q = 1
        while (q < P) { if (a(q)(f) > m) m = a(q)(f); q += 1 }
        poolV(f) = m
      } else {
        var sum = 0.0
        var q = 0
        while (q < P) { sum += a(q)(f); q += 1 }
        poolV(f) = sum / P
      }
      mask(f) = dropMaskLocal(s.iv, s.rk, epoch, f, dropout)
      dp(f) = poolV(f) * mask(f)
      f += 1
    }
    val z2 = new Array[Double](p.kc)
    var o = 0
    while (o < p.kc) {
      var acc = p.b2(o)
      val wo = p.w2(o)
      var v = 0
      while (v < nf) { acc += dp(v) * wo(v); v += 1 }
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
      while (v < nf) { g(ly.w2Off + o * nf + v) += dzo(o) * dp(v); v += 1 }
      o += 1
    }
    // backward to the conv layer: da routed per pooling mode, the head
    // gradient crossing the dropout mask (d dp/d pool = mask)
    f = 0
    while (f < nf) {
      var dpool = 0.0
      o = 0
      while (o < p.kc) { dpool += dzo(o) * p.w2(o)(f); o += 1 }
      dpool *= mask(f)
      // first-argmax position for max routing (a[p] == pool; every
      // earlier a[q] < pool means the FIRST index attaining the max)
      var firstMax = -1
      if (maxPool) {
        var q = 0
        while (q < P && firstMax < 0) {
          if (a(q)(f) == poolV(f)) firstMax = q
          q += 1
        }
      }
      var pos2 = 0
      while (pos2 < P) {
        val da =
          if (maxPool) { if (pos2 == firstMax) dpool else 0.0 }
          else dpool / P
        val dz = da * (if (a(pos2)(f) > 0) 1.0 else 0.0)
        if (dz != 0.0) {
          g(ly.bOff + f) += dz
          var j = 0
          while (j < p.k) {
            g(ly.wOff + f * p.k + j) += dz * s.x(pos2 + j)
            j += 1
          }
        }
        pos2 += 1
      }
      f += 1
    }
  }

  /** One full-batch pass — the [[ConvTrainer.gradientsVal]] contract on
    * the treeAggregate path. */
  def gradientsVal(df: DataFrame, xs: Seq[Column], label: Column,
      rowKey: Column, w: ConvWeights, epoch: Int, dropout: Double,
      isVal: Column,
      pool: Pooling = AvgPool): (ConvGrads, Option[Double]) = {
    require(xs.length - w.kernel + 1 >= 1,
      s"input length ${xs.length} < kernel ${w.kernel}")
    gradientsValRdd(WideNet.sampleRdd(df, xs, label, rowKey, isVal),
      w, epoch, dropout, pool)
  }

  /** [[gradientsVal]] over pre-decoded typed rows — the fit loops call
    * this against ONE cached RDD instead of re-planning/re-decoding a
    * fresh DataFrame per epoch ([[WideNet.withSamples]]). */
  private def gradientsValRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: ConvWeights, epoch: Int, dropout: Double,
      pool: Pooling): (ConvGrads, Option[Double]) = {
    require(dropout >= 0.0 && dropout < 1.0, "dropout in [0, 1)")
    val spark = org.apache.spark.sql.SparkSession.active
    val packed = new Packed(w)
    val ly = new Layout(packed)
    val maxPool = pool == MaxPool
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = rows.treeAggregate(new Array[Double](ly.size))(
      seqOp = (buf, s) => {
        val (p, l) = bc.value
        accumulate(s, p, l, epoch, dropout, maxPool, buf); buf
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    bc.destroy()
    val n = g(ly.statsOff + 1)
    require(n > 0, "WideConv.gradients: empty training input")
    val nVal = g(ly.statsOff + 3)
    val nf = packed.nf; val k = packed.k; val kc = packed.kc
    (ConvGrads(
      Seq.tabulate(nf, k)((f, j) => g(ly.wOff + f * k + j) / n),
      Seq.tabulate(nf)(f => g(ly.bOff + f) / n),
      Seq.tabulate(kc, nf)((o, f) => g(ly.w2Off + o * nf + f) / n),
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
      rowKey: Column, w: ConvWeights, isVal: Column,
      pool: Pooling = AvgPool): Double =
    valLossRdd(WideNet.sampleRdd(
      df.filter(isVal), xs, label, rowKey, lit(true)), w, pool)

  /** [[valLoss]] over pre-decoded VAL rows (a narrow filter of the
    * cached fit RDD — same partitions, same order). */
  private def valLossRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: ConvWeights, pool: Pooling): Double = {
    val spark = org.apache.spark.sql.SparkSession.active
    val packed = new Packed(w)
    val ly = new Layout(packed)
    val maxPool = pool == MaxPool
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = rows.treeAggregate(new Array[Double](ly.size))(
      seqOp = (buf, s) => {
        val (p, l) = bc.value
        accumulate(s, p, l, epoch = 0, dropout = 0.0, maxPool, buf); buf
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    bc.destroy()
    val nVal = g(ly.statsOff + 3)
    require(nVal > 0, "WideConv.valLoss: empty validation slice")
    g(ly.statsOff + 2) / nVal
  }

  /** Full-batch GD on the wide path ([[ConvTrainer.fit]] contract). */
  def fit(df: DataFrame, xs: Seq[Column], label: Column, w0: ConvWeights,
      epochs: Int, lr: Double, pool: Pooling = AvgPool,
      rowKey: Column = lit(0L),
      dropout: Double = 0.0): (ConvWeights, Seq[Double]) = {
    require(xs.length - w0.kernel + 1 >= 1,
      s"input length ${xs.length} < kernel ${w0.kernel}")
    WideNet.withSamples(df, xs, label, rowKey, lit(false)) { rows =>
      var w = w0
      val losses = (1 to epochs).map { e =>
        val (gr, _) = gradientsValRdd(rows, w, e, dropout, pool)
        w = ConvTrainer.applyStep(w, gr, lr)
        gr.loss
      }
      (w, losses)
    }
  }

  /** [[fit]] under Keras EarlyStopping ([[TrainerCommon.earlyStop]]). */
  def fitEs(df: DataFrame, xs: Seq[Column], label: Column,
      w0: ConvWeights, maxEpochs: Int, lr: Double, rowKey: Column,
      dropout: Double, isVal: Column, pool: Pooling = AvgPool,
      patience: Int = 5): TrainerCommon.EsResult[ConvWeights] = {
    require(xs.length - w0.kernel + 1 >= 1,
      s"input length ${xs.length} < kernel ${w0.kernel}")
    WideNet.withSamples(df, xs, label, rowKey, isVal) { rows =>
      val valRows = rows.filter(_.iv)
      TrainerCommon.earlyStop(w0, maxEpochs, patience,
          evalPass = Some(wc => valLossRdd(valRows, wc, pool))) { (w, e) =>
        val (gr, vl) = gradientsValRdd(rows, w, e, dropout, pool)
        (ConvTrainer.applyStep(w, gr, lr), gr.loss,
          vl.getOrElse(sys.error("fitEs: empty validation slice")))
      }
    }
  }

  /** [[fitEs]] with pluggable optimizer + hash mini-batching
    * ([[TrainerCommon.batchedEpoch]]); sgd + nBatches=1 reproduces
    * [[fitEs]]. Full-batch runs on the cached-RDD path; the batched
    * form keeps per-batch DataFrame filters (membership is a
    * (keys, epoch) hash — it changes every epoch). */
  def fitEsOpt(df: DataFrame, xs: Seq[Column], label: Column,
      w0: ConvWeights, maxEpochs: Int, opt: TrainerCommon.Optimizer,
      rowKey: Column, dropout: Double, isVal: Column,
      pool: Pooling = AvgPool, patience: Int = 5,
      batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): TrainerCommon.EsResult[ConvWeights] =
    if (nBatches == 1)
      WideNet.withSamples(df, xs, label, rowKey, isVal) { rows =>
        val valRows = rows.filter(_.iv)
        TrainerCommon.earlyStop(w0, maxEpochs, patience,
            evalPass = Some(wc => valLossRdd(valRows, wc, pool))) { (w, e) =>
          val (gr, vl) = gradientsValRdd(rows, w, e, dropout, pool)
          (ConvTrainer.applyOpt(w, gr, opt), gr.loss,
            vl.getOrElse(sys.error("fitEsOpt: empty validation slice")))
        }
      }
    else
      TrainerCommon.earlyStop(w0, maxEpochs, patience, evalPass =
          Some(wc => valLoss(df, xs, label, rowKey, wc, isVal, pool))) {
        (w, e) =>
        TrainerCommon.batchedEpoch(df, isVal, batchKeys, nBatches, e, w,
            evalOnly = e > maxEpochs) {
          (dfb, ivb, wc) =>
            val (gr, vl) = gradientsVal(dfb, xs, label, rowKey, wc, e,
              dropout, ivb, pool)
            (ConvTrainer.applyOpt(wc, gr, opt), gr.loss, vl)
        }
      }
}
