package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-WIDTH execution path for [[GdTrainer]] — the single-layer
  * MLP member of the [[WideNet]]/[[WideRnn2]]/[[WideLstm2]] twin family
  * (see WideNet for the representation rationale): identical math as
  * per-partition imperative gradient accumulation + one O(params)
  * treeAggregate per epoch. The staged-expression form is ideal for
  * oracle visibility but pays plan/codegen cost per epoch that at
  * fixture scale dominates wall; this is the same-semantics execution
  * form MLlib's own GD uses and the honest shape at the reference's
  * real widths (`models/mlp_model.py:19-26`: Dense(128)/Dense(64)).
  * WideMlpSpec (WideSinglesSpec) pins gradient-for-gradient equivalence
  * against [[GdTrainer.gradientsVal]], dropout masks and the val slice
  * included.
  */
object WideMlp {
  import GdTrainer.{MlpWeights, MlpGrads}
  import WideNet.{Sample, dropMaskLocal}

  private final class Packed(w: MlpWeights) extends Serializable {
    val w1: Array[Array[Double]] = w.w1.map(_.toArray).toArray
    val b1: Array[Double] = w.b1.toArray
    val w2: Array[Array[Double]] = w.w2.map(_.toArray).toArray
    val b2: Array[Double] = w.b2.toArray
    val h: Int = w.hidden
    val kc: Int = w.classes
    val d: Int = w1(0).length
  }

  /** Buffer layout: w1 (h,d), b1 (h), w2 (kc,h), b2 (kc), then
    * [train loss sum, train count, val loss sum, val count]. */
  private final class Layout(p: Packed) extends Serializable {
    val w1Off: Int = 0
    val b1Off: Int = w1Off + p.h * p.d
    val w2Off: Int = b1Off + p.h
    val b2Off: Int = w2Off + p.kc * p.h
    val statsOff: Int = b2Off + p.kc
    val size: Int = statsOff + 4
  }

  /** One row's contribution — line-for-line [[GdTrainer.gradientsVal]]'s
    * staged columns: z1 = w1 x + b1, a1 = relu(z1) * mask, z2 = w2 a1 +
    * b2, max-shifted softmax CE, dz1 = (w2T dzo) * mask * relu'. */
  private def accumulate(s: Sample, p: Packed, ly: Layout, epoch: Int,
      dropout: Double, g: Array[Double]): Unit = {
    val z1 = new Array[Double](p.h)
    val a1 = new Array[Double](p.h)
    val mask = new Array[Double](p.h)
    var u = 0
    while (u < p.h) {
      var acc = p.b1(u)
      val wu = p.w1(u)
      var i = 0
      while (i < p.d) { acc += s.x(i) * wu(i); i += 1 }
      z1(u) = acc
      mask(u) = dropMaskLocal(s.iv, s.rk, epoch, u, dropout)
      a1(u) = (if (acc > 0) acc else 0.0) * mask(u)
      u += 1
    }
    val z2 = new Array[Double](p.kc)
    var o = 0
    while (o < p.kc) {
      var acc = p.b2(o)
      val wo = p.w2(o)
      var u2 = 0
      while (u2 < p.h) { acc += a1(u2) * wo(u2); u2 += 1 }
      z2(o) = acc; o += 1
    }
    var mx = z2(0); o = 1
    while (o < p.kc) { if (z2(o) > mx) mx = z2(o); o += 1 }
    var denom = 0.0; o = 0
    while (o < p.kc) { denom += math.exp(z2(o) - mx); o += 1 }
    val loss = math.log(denom) + mx - z2(s.y)
    if (s.iv) {
      g(ly.statsOff + 2) += loss; g(ly.statsOff + 3) += 1.0
      return // val rows contribute loss only, never gradients
    }
    g(ly.statsOff) += loss; g(ly.statsOff + 1) += 1.0
    val dzo = new Array[Double](p.kc)
    o = 0
    while (o < p.kc) {
      dzo(o) = math.exp(z2(o) - mx) / denom - (if (s.y == o) 1.0 else 0.0)
      g(ly.b2Off + o) += dzo(o)
      var u2 = 0
      while (u2 < p.h) {
        g(ly.w2Off + o * p.h + u2) += dzo(o) * a1(u2)
        u2 += 1
      }
      o += 1
    }
    u = 0
    while (u < p.h) {
      var acc = 0.0
      o = 0
      while (o < p.kc) { acc += dzo(o) * p.w2(o)(u); o += 1 }
      val dz1 = acc * mask(u) * (if (z1(u) > 0) 1.0 else 0.0)
      g(ly.b1Off + u) += dz1
      var i = 0
      while (i < p.d) { g(ly.w1Off + u * p.d + i) += dz1 * s.x(i); i += 1 }
      u += 1
    }
  }

  /** One full-batch pass — the [[GdTrainer.gradientsVal]] contract on
    * the treeAggregate path: weights broadcast once, one O(params)
    * reduction, mean TRAIN gradients + mean train loss + mean val loss
    * (None when the isVal slice is empty). */
  def gradientsVal(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w: MlpWeights, epoch: Int, dropout: Double,
      isVal: Column): (MlpGrads, Option[Double]) = {
    require(w.w1.headOption.fold(0)(_.length) == features.length,
      "feature count != weight width")
    gradientsValRdd(WideNet.sampleRdd(df, features, label, rowKey, isVal),
      w, epoch, dropout)
  }

  /** [[gradientsVal]] over pre-decoded typed rows — the fit loops call
    * this against ONE cached RDD instead of re-planning/re-decoding a
    * fresh DataFrame per epoch ([[WideNet.withSamples]]). */
  private def gradientsValRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: MlpWeights, epoch: Int,
      dropout: Double): (MlpGrads, Option[Double]) = {
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
    require(n > 0, "WideMlp.gradients: empty training input")
    val nVal = g(ly.statsOff + 3)
    val h = packed.h; val d = packed.d; val kc = packed.kc
    (MlpGrads(
      Seq.tabulate(h, d)((u, i) => g(ly.w1Off + u * d + i) / n),
      Seq.tabulate(h)(u => g(ly.b1Off + u) / n),
      Seq.tabulate(kc, h)((o, u) => g(ly.w2Off + o * h + u) / n),
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
  def valLoss(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w: MlpWeights, isVal: Column): Double = {
    require(w.w1.headOption.fold(0)(_.length) == features.length,
      "feature count != weight width")
    valLossRdd(WideNet.sampleRdd(
      df.filter(isVal), features, label, rowKey, lit(true)), w)
  }

  /** [[valLoss]] over pre-decoded VAL rows (a narrow filter of the
    * cached fit RDD — same partitions, same order). */
  private def valLossRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: MlpWeights): Double = {
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
    require(nVal > 0, "WideMlp.valLoss: empty validation slice")
    g(ly.statsOff + 2) / nVal
  }

  /** Full-batch GD on the wide path ([[GdTrainer.fit]] contract).
    * Decodes the typed rows once and runs every epoch against the
    * cached RDD ([[WideNet.withSamples]] — bit-identical, see its
    * note). */
  def fit(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w0: MlpWeights, epochs: Int, lr: Double,
      dropout: Double = 0.0): (MlpWeights, Seq[Double]) =
    WideNet.withSamples(df, features, label, rowKey, lit(false)) { rows =>
      var w = w0
      val losses = (1 to epochs).map { e =>
        val (gr, _) = gradientsValRdd(rows, w, e, dropout)
        w = GdTrainer.applyStep(w, gr, lr)
        gr.loss
      }
      (w, losses)
    }

  /** [[fit]] under Keras EarlyStopping ([[TrainerCommon.earlyStop]]). */
  def fitEs(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w0: MlpWeights, maxEpochs: Int, lr: Double,
      dropout: Double, isVal: Column,
      patience: Int = 5): TrainerCommon.EsResult[MlpWeights] =
    WideNet.withSamples(df, features, label, rowKey, isVal) { rows =>
      val valRows = rows.filter(_.iv)
      TrainerCommon.earlyStop(w0, maxEpochs, patience,
          evalPass = Some(wc => valLossRdd(valRows, wc))) { (w, e) =>
        val (gr, vl) = gradientsValRdd(rows, w, e, dropout)
        (GdTrainer.applyStep(w, gr, lr), gr.loss,
          vl.getOrElse(sys.error("fitEs: empty validation slice")))
      }
    }

  /** [[GdTrainer.fitEsOpt]] on the treeAggregate path — pluggable
    * optimizer (Adam for reference parity) + deterministic hash
    * mini-batching; nBatches = 1 + sgd reproduces [[fitEs]]
    * bit-for-bit (AdamSpec). Full-batch runs on the cached-RDD path;
    * the batched form keeps per-batch DataFrame filters (membership is
    * a (keys, epoch) hash — it changes every epoch). */
  def fitEsOpt(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w0: MlpWeights, maxEpochs: Int,
      opt: TrainerCommon.Optimizer, dropout: Double, isVal: Column,
      patience: Int = 5, batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): TrainerCommon.EsResult[MlpWeights] =
    if (nBatches == 1)
      WideNet.withSamples(df, features, label, rowKey, isVal) { rows =>
        val valRows = rows.filter(_.iv)
        TrainerCommon.earlyStop(w0, maxEpochs, patience,
            evalPass = Some(wc => valLossRdd(valRows, wc))) { (w, e) =>
          val (gr, vl) = gradientsValRdd(rows, w, e, dropout)
          (GdTrainer.applyOpt(w, gr, opt), gr.loss,
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
            val (gr, vl) = gradientsVal(dfb, features, label, rowKey, wc, e,
              dropout, ivb)
            (GdTrainer.applyOpt(wc, gr, opt), gr.loss, vl)
        }
      }
}
