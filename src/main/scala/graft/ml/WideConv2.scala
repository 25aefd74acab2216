package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-WIDTH execution path for [[Conv2Trainer]] — the stacked
  * two-block Conv1D member of the wide-twin family (see [[WideNet]]
  * for the representation rationale): identical math as per-partition
  * imperative accumulation + one O(params) treeAggregate per epoch.
  * Both argmax routings replay the staged first-argmax semantics
  * exactly — the local 2-window pool routes position p iff its
  * activation equals the window max and the earlier window position is
  * strictly below it, and the global pool routes the FIRST conv2
  * position attaining the per-filter max. WideConv2Spec pins
  * gradient-for-gradient equivalence against
  * [[Conv2Trainer.gradients]] and fit-trajectory equality; the staged
  * trainer remains the semantic source of truth (FD-gated in
  * Conv2TrainerSpec) and keeps serving `predictStaged`.
  */
object WideConv2 {
  import Conv2Trainer.{Conv2Weights, Conv2Grads}
  import WideNet.Sample

  private final class Packed(w: Conv2Weights) extends Serializable {
    val w1: Array[Array[Double]] = w.w1.map(_.toArray).toArray
    val b1: Array[Double] = w.b1.toArray
    // (g, j, f) nested — position-major kernel over f1 input channels
    val w2: Array[Array[Array[Double]]] =
      w.w2.map(_.map(_.toArray).toArray).toArray
    val b2: Array[Double] = w.b2.toArray
    val wh: Array[Array[Double]] = w.wh.map(_.toArray).toArray
    val bh: Array[Double] = w.bh.toArray
    val f1: Int = w.f1
    val f2: Int = w.f2
    val k: Int = w.k
    val kc: Int = w.classes
  }

  /** Buffer layout: w1 (f,i), b1 (f), w2 (g,j,f), b2 (g), wh (o,g),
    * bh (o), then [loss sum, row count]. */
  private final class Layout(p: Packed, T: Int) extends Serializable {
    val P1: Int = T - p.k + 1
    val J: Int = P1 / 2
    val P2: Int = J - p.k + 1
    val w1Off: Int = 0
    val b1Off: Int = w1Off + p.f1 * p.k
    val w2Off: Int = b1Off + p.f1
    val b2Off: Int = w2Off + p.f2 * p.k * p.f1
    val whOff: Int = b2Off + p.f2
    val bhOff: Int = whOff + p.kc * p.f2
    val statsOff: Int = bhOff + p.kc
    val size: Int = statsOff + 2
  }

  /** One row's contribution — line-for-line the staged
    * [[Conv2Trainer.gradients]] columns. */
  private def accumulate(s: Sample, p: Packed, ly: Layout,
      g: Array[Double]): Unit = {
    val k = p.k; val f1 = p.f1; val f2 = p.f2; val kc = p.kc
    val P1 = ly.P1; val J = ly.J; val P2 = ly.P2
    // conv1 + relu, (pos, f) row-major
    val a1 = new Array[Double](P1 * f1)
    var pos = 0
    while (pos < P1) {
      var f = 0
      while (f < f1) {
        var acc = p.b1(f)
        val wf = p.w1(f)
        var j = 0
        while (j < k) { acc += s.x(pos + j) * wf(j); j += 1 }
        a1(pos * f1 + f) = if (acc > 0) acc else 0.0
        f += 1
      }
      pos += 1
    }
    // local 2-window max pool, (j, f)
    val m1 = new Array[Double](J * f1)
    var jw = 0
    while (jw < J) {
      var f = 0
      while (f < f1) {
        val x0 = a1(2 * jw * f1 + f); val x1 = a1((2 * jw + 1) * f1 + f)
        m1(jw * f1 + f) = if (x0 >= x1) x0 else x1
        f += 1
      }
      jw += 1
    }
    // conv2 + relu over f1 channels, (pos, g)
    val a2 = new Array[Double](P2 * f2)
    pos = 0
    while (pos < P2) {
      var gg = 0
      while (gg < f2) {
        var acc = p.b2(gg)
        val wg = p.w2(gg)
        var j = 0
        while (j < k) {
          val wj = wg(j)
          var f = 0
          while (f < f1) { acc += m1((pos + j) * f1 + f) * wj(f); f += 1 }
          j += 1
        }
        a2(pos * f2 + gg) = if (acc > 0) acc else 0.0
        gg += 1
      }
      pos += 1
    }
    // global max pool over P2, per filter
    val gp = new Array[Double](f2)
    var gg = 0
    while (gg < f2) {
      var m = a2(gg)
      var q = 1
      while (q < P2) {
        val v = a2(q * f2 + gg)
        if (v > m) m = v
        q += 1
      }
      gp(gg) = m
      gg += 1
    }
    // head + max-shifted softmax CE (TrainerCommon.softmaxHead algebra)
    val z = new Array[Double](kc)
    var o = 0
    while (o < kc) {
      var acc = p.bh(o)
      val wo = p.wh(o)
      var v = 0
      while (v < f2) { acc += gp(v) * wo(v); v += 1 }
      z(o) = acc; o += 1
    }
    var mx = z(0); o = 1
    while (o < kc) { if (z(o) > mx) mx = z(o); o += 1 }
    var denom = 0.0; o = 0
    while (o < kc) { denom += math.exp(z(o) - mx); o += 1 }
    g(ly.statsOff) += math.log(denom) + mx - z(s.y)
    g(ly.statsOff + 1) += 1.0
    val dzo = new Array[Double](kc)
    o = 0
    while (o < kc) {
      dzo(o) = math.exp(z(o) - mx) / denom - (if (s.y == o) 1.0 else 0.0)
      g(ly.bhOff + o) += dzo(o)
      var v = 0
      while (v < f2) { g(ly.whOff + o * f2 + v) += dzo(o) * gp(v); v += 1 }
      o += 1
    }
    // dz2: global-max first-argmax routing + relu mask
    val dz2 = new Array[Double](P2 * f2)
    gg = 0
    while (gg < f2) {
      var dgp = 0.0
      o = 0
      while (o < kc) { dgp += dzo(o) * p.wh(o)(gg); o += 1 }
      var firstMax = -1
      var q = 0
      while (q < P2 && firstMax < 0) {
        if (a2(q * f2 + gg) == gp(gg)) firstMax = q
        q += 1
      }
      if (firstMax >= 0 && a2(firstMax * f2 + gg) > 0)
        dz2(firstMax * f2 + gg) = dgp
      gg += 1
    }
    // conv2 kernel/bias grads
    gg = 0
    while (gg < f2) {
      var gb = 0.0
      var q = 0
      while (q < P2) { gb += dz2(q * f2 + gg); q += 1 }
      g(ly.b2Off + gg) += gb
      var j = 0
      while (j < k) {
        var f = 0
        while (f < f1) {
          var gw = 0.0
          q = 0
          while (q < P2) {
            gw += dz2(q * f2 + gg) * m1((q + j) * f1 + f)
            q += 1
          }
          g(ly.w2Off + (gg * k + j) * f1 + f) += gw
          f += 1
        }
        j += 1
      }
      gg += 1
    }
    // dm1 via W2, then conv1 pre-activation grads (local-max + relu)
    val dm1 = new Array[Double](J * f1)
    jw = 0
    while (jw < J) {
      var f = 0
      while (f < f1) {
        var acc = 0.0
        var q = math.max(0, jw - k + 1)
        val qMax = math.min(P2 - 1, jw)
        while (q <= qMax) {
          var g2 = 0
          while (g2 < f2) {
            acc += dz2(q * f2 + g2) * p.w2(g2)(jw - q)(f)
            g2 += 1
          }
          q += 1
        }
        dm1(jw * f1 + f) = acc
        f += 1
      }
      jw += 1
    }
    pos = 0
    while (pos < P1) {
      val j = pos / 2
      if (j < J) {
        var f = 0
        while (f < f1) {
          val target = m1(j * f1 + f)
          val av = a1(pos * f1 + f)
          val route =
            if (pos == 2 * j) av == target
            else a1(2 * j * f1 + f) < target && av == target
          if (route && av > 0) {
            val dz = dm1(j * f1 + f)
            if (dz != 0.0) {
              g(ly.b1Off + f) += dz
              var i = 0
              while (i < k) {
                g(ly.w1Off + f * k + i) += dz * s.x(pos + i)
                i += 1
              }
            }
          }
          f += 1
        }
      }
      pos += 1
    }
  }

  /** One full-batch pass — the [[Conv2Trainer.gradients]] contract on
    * the treeAggregate path: mean gradients + mean loss, one Spark job,
    * weights broadcast once, O(params) reduction. */
  def gradients(df: DataFrame, xs: Seq[Column], label: Column,
      w: Conv2Weights): Conv2Grads = {
    val T = xs.length
    require(T - w.k + 1 >= 1 && (T - w.k + 1) / 2 - w.k + 1 >= 1,
      s"input length $T too short for stacked kernels ${w.k}")
    gradientsRdd(WideNet.sampleRdd(df, xs, label, lit(0L), lit(false)),
      T, w)
  }

  /** [[gradients]] over pre-decoded typed rows — the fit loops call
    * this against ONE cached RDD instead of re-planning/re-decoding a
    * fresh DataFrame per epoch ([[WideNet.withSamples]]). */
  private def gradientsRdd(rows: org.apache.spark.rdd.RDD[Sample],
      T: Int, w: Conv2Weights): Conv2Grads = {
    val spark = org.apache.spark.sql.SparkSession.active
    val packed = new Packed(w)
    val ly = new Layout(packed, T)
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
    require(n > 0, "WideConv2.gradients: empty training input")
    val f1 = packed.f1; val f2 = packed.f2; val k = packed.k
    val kc = packed.kc
    Conv2Grads(
      Seq.tabulate(f1, k)((f, i) => g(ly.w1Off + f * k + i) / n),
      Seq.tabulate(f1)(f => g(ly.b1Off + f) / n),
      Seq.tabulate(f2, k, f1)((gg, j, f) =>
        g(ly.w2Off + (gg * k + j) * f1 + f) / n),
      Seq.tabulate(f2)(gg => g(ly.b2Off + gg) / n),
      Seq.tabulate(kc, f2)((o, gg) => g(ly.whOff + o * f2 + gg) / n),
      Seq.tabulate(kc)(o => g(ly.bhOff + o) / n),
      g(ly.statsOff) / n)
  }

  /** Full-batch GD on the wide path ([[Conv2Trainer.fit]] contract). */
  def fit(df: DataFrame, xs: Seq[Column], label: Column,
      w0: Conv2Weights, epochs: Int,
      lr: Double): (Conv2Weights, Seq[Double]) = {
    val T = xs.length
    require(T - w0.k + 1 >= 1 && (T - w0.k + 1) / 2 - w0.k + 1 >= 1,
      s"input length $T too short for stacked kernels ${w0.k}")
    WideNet.withSamples(df, xs, label, lit(0L), lit(false)) { rows =>
      var w = w0
      val losses = (1 to epochs).map { _ =>
        val gr = gradientsRdd(rows, T, w)
        w = Conv2Trainer.applyStep(w, gr, lr)
        gr.loss
      }
      (w, losses)
    }
  }

  /** [[fit]] with pluggable optimizer (the reference's Adam) and
    * optional deterministic hash mini-batching (no validation slice on
    * this twin — batches are plain row-local filters); sgd +
    * nBatches=1 reproduces [[fit]]. Full-batch runs on the cached-RDD
    * path; the batched form keeps per-batch DataFrame filters
    * (membership is a (keys, epoch) hash — it changes every epoch). */
  def fitOpt(df: DataFrame, xs: Seq[Column], label: Column,
      w0: Conv2Weights, epochs: Int, opt: TrainerCommon.Optimizer,
      batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): (Conv2Weights, Seq[Double]) =
    if (nBatches == 1) {
      val T = xs.length
      require(T - w0.k + 1 >= 1 && (T - w0.k + 1) / 2 - w0.k + 1 >= 1,
        s"input length $T too short for stacked kernels ${w0.k}")
      WideNet.withSamples(df, xs, label, lit(0L), lit(false)) { rows =>
        var w = w0
        val losses = (1 to epochs).map { _ =>
          val gr = gradientsRdd(rows, T, w)
          w = Conv2Trainer.applyOpt(w, gr, opt)
          gr.loss
        }
        (w, losses)
      }
    } else
      TrainerCommon.fitLoop(df, epochs, batchKeys, nBatches, w0) { (dfb, w) =>
        val gr = gradients(dfb, xs, label, w)
        (Conv2Trainer.applyOpt(w, gr, opt), gr.loss)
      }
}
