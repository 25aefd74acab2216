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

  /** FLAT packed weights + transposed copies for the backward pass's
    * column access (the WideLstm2 layout rationale): same doubles, same
    * arithmetic, no nested-array pointer chasing. */
  private final class Packed(w: W) extends Serializable {
    val u1: Int = w.u1
    val u2: Int = w.u2
    val kc: Int = w.classes
    val wx1: Array[Double] = w.wx1.toArray
    val wh1: Array[Double] = w.wh1.flatten.toArray     // (u)*u1+v
    val b1: Array[Double] = w.b1.toArray
    val wx2: Array[Double] = w.wx2.flatten.toArray     // (u)*u1+v
    val wh2: Array[Double] = w.wh2.flatten.toArray     // (u)*u2+v
    val b2: Array[Double] = w.b2.toArray
    val w3: Array[Double] = w.w3.flatten.toArray       // (o)*u2+v
    val b3: Array[Double] = w.b3.toArray
    val wh1T: Array[Double] = {                         // (c)*u1+r = wh1(r)(c)
      val a = new Array[Double](u1 * u1)
      var r = 0
      while (r < u1) {
        var c = 0
        while (c < u1) { a(c * u1 + r) = wh1(r * u1 + c); c += 1 }
        r += 1
      }
      a
    }
    val wx2T: Array[Double] = {                         // (c)*u2+r = wx2(r)(c)
      val a = new Array[Double](u2 * u1)
      var r = 0
      while (r < u2) {
        var c = 0
        while (c < u1) { a(c * u2 + r) = wx2(r * u1 + c); c += 1 }
        r += 1
      }
      a
    }
    val wh2T: Array[Double] = {                         // (c)*u2+r = wh2(r)(c)
      val a = new Array[Double](u2 * u2)
      var r = 0
      while (r < u2) {
        var c = 0
        while (c < u2) { a(c * u2 + r) = wh2(r * u2 + c); c += 1 }
        r += 1
      }
      a
    }
    val w3T: Array[Double] = {                          // (v)*kc+o = w3(o)(v)
      val a = new Array[Double](kc * u2)
      var o = 0
      while (o < kc) {
        var v = 0
        while (v < u2) { a(v * kc + o) = w3(o * u2 + v); v += 1 }
        o += 1
      }
      a
    }
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

  /** Per-thread reusable scratch (the WideLstm2 pattern): every array
    * is fully written before read except the t = 0 state rows, which no
    * code path writes — they stay zero from allocation. */
  private final class Scratch(val T: Int, val u1: Int, val u2: Int,
      val kc: Int) {
    private def mk(n: Int) = new Array[Double]((T + 1) * n)
    val h1 = mk(u1); val a1 = mk(u1); val m1v = mk(u1); val h2 = mk(u2)
    val m2v = new Array[Double](u2); val a2 = new Array[Double](u2)
    val z3 = new Array[Double](kc); val dzo = new Array[Double](kc)
    val dz1 = new Array[Double]((T + 2) * u1)
    val dz2 = new Array[Double]((T + 2) * u2)
    val h1T = new Array[Double](u1 * (T + 1))
    val a1T = new Array[Double](u1 * (T + 1))
    val h2T = new Array[Double](u2 * (T + 1))
    val dzl = new Array[Double](T + 1)
  }
  private val scratchTL = new ThreadLocal[Scratch]
  private def scratchFor(T: Int, p: Packed): Scratch = {
    val c = scratchTL.get()
    if (c != null && c.T == T && c.u1 == p.u1 && c.u2 == p.u2 &&
      c.kc == p.kc) c
    else {
      val n = new Scratch(T, p.u1, p.u2, p.kc)
      scratchTL.set(n); n
    }
  }

  /** One row's stacked-BPTT contribution — line for line the staged
    * columns of [[Rnn2Trainer.gradientsVal]]. Flat layouts, transposed
    * reads, and 4-lane unit unrolls (independent accumulator chains);
    * every accumulator's add order is the historical one, so the
    * output is bit-identical (the WideLstm2 rationale). */
  private def accumulate(s: Sample, p: Packed, ly: Layout, epoch: Int,
      dropout: Double, g: Array[Double]): Unit = {
    val T = s.x.length
    val u1 = p.u1; val u2 = p.u2
    val sc = scratchFor(T, p)
    val h1 = sc.h1; val a1 = sc.a1; val m1v = sc.m1v; val h2 = sc.h2
    var t = 1
    while (t <= T) {
      val xt = s.x(t - 1)
      val rp = t * u1; val rm = (t - 1) * u1
      var u = 0
      while (u + 3 < u1) {
        var s0 = xt * p.wx1(u) + p.b1(u)
        var s1 = xt * p.wx1(u + 1) + p.b1(u + 1)
        var s2 = xt * p.wx1(u + 2) + p.b1(u + 2)
        var s3 = xt * p.wx1(u + 3) + p.b1(u + 3)
        val w0 = u * u1; val w1 = (u + 1) * u1
        val w2 = (u + 2) * u1; val w3 = (u + 3) * u1
        var v = 0
        while (v < u1) {
          val hv = h1(rm + v)
          s0 += hv * p.wh1(w0 + v); s1 += hv * p.wh1(w1 + v)
          s2 += hv * p.wh1(w2 + v); s3 += hv * p.wh1(w3 + v)
          v += 1
        }
        var l = 0
        while (l < 4) {
          val acc = l match {
            case 0 => s0; case 1 => s1; case 2 => s2; case _ => s3
          }
          h1(rp + u + l) = if (acc > 0) acc else 0.0
          m1v(rp + u + l) = dropMaskLocal(s.iv, s.rk, epoch,
            (t - 1) * u1 + u + l, dropout)
          a1(rp + u + l) = h1(rp + u + l) * m1v(rp + u + l)
          l += 1
        }
        u += 4
      }
      while (u < u1) {
        var acc = xt * p.wx1(u) + p.b1(u)
        val wb = u * u1
        var v = 0
        while (v < u1) { acc += h1(rm + v) * p.wh1(wb + v); v += 1 }
        h1(rp + u) = if (acc > 0) acc else 0.0
        m1v(rp + u) = dropMaskLocal(s.iv, s.rk, epoch, (t - 1) * u1 + u,
          dropout)
        a1(rp + u) = h1(rp + u) * m1v(rp + u)
        u += 1
      }
      val qp = t * u2; val qm = (t - 1) * u2
      u = 0
      while (u + 3 < u2) {
        var s0 = p.b2(u); var s1 = p.b2(u + 1)
        var s2 = p.b2(u + 2); var s3 = p.b2(u + 3)
        val x0 = u * u1; val x1 = (u + 1) * u1
        val x2 = (u + 2) * u1; val x3 = (u + 3) * u1
        var v = 0
        while (v < u1) {
          val av = a1(rp + v)
          s0 += av * p.wx2(x0 + v); s1 += av * p.wx2(x1 + v)
          s2 += av * p.wx2(x2 + v); s3 += av * p.wx2(x3 + v)
          v += 1
        }
        val h0 = u * u2; val h1b = (u + 1) * u2
        val h2b = (u + 2) * u2; val h3b = (u + 3) * u2
        v = 0
        while (v < u2) {
          val hv = h2(qm + v)
          s0 += hv * p.wh2(h0 + v); s1 += hv * p.wh2(h1b + v)
          s2 += hv * p.wh2(h2b + v); s3 += hv * p.wh2(h3b + v)
          v += 1
        }
        h2(qp + u) = if (s0 > 0) s0 else 0.0
        h2(qp + u + 1) = if (s1 > 0) s1 else 0.0
        h2(qp + u + 2) = if (s2 > 0) s2 else 0.0
        h2(qp + u + 3) = if (s3 > 0) s3 else 0.0
        u += 4
      }
      while (u < u2) {
        var acc = p.b2(u)
        val xb = u * u1
        var v = 0
        while (v < u1) { acc += a1(rp + v) * p.wx2(xb + v); v += 1 }
        val hb = u * u2
        v = 0
        while (v < u2) { acc += h2(qm + v) * p.wh2(hb + v); v += 1 }
        h2(qp + u) = if (acc > 0) acc else 0.0
        u += 1
      }
      t += 1
    }
    val m2v = sc.m2v
    val a2 = sc.a2
    var u = 0
    while (u < u2) {
      m2v(u) = dropMaskLocal(s.iv, s.rk, epoch, T * u1 + u, dropout)
      a2(u) = h2(T * u2 + u) * m2v(u); u += 1
    }
    val z3 = sc.z3
    var o = 0
    while (o < p.kc) {
      var acc = p.b3(o)
      val wb = o * u2
      var v = 0
      while (v < u2) { acc += a2(v) * p.w3(wb + v); v += 1 }
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
    val dzo = sc.dzo
    o = 0
    while (o < p.kc) {
      dzo(o) = math.exp(z3(o) - mx) / denom - (if (s.y == o) 1.0 else 0.0)
      o += 1
    }
    val dz1 = sc.dz1
    val dz2 = sc.dz2
    t = T
    while (t >= 1) {
      val ti = t
      val qp = ti * u2
      var u3 = 0
      if (ti == T) {
        while (u3 < u2) {
          var acc = 0.0
          val wb = u3 * p.kc
          o = 0
          while (o < p.kc) { acc += dzo(o) * p.w3T(wb + o); o += 1 }
          val dh2 = acc * m2v(u3)
          dz2(ti * u2 + u3) = dh2 * (if (h2(qp + u3) > 0) 1.0 else 0.0)
          u3 += 1
        }
      } else {
        val db = (ti + 1) * u2
        while (u3 + 3 < u2) {
          var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
          val w0 = u3 * u2; val w1 = (u3 + 1) * u2
          val w2 = (u3 + 2) * u2; val w3 = (u3 + 3) * u2
          var v = 0
          while (v < u2) {
            val dv = dz2(db + v)
            s0 += dv * p.wh2T(w0 + v); s1 += dv * p.wh2T(w1 + v)
            s2 += dv * p.wh2T(w2 + v); s3 += dv * p.wh2T(w3 + v)
            v += 1
          }
          dz2(ti * u2 + u3) = s0 * (if (h2(qp + u3) > 0) 1.0 else 0.0)
          dz2(ti * u2 + u3 + 1) = s1 * (if (h2(qp + u3 + 1) > 0) 1.0 else 0.0)
          dz2(ti * u2 + u3 + 2) = s2 * (if (h2(qp + u3 + 2) > 0) 1.0 else 0.0)
          dz2(ti * u2 + u3 + 3) = s3 * (if (h2(qp + u3 + 3) > 0) 1.0 else 0.0)
          u3 += 4
        }
        while (u3 < u2) {
          var acc = 0.0
          val wb = u3 * u2
          var v = 0
          while (v < u2) { acc += dz2(db + v) * p.wh2T(wb + v); v += 1 }
          dz2(ti * u2 + u3) = acc * (if (h2(qp + u3) > 0) 1.0 else 0.0)
          u3 += 1
        }
      }
      val rp = ti * u1
      val db2 = ti * u2
      var u4 = 0
      while (u4 + 3 < u1) {
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
        val w0 = u4 * u2; val w1 = (u4 + 1) * u2
        val w2 = (u4 + 2) * u2; val w3 = (u4 + 3) * u2
        var v = 0
        while (v < u2) {
          val dv = dz2(db2 + v)
          s0 += dv * p.wx2T(w0 + v); s1 += dv * p.wx2T(w1 + v)
          s2 += dv * p.wx2T(w2 + v); s3 += dv * p.wx2T(w3 + v)
          v += 1
        }
        s0 *= m1v(rp + u4); s1 *= m1v(rp + u4 + 1)
        s2 *= m1v(rp + u4 + 2); s3 *= m1v(rp + u4 + 3)
        if (ti < T) {
          val db1 = (ti + 1) * u1
          val h0 = u4 * u1; val h1b = (u4 + 1) * u1
          val h2b = (u4 + 2) * u1; val h3b = (u4 + 3) * u1
          var v2 = 0
          while (v2 < u1) {
            val dv = dz1(db1 + v2)
            s0 += dv * p.wh1T(h0 + v2); s1 += dv * p.wh1T(h1b + v2)
            s2 += dv * p.wh1T(h2b + v2); s3 += dv * p.wh1T(h3b + v2)
            v2 += 1
          }
        }
        dz1(ti * u1 + u4) = s0 * (if (h1(rp + u4) > 0) 1.0 else 0.0)
        dz1(ti * u1 + u4 + 1) = s1 * (if (h1(rp + u4 + 1) > 0) 1.0 else 0.0)
        dz1(ti * u1 + u4 + 2) = s2 * (if (h1(rp + u4 + 2) > 0) 1.0 else 0.0)
        dz1(ti * u1 + u4 + 3) = s3 * (if (h1(rp + u4 + 3) > 0) 1.0 else 0.0)
        u4 += 4
      }
      while (u4 < u1) {
        var fromL2 = 0.0
        val wb = u4 * u2
        var v = 0
        while (v < u2) { fromL2 += dz2(db2 + v) * p.wx2T(wb + v); v += 1 }
        fromL2 *= m1v(rp + u4)
        var dh1 = fromL2
        if (ti < T) {
          val db1 = (ti + 1) * u1
          val hb = u4 * u1
          v = 0
          while (v < u1) { dh1 += dz1(db1 + v) * p.wh1T(hb + v); v += 1 }
        }
        dz1(ti * u1 + u4) = dh1 * (if (h1(rp + u4) > 0) 1.0 else 0.0)
        u4 += 1
      }
      t -= 1
    }
    // gradient accumulation: state transposed to (unit, t) so the
    // t-inner dot products stream contiguously; each unit's dz column
    // hoists into a local T-vector once
    val h1T = sc.h1T; val a1T = sc.a1T; val h2T = sc.h2T
    var tt = 0
    while (tt <= T) {
      var v = 0
      while (v < u1) {
        h1T(v * (T + 1) + tt) = h1(tt * u1 + v)
        a1T(v * (T + 1) + tt) = a1(tt * u1 + v)
        v += 1
      }
      v = 0
      while (v < u2) { h2T(v * (T + 1) + tt) = h2(tt * u2 + v); v += 1 }
      tt += 1
    }
    val dzl = sc.dzl
    var u5 = 0
    while (u5 < u1) {
      var swx = 0.0; var sb = 0.0
      var t2 = 1
      while (t2 <= T) {
        dzl(t2) = dz1(t2 * u1 + u5)
        swx += dzl(t2) * s.x(t2 - 1); sb += dzl(t2); t2 += 1
      }
      g(ly.wx1Off + u5) += swx
      g(ly.b1Off + u5) += sb
      val gb = ly.wh1Off + u5 * u1
      var v = 0
      while (v + 3 < u1) {
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
        val h0 = v * (T + 1); val h1b = (v + 1) * (T + 1)
        val h2b = (v + 2) * (T + 1); val h3b = (v + 3) * (T + 1)
        t2 = 1
        while (t2 <= T) {
          val dv = dzl(t2)
          s0 += dv * h1T(h0 + t2 - 1); s1 += dv * h1T(h1b + t2 - 1)
          s2 += dv * h1T(h2b + t2 - 1); s3 += dv * h1T(h3b + t2 - 1)
          t2 += 1
        }
        g(gb + v) += s0; g(gb + v + 1) += s1
        g(gb + v + 2) += s2; g(gb + v + 3) += s3
        v += 4
      }
      while (v < u1) {
        var sw = 0.0
        val hb = v * (T + 1)
        t2 = 1
        while (t2 <= T) { sw += dzl(t2) * h1T(hb + t2 - 1); t2 += 1 }
        g(gb + v) += sw
        v += 1
      }
      u5 += 1
    }
    var u6 = 0
    while (u6 < u2) {
      var sb = 0.0
      var t2 = 1
      while (t2 <= T) {
        dzl(t2) = dz2(t2 * u2 + u6); sb += dzl(t2); t2 += 1
      }
      g(ly.b2Off + u6) += sb
      val gxb = ly.wx2Off + u6 * u1
      var v = 0
      while (v + 3 < u1) {
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
        val a0 = v * (T + 1); val a1b = (v + 1) * (T + 1)
        val a2b = (v + 2) * (T + 1); val a3b = (v + 3) * (T + 1)
        t2 = 1
        while (t2 <= T) {
          val dv = dzl(t2)
          s0 += dv * a1T(a0 + t2); s1 += dv * a1T(a1b + t2)
          s2 += dv * a1T(a2b + t2); s3 += dv * a1T(a3b + t2)
          t2 += 1
        }
        g(gxb + v) += s0; g(gxb + v + 1) += s1
        g(gxb + v + 2) += s2; g(gxb + v + 3) += s3
        v += 4
      }
      while (v < u1) {
        var sw = 0.0
        val ab = v * (T + 1)
        t2 = 1
        while (t2 <= T) { sw += dzl(t2) * a1T(ab + t2); t2 += 1 }
        g(gxb + v) += sw
        v += 1
      }
      val ghb = ly.wh2Off + u6 * u2
      v = 0
      while (v + 3 < u2) {
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
        val h0 = v * (T + 1); val h1b = (v + 1) * (T + 1)
        val h2b = (v + 2) * (T + 1); val h3b = (v + 3) * (T + 1)
        t2 = 1
        while (t2 <= T) {
          val dv = dzl(t2)
          s0 += dv * h2T(h0 + t2 - 1); s1 += dv * h2T(h1b + t2 - 1)
          s2 += dv * h2T(h2b + t2 - 1); s3 += dv * h2T(h3b + t2 - 1)
          t2 += 1
        }
        g(ghb + v) += s0; g(ghb + v + 1) += s1
        g(ghb + v + 2) += s2; g(ghb + v + 3) += s3
        v += 4
      }
      while (v < u2) {
        var sw = 0.0
        val hb = v * (T + 1)
        t2 = 1
        while (t2 <= T) { sw += dzl(t2) * h2T(hb + t2 - 1); t2 += 1 }
        g(ghb + v) += sw
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
      isVal: Column): (G, Option[Double]) =
    gradientsValRdd(WideNet.sampleRdd(df, xs, label, rowKey, isVal),
      w, epoch, dropout)

  /** [[gradientsVal]] over pre-decoded typed rows — the fit loops call
    * this against ONE cached RDD instead of re-planning/re-decoding a
    * fresh DataFrame per epoch ([[WideNet.withSamples]]). */
  private def gradientsValRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: W, epoch: Int, dropout: Double): (G, Option[Double]) = {
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
      rowKey: Column, w: W, isVal: Column): Double =
    valLossRdd(WideNet.sampleRdd(
      df.filter(isVal), xs, label, rowKey, lit(true)), w)

  /** [[valLoss]] over pre-decoded VAL rows (a narrow filter of the
    * cached fit RDD — same partitions, same order). */
  private def valLossRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: W): Double = {
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
    require(nVal > 0, "WideRnn2.valLoss: empty validation slice")
    g(ly.statsOff + 2) / nVal
  }

  /** Full-batch stacked-BPTT GD on the wide path. Decodes the typed
    * rows once and runs every epoch against the cached RDD
    * ([[WideNet.withSamples]] — bit-identical, see its note). */
  def fit(df: DataFrame, xs: Seq[Column], label: Column, w0: W,
      epochs: Int, lr: Double, rowKey: Column = lit(0L),
      dropout: Double = 0.0): (W, Seq[Double]) =
    WideNet.withSamples(df, xs, label, rowKey, lit(false)) { rows =>
      var w = w0
      val losses = (1 to epochs).map { e =>
        val (gr, _) = gradientsValRdd(rows, w, e, dropout)
        w = Rnn2Trainer.step(w, gr, lr)
        gr.loss
      }
      (w, losses)
    }

  /** [[fit]] under Keras EarlyStopping ([[TrainerCommon.earlyStop]]). */
  def fitEs(df: DataFrame, xs: Seq[Column], label: Column, w0: W,
      maxEpochs: Int, lr: Double, rowKey: Column, dropout: Double,
      isVal: Column, patience: Int = 5): TrainerCommon.EsResult[W] =
    WideNet.withSamples(df, xs, label, rowKey, isVal) { rows =>
      val valRows = rows.filter(_.iv)
      TrainerCommon.earlyStop(w0, maxEpochs, patience,
          evalPass = Some(wc => valLossRdd(valRows, wc))) { (w, e) =>
        val (gr, vl) = gradientsValRdd(rows, w, e, dropout)
        (Rnn2Trainer.step(w, gr, lr), gr.loss,
          vl.getOrElse(sys.error("fitEs: empty validation slice")))
      }
    }

  /** [[fitEs]] with pluggable optimizer + hash mini-batching
    * ([[TrainerCommon.batchedEpoch]]); sgd + nBatches=1 reproduces
    * [[fitEs]]. Full-batch runs on the cached-RDD path; the batched
    * form keeps per-batch DataFrame filters (membership is a
    * (keys, epoch) hash — it changes every epoch). */
  def fitEsOpt(df: DataFrame, xs: Seq[Column], label: Column, w0: W,
      maxEpochs: Int, opt: TrainerCommon.Optimizer, rowKey: Column,
      dropout: Double, isVal: Column, patience: Int = 5,
      batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): TrainerCommon.EsResult[W] =
    if (nBatches == 1)
      WideNet.withSamples(df, xs, label, rowKey, isVal) { rows =>
        val valRows = rows.filter(_.iv)
        TrainerCommon.earlyStop(w0, maxEpochs, patience,
            evalPass = Some(wc => valLossRdd(valRows, wc))) { (w, e) =>
          val (gr, vl) = gradientsValRdd(rows, w, e, dropout)
          (Rnn2Trainer.applyOpt(w, gr, opt), gr.loss,
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
            (Rnn2Trainer.applyOpt(wc, gr, opt), gr.loss, vl)
        }
      }
}
