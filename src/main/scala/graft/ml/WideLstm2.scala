package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Packed weights: FLAT gate-major arrays (plus transposed copies for
    * the backward pass's column access), O(1) hot-loop access with no
    * nested-array pointer chasing — the 2-level `Array[Array[Double]]`
    * form cost the hot loop one dependent load + bounds check per
    * element and defeated cache-line streaming on the transposed reads
    * (measured ~2.5x on q76's 64/128 widths). Gate order i/f/g/o
    * throughout; same doubles, same arithmetic — layout only. */
  private final class Packed(w: W) extends Serializable {
    val u1: Int = w.u1
    val u2: Int = w.u2
    val d: Int = w.d
    val kc: Int = w.classes
    // layer 1: wx1((x)*u1+u), uu1(((x*u1)+u)*u1+v), b1((x)*u1+u)
    val wx1: Array[Double] = Gates.flatMap(x => w.l1(x).wx)
    val uu1: Array[Double] = Gates.flatMap(x => w.l1(x).u.flatten)
    val b1: Array[Double] = Gates.flatMap(x => w.l1(x).b)
    // layer 2: wx2(((x*u2)+u)*u1+v over u1), uu2(((x*u2)+u)*u2+v), b2
    val wx2: Array[Double] = Gates.flatMap(x => w.l2(x).wx.flatten)
    val uu2: Array[Double] = Gates.flatMap(x => w.l2(x).u.flatten)
    val b2: Array[Double] = Gates.flatMap(x => w.l2(x).b)
    val wd: Array[Double] = w.wd.flatten.toArray            // (j)*u2+v
    val bd: Array[Double] = w.bd.toArray
    val w3: Array[Double] = w.w3.flatten.toArray            // (o)*d+j
    val b3: Array[Double] = w.b3.toArray
    // transposed copies (same values): backward reads weights by their
    // INPUT index — contiguous here where the originals are strided
    val uu1T: Array[Double] = {                 // ((x*u1)+v)*u1+u = uu1(x)(u)(v)
      val a = new Array[Double](4 * u1 * u1)
      var x = 0
      while (x < 4) {
        var u = 0
        while (u < u1) {
          var v = 0
          while (v < u1) {
            a((x * u1 + v) * u1 + u) = uu1((x * u1 + u) * u1 + v); v += 1
          }
          u += 1
        }
        x += 1
      }
      a
    }
    val uu2T: Array[Double] = {                 // ((x*u2)+v)*u2+u = uu2(x)(u)(v)
      val a = new Array[Double](4 * u2 * u2)
      var x = 0
      while (x < 4) {
        var u = 0
        while (u < u2) {
          var v = 0
          while (v < u2) {
            a((x * u2 + v) * u2 + u) = uu2((x * u2 + u) * u2 + v); v += 1
          }
          u += 1
        }
        x += 1
      }
      a
    }
    val wx2T: Array[Double] = {                 // ((x*u1)+v)*u2+u = wx2(x)(u)(v)
      val a = new Array[Double](4 * u1 * u2)
      var x = 0
      while (x < 4) {
        var u = 0
        while (u < u2) {
          var v = 0
          while (v < u1) {
            a((x * u1 + v) * u2 + u) = wx2((x * u2 + u) * u1 + v); v += 1
          }
          u += 1
        }
        x += 1
      }
      a
    }
    val wdT: Array[Double] = {                  // (v)*d+j = wd(j)(v)
      val a = new Array[Double](u2 * d)
      var j = 0
      while (j < d) {
        var v = 0
        while (v < u2) { a(v * d + j) = wd(j * u2 + v); v += 1 }
        j += 1
      }
      a
    }
    val w3T: Array[Double] = {                  // (j)*kc+o = w3(o)(j)
      val a = new Array[Double](kc * d)
      var o = 0
      while (o < kc) {
        var j = 0
        while (j < d) { a(j * kc + o) = w3(o * d + j); j += 1 }
        o += 1
      }
      a
    }
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

  /** Per-thread reusable scratch for [[accumulate]] — ~190 KB of state/
    * gradient work arrays per row otherwise allocated and zeroed 18k+
    * times per epoch. Safe to reuse across rows because every cell is
    * written before it is read on the paths that read it, EXCEPT the
    * t = 0 state rows (zero init = zero h/c state), which no code path
    * ever writes — so they stay zero from the initial allocation.
    * Executor task threads are pooled and long-lived; one scratch per
    * (thread, dims) amortizes to nothing. */
  private final class Scratch(val T: Int, val u1: Int, val u2: Int,
      val d: Int, val kc: Int) {
    private def mk(n: Int) = new Array[Double]((T + 1) * n)
    val i1 = mk(u1); val f1 = mk(u1); val g1 = mk(u1); val o1 = mk(u1)
    val c1 = mk(u1); val tc1 = mk(u1); val h1 = mk(u1); val a1 = mk(u1)
    val i2 = mk(u2); val f2 = mk(u2); val g2 = mk(u2); val o2 = mk(u2)
    val c2 = mk(u2); val tc2 = mk(u2); val h2 = mk(u2)
    val m1v = mk(u1)
    val m2v = new Array[Double](u2); val a2 = new Array[Double](u2)
    val zd = new Array[Double](d); val ad = new Array[Double](d)
    val z3 = new Array[Double](kc); val dzo = new Array[Double](kc)
    val dzd = new Array[Double](d)
    val dz1 = new Array[Double](4 * (T + 1) * u1)
    val dz2 = new Array[Double](4 * (T + 1) * u2)
    val dc1 = new Array[Double]((T + 2) * u1)
    val dc2 = new Array[Double]((T + 2) * u2)
    val h1T = new Array[Double](u1 * (T + 1))
    val a1T = new Array[Double](u1 * (T + 1))
    val h2T = new Array[Double](u2 * (T + 1))
    val dzl = new Array[Double](T + 1)
  }
  private val scratchTL = new ThreadLocal[Scratch]
  private def scratchFor(T: Int, p: Packed): Scratch = {
    val c = scratchTL.get()
    if (c != null && c.T == T && c.u1 == p.u1 && c.u2 == p.u2 &&
      c.d == p.d && c.kc == p.kc) c
    else {
      val n = new Scratch(T, p.u1, p.u2, p.d, p.kc)
      scratchTL.set(n); n
    }
  }

  /** One row's contribution — line for line the staged columns of
    * [[Lstm2Trainer.gradientsVal]]. Every accumulator's ADD ORDER is
    * the historical one (flat/transposed layouts change where a double
    * lives, never the sequence of additions into any sum), so gradients
    * and losses are bit-identical to the nested-array form. */
  private def accumulate(s: Sample, p: Packed, ly: Layout, epoch: Int,
      dropout: Double, g: Array[Double]): Unit = {
    val T = s.x.length
    val u1 = p.u1; val u2 = p.u2
    // forward state, flat (t)*u+i; t index 1..T, 0 = zero init (the
    // t = 0 rows are zero in a fresh Scratch and never written — see
    // Scratch's reuse contract)
    val sc = scratchFor(T, p)
    val i1 = sc.i1; val f1 = sc.f1; val g1 = sc.g1; val o1 = sc.o1
    val c1 = sc.c1; val tc1 = sc.tc1; val h1 = sc.h1; val a1 = sc.a1
    val i2 = sc.i2; val f2 = sc.f2; val g2 = sc.g2; val o2 = sc.o2
    val c2 = sc.c2; val tc2 = sc.tc2; val h2 = sc.h2
    val m1v = sc.m1v
    // The four gates' pre-activations run as ONE pass over the state
    // row with four independent accumulator chains: same adds in the
    // same order per accumulator, but the FP-add latency chains overlap
    // (a single chain serializes the whole dot product on add latency)
    // and each state element is loaded once instead of four times.
    var t = 1
    while (t <= T) {
      val xt = s.x(t - 1)
      val rp = t * u1; val rm = (t - 1) * u1
      var u = 0
      while (u < u1) {
        var a0 = xt * p.wx1(u) + p.b1(u)
        var a1g = xt * p.wx1(u1 + u) + p.b1(u1 + u)
        var a2g = xt * p.wx1(2 * u1 + u) + p.b1(2 * u1 + u)
        var a3 = xt * p.wx1(3 * u1 + u) + p.b1(3 * u1 + u)
        val b0 = u * u1; val b1i = (u1 + u) * u1
        val b2i = (2 * u1 + u) * u1; val b3 = (3 * u1 + u) * u1
        var v = 0
        while (v < u1) {
          val hv = h1(rm + v)
          a0 += hv * p.uu1(b0 + v); a1g += hv * p.uu1(b1i + v)
          a2g += hv * p.uu1(b2i + v); a3 += hv * p.uu1(b3 + v)
          v += 1
        }
        i1(rp + u) = sigm(a0); f1(rp + u) = sigm(a1g)
        g1(rp + u) = math.tanh(a2g); o1(rp + u) = sigm(a3)
        c1(rp + u) = f1(rp + u) * c1(rm + u) + i1(rp + u) * g1(rp + u)
        tc1(rp + u) = math.tanh(c1(rp + u))
        h1(rp + u) = o1(rp + u) * tc1(rp + u)
        m1v(rp + u) = dropMaskLocal(s.iv, s.rk, epoch, (t - 1) * u1 + u,
          dropout)
        a1(rp + u) = h1(rp + u) * m1v(rp + u)
        u += 1
      }
      val qp = t * u2; val qm = (t - 1) * u2
      u = 0
      while (u < u2) {
        var a0 = p.b2(u)
        var a1g = p.b2(u2 + u)
        var a2g = p.b2(2 * u2 + u)
        var a3 = p.b2(3 * u2 + u)
        val w0 = u * u1; val w1i = (u2 + u) * u1
        val w2i = (2 * u2 + u) * u1; val w3i = (3 * u2 + u) * u1
        var v = 0
        while (v < u1) {
          val av = a1(rp + v)
          a0 += av * p.wx2(w0 + v); a1g += av * p.wx2(w1i + v)
          a2g += av * p.wx2(w2i + v); a3 += av * p.wx2(w3i + v)
          v += 1
        }
        val c0 = u * u2; val c1i = (u2 + u) * u2
        val c2i = (2 * u2 + u) * u2; val c3i = (3 * u2 + u) * u2
        v = 0
        while (v < u2) {
          val hv = h2(qm + v)
          a0 += hv * p.uu2(c0 + v); a1g += hv * p.uu2(c1i + v)
          a2g += hv * p.uu2(c2i + v); a3 += hv * p.uu2(c3i + v)
          v += 1
        }
        i2(qp + u) = sigm(a0); f2(qp + u) = sigm(a1g)
        g2(qp + u) = math.tanh(a2g); o2(qp + u) = sigm(a3)
        c2(qp + u) = f2(qp + u) * c2(qm + u) + i2(qp + u) * g2(qp + u)
        tc2(qp + u) = math.tanh(c2(qp + u))
        h2(qp + u) = o2(qp + u) * tc2(qp + u)
        u += 1
      }
      t += 1
    }
    // head: dropped h2_T -> relu Dense(d) -> softmax
    val m2v = sc.m2v
    val a2 = sc.a2
    var u = 0
    while (u < u2) {
      m2v(u) = dropMaskLocal(s.iv, s.rk, epoch, T * u1 + u, dropout)
      a2(u) = h2(T * u2 + u) * m2v(u); u += 1
    }
    val zd = sc.zd
    val ad = sc.ad
    var j = 0
    while (j < p.d) {
      var acc = p.bd(j)
      val wb = j * u2
      var v = 0
      while (v < u2) { acc += a2(v) * p.wd(wb + v); v += 1 }
      zd(j) = acc; ad(j) = if (acc > 0) acc else 0.0; j += 1
    }
    val z3 = sc.z3
    var o = 0
    while (o < p.kc) {
      var acc = p.b3(o)
      val wb = o * p.d
      var j2 = 0
      while (j2 < p.d) { acc += ad(j2) * p.w3(wb + j2); j2 += 1 }
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
    val dzd = sc.dzd
    j = 0
    while (j < p.d) {
      var acc = 0.0
      val wb = j * p.kc
      o = 0
      while (o < p.kc) { acc += dzo(o) * p.w3T(wb + o); o += 1 }
      dzd(j) = acc * (if (zd(j) > 0) 1.0 else 0.0); j += 1
    }
    // backward through time; dz flat ((x)*(T+1)+t)*u+i
    val dz1 = sc.dz1
    val dz2 = sc.dz2
    val dc1 = sc.dc1
    val dc2 = sc.dc2
    // Backward: the per-unit upstream sums (dh2, da1/dh1) run 4 units
    // per pass — four independent accumulator chains sharing one read
    // of the dz stream; each unit's adds keep their historical order.
    t = T
    while (t >= 1) {
      // snapshot the loop var: the nested tail defs must capture a val,
      // not the mutable `t` (a captured var boxes to IntRef and every
      // access in the method pays a heap deref)
      val ti = t
      val qp = ti * u2; val qm = (ti - 1) * u2
      def dz2Tail(u3: Int, dh2: Double): Unit = {
        val local = dh2 * o2(qp + u3) * (1.0 - tc2(qp + u3) * tc2(qp + u3))
        val dc = if (ti == T) local
          else local + dc2((ti + 1) * u2 + u3) * f2((ti + 1) * u2 + u3)
        dc2(ti * u2 + u3) = dc
        dz2((0 * (T + 1) + ti) * u2 + u3) =
          dc * g2(qp + u3) * i2(qp + u3) * (1.0 - i2(qp + u3))
        dz2((1 * (T + 1) + ti) * u2 + u3) =
          dc * c2(qm + u3) * f2(qp + u3) * (1.0 - f2(qp + u3))
        dz2((2 * (T + 1) + ti) * u2 + u3) =
          dc * i2(qp + u3) * (1.0 - g2(qp + u3) * g2(qp + u3))
        dz2((3 * (T + 1) + ti) * u2 + u3) =
          dh2 * tc2(qp + u3) * o2(qp + u3) * (1.0 - o2(qp + u3))
      }
      var u3 = 0
      if (ti == T) {
        while (u3 + 3 < u2) {
          var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
          val w0 = u3 * p.d; val w1i = (u3 + 1) * p.d
          val w2i = (u3 + 2) * p.d; val w3i = (u3 + 3) * p.d
          var j2 = 0
          while (j2 < p.d) {
            val dv = dzd(j2)
            s0 += dv * p.wdT(w0 + j2); s1 += dv * p.wdT(w1i + j2)
            s2 += dv * p.wdT(w2i + j2); s3 += dv * p.wdT(w3i + j2)
            j2 += 1
          }
          dz2Tail(u3, s0 * m2v(u3)); dz2Tail(u3 + 1, s1 * m2v(u3 + 1))
          dz2Tail(u3 + 2, s2 * m2v(u3 + 2)); dz2Tail(u3 + 3, s3 * m2v(u3 + 3))
          u3 += 4
        }
        while (u3 < u2) {
          var acc = 0.0
          val wb = u3 * p.d
          var j2 = 0
          while (j2 < p.d) { acc += dzd(j2) * p.wdT(wb + j2); j2 += 1 }
          dz2Tail(u3, acc * m2v(u3))
          u3 += 1
        }
      } else {
        while (u3 + 3 < u2) {
          var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
          var x = 0
          while (x < 4) {
            val db = (x * (T + 1) + (ti + 1)) * u2
            val b0 = (x * u2 + u3) * u2; val b1i = (x * u2 + u3 + 1) * u2
            val b2i = (x * u2 + u3 + 2) * u2; val b3i = (x * u2 + u3 + 3) * u2
            var v = 0
            while (v < u2) {
              val dv = dz2(db + v)
              s0 += dv * p.uu2T(b0 + v); s1 += dv * p.uu2T(b1i + v)
              s2 += dv * p.uu2T(b2i + v); s3 += dv * p.uu2T(b3i + v)
              v += 1
            }
            x += 1
          }
          dz2Tail(u3, s0); dz2Tail(u3 + 1, s1)
          dz2Tail(u3 + 2, s2); dz2Tail(u3 + 3, s3)
          u3 += 4
        }
        while (u3 < u2) {
          var acc = 0.0
          var x = 0
          while (x < 4) {
            val db = (x * (T + 1) + (ti + 1)) * u2
            val ub = (x * u2 + u3) * u2
            var v = 0
            while (v < u2) { acc += dz2(db + v) * p.uu2T(ub + v); v += 1 }
            x += 1
          }
          dz2Tail(u3, acc)
          u3 += 1
        }
      }
      val rp = ti * u1; val rm = (ti - 1) * u1
      def dz1Tail(u4: Int, dh1: Double): Unit = {
        val local = dh1 * o1(rp + u4) * (1.0 - tc1(rp + u4) * tc1(rp + u4))
        val dc = if (ti == T) local
          else local + dc1((ti + 1) * u1 + u4) * f1((ti + 1) * u1 + u4)
        dc1(ti * u1 + u4) = dc
        dz1((0 * (T + 1) + ti) * u1 + u4) =
          dc * g1(rp + u4) * i1(rp + u4) * (1.0 - i1(rp + u4))
        dz1((1 * (T + 1) + ti) * u1 + u4) =
          dc * c1(rm + u4) * f1(rp + u4) * (1.0 - f1(rp + u4))
        dz1((2 * (T + 1) + ti) * u1 + u4) =
          dc * i1(rp + u4) * (1.0 - g1(rp + u4) * g1(rp + u4))
        dz1((3 * (T + 1) + ti) * u1 + u4) =
          dh1 * tc1(rp + u4) * o1(rp + u4) * (1.0 - o1(rp + u4))
      }
      var u4 = 0
      while (u4 + 3 < u1) {
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
        var x = 0
        while (x < 4) {
          val db = (x * (T + 1) + ti) * u2
          val b0 = (x * u1 + u4) * u2; val b1i = (x * u1 + u4 + 1) * u2
          val b2i = (x * u1 + u4 + 2) * u2; val b3i = (x * u1 + u4 + 3) * u2
          var v = 0
          while (v < u2) {
            val dv = dz2(db + v)
            s0 += dv * p.wx2T(b0 + v); s1 += dv * p.wx2T(b1i + v)
            s2 += dv * p.wx2T(b2i + v); s3 += dv * p.wx2T(b3i + v)
            v += 1
          }
          x += 1
        }
        s0 *= m1v(rp + u4); s1 *= m1v(rp + u4 + 1)
        s2 *= m1v(rp + u4 + 2); s3 *= m1v(rp + u4 + 3)
        if (ti < T) {
          var x2 = 0
          while (x2 < 4) {
            val db = (x2 * (T + 1) + (ti + 1)) * u1
            val b0 = (x2 * u1 + u4) * u1; val b1i = (x2 * u1 + u4 + 1) * u1
            val b2i = (x2 * u1 + u4 + 2) * u1; val b3i = (x2 * u1 + u4 + 3) * u1
            var v = 0
            while (v < u1) {
              val dv = dz1(db + v)
              s0 += dv * p.uu1T(b0 + v); s1 += dv * p.uu1T(b1i + v)
              s2 += dv * p.uu1T(b2i + v); s3 += dv * p.uu1T(b3i + v)
              v += 1
            }
            x2 += 1
          }
        }
        dz1Tail(u4, s0); dz1Tail(u4 + 1, s1)
        dz1Tail(u4 + 2, s2); dz1Tail(u4 + 3, s3)
        u4 += 4
      }
      while (u4 < u1) {
        var da1 = 0.0
        var x = 0
        while (x < 4) {
          val db = (x * (T + 1) + ti) * u2
          val wb = (x * u1 + u4) * u2
          var v = 0
          while (v < u2) { da1 += dz2(db + v) * p.wx2T(wb + v); v += 1 }
          x += 1
        }
        da1 *= m1v(rp + u4)
        val dh1 =
          if (ti == T) da1
          else {
            var acc = da1
            var x2 = 0
            while (x2 < 4) {
              val db = (x2 * (T + 1) + (ti + 1)) * u1
              val ub = (x2 * u1 + u4) * u1
              var v = 0
              while (v < u1) { acc += dz1(db + v) * p.uu1T(ub + v); v += 1 }
              x2 += 1
            }
            acc
          }
        dz1Tail(u4, dh1)
        u4 += 1
      }
      t -= 1
    }
    // gradient accumulation (sum over t; mean over rows happens at the
    // end). The t-inner dot products read state TRANSPOSED — (i)*(T+1)+t,
    // contiguous over t — and hoist each (x, unit)'s dz column into a
    // local T-vector once instead of re-striding it per input index.
    val h1T = sc.h1T
    val a1T = sc.a1T
    val h2T = sc.h2T
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
    var x = 0
    while (x < 4) {
      var u5 = 0
      while (u5 < u1) {
        var swx = 0.0; var sb = 0.0
        var t2 = 1
        while (t2 <= T) {
          dzl(t2) = dz1((x * (T + 1) + t2) * u1 + u5)
          swx += dzl(t2) * s.x(t2 - 1)
          sb += dzl(t2)
          t2 += 1
        }
        g(ly.wx1Off + x * u1 + u5) += swx
        g(ly.b1Off + x * u1 + u5) += sb
        val gb = ly.uu1Off + (x * u1 + u5) * u1
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
          var su = 0.0
          val hb = v * (T + 1)
          t2 = 1
          while (t2 <= T) { su += dzl(t2) * h1T(hb + t2 - 1); t2 += 1 }
          g(gb + v) += su
          v += 1
        }
        u5 += 1
      }
      var u6 = 0
      while (u6 < u2) {
        var sb = 0.0
        var t2 = 1
        while (t2 <= T) {
          dzl(t2) = dz2((x * (T + 1) + t2) * u2 + u6)
          sb += dzl(t2)
          t2 += 1
        }
        g(ly.b2Off + x * u2 + u6) += sb
        val gwb = ly.wx2Off + (x * u2 + u6) * u1
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
          g(gwb + v) += s0; g(gwb + v + 1) += s1
          g(gwb + v + 2) += s2; g(gwb + v + 3) += s3
          v += 4
        }
        while (v < u1) {
          var swx = 0.0
          val ab = v * (T + 1)
          t2 = 1
          while (t2 <= T) { swx += dzl(t2) * a1T(ab + t2); t2 += 1 }
          g(gwb + v) += swx
          v += 1
        }
        val gub = ly.uu2Off + (x * u2 + u6) * u2
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
          g(gub + v) += s0; g(gub + v + 1) += s1
          g(gub + v + 2) += s2; g(gub + v + 3) += s3
          v += 4
        }
        while (v < u2) {
          var su = 0.0
          val hb = v * (T + 1)
          t2 = 1
          while (t2 <= T) { su += dzl(t2) * h2T(hb + t2 - 1); t2 += 1 }
          g(gub + v) += su
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
      isVal: Column): (G, Option[Double]) =
    gradientsValRdd(WideNet.sampleRdd(df, xs, label, rowKey, isVal),
      w, epoch, dropout)

  /** [[gradientsVal]] over pre-decoded typed rows — the fit loops call
    * this against ONE cached RDD instead of re-planning/re-decoding a
    * fresh DataFrame per epoch ([[WideNet.withSamples]]). */
  private def gradientsValRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: W, epoch: Int, dropout: Double): (G, Option[Double]) = {
    require(dropout >= 0.0 && dropout < 1.0, "dropout in [0, 1)")
    val spark = SparkSession.active
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
      rowKey: Column, w: W, isVal: Column): Double =
    valLossRdd(WideNet.sampleRdd(
      df.filter(isVal), xs, label, rowKey, lit(true)), w)

  /** [[valLoss]] over pre-decoded VAL rows (a narrow filter of the
    * cached fit RDD — same partitions, same order). */
  private def valLossRdd(rows: org.apache.spark.rdd.RDD[Sample],
      w: W): Double = {
    val spark = SparkSession.active
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
    require(nVal > 0, "WideLstm2.valLoss: empty validation slice")
    g(ly.statsOff + 2) / nVal
  }

  /** Full-batch gated-BPTT GD on the wide path. Decodes the typed rows
    * once and runs every epoch against the cached RDD
    * ([[WideNet.withSamples]] — bit-identical, see its note). */
  def fit(df: DataFrame, xs: Seq[Column], label: Column, w0: W,
      epochs: Int, lr: Double, rowKey: Column = lit(0L),
      dropout: Double = 0.0): (W, Seq[Double]) =
    WideNet.withSamples(df, xs, label, rowKey, lit(false)) { rows =>
      var w = w0
      val losses = (1 to epochs).map { e =>
        val (gr, _) = gradientsValRdd(rows, w, e, dropout)
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
      dropout: Double = 0.0): (W, Seq[Double]) =
    WideNet.withSamples(df, xs, label, rowKey, lit(false)) { rows =>
      var w = w0
      val losses = (1 to epochs).map { e =>
        val (gr, _) = gradientsValRdd(rows, w, e, dropout)
        w = Lstm2Trainer.applyOpt(w, gr, opt)
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
        (Lstm2Trainer.step(w, gr, lr), gr.loss,
          vl.getOrElse(sys.error("fitEs: empty validation slice")))
      }
    }

  /** [[fitEs]] with pluggable optimizer + hash mini-batching
    * ([[TrainerCommon.batchedEpoch]]); sgd + nBatches=1 reproduces
    * [[fitEs]]. The full-batch form runs on the cached-RDD path; the
    * batched form keeps the per-batch DataFrame filters (membership is
    * an (keys, epoch) hash predicate — it changes every epoch, so there
    * is no single decoded frame to cache). */
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
          (Lstm2Trainer.applyOpt(w, gr, opt), gr.loss,
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
            (Lstm2Trainer.applyOpt(wc, gr, opt), gr.loss, vl)
        }
      }
}
