package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Reference-WIDTH execution path for [[ConvNetTrainer]]: identical
  * math, different physical representation.
  *
  * The staged-expression trainers unroll every (position, filter) cell
  * into its own Catalyst column — ideal at fixture widths (whole-stage
  * codegen, zero serialization, the oracle can watch every tensor), but
  * plan size grows as O(width^2) expression nodes, and at the
  * reference's real widths (`models/cnn_model.py:21-32`: 32/64/128
  * filters + Dense(128)) a single epoch's plan has tens of millions of
  * nodes — the wrong tool. At those widths the industry Spark shape is
  * the one MLlib's own GD/L-BFGS uses: per-partition IMPERATIVE gradient
  * accumulation over typed rows, merged with `treeAggregate`, weights
  * broadcast once per epoch. Work per row is the same flops the staged
  * plan would do; the cluster contract is the same (one O(params)
  * reduction per epoch, full-batch semantics); only the per-row
  * evaluator changes from generated code over columns to a hand-written
  * loop over arrays.
  *
  * EQUIVALENCE CONTRACT: every number this object produces — per-tensor
  * mean gradients, train loss, validation loss, the deterministic
  * dropout mask, the early-stop trajectory — matches
  * [[ConvNetTrainer.gradientsVal]] at any width where the staged plan is
  * tractable. WideNetSpec pins gradient-for-gradient agreement (with and
  * without dropout, with a validation slice) at the spec widths; the
  * reference-width run then exercises THIS path, so "width is only a
  * constructor argument" is demonstrated, not asserted.
  *
  * The dropout mask replays [[TrainerCommon.dropMask]] bit-for-bit:
  * Spark's `xxhash64(rk, epoch, u)` is XXH64 seeded 42 folded over the
  * children (longs and ints hash via hashLong/hashInt), and the keep
  * threshold uses the same rounded `1000 p` cutoff — so a row keeps the
  * same units under either execution path.
  */
object WideNet {
  import ConvNetTrainer.{NetWeights, NetGrads}

  /** Typed row: feature vector, int label, dropout row key, val flag. */
  final case class Sample(x: Array[Double], y: Int, rk: Long, iv: Boolean)

  /** The families' shared typed-row projection as an RDD — one place so
    * the (x, y, rk, iv) column contract cannot drift per family. */
  private[ml] def sampleRdd(df: DataFrame, xs: Seq[Column], label: Column,
      rowKey: Column, isVal: Column)
      : org.apache.spark.rdd.RDD[Sample] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      array(xs.map(_.cast("double")): _*).as("x"),
      label.cast("int").as("y"), rowKey.cast("long").as("rk"),
      isVal.cast("boolean").as("iv")).as[Sample].rdd
  }

  /** Decode the typed rows ONCE and cache them for a fit's epoch loop.
    * Each epoch of the historical path re-ran the projection through a
    * fresh DataFrame — re-planning, re-codegen and re-decoding the same
    * rows every pass (measured ~0.35-0.5 s/pass at sf0.1 vs ~0.1 s for
    * a treeAggregate over the cached RDD; the arithmetic inside the
    * pass is identical). Caching the INPUT of a single fit is the same
    * contract as the entries' existing `facts.persist()` — released
    * before the query returns, nothing survives across runs. The RDD
    * inherits the projection's partitioning and per-partition row
    * order, so per-partition gradient sums are bit-identical to the
    * per-epoch-DataFrame path. */
  private[ml] def withSamples[R](df: DataFrame, xs: Seq[Column],
      label: Column, rowKey: Column, isVal: Column)(
      body: org.apache.spark.rdd.RDD[Sample] => R): R = {
    val rdd = sampleRdd(df, xs, label, rowKey, isVal)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try body(rdd) finally { rdd.unpersist(blocking = false); () }
  }

  /** Packed weights: FLAT per-block arrays (plus transposed copies for
    * the backward pass's column access) — the 4-level nested-Array form
    * cost the hot conv loop three dependent pointer loads per element.
    * Same doubles, same arithmetic; layout only. A block's kernel row
    * for filter f, `cw(b)((f*k+j)*fin+c)`, is CONTIGUOUS over (j, c) —
    * exactly the order the conv window reads its input — so the conv
    * becomes a straight dot product of two contiguous segments. */
  private final class Packed(w: NetWeights) extends Serializable {
    val blocks: Int = w.convW.length
    val k: Int = w.convW(0)(0).length
    val fs: Array[Int] = w.convW.map(_.length).toArray
    val fin: Array[Int] =
      Array.tabulate(blocks)(b => w.convW(b)(0)(0).length)
    // cw(b)((f*k+j)*fin+c); cwT(b)((j*fin+c)*fs+f) = cw(b)(f)(j)(c)
    val cw: Array[Array[Double]] =
      w.convW.map(_.flatten.flatten.toArray).toArray
    val cwT: Array[Array[Double]] = Array.tabulate(blocks) { b =>
      val a = new Array[Double](fs(b) * k * fin(b))
      var f = 0
      while (f < fs(b)) {
        var j = 0
        while (j < k) {
          var c = 0
          while (c < fin(b)) {
            a((j * fin(b) + c) * fs(b) + f) =
              cw(b)((f * k + j) * fin(b) + c)
            c += 1
          }
          j += 1
        }
        f += 1
      }
      a
    }
    val cb: Array[Array[Double]] = w.convB.map(_.toArray).toArray
    val dh: Int = w.denseW.length
    val flat: Int = w.denseW(0).length
    val dw: Array[Double] = w.denseW.flatten.toArray   // (u)*flat+i
    val dwT: Array[Double] = {                          // (i)*dh+u
      val a = new Array[Double](dh * flat)
      var u = 0
      while (u < dh) {
        var i = 0
        while (i < flat) { a(i * dh + u) = dw(u * flat + i); i += 1 }
        u += 1
      }
      a
    }
    val db: Array[Double] = w.denseB.toArray
    val kc: Int = w.headW.length
    val hw: Array[Double] = w.headW.flatten.toArray    // (o)*dh+u
    val hwT: Array[Double] = {                          // (u)*kc+o
      val a = new Array[Double](kc * dh)
      var o = 0
      while (o < kc) {
        var u = 0
        while (u < dh) { a(u * kc + o) = hw(o * dh + u); u += 1 }
        o += 1
      }
      a
    }
    val hb: Array[Double] = w.headB.toArray
  }

  /** [[TrainerCommon.dropMask]] replayed on the driver/executor side:
    * same XXH64 fold (seed 42, rk as long, epoch and u as ints), same
    * pmod-1000 keep test, same 1/(1-p) inverted scaling, same
    * validation-rows-keep-all inference semantics. */
  private[ml] def dropMaskLocal(iv: Boolean, rk: Long, epoch: Int,
      u: Int, p: Double): Double =
    if (p <= 0.0) 1.0
    else if (iv) 1.0
    else {
      val h = XXH64.hashInt(u, XXH64.hashInt(epoch, XXH64.hashLong(rk, 42L)))
      val m = ((h % 1000L) + 1000L) % 1000L
      if (m >= math.round(1000 * p)) 1.0 / (1.0 - p) else 0.0
    }

  private def levelSizes(T: Int, k: Int, blocks: Int): (Array[Int], Array[Int]) = {
    var len = T
    val ps = new Array[Int](blocks)
    val ls = new Array[Int](blocks)
    var b = 0
    while (b < blocks) {
      val p = len - k + 1
      require(p >= 1, s"sequence too short for $blocks blocks of kernel $k")
      val l = p / 2
      require(l >= 1, s"pooling empties the sequence ($blocks blocks, k=$k)")
      ps(b) = p; ls(b) = l; len = l; b += 1
    }
    (ps, ls)
  }

  /** Gradient buffer layout: conv weights (b,f,j,c), conv biases (b,f),
    * dense (u,i), dense bias (u), head (o,u), head bias (o), then
    * [train loss sum, train count, val loss sum, val count]. */
  private final class Layout(p: Packed, T: Int) extends Serializable {
    val (ps, ls) = levelSizes(T, p.k, p.blocks)
    val fin: Array[Int] =
      Array.tabulate(p.blocks)(b => if (b == 0) 1 else p.fs(b - 1))
    val flat: Int = ls(p.blocks - 1) * p.fs(p.blocks - 1)
    val cwOff: Array[Int] = {
      val o = new Array[Int](p.blocks)
      var acc = 0
      for (b <- 0 until p.blocks) { o(b) = acc; acc += p.fs(b) * p.k * fin(b) }
      o
    }
    val cwSize: Int = cwOff(p.blocks - 1) +
      p.fs(p.blocks - 1) * p.k * fin(p.blocks - 1)
    val cbOff: Array[Int] = {
      val o = new Array[Int](p.blocks)
      var acc = cwSize
      for (b <- 0 until p.blocks) { o(b) = acc; acc += p.fs(b) }
      o
    }
    val dwOff: Int = cbOff(p.blocks - 1) + p.fs(p.blocks - 1)
    val dbOff: Int = dwOff + p.dh * flat
    val hwOff: Int = dbOff + p.dh
    val hbOff: Int = hwOff + p.kc * p.dh
    val statsOff: Int = hbOff + p.kc
    val size: Int = statsOff + 4
  }

  /** Per-thread reusable scratch for [[accumulate]] (the WideLstm2
    * pattern): activation/gradient work arrays otherwise allocated and
    * zeroed per row. Reuse-safe: every array is either fully written
    * before any read (a/m/dm/dmp/inT and the dense/head vectors) or
    * explicitly re-zeroed per use (`da` — the argmax routing writes
    * sparsely). */
  private final class Scratch(val T: Int, p: Packed, ly: Layout) {
    val fsKey: Array[Int] = p.fs.clone()
    val dhKey: Int = p.dh; val kcKey: Int = p.kc; val kKey: Int = p.k
    val a: Array[Array[Double]] =
      Array.tabulate(p.blocks)(b => new Array[Double](ly.ps(b) * p.fs(b)))
    val m: Array[Array[Double]] =
      Array.tabulate(p.blocks)(b => new Array[Double](ly.ls(b) * p.fs(b)))
    val da: Array[Array[Double]] =
      Array.tabulate(p.blocks)(b => new Array[Double](ly.ps(b) * p.fs(b)))
    // dmp(b): upstream gradient for block b's input (b >= 1)
    val dmp: Array[Array[Double]] = Array.tabulate(p.blocks)(b =>
      if (b == 0) null
      else new Array[Double](ly.ls(b - 1) * p.fs(b - 1)))
    // inT(b): block b's input transposed to (channel, position)
    val inT: Array[Array[Double]] = Array.tabulate(p.blocks) { b =>
      val len = if (b == 0) T else ly.ls(b - 1)
      new Array[Double](ly.fin(b) * len)
    }
    val daf = new Array[Double](if (ly.ps.isEmpty) 0 else ly.ps.max)
    val hpre = new Array[Double](p.dh); val hd = new Array[Double](p.dh)
    val mask = new Array[Double](p.dh); val dpre = new Array[Double](p.dh)
    val z = new Array[Double](p.kc); val dzo = new Array[Double](p.kc)
    val dm = new Array[Double](ly.flat)
  }
  private val scratchTL = new ThreadLocal[Scratch]
  private def scratchFor(T: Int, p: Packed, ly: Layout): Scratch = {
    val c = scratchTL.get()
    if (c != null && c.T == T && c.dhKey == p.dh && c.kcKey == p.kc &&
      c.kKey == p.k && java.util.Arrays.equals(c.fsKey, p.fs)) c
    else {
      val n = new Scratch(T, p, ly)
      scratchTL.set(n); n
    }
  }

  /** Accumulate one row's contribution into `g` (gradients for train
    * rows; loss tallies for both slices). The math is line-for-line
    * [[ConvNetTrainer.gradientsVal]]'s staged columns; every
    * accumulator's add order is the historical one (flat/transposed
    * layouts and lane unrolls change where doubles live and how many
    * independent chains run, never the sequence of additions into any
    * single sum), so the output is bit-identical. */
  private def accumulate(s: Sample, p: Packed, ly: Layout, epoch: Int,
      dropout: Double, g: Array[Double]): Unit = {
    val B = p.blocks; val k = p.k; val fs = p.fs
    val sc = scratchFor(s.x.length, p, ly)
    // ---- forward ----
    val a = sc.a                         // conv+relu, (p, f) row-major
    val m = sc.m                         // pooled, (j, f)
    var in: Array[Double] = s.x          // level input, (pos, ch)
    var b = 0
    while (b < B) {
      val fin = ly.fin(b); val pb = ly.ps(b); val lb = ly.ls(b)
      val fb = fs(b)
      val ab = a(b)
      val cwb = p.cw(b); val cbb = p.cb(b)
      // the (j, c) kernel window reads in((pos+j)*fin+c) — CONTIGUOUS
      // over the flat index j*fin+c starting at pos*fin, matching the
      // flat kernel row, so the conv is one straight dot product; four
      // filters run per pass sharing the window reads
      val klen = k * fin
      var pos = 0
      while (pos < pb) {
        val base = pos * fin
        val ob = pos * fb
        var f = 0
        while (f + 3 < fb) {
          var a0 = cbb(f); var a1 = cbb(f + 1)
          var a2 = cbb(f + 2); var a3 = cbb(f + 3)
          val w0 = f * klen; val w1 = (f + 1) * klen
          val w2 = (f + 2) * klen; val w3 = (f + 3) * klen
          var idx = 0
          while (idx < klen) {
            val iv = in(base + idx)
            a0 += iv * cwb(w0 + idx); a1 += iv * cwb(w1 + idx)
            a2 += iv * cwb(w2 + idx); a3 += iv * cwb(w3 + idx)
            idx += 1
          }
          ab(ob + f) = if (a0 > 0) a0 else 0.0
          ab(ob + f + 1) = if (a1 > 0) a1 else 0.0
          ab(ob + f + 2) = if (a2 > 0) a2 else 0.0
          ab(ob + f + 3) = if (a3 > 0) a3 else 0.0
          f += 4
        }
        while (f < fb) {
          var acc = cbb(f)
          val wb = f * klen
          var idx = 0
          while (idx < klen) { acc += in(base + idx) * cwb(wb + idx); idx += 1 }
          ab(ob + f) = if (acc > 0) acc else 0.0
          f += 1
        }
        pos += 1
      }
      val mb = m(b)
      var j2 = 0
      while (j2 < lb) {
        var f = 0
        while (f < fb) {
          val x0 = ab(2 * j2 * fb + f); val x1 = ab((2 * j2 + 1) * fb + f)
          mb(j2 * fb + f) = if (x0 >= x1) x0 else x1
          f += 1
        }
        j2 += 1
      }
      in = mb; b += 1
    }
    val flat = m(B - 1) // (j, f) row-major == flatten index j * fB + f
    // ---- dense -> dropout -> head ----
    val hpre = sc.hpre
    val hd = sc.hd
    val mask = sc.mask
    val flatN = ly.flat
    var u = 0
    while (u + 3 < p.dh) {
      var a0 = p.db(u); var a1 = p.db(u + 1)
      var a2 = p.db(u + 2); var a3 = p.db(u + 3)
      val w0 = u * flatN; val w1 = (u + 1) * flatN
      val w2 = (u + 2) * flatN; val w3 = (u + 3) * flatN
      var i = 0
      while (i < flatN) {
        val fv = flat(i)
        a0 += fv * p.dw(w0 + i); a1 += fv * p.dw(w1 + i)
        a2 += fv * p.dw(w2 + i); a3 += fv * p.dw(w3 + i)
        i += 1
      }
      hpre(u) = a0; hpre(u + 1) = a1; hpre(u + 2) = a2; hpre(u + 3) = a3
      var l = 0
      while (l < 4) {
        mask(u + l) = dropMaskLocal(s.iv, s.rk, epoch, u + l, dropout)
        hd(u + l) = (if (hpre(u + l) > 0) hpre(u + l) else 0.0) * mask(u + l)
        l += 1
      }
      u += 4
    }
    while (u < p.dh) {
      var acc = p.db(u)
      val wb = u * flatN
      var i = 0
      while (i < flatN) { acc += flat(i) * p.dw(wb + i); i += 1 }
      hpre(u) = acc
      mask(u) = dropMaskLocal(s.iv, s.rk, epoch, u, dropout)
      hd(u) = (if (acc > 0) acc else 0.0) * mask(u)
      u += 1
    }
    val z = sc.z
    var o = 0
    while (o < p.kc) {
      var acc = p.hb(o)
      val wb = o * p.dh
      var u2 = 0
      while (u2 < p.dh) { acc += hd(u2) * p.hw(wb + u2); u2 += 1 }
      z(o) = acc; o += 1
    }
    // max-shifted softmax CE (TrainerCommon.softmaxHead algebra)
    var mx = z(0); o = 1
    while (o < p.kc) { if (z(o) > mx) mx = z(o); o += 1 }
    var denom = 0.0; o = 0
    while (o < p.kc) { denom += math.exp(z(o) - mx); o += 1 }
    val loss = math.log(denom) + mx - z(s.y)
    if (s.iv) {
      g(ly.statsOff + 2) += loss; g(ly.statsOff + 3) += 1.0
      return // val rows contribute loss only, never gradients
    }
    g(ly.statsOff) += loss; g(ly.statsOff + 1) += 1.0
    val dzo = sc.dzo
    o = 0
    while (o < p.kc) {
      dzo(o) = math.exp(z(o) - mx) / denom - (if (s.y == o) 1.0 else 0.0)
      o += 1
    }
    // ---- backward ----
    val dpre = sc.dpre
    u = 0
    while (u < p.dh) {
      var acc = 0.0
      val wb = u * p.kc
      o = 0
      while (o < p.kc) { acc += dzo(o) * p.hwT(wb + o); o += 1 }
      dpre(u) = acc * mask(u) * (if (hpre(u) > 0) 1.0 else 0.0)
      u += 1
    }
    val dm = sc.dm // dm at level B-1, (j, f)
    var i = 0
    while (i + 3 < flatN) {
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
      val w0 = i * p.dh; val w1 = (i + 1) * p.dh
      val w2 = (i + 2) * p.dh; val w3 = (i + 3) * p.dh
      u = 0
      while (u < p.dh) {
        val dv = dpre(u)
        s0 += dv * p.dwT(w0 + u); s1 += dv * p.dwT(w1 + u)
        s2 += dv * p.dwT(w2 + u); s3 += dv * p.dwT(w3 + u)
        u += 1
      }
      dm(i) = s0; dm(i + 1) = s1; dm(i + 2) = s2; dm(i + 3) = s3
      i += 4
    }
    while (i < flatN) {
      var acc = 0.0
      val wb = i * p.dh
      u = 0
      while (u < p.dh) { acc += dpre(u) * p.dwT(wb + u); u += 1 }
      dm(i) = acc; i += 1
    }
    var dmCur = dm
    b = B - 1
    while (b >= 0) {
      val fin = ly.fin(b); val pb = ly.ps(b); val lb = ly.ls(b)
      val fb = fs(b)
      val ab = a(b); val mb = m(b)
      val da = sc.da(b)
      java.util.Arrays.fill(da, 0, pb * fb, 0.0)
      var pos = 0
      while (pos < pb) {
        val j = pos / 2
        if (j < lb) {
          var f = 0
          while (f < fb) {
            val target = mb(j * fb + f)
            val av = ab(pos * fb + f)
            // first-argmax routing: position pos routes iff it equals
            // the max and every earlier window position is strictly less
            val route =
              if (pos == 2 * j) av == target
              else ab(2 * j * fb + f) < target && av == target
            if (route && av > 0)
              da(pos * fb + f) = dmCur(j * fb + f)
            f += 1
          }
        }
        pos += 1
      }
      // gradients of this block's kernel + bias. The input transposes
      // to (channel, position) once per block so the position-sum inner
      // loops stream contiguously; da's column for filter f hoists into
      // a local once instead of re-striding per (j, c) cell.
      val inArr: Array[Double] = if (b == 0) s.x else m(b - 1)
      val inLen = if (b == 0) s.x.length / ly.fin(0) else ly.ls(b - 1)
      val inT = sc.inT(b)
      var cc = 0
      while (cc < fin) {
        var pos2 = 0
        while (pos2 < inLen) {
          inT(cc * inLen + pos2) = inArr(pos2 * fin + cc); pos2 += 1
        }
        cc += 1
      }
      val daf = sc.daf
      var f = 0
      while (f < fb) {
        var pp0 = 0
        while (pp0 < pb) { daf(pp0) = da(pp0 * fb + f); pp0 += 1 }
        var gb = 0.0
        var pos2 = 0
        while (pos2 < pb) { gb += daf(pos2); pos2 += 1 }
        g(ly.cbOff(b) + f) += gb
        val gwb = ly.cwOff(b) + f * k * fin
        var j = 0
        while (j < k) {
          var c = 0
          while (c + 3 < fin) {
            var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
            val i0 = c * inLen + j; val i1 = (c + 1) * inLen + j
            val i2 = (c + 2) * inLen + j; val i3 = (c + 3) * inLen + j
            var pp = 0
            while (pp < pb) {
              val dv = daf(pp)
              s0 += dv * inT(i0 + pp); s1 += dv * inT(i1 + pp)
              s2 += dv * inT(i2 + pp); s3 += dv * inT(i3 + pp)
              pp += 1
            }
            g(gwb + j * fin + c) += s0; g(gwb + j * fin + c + 1) += s1
            g(gwb + j * fin + c + 2) += s2; g(gwb + j * fin + c + 3) += s3
            c += 4
          }
          while (c < fin) {
            var gw = 0.0
            val ib = c * inLen + j
            var pp = 0
            while (pp < pb) { gw += daf(pp) * inT(ib + pp); pp += 1 }
            g(gwb + j * fin + c) += gw
            c += 1
          }
          j += 1
        }
        f += 1
      }
      if (b > 0) {
        val lprev = ly.ls(b - 1); val fprev = fs(b - 1)
        val dmPrev = sc.dmp(b)
        val cwTb = p.cwT(b)
        var jp = 0
        while (jp < lprev) {
          val ppLo = math.max(0, jp - k + 1)
          val pMax = math.min(pb - 1, jp)
          var c = 0
          while (c + 3 < fprev) {
            var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
            var pp = ppLo
            while (pp <= pMax) {
              val dab = pp * fb
              val jr = jp - pp
              val w0 = (jr * fin + c) * fb; val w1 = (jr * fin + c + 1) * fb
              val w2 = (jr * fin + c + 2) * fb; val w3 = (jr * fin + c + 3) * fb
              var f2 = 0
              while (f2 < fb) {
                val dv = da(dab + f2)
                s0 += dv * cwTb(w0 + f2); s1 += dv * cwTb(w1 + f2)
                s2 += dv * cwTb(w2 + f2); s3 += dv * cwTb(w3 + f2)
                f2 += 1
              }
              pp += 1
            }
            dmPrev(jp * fprev + c) = s0; dmPrev(jp * fprev + c + 1) = s1
            dmPrev(jp * fprev + c + 2) = s2; dmPrev(jp * fprev + c + 3) = s3
            c += 4
          }
          while (c < fprev) {
            var acc = 0.0
            var pp = ppLo
            while (pp <= pMax) {
              val dab = pp * fb
              val wb = ((jp - pp) * fin + c) * fb
              var f2 = 0
              while (f2 < fb) { acc += da(dab + f2) * cwTb(wb + f2); f2 += 1 }
              pp += 1
            }
            dmPrev(jp * fprev + c) = acc
            c += 1
          }
          jp += 1
        }
        dmCur = dmPrev
      }
      // dense-layer gradients once (they consume flat + dpre)
      if (b == B - 1) {
        u = 0
        while (u < p.dh) {
          g(ly.dbOff + u) += dpre(u)
          val gwb = ly.dwOff + u * flatN
          val dv = dpre(u)
          var i2 = 0
          while (i2 < flatN) { g(gwb + i2) += dv * flat(i2); i2 += 1 }
          u += 1
        }
        o = 0
        while (o < p.kc) {
          g(ly.hbOff + o) += dzo(o)
          val gwb = ly.hwOff + o * p.dh
          val dv = dzo(o)
          var u2 = 0
          while (u2 < p.dh) { g(gwb + u2) += dv * hd(u2); u2 += 1 }
          o += 1
        }
      }
      b -= 1
    }
  }

  /** One full-batch pass: mean TRAIN gradients + mean train loss + mean
    * val loss (None if the isVal slice is empty) — the
    * [[ConvNetTrainer.gradientsVal]] contract on the treeAggregate path.
    * One Spark job; weights broadcast once; O(params) reduction. */
  def gradientsVal(df: DataFrame, xs: Seq[Column], label: Column,
      rowKey: Column, w: NetWeights, epoch: Int, dropout: Double,
      isVal: Column): (NetGrads, Option[Double]) =
    gradientsValRdd(sampleRdd(df, xs, label, rowKey, isVal), xs.length,
      w, epoch, dropout)

  /** [[gradientsVal]] over pre-decoded typed rows — the fit loops call
    * this against ONE cached RDD instead of re-planning/re-decoding a
    * fresh DataFrame per epoch ([[withSamples]]). */
  private def gradientsValRdd(rows: org.apache.spark.rdd.RDD[Sample],
      T: Int, w: NetWeights, epoch: Int,
      dropout: Double): (NetGrads, Option[Double]) = {
    require(dropout >= 0.0 && dropout < 1.0, "dropout in [0, 1)")
    val spark = org.apache.spark.sql.SparkSession.active
    val packed = new Packed(w)
    val ly = new Layout(packed, T)
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = rows.treeAggregate(new Array[Double](ly.size))(
      seqOp = (buf, s) => {
        val (p, l) = bc.value
        accumulate(s, p, l, epoch, dropout, buf); buf
      },
      combOp = (x, y2) => {
        var i = 0
        while (i < x.length) { x(i) += y2(i); i += 1 }
        x
      })
    bc.destroy()
    val nTrain = g(ly.statsOff + 1)
    require(nTrain > 0, "WideNet.gradients: empty training input")
    val nVal = g(ly.statsOff + 3)
    val fs = packed.fs; val k = packed.k
    def cwAt(b: Int, f: Int, j: Int, c: Int) =
      g(ly.cwOff(b) + ((f * k) + j) * ly.fin(b) + c) / nTrain
    (NetGrads(
      (0 until packed.blocks).map(b => Seq.tabulate(fs(b), k, ly.fin(b))(
        (f, j, c) => cwAt(b, f, j, c))),
      (0 until packed.blocks).map(b =>
        Seq.tabulate(fs(b))(f => g(ly.cbOff(b) + f) / nTrain)),
      Seq.tabulate(packed.dh, ly.flat)((u, i) =>
        g(ly.dwOff + u * ly.flat + i) / nTrain),
      Seq.tabulate(packed.dh)(u => g(ly.dbOff + u) / nTrain),
      Seq.tabulate(packed.kc, packed.dh)((o, u) =>
        g(ly.hwOff + o * packed.dh + u) / nTrain),
      Seq.tabulate(packed.kc)(o => g(ly.hbOff + o) / nTrain),
      g(ly.statsOff) / nTrain),
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
      rowKey: Column, w: NetWeights, isVal: Column): Double =
    valLossRdd(sampleRdd(df.filter(isVal), xs, label, rowKey, lit(true)),
      xs.length, w)

  /** [[valLoss]] over pre-decoded VAL rows (a narrow filter of the
    * cached fit RDD — same partitions, same order). */
  private def valLossRdd(rows: org.apache.spark.rdd.RDD[Sample], T: Int,
      w: NetWeights): Double = {
    val spark = org.apache.spark.sql.SparkSession.active
    val packed = new Packed(w)
    val ly = new Layout(packed, T)
    val bc = spark.sparkContext.broadcast((packed, ly))
    val g = rows.treeAggregate(new Array[Double](ly.size))(
      seqOp = (buf, s) => {
        val (p, l) = bc.value
        accumulate(s, p, l, epoch = 0, dropout = 0.0, buf); buf
      },
      combOp = (x, y2) => {
        var i = 0
        while (i < x.length) { x(i) += y2(i); i += 1 }
        x
      })
    bc.destroy()
    val nVal = g(ly.statsOff + 3)
    require(nVal > 0, "WideNet.valLoss: empty validation slice")
    g(ly.statsOff + 2) / nVal
  }

  /** Full-batch GD on the wide path ([[ConvNetTrainer.fit]] contract).
    * Decodes the typed rows once and runs every epoch against the
    * cached RDD ([[withSamples]] — bit-identical, see its note). */
  def fit(df: DataFrame, xs: Seq[Column], label: Column, w0: NetWeights,
      epochs: Int, lr: Double, rowKey: Column = lit(0L),
      dropout: Double = 0.0): (NetWeights, Seq[Double]) =
    withSamples(df, xs, label, rowKey, lit(false)) { rows =>
      var w = w0
      val losses = (1 to epochs).map { e =>
        val (gr, _) = gradientsValRdd(rows, xs.length, w, e, dropout)
        w = ConvNetTrainer.step(w, gr, lr)
        gr.loss
      }
      (w, losses)
    }

  /** [[fit]] under Keras EarlyStopping ([[TrainerCommon.earlyStop]]). */
  def fitEs(df: DataFrame, xs: Seq[Column], label: Column,
      w0: NetWeights, maxEpochs: Int, lr: Double, rowKey: Column,
      dropout: Double, isVal: Column,
      patience: Int = 5): TrainerCommon.EsResult[NetWeights] =
    withSamples(df, xs, label, rowKey, isVal) { rows =>
      val valRows = rows.filter(_.iv)
      TrainerCommon.earlyStop(w0, maxEpochs, patience,
          evalPass = Some(wc => valLossRdd(valRows, xs.length, wc))) {
        (w, e) =>
        val (gr, vl) = gradientsValRdd(rows, xs.length, w, e, dropout)
        (ConvNetTrainer.step(w, gr, lr), gr.loss,
          vl.getOrElse(sys.error("fitEs: empty validation slice")))
      }
    }

  /** [[fitEs]] with the reference's actual `compile/fit` semantics on
    * the stacked net: pluggable optimizer
    * (`TrainerCommon.Optimizer.adam(0.001)` = `cnn_model.py:34`) and
    * deterministic hash mini-batching, weights updated after each
    * batch ([[TrainerCommon.batchedEpoch]]). nBatches = 1 + sgd(lr)
    * reproduces [[fitEs]] bit-for-bit (AdamSpec pins it). Full-batch
    * runs on the cached-RDD path; the batched form keeps per-batch
    * DataFrame filters (membership is a (keys, epoch) hash — it
    * changes every epoch). */
  def fitEsOpt(df: DataFrame, xs: Seq[Column], label: Column,
      w0: NetWeights, maxEpochs: Int, opt: TrainerCommon.Optimizer,
      rowKey: Column, dropout: Double, isVal: Column,
      patience: Int = 5, batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): TrainerCommon.EsResult[NetWeights] =
    if (nBatches == 1)
      withSamples(df, xs, label, rowKey, isVal) { rows =>
        val valRows = rows.filter(_.iv)
        TrainerCommon.earlyStop(w0, maxEpochs, patience,
            evalPass = Some(wc => valLossRdd(valRows, xs.length, wc))) {
          (w, e) =>
          val (gr, vl) = gradientsValRdd(rows, xs.length, w, e, dropout)
          (ConvNetTrainer.applyOpt(w, gr, opt), gr.loss,
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
            (ConvNetTrainer.applyOpt(wc, gr, opt), gr.loss, vl)
        }
      }
}
