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

  /** Packed weights: nested Arrays for O(1) hot-loop indexing (the
    * public NetWeights Seqs are Lists — O(n) apply). */
  private final class Packed(w: NetWeights) extends Serializable {
    val cw: Array[Array[Array[Array[Double]]]] =
      w.convW.map(_.map(_.map(_.toArray).toArray).toArray).toArray
    val cb: Array[Array[Double]] = w.convB.map(_.toArray).toArray
    val dw: Array[Array[Double]] = w.denseW.map(_.toArray).toArray
    val db: Array[Double] = w.denseB.toArray
    val hw: Array[Array[Double]] = w.headW.map(_.toArray).toArray
    val hb: Array[Double] = w.headB.toArray
    val blocks: Int = cw.length
    val k: Int = cw(0)(0).length
    val fs: Array[Int] = cw.map(_.length)
    val dh: Int = dw.length
    val kc: Int = hw.length
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

  /** Accumulate one row's contribution into `g` (gradients for train
    * rows; loss tallies for both slices). The math is line-for-line
    * [[ConvNetTrainer.gradientsVal]]'s staged columns. */
  private def accumulate(s: Sample, p: Packed, ly: Layout, epoch: Int,
      dropout: Double, g: Array[Double]): Unit = {
    val B = p.blocks; val k = p.k; val fs = p.fs
    // ---- forward ----
    val a = new Array[Array[Double]](B)  // conv+relu, (p, f) row-major
    val m = new Array[Array[Double]](B)  // pooled, (j, f)
    var in: Array[Double] = s.x          // level input, (pos, ch)
    var b = 0
    while (b < B) {
      val fin = ly.fin(b); val pb = ly.ps(b); val lb = ly.ls(b)
      val ab = new Array[Double](pb * fs(b))
      var pos = 0
      while (pos < pb) {
        var f = 0
        while (f < fs(b)) {
          var acc = p.cb(b)(f)
          var j = 0
          while (j < k) {
            val wv = p.cw(b)(f)(j)
            var c = 0
            while (c < fin) { acc += in((pos + j) * fin + c) * wv(c); c += 1 }
            j += 1
          }
          ab(pos * fs(b) + f) = if (acc > 0) acc else 0.0
          f += 1
        }
        pos += 1
      }
      val mb = new Array[Double](lb * fs(b))
      var j2 = 0
      while (j2 < lb) {
        var f = 0
        while (f < fs(b)) {
          val x0 = ab(2 * j2 * fs(b) + f); val x1 = ab((2 * j2 + 1) * fs(b) + f)
          mb(j2 * fs(b) + f) = if (x0 >= x1) x0 else x1
          f += 1
        }
        j2 += 1
      }
      a(b) = ab; m(b) = mb; in = mb; b += 1
    }
    val flat = m(B - 1) // (j, f) row-major == flatten index j * fB + f
    // ---- dense -> dropout -> head ----
    val hpre = new Array[Double](p.dh)
    val hd = new Array[Double](p.dh)
    val mask = new Array[Double](p.dh)
    var u = 0
    while (u < p.dh) {
      var acc = p.db(u)
      val wu = p.dw(u)
      var i = 0
      while (i < ly.flat) { acc += flat(i) * wu(i); i += 1 }
      hpre(u) = acc
      mask(u) = dropMaskLocal(s.iv, s.rk, epoch, u, dropout)
      hd(u) = (if (acc > 0) acc else 0.0) * mask(u)
      u += 1
    }
    val z = new Array[Double](p.kc)
    var o = 0
    while (o < p.kc) {
      var acc = p.hb(o)
      val wo = p.hw(o)
      var u2 = 0
      while (u2 < p.dh) { acc += hd(u2) * wo(u2); u2 += 1 }
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
    val dzo = new Array[Double](p.kc)
    o = 0
    while (o < p.kc) {
      dzo(o) = math.exp(z(o) - mx) / denom - (if (s.y == o) 1.0 else 0.0)
      o += 1
    }
    // ---- backward ----
    val dpre = new Array[Double](p.dh)
    u = 0
    while (u < p.dh) {
      var acc = 0.0
      o = 0
      while (o < p.kc) { acc += dzo(o) * p.hw(o)(u); o += 1 }
      dpre(u) = acc * mask(u) * (if (hpre(u) > 0) 1.0 else 0.0)
      u += 1
    }
    val dm = new Array[Double](ly.flat) // dm at level B-1, (j, f)
    var i = 0
    while (i < ly.flat) {
      var acc = 0.0
      u = 0
      while (u < p.dh) { acc += dpre(u) * p.dw(u)(i); u += 1 }
      dm(i) = acc; i += 1
    }
    var dmCur = dm
    b = B - 1
    while (b >= 0) {
      val fin = ly.fin(b); val pb = ly.ps(b); val lb = ly.ls(b)
      val ab = a(b); val mb = m(b)
      val da = new Array[Double](pb * fs(b))
      var pos = 0
      while (pos < pb) {
        val j = pos / 2
        if (j < lb) {
          var f = 0
          while (f < fs(b)) {
            val target = mb(j * fs(b) + f)
            val av = ab(pos * fs(b) + f)
            // first-argmax routing: position pos routes iff it equals
            // the max and every earlier window position is strictly less
            val route =
              if (pos == 2 * j) av == target
              else ab(2 * j * fs(b) + f) < target && av == target
            if (route && av > 0)
              da(pos * fs(b) + f) = dmCur(j * fs(b) + f)
            f += 1
          }
        }
        pos += 1
      }
      // gradients of this block's kernel + bias
      val inArr: Array[Double] = if (b == 0) s.x else m(b - 1)
      var f = 0
      while (f < fs(b)) {
        var gb = 0.0
        var pos2 = 0
        while (pos2 < pb) { gb += da(pos2 * fs(b) + f); pos2 += 1 }
        g(ly.cbOff(b) + f) += gb
        var j = 0
        while (j < k) {
          var c = 0
          while (c < fin) {
            var gw = 0.0
            var pp = 0
            while (pp < pb) {
              gw += da(pp * fs(b) + f) * inArr((pp + j) * fin + c)
              pp += 1
            }
            g(ly.cwOff(b) + ((f * k) + j) * fin + c) += gw
            c += 1
          }
          j += 1
        }
        f += 1
      }
      if (b > 0) {
        val lprev = ly.ls(b - 1); val fprev = fs(b - 1)
        val dmPrev = new Array[Double](lprev * fprev)
        var jp = 0
        while (jp < lprev) {
          var c = 0
          while (c < fprev) {
            var acc = 0.0
            var pp = math.max(0, jp - k + 1)
            val pMax = math.min(pb - 1, jp)
            while (pp <= pMax) {
              var f2 = 0
              while (f2 < fs(b)) {
                acc += da(pp * fs(b) + f2) * p.cw(b)(f2)(jp - pp)(c)
                f2 += 1
              }
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
          var i2 = 0
          while (i2 < ly.flat) {
            g(ly.dwOff + u * ly.flat + i2) += dpre(u) * flat(i2)
            i2 += 1
          }
          u += 1
        }
        o = 0
        while (o < p.kc) {
          g(ly.hbOff + o) += dzo(o)
          var u2 = 0
          while (u2 < p.dh) {
            g(ly.hwOff + o * p.dh + u2) += dzo(o) * hd(u2)
            u2 += 1
          }
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
      isVal: Column): (NetGrads, Option[Double]) = {
    require(dropout >= 0.0 && dropout < 1.0, "dropout in [0, 1)")
    val spark = df.sparkSession
    import spark.implicits._
    val T = xs.length
    val packed = new Packed(w)
    val ly = new Layout(packed, T)
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
      rowKey: Column, w: NetWeights, isVal: Column): Double = {
    val spark = df.sparkSession
    import spark.implicits._
    val packed = new Packed(w)
    val ly = new Layout(packed, xs.length)
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

  /** Full-batch GD on the wide path ([[ConvNetTrainer.fit]] contract). */
  def fit(df: DataFrame, xs: Seq[Column], label: Column, w0: NetWeights,
      epochs: Int, lr: Double, rowKey: Column = lit(0L),
      dropout: Double = 0.0): (NetWeights, Seq[Double]) = {
    var w = w0
    val losses = (1 to epochs).map { e =>
      val (gr, _) = gradientsVal(df, xs, label, rowKey, w, e, dropout,
        lit(false))
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
    TrainerCommon.earlyStop(w0, maxEpochs, patience,
        evalPass = Some(wc => valLoss(df, xs, label, rowKey, wc, isVal))) {
      (w, e) =>
      val (gr, vl) = gradientsVal(df, xs, label, rowKey, w, e, dropout,
        isVal)
      (ConvNetTrainer.step(w, gr, lr), gr.loss,
        vl.getOrElse(sys.error("fitEs: empty validation slice")))
    }

  /** [[fitEs]] with the reference's actual `compile/fit` semantics on
    * the stacked net: pluggable optimizer
    * (`TrainerCommon.Optimizer.adam(0.001)` = `cnn_model.py:34`) and
    * deterministic hash mini-batching, weights updated after each
    * batch ([[TrainerCommon.batchedEpoch]]). nBatches = 1 + sgd(lr)
    * reproduces [[fitEs]] bit-for-bit (AdamSpec pins it). */
  def fitEsOpt(df: DataFrame, xs: Seq[Column], label: Column,
      w0: NetWeights, maxEpochs: Int, opt: TrainerCommon.Optimizer,
      rowKey: Column, dropout: Double, isVal: Column,
      patience: Int = 5, batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): TrainerCommon.EsResult[NetWeights] =
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
