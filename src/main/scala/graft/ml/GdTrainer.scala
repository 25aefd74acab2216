package graft.ml

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Engine-native full-batch gradient-descent trainer for a 1-hidden-layer
  * MLP with DETERMINISTIC DROPOUT — the regularizer the reference's Keras
  * models use (`models/mlp_model.py:19-26`, Dropout 0.3/0.5) that MLlib's
  * `MultilayerPerceptronClassifier` cannot express (SURVEY §2.6 M1).
  *
  * Architecture: x (d) -> dense(h, relu) -> dropout(p) -> dense(k) ->
  * softmax, trained with cross-entropy on full-batch GD.
  *
  * Distribution model (the part that matters at 100 TB): per-row forward
  * + backward passes are pure Catalyst expression columns (weights are
  * plan literals — the broadcast-small-model pattern), and one epoch is
  * ONE aggregation averaging every per-row gradient — partial sums
  * map-side, a single O(params) row to the driver, O(params) update
  * there. No per-row UDFs, no parameter shuffling, no driver-side data.
  *
  * Dropout without rand(): Keras drops units by drawing train-time
  * Bernoulli noise; a distributed re-runnable trainer can't depend on
  * nondeterministic per-task RNG state (retries/speculative tasks would
  * see different masks). The mask here is a HASH of (row key, epoch,
  * unit): `xxhash64(rk, epoch, u) % 1000 >= 1000p`, with the kept
  * activations scaled by 1/(1-p) (inverted dropout, Keras parity). Same
  * row + epoch + unit -> same mask on any executor, any retry, any
  * cluster size — training is bit-reproducible while still resampling
  * masks every epoch.
  */
object GdTrainer {

  /** w1: h x d, b1: h, w2: k x h, b2: k. */
  final case class MlpWeights(w1: Seq[Seq[Double]], b1: Seq[Double],
      w2: Seq[Seq[Double]], b2: Seq[Double]) {
    def hidden: Int = w1.length
    def classes: Int = w2.length
    require(b1.length == hidden && b2.length == classes &&
      w2.forall(_.length == hidden), "inconsistent shapes")
  }

  /** Deterministic small init in [-0.5, 0.5) from `seed` (driver-side;
    * any fixed scheme works — GD breaks symmetry via distinct values). */
  def init(d: Int, hidden: Int, classes: Int, seed: Long): MlpWeights = {
    val rng = new scala.util.Random(seed)
    def m(r: Int, c: Int) = Seq.fill(r, c)(rng.nextDouble() - 0.5)
    def v(n: Int) = Seq.fill(n)(rng.nextDouble() - 0.5)
    MlpWeights(m(hidden, d), v(hidden), m(classes, hidden), v(classes))
  }

  final case class MlpGrads(w1: Seq[Seq[Double]], b1: Seq[Double],
      w2: Seq[Seq[Double]], b2: Seq[Double], loss: Double)

  /** One full-batch pass at `w`: mean cross-entropy loss and mean
    * gradients, with epoch-`epoch` dropout masks applied. One Spark job.
    *
    * `rowKey` must be unique per row (it seeds the dropout mask);
    * `label` in 0..k-1.
    */
  def gradients(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w: MlpWeights, epoch: Int, dropout: Double): MlpGrads =
    gradientsVal(df, features, label, rowKey, w, epoch, dropout,
      lit(false))._1

  /** [[gradients]] with an in-pass validation slice: rows where `isVal`
    * holds are EXCLUDED from every gradient/train-loss average and
    * instead contribute to a separate mean-loss (returned as the second
    * element), computed at inference semantics — no dropout mask, no
    * 1/(1-p) rescale — exactly what Keras's end-of-epoch val_loss
    * evaluates. One Spark job still: the split is a per-row conditional
    * inside the same aggregation, so early stopping costs no extra
    * pass (see [[TrainerCommon.earlyStop]]). Returns None for the val
    * loss when the slice is empty. */
  def gradientsVal(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w: MlpWeights, epoch: Int, dropout: Double,
      isVal: Column): (MlpGrads, Option[Double]) = {
    val d = features.length
    val h = w.hidden
    val k = w.classes
    require(dropout >= 0.0 && dropout < 1.0, "dropout in [0, 1)")

    // stage 0: features, label, row key, val flag as plain attributes
    val base = df.select(
      (features.zipWithIndex.map { case (f, i) => f.as(s"x$i") } :+
        label.cast("int").as("y")) ++
        Seq(rowKey.as("rk"), isVal.as("iv")): _*)
    val xs = (0 until d).map(i => col(s"x$i"))
    val carry0 = xs ++ Seq(col("y"), col("rk"), col("iv"))

    // per-unit train-time inverted-dropout mask; validation rows run at
    // inference semantics (TrainerCommon.dropMask — the ONE mask impl)
    def maskOf(u: Int): Column =
      TrainerCommon.dropMask(col("iv"), col("rk"), epoch, u, dropout)

    // stage 1: pre-activations z1_u, then dropped+scaled activations a1_u
    // (mask folded into a1; relu' recomputed from z1's sign in backprop)
    val z1 = (0 until h).map { u =>
      ((0 until d).map(i => xs(i) * lit(w.w1(u)(i))).reduce(_ + _) +
        lit(w.b1(u))).as(s"z1_$u")
    }
    val s1 = base.select(carry0 ++ z1: _*)
    val a1 = (0 until h).map { u =>
      (greatest(col(s"z1_$u"), lit(0.0)) * maskOf(u)).as(s"a1_$u")
    }
    val carry1 = carry0 ++ (0 until h).map(u => col(s"z1_$u"))
    val s2 = s1.select(carry1 ++ a1: _*)

    // stage 2: logits, stable log-softmax pieces, dz2_o = p_o - 1[y=o]
    val z2 = (0 until k).map { o =>
      ((0 until h).map(u => col(s"a1_$u") * lit(w.w2(o)(u))).reduce(_ + _) +
        lit(w.b2(o))).as(s"z2_$o")
    }
    val carry2 = carry1 ++ (0 until h).map(u => col(s"a1_$u"))
    val s3 = s2.select(carry2 ++ z2: _*)
    val zc = (0 until k).map(o => col(s"z2_$o"))
    val (dz2, lossCol) = TrainerCommon.softmaxHead(zc, col("y"))
    val s4 = s3.select(carry2 ++ zc ++ dz2 :+ lossCol: _*)

    // stage 3: dz1_u = (sum_o w2[o][u] dz2_o) * mask*scale * relu'(z1_u)
    // (mask/scale irrelevant on val rows — their gradients never reach
    // the aggregation below)
    val dz1 = (0 until h).map { u =>
      ((0 until k).map(o => col(s"dzo_$o") * lit(w.w2(o)(u))).reduce(_ + _) *
        maskOf(u) *
        when(col(s"z1_$u") > 0, 1.0).otherwise(0.0)).as(s"dz1_$u")
    }
    val s5 = s4.select(carry2 ++ (0 until k).map(o => col(s"dzo_$o")) ++
      Seq(col("loss")) ++ dz1: _*)

    // one aggregation: mean of every gradient product + mean loss,
    // each over TRAIN rows only (when-without-otherwise nulls val rows
    // out of the avg), plus the val slice's mean loss
    def tavg(c: Column) = avg(when(!col("iv"), c))
    val aggs: Seq[Column] =
      (for (o <- 0 until k; u <- 0 until h)
        yield tavg(col(s"dzo_$o") * col(s"a1_$u")).as(s"gw2_${o}_$u")) ++
      (0 until k).map(o => tavg(col(s"dzo_$o")).as(s"gb2_$o")) ++
      (for (u <- 0 until h; i <- 0 until d)
        yield tavg(col(s"dz1_$u") * col(s"x$i")).as(s"gw1_${u}_$i")) ++
      (0 until h).map(u => tavg(col(s"dz1_$u")).as(s"gb1_$u")) ++
      Seq(tavg(col("loss")).as("mloss"),
        avg(when(col("iv"), col("loss"))).as("vloss"))
    val row = s5.agg(aggs.head, aggs.tail: _*).head()
    // avg() over zero rows is null, and getAs[Double] would silently
    // unbox it to 0.0 — fake zero gradients instead of an error
    require(row.getAs[Any]("mloss") != null,
      "GdTrainer.gradients: empty training input")
    def g(n: String) = row.getAs[Double](n)
    (MlpGrads(
      Seq.tabulate(h, d)((u, i) => g(s"gw1_${u}_$i")),
      Seq.tabulate(h)(u => g(s"gb1_$u")),
      Seq.tabulate(k, h)((o, u) => g(s"gw2_${o}_$u")),
      Seq.tabulate(k)(o => g(s"gb2_$o")),
      g("mloss")),
      Option(row.getAs[Any]("vloss")).map(_.asInstanceOf[Double]))
  }

  /** Full-batch GD: `epochs` gradient steps from `w0`. Returns the final
    * weights and the per-epoch mean loss (loss BEFORE each update).
    * One Spark job per epoch; driver work is O(params). */
  def fit(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w0: MlpWeights, epochs: Int, lr: Double,
      dropout: Double = 0.0): (MlpWeights, Seq[Double]) = {
    var w = w0
    val losses = (1 to epochs).map { e =>
      val gr = gradients(df, features, label, rowKey, w, e, dropout)
      w = applyStep(w, gr, lr)
      gr.loss
    }
    (w, losses)
  }

  private[ml] def applyStep(w: MlpWeights, gr: MlpGrads,
      lr: Double): MlpWeights =
    MlpWeights(
      w.w1.zip(gr.w1).map { case (r, gRow) =>
        r.zip(gRow).map { case (x, gx) => x - lr * gx } },
      w.b1.zip(gr.b1).map { case (x, gx) => x - lr * gx },
      w.w2.zip(gr.w2).map { case (r, gRow) =>
        r.zip(gRow).map { case (x, gx) => x - lr * gx } },
      w.b2.zip(gr.b2).map { case (x, gx) => x - lr * gx })

  /** One optimizer step ([[TrainerCommon.Tensors.applyOpt]] — the
    * structural walker shared by every trainer family).
    * applyOpt(w, gr, Optimizer.sgd(lr)) == [[applyStep]](w, gr, lr)
    * exactly (AdamSpec + OptimizerStepSpec pin it). */
  private[ml] def applyOpt(w: MlpWeights, gr: MlpGrads,
      opt: TrainerCommon.Optimizer): MlpWeights =
    TrainerCommon.Tensors.applyOpt(w, gr, opt)

  /** [[fit]] under Keras EarlyStopping(patience, restore_best_weights):
    * rows flagged by `isVal` form the monitored hold-out slice (never
    * trained on), and each epoch's single aggregation carries both the
    * train gradients and the val loss ([[gradientsVal]]) — see
    * [[TrainerCommon.earlyStop]] for the loop semantics and job count. */
  def fitEs(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w0: MlpWeights, maxEpochs: Int, lr: Double,
      dropout: Double, isVal: Column,
      patience: Int = 5): TrainerCommon.EsResult[MlpWeights] =
    TrainerCommon.earlyStop(w0, maxEpochs, patience) { (w, e) =>
      val (gr, vl) = gradientsVal(df, features, label, rowKey, w, e,
        dropout, isVal)
      (applyStep(w, gr, lr), gr.loss,
        vl.getOrElse(sys.error("fitEs: empty validation slice")))
    }

  /** [[fitEs]] generalized to the reference's actual `compile/fit`
    * semantics (`models/mlp_model.py:10,28-34`): a pluggable optimizer
    * (`TrainerCommon.Optimizer.adam(0.001)` for Keras parity, `sgd(lr)`
    * for the historical step) and deterministic mini-batching —
    * `nBatches` hash-drawn batches per epoch, membership re-drawn every
    * epoch ([[TrainerCommon.batchOf]]), weights updated after EACH
    * batch. nBatches = 1 with sgd reproduces [[fitEs]] bit-for-bit
    * (AdamSpec pins it). Jobs per epoch = nBatches (val loss rides the
    * first batch pass — [[TrainerCommon.batchedEpoch]]). */
  def fitEsOpt(df: DataFrame, features: Seq[Column], label: Column,
      rowKey: Column, w0: MlpWeights, maxEpochs: Int,
      opt: TrainerCommon.Optimizer, dropout: Double, isVal: Column,
      patience: Int = 5, batchKeys: Seq[Column] = Nil,
      nBatches: Int = 1): TrainerCommon.EsResult[MlpWeights] =
    TrainerCommon.earlyStop(w0, maxEpochs, patience) { (w, e) =>
      TrainerCommon.batchedEpoch(df, isVal, batchKeys, nBatches, e, w,
          evalOnly = e > maxEpochs) {
        (dfb, ivb, wc) =>
          val (gr, vl) = gradientsVal(dfb, features, label, rowKey, wc, e,
            dropout, ivb)
          (applyOpt(wc, gr, opt), gr.loss, vl)
      }
    }

  /** Inference column: argmax class under `w`, NO dropout (inverted
    * dropout trains with scaled activations precisely so inference is
    * the plain forward pass — Keras parity). First index wins ties. */
  def predict(features: Seq[Column], w: MlpWeights): Column = {
    val a1 = (0 until w.hidden).map { u =>
      greatest(features.indices.map(i =>
        features(i) * lit(w.w1(u)(i))).reduce(_ + _) + lit(w.b1(u)), lit(0.0))
    }
    val z2 = (0 until w.classes).map { o =>
      (0 until w.hidden).map(u => a1(u) * lit(w.w2(o)(u))).reduce(_ + _) +
        lit(w.b2(o))
    }
    TrainerCommon.argmax(z2)
  }
}
