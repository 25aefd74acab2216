package graft.ml

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Engine-native full-batch trainer for a STACKED 1-D convolutional
  * classifier — the reference's block structure
  * (`models/cnn_model.py:21-32`: Conv1D -> MaxPooling1D -> Conv1D -> …):
  *
  *   Conv1D(f1, k, relu) -> MaxPool1D(2, stride 2, drop odd tail —
  *   Keras parity) -> Conv1D(f2, k, relu, f1 input channels) ->
  *   global max pool -> dense softmax, cross-entropy.
  *
  * [[ConvTrainer]] trains the single-block form; this closes the
  * remaining M2 structure delta (stacking + LOCAL pooling between conv
  * layers, which is where multi-channel convolution and two levels of
  * argmax gradient routing appear). Same execution contract as every
  * trainer here: staged expression columns, weights as plan literals,
  * ONE O(params) aggregation per epoch.
  *
  * Shapes (T input steps, single input channel):
  *   P1 = T - k + 1 conv1 positions; J = floor(P1 / 2) pooled positions;
  *   P2 = J - k + 1 conv2 positions (requires P2 >= 1).
  * Backward: head dz -> global-max routing (first argmax over P2) ->
  * relu mask -> conv2 grads + dm1 (via W2) -> local-max routing (first
  * argmax within each 2-window) -> relu mask -> conv1 grads.
  */
object Conv2Trainer {

  /** w1: f1 x k (single input channel), b1: f1; w2: f2 x k x f1
    * (position-major kernel over f1 channels), b2: f2; wh: classes x f2,
    * bh: classes. */
  final case class Conv2Weights(w1: Seq[Seq[Double]], b1: Seq[Double],
      w2: Seq[Seq[Seq[Double]]], b2: Seq[Double],
      wh: Seq[Seq[Double]], bh: Seq[Double]) {
    def f1: Int = w1.length
    def k: Int = w1.head.length
    def f2: Int = w2.length
    def classes: Int = wh.length
    require(b1.length == f1 && w2.forall(m => m.length == k &&
      m.forall(_.length == f1)) && b2.length == f2 &&
      wh.forall(_.length == f2) && bh.length == classes,
      "inconsistent shapes")
  }

  /** Deterministic small init in [-0.5, 0.5) from `seed`; conv biases
    * start at +0.1 so no filter is born dead under max routing (the
    * ConvTrainerSpec dead-filter note). */
  def init(f1: Int, f2: Int, kernel: Int, classes: Int,
      seed: Long): Conv2Weights = {
    val rng = new scala.util.Random(seed)
    def v(n: Int) = Seq.fill(n)(rng.nextDouble() - 0.5)
    Conv2Weights(
      Seq.fill(f1)(v(kernel)), Seq.fill(f1)(0.1),
      Seq.fill(f2)(Seq.fill(kernel)(v(f1))), Seq.fill(f2)(0.1),
      Seq.fill(classes)(v(f2)), v(classes))
  }

  final case class Conv2Grads(w1: Seq[Seq[Double]], b1: Seq[Double],
      w2: Seq[Seq[Seq[Double]]], b2: Seq[Double],
      wh: Seq[Seq[Double]], bh: Seq[Double], loss: Double)

  /** First-argmax indicator: cand == target AND every earlier candidate
    * is strictly below target. */
  private def isFirstMax(cands: Seq[Column], p: Int, target: Column) =
    (0 until p).map(q => cands(q) < target)
      .foldLeft(cands(p) === target)(_ && _)

  /** One full-batch pass at `w`: mean loss + mean gradients. One Spark
    * job. */
  def gradients(df: DataFrame, xs: Seq[Column], label: Column,
      w: Conv2Weights): Conv2Grads = {
    val T = xs.length
    val k = w.k
    val P1 = T - k + 1
    val J = P1 / 2
    val P2 = J - k + 1
    require(P2 >= 1, s"input length $T too short for stacked kernels $k")
    val (f1, f2, kc) = (w.f1, w.f2, w.classes)

    val base = df.select(xs.zipWithIndex.map { case (x, t) =>
      x.as(s"x${t + 1}") } :+ label.cast("int").as("y"): _*)
    val xRef = (1 to T).map(t => col(s"x$t"))
    var cur = base
    var carry: Seq[Column] = xRef :+ col("y")
    def stage(cols: Seq[(String, Column)]): Unit = {
      cur = cur.select(carry ++ cols.map { case (n, c) => c.as(n) }: _*)
      carry = carry ++ cols.map { case (n, _) => col(n) }
    }

    // conv1 + relu
    stage(for (p <- 0 until P1; f <- 0 until f1) yield
      (s"a1_${p}_$f",
        greatest((0 until k).map(j => xRef(p + j) * lit(w.w1(f)(j)))
          .reduce(_ + _) + lit(w.b1(f)), lit(0.0))))
    // local max pool, window j covers conv1 positions 2j, 2j+1
    stage(for (j <- 0 until J; f <- 0 until f1) yield
      (s"m1_${j}_$f",
        greatest(col(s"a1_${2 * j}_$f"), col(s"a1_${2 * j + 1}_$f"))))
    // conv2 + relu over f1 channels
    stage(for (p <- 0 until P2; g <- 0 until f2) yield
      (s"a2_${p}_$g",
        greatest((for (j <- 0 until k; f <- 0 until f1)
          yield col(s"m1_${p + j}_$f") * lit(w.w2(g)(j)(f)))
          .reduce(_ + _) + lit(w.b2(g)), lit(0.0))))
    // global max pool over P2
    stage((0 until f2).map(g =>
      (s"gp_$g", (0 until P2).map(p => col(s"a2_${p}_$g"))
        .reduce(greatest(_, _)))))
    // head
    stage((0 until kc).map(o => (s"z2_$o",
      (0 until f2).map(g => col(s"gp_$g") * lit(w.wh(o)(g)))
        .reduce(_ + _) + lit(w.bh(o)))))
    val (dzh, lossCol) = TrainerCommon.softmaxHead(
      (0 until kc).map(o => col(s"z2_$o")), col("y"))
    stage(dzh.zipWithIndex.map { case (c, o) => (s"dzo_$o", c) } :+
      (("loss", lossCol)))

    // backward: conv2 pre-activation grads (global-max routing + relu)
    stage(for (p <- 0 until P2; g <- 0 until f2) yield {
      val dgp = (0 until kc).map(o =>
        col(s"dzo_$o") * lit(w.wh(o)(g))).reduce(_ + _)
      val route = isFirstMax(
        (0 until P2).map(q => col(s"a2_${q}_$g")), p, col(s"gp_$g"))
      (s"dz2_${p}_$g", dgp * when(route, 1.0).otherwise(0.0) *
        when(col(s"a2_${p}_$g") > 0, 1.0).otherwise(0.0))
    })
    // dm1 via W2, then conv1 pre-activation grads (local-max + relu)
    stage(for (j <- 0 until J; f <- 0 until f1) yield
      (s"dm1_${j}_$f",
        (for (p <- 0 until P2; g <- 0 until f2;
              if j - p >= 0 && j - p < k)
          yield col(s"dz2_${p}_$g") * lit(w.w2(g)(j - p)(f)))
          .foldLeft(lit(0.0))(_ + _)))
    stage(for (p <- 0 until P1; f <- 0 until f1) yield {
      val j = p / 2
      val inWindow = j < J // odd tail beyond the last full window
      val c =
        if (!inWindow) lit(0.0)
        else {
          val route = isFirstMax(
            Seq(col(s"a1_${2 * j}_$f"), col(s"a1_${2 * j + 1}_$f")),
            p - 2 * j, col(s"m1_${j}_$f"))
          col(s"dm1_${j}_$f") * when(route, 1.0).otherwise(0.0) *
            when(col(s"a1_${p}_$f") > 0, 1.0).otherwise(0.0)
        }
      (s"dz1_${p}_$f", c)
    })

    // one aggregation: mean gradients
    val aggs: Seq[Column] =
      (for (f <- 0 until f1; i <- 0 until k)
        yield avg((0 until P1).map(p =>
          col(s"dz1_${p}_$f") * col(s"x${p + i + 1}")).reduce(_ + _))
          .as(s"gw1_${f}_$i")) ++
      (0 until f1).map(f => avg((0 until P1).map(p =>
        col(s"dz1_${p}_$f")).reduce(_ + _)).as(s"gb1_$f")) ++
      (for (g <- 0 until f2; j <- 0 until k; f <- 0 until f1)
        yield avg((0 until P2).map(p =>
          col(s"dz2_${p}_$g") * col(s"m1_${p + j}_$f")).reduce(_ + _))
          .as(s"gw2_${g}_${j}_$f")) ++
      (0 until f2).map(g => avg((0 until P2).map(p =>
        col(s"dz2_${p}_$g")).reduce(_ + _)).as(s"gb2_$g")) ++
      (for (o <- 0 until kc; g <- 0 until f2)
        yield avg(col(s"dzo_$o") * col(s"gp_$g")).as(s"gwh_${o}_$g")) ++
      (0 until kc).map(o => avg(col(s"dzo_$o")).as(s"gbh_$o")) :+
      avg(col("loss")).as("mloss")
    val row = cur.agg(aggs.head, aggs.tail: _*).head()
    require(row.getAs[Any]("mloss") != null,
      "Conv2Trainer.gradients: empty training input")
    def g(n: String) = row.getAs[Double](n)
    Conv2Grads(
      Seq.tabulate(f1, k)((f, i) => g(s"gw1_${f}_$i")),
      Seq.tabulate(f1)(f => g(s"gb1_$f")),
      Seq.tabulate(f2, k, f1)((gg, j, f) => g(s"gw2_${gg}_${j}_$f")),
      Seq.tabulate(f2)(gg => g(s"gb2_$gg")),
      Seq.tabulate(kc, f2)((o, gg) => g(s"gwh_${o}_$gg")),
      Seq.tabulate(kc)(o => g(s"gbh_$o")),
      g("mloss"))
  }

  /** Full-batch GD: `epochs` steps from `w0`; returns final weights +
    * per-epoch pre-update mean loss. One Spark job per epoch. */
  private[ml] def applyStep(w: Conv2Weights, gr: Conv2Grads,
      lr: Double): Conv2Weights = {
    def s1(a: Seq[Double], ga: Seq[Double]) =
      a.zip(ga).map { case (x, gx) => x - lr * gx }
    def s2(a: Seq[Seq[Double]], ga: Seq[Seq[Double]]) =
      a.zip(ga).map { case (r, gr) => s1(r, gr) }
    def s3(a: Seq[Seq[Seq[Double]]], ga: Seq[Seq[Seq[Double]]]) =
      a.zip(ga).map { case (m, gm) => s2(m, gm) }
    Conv2Weights(s2(w.w1, gr.w1), s1(w.b1, gr.b1),
      s3(w.w2, gr.w2), s1(w.b2, gr.b2),
      s2(w.wh, gr.wh), s1(w.bh, gr.bh))
  }

  /** One optimizer step (Adam / sgd) —
    * [[TrainerCommon.Tensors.applyOpt]]; OptimizerStepSpec pins
    * sgd(lr) == [[applyStep]] bit-for-bit. */
  private[ml] def applyOpt(w: Conv2Weights, gr: Conv2Grads,
      opt: TrainerCommon.Optimizer): Conv2Weights =
    TrainerCommon.Tensors.applyOpt(w, gr, opt)

  def fit(df: DataFrame, xs: Seq[Column], label: Column,
      w0: Conv2Weights, epochs: Int,
      lr: Double): (Conv2Weights, Seq[Double]) = {
    var w = w0
    val losses = (1 to epochs).map { _ =>
      val gr = gradients(df, xs, label, w)
      w = applyStep(w, gr, lr)
      gr.loss
    }
    (w, losses)
  }

  /** Staged inference: argmax class appended as `outCol`. */
  def predictStaged(df: DataFrame, carry: Seq[Column], xs: Seq[Column],
      w: Conv2Weights, outCol: String): DataFrame = {
    val T = xs.length
    val k = w.k
    val P1 = T - k + 1
    val J = P1 / 2
    val P2 = J - k + 1
    val staged0 = df.select(carry ++ xs.zipWithIndex.map { case (x, t) =>
      x.as(s"qx${t + 1}") }: _*)
    val xr = (1 to T).map(t => col(s"qx$t"))
    val a1 = staged0.select(carry ++ (for (p <- 0 until P1;
        f <- 0 until w.f1) yield
      greatest((0 until k).map(j => xr(p + j) * lit(w.w1(f)(j)))
        .reduce(_ + _) + lit(w.b1(f)), lit(0.0)).as(s"qa1_${p}_$f")): _*)
    val m1 = a1.select(carry ++ (for (j <- 0 until J; f <- 0 until w.f1)
      yield greatest(col(s"qa1_${2 * j}_$f"), col(s"qa1_${2 * j + 1}_$f"))
        .as(s"qm1_${j}_$f")): _*)
    val a2 = m1.select(carry ++ (for (p <- 0 until P2; g <- 0 until w.f2)
      yield greatest((for (j <- 0 until k; f <- 0 until w.f1)
        yield col(s"qm1_${p + j}_$f") * lit(w.w2(g)(j)(f)))
        .reduce(_ + _) + lit(w.b2(g)), lit(0.0)).as(s"qa2_${p}_$g")): _*)
    val gp = (0 until w.f2).map(g =>
      (0 until P2).map(p => col(s"qa2_${p}_$g")).reduce(greatest(_, _)))
    val z2 = (0 until w.classes).map { o =>
      (0 until w.f2).map(g => gp(g) * lit(w.wh(o)(g))).reduce(_ + _) +
        lit(w.bh(o))
    }
    a2.select(carry :+ TrainerCommon.argmax(z2).as(outCol): _*)
  }
}
