package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-weight neural FORWARD passes as pure Catalyst expression trees —
  * no UDFs, no driver loops, fully distributed scoring.
  *
  * Closes the scoring half of the M2/M3/M4 gap (SURVEY §2.6): MLlib has
  * no conv/recurrent layers, so TRAINING those reference architectures
  * (`models/cnn_model.py:21-32`, `models/rnn_model.py:19-26`,
  * `models/lstm_model.py:19-26`) stays mapped onto the MLP trainer
  * (documented delta, SURVEY §7.5). But given a weight set — e.g.
  * exported from an offline-trained Keras model — the engine can now
  * SCORE with true convolutional / recurrent semantics at cluster scale:
  * each layer is a `transform`/`aggregate` higher-order expression over
  * the feature array, unrolled over the (compile-time-known) weight
  * shapes. Weights live in the plan as literals, which is exactly the
  * broadcast-small-model pattern a 100 TB scoring pass wants: zero
  * shuffle, zero state, one narrow projection per row.
  *
  * Layout conventions (Keras parity):
  *  - a sequence is `array<array<double>>`, positions x channels; lift a
  *    single-channel `array<double>` with [[singleChannel]]
  *  - Conv1D weights are filters x kernel x inChannels, valid padding,
  *    stride 1 (`Conv1D(filters, kernel_size, activation)` defaults)
  *  - MaxPooling1D with pool p emits floor(P/p) windows — the odd tail
  *    is DROPPED, as Keras does
  *  - Flatten is position-major: (pos0 ch0..chC, pos1 ch0..chC, ...)
  *  - Dense weights are outUnits x inUnits
  *  - SimpleRNN/LSTM consume positions x channels and return the FINAL
  *    hidden state (`return_sequences=False`); initial state is zeros
  *
  * Preconditions (shapes are weight-driven and checked at plan build):
  * inputs must be at least kernel-size (conv) / pool-size (pool) long —
  * the layer stack fixes lengths statically, as in Keras.
  */
object NeuralForward {

  private def act(name: String)(c: Column): Column = name match {
    case "relu"   => greatest(c, lit(0.0))
    case "tanh"   => tanh(c)
    case "linear" => c
    case other =>
      throw new IllegalArgumentException(s"unknown activation $other")
  }

  /** Lift `array<double>` to positions x 1-channel `array<array<double>>`. */
  def singleChannel(in: Column): Column = transform(in, x => array(x))

  /** Conv1D, valid padding, stride 1: out[p][f] =
    * act(sum_{j,c} in[p+j][c] * w[f][j][c] + b[f]), p in 0..P-k.
    * The filter/kernel/channel loops unroll at plan-build time into a
    * flat codegen-able arithmetic expression per output cell.
    */
  def conv1d(in: Column, w: Seq[Seq[Seq[Double]]], b: Seq[Double],
      activation: String = "relu"): Column = {
    require(w.nonEmpty && b.length == w.length, "one bias per filter")
    val k = w.head.length
    require(w.forall(_.length == k), "ragged kernel")
    // Guard inputs shorter than the kernel: sequence(0, negative) would
    // DESCEND ([0,-1]) and feed invalid indices to element_at (ANSI
    // crash / silent end-relative reads). Keras errors on short inputs;
    // here a short row yields zero positions and the job stays alive.
    when(size(in) >= k,
      transform(sequence(lit(0), size(in) - k), p =>
        array(w.indices.map { f =>
          val terms = for {
            j <- 0 until k
            c <- w(f)(j).indices
          } yield element_at(element_at(in, p + lit(j + 1)), c + 1) *
            lit(w(f)(j)(c))
          act(activation)(terms.reduce(_ + _) + lit(b(f)))
        }: _*)))
      .otherwise(typedLit(Seq.empty[Seq[Double]]))
  }

  /** MaxPooling1D: elementwise (per-channel) max over non-overlapping
    * windows of `pool` positions; the incomplete tail window is dropped
    * (Keras `MaxPooling1D` default).
    */
  def maxPool1d(in: Column, pool: Int): Column = {
    require(pool >= 1)
    // short-input guard: see conv1d
    when(size(in) >= pool,
      transform(sequence(lit(0), floor(size(in) / lit(pool)).cast("int") - 1),
        q =>
          (1 until pool).foldLeft(element_at(in, q * pool + 1)) { (acc, r) =>
            zip_with(acc, element_at(in, q * pool + (r + 1)),
              (a, bb) => greatest(a, bb))
          }))
      .otherwise(typedLit(Seq.empty[Seq[Double]]))
  }

  /** Keras Flatten on positions x channels: position-major concatenation. */
  def flatten1d(in: Column): Column = flatten(in)

  /** Dense: out[o] = act(sum_i in[i] * w[o][i] + b[o]). */
  def dense(in: Column, w: Seq[Seq[Double]], b: Seq[Double],
      activation: String = "relu"): Column = {
    require(w.nonEmpty && b.length == w.length, "one bias per unit")
    array(w.indices.map { o =>
      act(activation)(
        w(o).indices.map(i => element_at(in, i + 1) * lit(w(o)(i)))
          .reduce(_ + _) + lit(b(o)))
    }: _*)
  }

  /** Numerically-stable softmax (max-subtracted). */
  def softmax(in: Column): Column = {
    val m = array_max(in)
    val exps = transform(in, e => exp(e - m))
    val denom = aggregate(exps, lit(0.0), (a, v) => a + v)
    transform(exps, e => e / denom)
  }

  /** 0-based index of the max element, first occurrence on ties
    * (np.argmax parity — the reference's predict path argmaxes the
    * softmax row, `models/cnn_model.py:predict`).
    */
  def argmax(in: Column): Column =
    (array_position(in, array_max(in)) - 1).cast("long")

  /** SimpleRNN forward (Keras `SimpleRNN(units)`): h_t =
    * act(x_t . wx + h_{t-1} . wh + b), h_0 = 0, returning h_T. The
    * recurrence is a single `aggregate` fold over the timestep array —
    * one pass, no exploded rows, no state store.
    * wx: units x channels, wh: units x units.
    */
  def simpleRnn(in: Column, wx: Seq[Seq[Double]], wh: Seq[Seq[Double]],
      b: Seq[Double], activation: String = "tanh"): Column = {
    val units = wx.length
    require(wh.length == units && b.length == units &&
      wh.forall(_.length == units), "wh must be units x units")
    aggregate(in,
      array(Seq.fill(units)(lit(0.0)): _*),
      (h, x) => array(wx.indices.map { u =>
        val xs = wx(u).indices.map(c => element_at(x, c + 1) * lit(wx(u)(c)))
        val hs = wh(u).indices.map(v => element_at(h, v + 1) * lit(wh(u)(v)))
        act(activation)((xs ++ hs).reduce(_ + _) + lit(b(u)))
      }: _*))
  }

  // ---- Static-shape variants ----
  //
  // A Keras model FIXES its input length (`input_shape`), so layer
  // extents are known at plan-build time and the loops can unroll into
  // plain scalar arithmetic over `Seq[Column]` — no arrays, no
  // higher-order functions. This matters for throughput: lambda
  // expressions (transform/aggregate) are interpreted per element and
  // break whole-stage codegen for their projection, while the unrolled
  // form is ordinary codegen'd arithmetic (measured ~20x on the q37
  // stack at sf0.1). Use the HOF forms above only for genuinely
  // variable-length sequences.
  //
  // Caller contract: STAGE each layer's outputs as named columns (one
  // select per layer) rather than feeding expressions straight into the
  // next layer — each consumer references a cell k*channels times, so
  // inlining compounds the tree multiplicatively per layer (and an
  // inlined recurrence is 3^T). The registry entries (queries/
  // NeuralOps.scala) show the staged shape.

  /** Conv1D on a static positions x channels grid of scalar columns. */
  def conv1dStatic(in: Seq[Seq[Column]], w: Seq[Seq[Seq[Double]]],
      b: Seq[Double], activation: String = "relu"): Seq[Seq[Column]] = {
    require(w.nonEmpty && b.length == w.length, "one bias per filter")
    val k = w.head.length
    require(in.length >= k, s"input length ${in.length} < kernel $k")
    (0 to in.length - k).map { p =>
      w.indices.map { f =>
        val terms = for (j <- 0 until k; c <- w(f)(j).indices)
          yield in(p + j)(c) * lit(w(f)(j)(c))
        act(activation)(terms.reduce(_ + _) + lit(b(f)))
      }
    }
  }

  /** MaxPooling1D on a static grid; incomplete tail window dropped. */
  def maxPool1dStatic(in: Seq[Seq[Column]], pool: Int): Seq[Seq[Column]] =
    (0 until in.length / pool).map { q =>
      in(q * pool).indices.map { ch =>
        (0 until pool).map(r => in(q * pool + r)(ch)).reduce(greatest(_, _))
      }
    }

  /** Keras Flatten: position-major. */
  def flattenStatic(in: Seq[Seq[Column]]): Seq[Column] = in.flatten

  /** Dense on static scalar columns. */
  def denseStatic(in: Seq[Column], w: Seq[Seq[Double]], b: Seq[Double],
      activation: String = "relu"): Seq[Column] =
    w.indices.map(o => act(activation)(
      w(o).indices.map(i => in(i) * lit(w(o)(i))).reduce(_ + _) + lit(b(o))))

  /** One SimpleRNN step: h' = act(x . wx + h . wh + b). Stage each
    * step's outputs as named columns before the next (see object note —
    * an inlined T-step recurrence grows as units^T).
    */
  def rnnCell(x: Seq[Column], h: Seq[Column], wx: Seq[Seq[Double]],
      wh: Seq[Seq[Double]], b: Seq[Double],
      activation: String = "tanh"): Seq[Column] =
    wx.indices.map { u =>
      act(activation)((wx(u).indices.map(c => x(c) * lit(wx(u)(c))) ++
        wh(u).indices.map(v => h(v) * lit(wh(u)(v)))).reduce(_ + _) +
        lit(b(u)))
    }

  /** One LSTM gate's weights: w (units x channels), u (units x units),
    * b (units). */
  final case class Gate(w: Seq[Seq[Double]], u: Seq[Seq[Double]],
      b: Seq[Double])

  /** Keras-gate-ordered LSTM weights: input, forget, cell, output. */
  final case class LstmWeights(i: Gate, f: Gate, c: Gate, o: Gate)

  /** LSTM forward (Keras `LSTM(units)` defaults: sigmoid recurrent
    * activation, tanh activation, zero initial state, no peepholes):
    *   i = sig(gate_i), f = sig(gate_f), g = tanh(gate_c), o = sig(gate_o)
    *   c_t = f * c_{t-1} + i * g ; h_t = o * tanh(c_t)
    * Single `aggregate` fold carrying struct(h, c); returns h_T.
    */
  def lstm(in: Column, wts: LstmWeights): Column = {
    val units = wts.i.b.length
    def zeros = array(Seq.fill(units)(lit(0.0)): _*)
    def pre(g: Gate, x: Column, h: Column, u: Int): Column = {
      val xs = g.w(u).indices.map(c => element_at(x, c + 1) * lit(g.w(u)(c)))
      val hs = g.u(u).indices.map(v => element_at(h, v + 1) * lit(g.u(u)(v)))
      (xs ++ hs).reduce(_ + _) + lit(g.b(u))
    }
    def sig(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))
    aggregate(in,
      struct(zeros.as("h"), zeros.as("c")),
      (s, x) => {
        val h = s.getField("h")
        val cPrev = s.getField("c")
        val cNew = array((0 until units).map { u =>
          sig(pre(wts.f, x, h, u)) * element_at(cPrev, u + 1) +
            sig(pre(wts.i, x, h, u)) * tanh(pre(wts.c, x, h, u))
        }: _*)
        val hNew = array((0 until units).map { u =>
          sig(pre(wts.o, x, h, u)) * tanh(element_at(cNew, u + 1))
        }: _*)
        struct(hNew.as("h"), cNew.as("c"))
      },
      s => s.getField("h"))
  }

  /** Static-unrolled LSTM over per-timestep scalar columns — the
    * codegen'd form of [[lstm]] (HOF lambdas are interpreted per
    * element; the q41 stack measured ~45x slower un-unrolled). Each
    * timestep stages two selects: (c_t, o-gate pre-activations) first,
    * then h_t = sigmoid(o)*tanh(c) — the staging bounds expression-tree
    * growth exactly as the object note prescribes (an inlined gated
    * recurrence is exponential in T). `xs`: one Seq of channel columns
    * per timestep; not-yet-consumed timesteps' columns are carried
    * through each staged select automatically, so `carry` only needs
    * whatever the CALLER wants to keep (keys etc.). Returns the staged
    * frame + final-h attribute refs.
    */
  def lstmStaged(df0: DataFrame, carry: Seq[Column], xs: Seq[Seq[Column]],
      wts: LstmWeights, prefix: String = "lstm"): (DataFrame, Seq[Column]) = {
    val units = wts.i.b.length
    def sig(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))
    def pre(g: Gate, x: Seq[Column], h: Seq[Column], u: Int): Column = {
      val xsum = g.w(u).indices.map(i => x(i) * lit(g.w(u)(i)))
      val hsum = g.u(u).indices.map(v => h(v) * lit(g.u(u)(v)))
      (xsum ++ hsum).reduce(_ + _) + lit(g.b(u))
    }
    val zeros = Seq.fill(units)(lit(0.0): Column)
    val init = (df0, zeros, zeros)
    val (dfT, hT, _) = xs.zipWithIndex.foldLeft(init) {
      case ((df, h, c), (x, t0)) =>
        val t = t0 + 1
        // timesteps after this one still need their x columns staged
        val futureX = xs.drop(t0 + 1).flatten
        val cNew = (0 until units).map(u =>
          (sig(pre(wts.f, x, h, u)) * c(u) +
            sig(pre(wts.i, x, h, u)) * tanh(pre(wts.c, x, h, u)))
            .as(s"${prefix}_c${t}_$u"))
        val oPre = (0 until units).map(u =>
          pre(wts.o, x, h, u).as(s"${prefix}_o${t}_$u"))
        val staged = df.select(carry ++ futureX ++ cNew ++ oPre: _*)
        val cRefs = (0 until units).map(u => col(s"${prefix}_c${t}_$u"))
        val hNew = (0 until units).map(u =>
          (sig(col(s"${prefix}_o${t}_$u")) * tanh(cRefs(u)))
            .as(s"${prefix}_h${t}_$u"))
        val staged2 = staged.select(carry ++ futureX ++ cRefs ++ hNew: _*)
        val hRefs = (0 until units).map(u => col(s"${prefix}_h${t}_$u"))
        (staged2, hRefs, cRefs)
    }
    (dfT, hT)
  }
}
