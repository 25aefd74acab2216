package graft.ml

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed sign-SGD training for a linear model (signSGD, Bernstein
  * et al. 2018): full-batch gradient of the squared loss, updating each
  * weight by only the gradient's SIGN with an integer step size.
  *
  * This is the engine's honest-to-goodness distributed TRAINING loop —
  * the same data-parallel shape MLlib's own optimizers use: each step is
  * ONE aggregation over the fact table (partial sums map-side, one
  * O(params) row to the driver), the driver applies the O(params) weight
  * update, and the next step's predictions are plan literals. Nothing
  * but the gradient sums ever crosses the wire, so the loop scales to
  * 100 TB exactly as far as a grouped aggregation does.
  *
  * Why sign updates: with integer features, integer targets, and integer
  * initial weights, every quantity in the loop — predictions, residuals,
  * gradient sums, squared-error sums, updated weights — stays an exact
  * integer forever (no learning-rate floats, no rounding drift). That is
  * what makes an ITERATIVE trainer hash-checkable against DuckDB: the
  * oracle replays the identical steps as chained aggregate CTEs and must
  * land on bit-identical weights and losses. (The classic caveat stands:
  * sign updates bound the step, they don't guarantee per-step descent.)
  *
  * Training the reference's float models stays with MLlib
  * (`ml/Pipelines.scala`); this gives the engine a native, oracle-gated
  * gradient-descent loop (reference training loop shape,
  * `models/mlp_model.py:fit`).
  */
object SignGd {

  /** One recorded step: `sse` is the squared-error SUM at the weights the
    * gradient was computed on (i.e. before this step's update); `w` are
    * the weights after the update. */
  final case class Step(step: Long, sse: Long, w: Seq[Long])

  /** Run `steps` full-batch sign-SGD steps of `y ~ w0 + w . xs` starting
    * from all-zero weights with integer step size `eta`. One Spark job
    * per step; `xs`/`y` must be integer-valued (exactness contract above).
    */
  def fit(df: DataFrame, xs: Seq[Column], y: Column, steps: Int,
      eta: Long = 1L): Seq[Step] = {
    require(steps >= 1 && xs.nonEmpty)
    val feats = lit(1L) +: xs // bias column first
    var w = Seq.fill(feats.length)(0L)
    (1 to steps).map { i =>
      val resid = feats.zip(w).map { case (x, wj) => x * lit(wj) }
        .reduce(_ + _) - y
      val sums = feats.map(x => sum(resid * x)) :+ sum(resid * resid)
      val row = df.agg(sums.head, sums.tail: _*).head()
      // sum() over zero rows is null — fail loudly, not with an opaque
      // NPE from getLong
      require(!row.isNullAt(0), "SignGd.fit: empty training input")
      val g = (0 until feats.length).map(row.getLong)
      val sse = row.getLong(feats.length)
      w = w.zip(g).map { case (wj, gj) => wj - eta * java.lang.Long.signum(gj) }
      Step(i.toLong, sse, w)
    }
  }
}
