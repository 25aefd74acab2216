package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The numerically subtle pieces every expression-column trainer shares
  * (GdTrainer / RnnTrainer / ConvTrainer) — kept in ONE place so a fix
  * to the max-shifted softmax or the loss algebra cannot silently miss
  * a copy (the dropout-threshold rounding fix in this repo's history is
  * the cautionary tale). Public: the query registry consumes
  * [[earlyStop]]'s result type and [[valSplit]] directly.
  */
object TrainerCommon {

  /** Stable log-softmax cross-entropy head over staged logit columns
    * `zc` with int label column `y`: returns (dzo_o columns aliased
    * `dzo_$o`, loss column aliased `loss`) where dzo_o = p_o - 1[y=o]
    * and loss = logsumexp(z) - z_y (max-shifted). */
  def softmaxHead(zc: Seq[Column], y: Column): (Seq[Column], Column) = {
    val m = zc.reduce(greatest(_, _))
    val denom = zc.map(z => exp(z - m)).reduce(_ + _)
    val loss = (log(denom) + m - zc.zipWithIndex.map { case (z, o) =>
      when(y === o, z).otherwise(lit(0.0)) }.reduce(_ + _)).as("loss")
    val dzo = zc.zipWithIndex.map { case (z, o) =>
      (exp(z - m) / denom - when(y === o, 1.0).otherwise(0.0)).as(s"dzo_$o")
    }
    (dzo, loss)
  }

  /** 0-based argmax over logit expressions, first index on ties
    * (np.argmax parity), as a long column. */
  def argmax(z2: Seq[Column]): Column = {
    val arr = array(z2: _*)
    (array_position(arr, array_max(arr)) - 1).cast("long")
  }

  /** Deterministic inverted-dropout factor for (row, epoch, unit):
    * keep-mask `xxhash64(rk, epoch, u) % 1000 >= round(1000p)` scaled
    * by 1/(1-p) on train rows; validation rows (`iv`) run at inference
    * semantics — keep-all, unscaled (Keras: dropout disabled in
    * evaluation). p = 0 short-circuits to keep-all with no hash in the
    * plan. Rounded threshold, not truncated: 1000 * 0.3 is 299.999...
    * in binary floating point, and truncation would drop at 299/1000
    * while rescaling by exactly 1/(1-0.3) — a systematic bias. Same
    * row + epoch + unit -> same mask on any executor, any retry, any
    * partitioning (the distributed-retry contract nondeterministic
    * rand() masks break). */
  def dropMask(iv: Column, rk: Column, epoch: Int, u: Int,
      p: Double): Column =
    if (p <= 0.0) lit(1.0)
    else when(iv, lit(1.0)).otherwise(
      when(pmod(xxhash64(rk, lit(epoch), lit(u)), lit(1000L)) >=
        lit(math.round(1000 * p).toInt), lit(1.0)).otherwise(lit(0.0)) *
        lit(1.0 / (1.0 - p)))

  /** Deterministic hold-out flag for early stopping: row lands in the
    * validation slice iff xxhash64(rowKey, salt) falls in the first
    * `valFrac` of the hash space. Content/key-hashed like every other
    * split in this engine (x6/x8): engine-portable, rerun-stable,
    * partitioning-invariant — a retried task sees the same split. */
  def valSplit(rowKey: Column, valFrac: Double = 0.2,
      salt: Long = 0x5eedL): Column =
    pmod(xxhash64(rowKey, lit(salt)), lit(1000L)) <
      lit(math.round(1000 * valFrac))

  /** [[valSplit]] on the engine-portable md5-affine family
    * ([[graft.functions.PortableHash]], seed index 17): row lands in
    * the validation slice iff `h(concat(keys, '#')) % 1000 <
    * round(1000*valFrac)`. Same contract (deterministic, rerun-stable,
    * partitioning-invariant), but ALSO replayable by an external
    * oracle — which is what lets q61_trainer_contract hash-check the
    * exact train/val row sets the ES trainers consume. Keys are cast
    * to string and '#'-joined, matching [[valSplitPortableSql]]. */
  def valSplitPortable(keys: Seq[Column], valFrac: Double = 0.2): Column =
    graft.functions.PortableHash.h(
      concat_ws("#", keys.map(_.cast("string")): _*), 17) %
      lit(1000L) < lit(math.round(1000 * valFrac))

  /** DuckDB replay of [[valSplitPortable]] over SQL expression texts. */
  def valSplitPortableSql(keys: Seq[String],
      valFrac: Double = 0.2): String = {
    val joined = keys.map(k => s"CAST($k AS VARCHAR)")
      .mkString("concat(", ", '#', ", ")")
    s"${graft.functions.PortableHash.hSql(joined, 17)} % 1000 < " +
      s"${math.round(1000 * valFrac)}"
  }

  /** Outcome of [[earlyStop]]: weights restored to the best-val epoch,
    * per-epoch train losses (loss at start of epoch, the trainers'
    * existing convention), per-epoch END-of-epoch validation losses,
    * and the 1-based best/stopped epoch numbers. */
  final case class EsResult[W](weights: W, trainLosses: Seq[Double],
      valLosses: Seq[Double], bestEpoch: Int, stoppedEpoch: Int)

  /** Keras-parity EarlyStopping(monitor=val_loss, patience, min_delta=0,
    * restore_best_weights=True) as a generic driver loop — the
    * reference's actual stop condition on every model
    * (`models/mlp_model.py:67-71`).
    *
    * ZERO extra Spark jobs: `epochPass(w, e)` is the trainer's ONE
    * per-epoch aggregation, returning (grads-applied next weights,
    * train loss at w, VALIDATION loss at w). Keras monitors val loss at
    * the END of an epoch (post-update) — which equals the val loss the
    * NEXT epoch's pass computes at its start — so the loop simply
    * attributes pass e+1's val number to epoch e. One trailing pass
    * evaluates the final epoch; total passes = stoppedEpoch + 1, vs
    * stoppedEpoch train jobs + stoppedEpoch separate val jobs for the
    * naive wiring.
    *
    * Semantics (Keras loop, min mode, min_delta = 0): an epoch improves
    * iff its val loss is STRICTLY below the best so far; `wait` resets
    * on improvement, else increments; training stops when wait reaches
    * `patience` — so patience = 0 stops at the FIRST non-improving
    * epoch, exactly as Keras `EarlyStopping(patience=0)` does. Pass
    * `patience < 0` to disable the stop entirely (train all maxEpochs;
    * restore-best still applies). The returned weights are the END of
    * the best epoch's snapshot. Weight snapshots are O(params) driver
    * memory, only the best is retained.
    */
  def earlyStop[W](w0: W, maxEpochs: Int, patience: Int)(
      epochPass: (W, Int) => (W, Double, Double)): EsResult[W] = {
    require(maxEpochs >= 1, "bad earlyStop params")
    var w = w0
    var bestW = w0
    var bestVal = Double.PositiveInfinity
    var bestEpoch = 0
    var wait = 0
    val trainLosses = Vector.newBuilder[Double]
    val valLosses = Vector.newBuilder[Double]
    var e = 1
    var stopped = 0
    while (stopped == 0 && e <= maxEpochs + 1) {
      val (next, trainLoss, valAtStart) = epochPass(w, e)
      if (e >= 2) {
        // valAtStart is epoch e-1's end-of-epoch validation loss
        valLosses += valAtStart
        if (valAtStart < bestVal) {
          bestVal = valAtStart; bestW = w; bestEpoch = e - 1; wait = 0
        } else {
          wait += 1
          // Keras parity including patience=0: the first non-improving
          // epoch trips wait(1) >= patience(0) and training stops there.
          // Negative patience = stopping disabled (fixed-epoch training).
          if (patience >= 0 && wait >= patience) stopped = e - 1
        }
      }
      if (stopped == 0 && e <= maxEpochs) {
        trainLosses += trainLoss
        w = next
      }
      e += 1
    }
    if (stopped == 0) stopped = maxEpochs
    val vls = valLosses.result()
    EsResult(if (bestEpoch > 0) bestW else w,
      trainLosses.result().take(stopped), vls.take(stopped),
      if (bestEpoch > 0) bestEpoch else stopped, stopped)
  }
}
