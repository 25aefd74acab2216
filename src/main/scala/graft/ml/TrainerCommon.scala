package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The numerically subtle pieces every expression-column trainer shares
  * (GdTrainer / RnnTrainer / ConvTrainer) — kept in ONE place so a fix
  * to the max-shifted softmax or the loss algebra cannot silently miss
  * a copy (the dropout-threshold rounding fix in this repo's history is
  * the cautionary tale).
  */
private[ml] object TrainerCommon {

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
}
