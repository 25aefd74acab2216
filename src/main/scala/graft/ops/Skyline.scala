package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (minimize `xCol`, maximize `yCol`) — the
  * multi-objective filter (quality-vs-length tradeoff curves in data
  * selection). The naive form is a quadratic NOT-EXISTS anti-join (the
  * oracle keeps it); this is the O(n log n) sweep run twice:
  *
  *  1. a LOCAL sweep per hash bucket — any subset's local skyline is a
  *     superset of its global-skyline members, so the pruning is
  *     lossless;
  *  2. the global sweep over the few survivors (bounded by
  *     skyline-size x buckets), never the input.
  *
  * Sweep invariant: sorted by (x asc, y desc), a DISTINCT point is on
  * the frontier iff its y beats the running max of everything
  * cheaper-or-equal before it. The final single-partition window only
  * ever sees survivors.
  */
object Skyline {

  private def sweep(df: DataFrame, xCol: String, yCol: String,
      part: Seq[String]): DataFrame = {
    val w0 =
      if (part.isEmpty) Window.orderBy(col(xCol).asc, col(yCol).desc)
      else Window.partitionBy(part.map(col): _*)
        .orderBy(col(xCol).asc, col(yCol).desc)
    val w = w0.rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__mx", max(yCol).over(w))
      .filter(col("__mx").isNull || col(yCol) > col("__mx"))
      .drop("__mx")
  }

  /** Frontier of the DISTINCT (xCol, yCol) points of `df`. */
  def frontier(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 32): DataFrame = {
    val pts = df.select(col(xCol), col(yCol)).distinct()
    val local = sweep(
      pts.withColumn("__b", pmod(hash(col(xCol), col(yCol)), lit(buckets))),
      xCol, yCol, Seq("__b")).drop("__b")
    sweep(local, xCol, yCol, Seq.empty)
  }
}
