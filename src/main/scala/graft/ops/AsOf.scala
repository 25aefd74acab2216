package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — an operator Spark's built-ins lack.
  *
  * For every left row, attach the value columns of the LATEST right row
  * with the same key and right.ts <= left.ts (the "last known state"
  * lookup of feature stores and market data).
  *
  * Implementation is the union trick, not a pair join: tag both sides,
  * union them, and per key take a running `last(_, ignoreNulls)` over
  * (ts asc, right-before-left on ties). One shuffle on the key + one
  * sort — work is O(n log n) per key and NEVER materializes the
  * (left x right) pairs an inequality join would. This is the form that
  * survives 100 TB; Catalyst would otherwise plan an inequality join as
  * a broadcast nested loop.
  *
  * Matches DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`
  * (oracle for q26): left rows with no prior right row get nulls.
  */
object AsOf {

  /** @param valueCols right-side columns to carry; they appear on the
    *                  output as `asof_<name>`. Left columns pass through. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCols: Seq[String]): DataFrame = {
    val payload = left.columns.filterNot(c => c == key || c == ts).toSeq
    val rTagged = right.select(
      (col(key) +: col(ts) +: lit(1).as("__is_r") +:
        valueCols.map(c => col(c).as(s"__r_$c"))) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      (col(key) +: col(ts) +: lit(0).as("__is_r") +:
        valueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))) ++
        payload.map(col): _*)
    // right rows sort BEFORE left rows at an equal timestamp: a state
    // change at exactly t is visible to a lookup at t (ASOF >= semantics).
    // Among right rows TIED on ts, the largest value tuple wins (values
    // ascending, nulls first, so the running last() lands on the max):
    // without the tie-break, last() picked a partition-order-dependent
    // row — nondeterministic across runs, and unpinnable against any
    // oracle (DuckDB ASOF is equally unspecified on duplicate r.ts).
    val w = Window.partitionBy(key)
      .orderBy((col(ts).asc +: col("__is_r").desc +:
        valueCols.map(c => col(s"__r_$c").asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(lTagged.unionByName(rTagged)) {
      (d, c) => d.withColumn(s"asof_$c",
        F.last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_r") === 0)
      .drop("__is_r" +: valueCols.map(c => s"__r_$c"): _*)
  }
}
