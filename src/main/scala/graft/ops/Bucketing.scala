package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle fact tables ONCE at write time so
  * every subsequent equi-join/aggregation on the bucket key runs with no
  * exchange at all — at 100 TB, re-shuffling a fact table per query is
  * the single largest avoidable cost.
  *
  * Both sides bucketed by the same key into the same bucket count ⇒
  * SortMergeJoin with zero Exchange (asserted in ScaleSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted external table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(table)
  }

  /** True when the executed plan of `df` contains no SHUFFLE exchange —
    * the property bucketing buys. Matches the shuffle node name at a
    * word boundary, so `BroadcastExchange` (which moves no shuffle
    * data) no longer misreports a broadcast-probed bucketed join as
    * shuffling (review find). String-based on purpose: the plan's
    * toString includes the inner plan of AdaptiveSparkPlanExec, which
    * a tree walk misses (AQE's wrapper is a leaf node). */
  def isExchangeFree(df: DataFrame): Boolean =
    """\bExchange """.r
      .findFirstIn(df.queryExecution.executedPlan.toString).isEmpty
}
