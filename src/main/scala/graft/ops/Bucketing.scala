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

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the property bucketing buys. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange ")
}
