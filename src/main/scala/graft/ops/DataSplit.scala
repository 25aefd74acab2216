package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` is seed-stable but PARTITIONING-dependent — re-reading
  * the same table with a different file layout reassigns rows. These
  * splits hash the row's KEY, so membership is a pure function of the
  * data: stable across re-runs, re-partitions, cluster sizes, and
  * incremental appends (a new row never flips an old row's split).
  */
object DataSplit {

  /** Bucket in [0, 10000) derived from the key — two decimal places of
    * split precision. */
  private def bucket(key: Column): Column =
    pmod(xxhash64(key, lit("graft-split")), lit(10000L))

  /** (train, test) with ~`testFraction` of rows in test, keyed by
    * `keyCol`. All rows with equal keys land on the same side —
    * REQUIRED for dedup-sensitive corpora, where near-identical rows
    * split across train/test leak evaluation data. */
  def trainTest(df: DataFrame, keyCol: String,
      testFraction: Double): (DataFrame, DataFrame) = {
    val cut = (testFraction * 10000).toLong
    val b = bucket(col(keyCol))
    (df.filter(b >= cut), df.filter(b < cut))
  }

  /** K-fold assignment column (0..k-1), hash-keyed. */
  def foldColumn(keyCol: String, k: Int): Column =
    pmod(xxhash64(col(keyCol), lit("graft-fold")), lit(k.toLong))

  /** Deterministic stratified sample: keep ~`fractions(stratum)` of
    * each stratum (default 0 for unlisted strata), hash-keyed so the
    * sample is stable under re-runs and appends. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val cut = fractions.foldLeft(lit(0L)) { case (acc, (s, f)) =>
      when(col(stratumCol) === s, lit((f * 10000).toLong)).otherwise(acc)
    }
    df.filter(bucket(col(keyCol)) < cut)
  }
}
