package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for the 100 TB path.
  *
  * AQE's skew-join splitting (on in GraftSession) handles most runtime
  * skew; these explicit forms cover what AQE cannot — a hot key so large
  * that even a split shuffle partition overwhelms one task's build side,
  * or aggregation skew ahead of any join.
  *
  * Both are pure plan rewrites with identical semantics to the naive
  * form (asserted in ScaleSpec).
  */
object Skew {

  /** Equi-join where `left` carries skewed join keys. Every left row
    * gets a salt in [0, saltFactor) by per-partition round-robin
    * (`monotonically_increasing_id % saltFactor`) — NOT a row-content
    * hash: byte-identical hot rows (exactly what a duplicate-heavy
    * pre-dedup corpus produces) would all hash to ONE salt, paying the
    * full replication cost for zero skew relief (review find). Salt
    * values are partitioning-only state; the join's ROW SET is
    * identical for any salt assignment, so retries/re-runs stay
    * semantically stable. The right side is replicated saltFactor
    * times; the join key becomes (key, salt). A hot key's rows now land
    * on saltFactor different reducers instead of one. Cost: right side
    * shuffles saltFactor x — use for big-left / modest-right joins.
    *
    * Below `minLeftBytes` of (optimizer-estimated) left input the
    * rewrite SKIPS ITSELF and plans the plain equi-join — the AQE-style
    * size gate: a left side that small cannot produce a hot key that
    * overwhelms one task, so salting would pay its replication and
    * wider-key costs for nothing (measured at sf0.1: 0.97 s salted vs
    * a 0.05 s oracle on a skewless-by-construction input). Semantics
    * are identical either way (asserted in ScaleSpec); pass
    * `minLeftBytes = 0` to force the salted form.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltFactor: Int,
      minLeftBytes: Long = 1L << 30): DataFrame = {
    val leftBytes = left.queryExecution.optimizedPlan.stats.sizeInBytes
    if (leftBytes < minLeftBytes)
      return left.join(right, left(leftKey) === right(rightKey))
    val salt = pmod(monotonically_increasing_id(), lit(saltFactor.toLong))
    val saltedLeft = left.withColumn("__salt", salt)
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<long>")))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. Correct for algebraic
    * aggregates (sum/count/min/max — pass partials and a combiner).
    * Spark's hash aggregate already does map-side partials; this adds a
    * REDUCE-side split for keys whose partials still overwhelm one task.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int): DataFrame = {
    // round-robin, not a row-content hash: identical hot rows must
    // split across salts too (same rationale as [[saltedJoin]])
    val salt = pmod(monotonically_increasing_id(), lit(saltFactor.toLong))
    df.withColumn("__salt", salt)
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pcnt").as("n"))
  }
}
