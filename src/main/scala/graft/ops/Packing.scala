package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — assign documents to fixed-capacity training bins
  * (greedy next-fit in deterministic order), the step that turns a
  * cleaned corpus into fixed-length pretraining examples. No reference
  * counterpart (the reference trains on per-row feature vectors);
  * first-class here because a 100 TB text pipeline ends in exactly this
  * operator.
  *
  * Semantics (deterministic): within each shard, documents in ascending
  * id order; a document opens a new bin when the current bin is
  * non-empty and adding it would exceed `capacity`. A document larger
  * than the capacity gets a bin of its own. Bin ids are 0-based per
  * shard.
  *
  * Scale shape: `repartition(shard)` + `sortWithinPartitions(shard, id)`
  * + ONE sequential `mapPartitions` pass folding the running token
  * count. Parallelism = shards, no driver involvement, output linear in
  * documents. The fold resets at every shard boundary, so bin ids are a
  * pure function of (shard, order, token counts) — independent of how
  * shards co-reside in partitions. This per-partition sequential fold
  * is the documented exception to the no-imperative-code rule: next-fit
  * is order-carrying by definition (each decision depends on the
  * running fill), so no window/aggregate composition expresses it.
  */
object Packing {

  /** @param docs     input frame
    * @param shardCol grouping column (fold resets per shard)
    * @param idCol    LONG id giving the deterministic order within shard
    * @param tokCol   integral token count per document
    * @return (shard, doc, toks, bin)
    */
  def nextFitPack(spark: SparkSession, docs: DataFrame, shardCol: String,
      idCol: String, tokCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    import spark.implicits._
    docs
      .select(col(shardCol).cast("string").as("shard"),
        col(idCol).cast("long").as("doc"),
        col(tokCol).cast("long").as("toks"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var shard: String = null
        var bin = 0L
        var fill = 0L
        it.map { case (s, d, t) =>
          if (s != shard) { shard = s; bin = 0L; fill = 0L }
          else if (fill > 0 && fill + t > capacity) { bin += 1; fill = 0L }
          fill += t
          (s, d, t, bin)
        }
      }
      .toDF("shard", "doc", "toks", "bin")
  }

  /** Per-bin packing summary: documents per bin, fill, utilization
    * (fill/capacity rounded to 4dp). One hash aggregation over the
    * linear assignment frame. */
  def packStats(assignments: DataFrame, capacity: Long): DataFrame =
    assignments.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("fill"))
      .withColumn("util",
        round(col("fill") / lit(capacity.toDouble), 4))
}
