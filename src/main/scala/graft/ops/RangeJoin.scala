package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — equi-key + time-band predicate.
  *
  * `left JOIN right ON key AND r.ts IN [l.ts - band, l.ts)` written
  * naively is an inequality join Catalyst can only nested-loop. The
  * scalable form bins both sides into band-width buckets and equi-joins
  * on (key, bin) with the left probing its own bin and the previous one
  * — every candidate pair shares a bin edge, so the shuffle key is
  * (key, bin) and per-pair work is one band check. Work scales with
  * matches + bin co-residents, never |left| x |right|.
  */
object RangeJoin {

  /** For each left row, all right rows with the same key and
    * `l.ts - band <= r.ts < l.ts` (strictly before the left event,
    * within the band). Output: left columns + right `valueCols`
    * (null-extended rows are NOT emitted — inner semantics). */
  def bandJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      bandSeconds: Long, valueCols: Seq[String]): DataFrame = {
    val binL = (unix_timestamp(col(ts)) / bandSeconds).cast("long")
    val l = left.withColumn("__bin", binL)
      // probe this bin and the previous: any r.ts within band of l.ts
      // lives in one of the two
      .withColumn("__probe", explode(array(col("__bin"), col("__bin") - 1)))
    val r = right.select(
      (col(key).as("__rk") +: col(ts).as("__rts") +:
        valueCols.map(c => col(c).as(s"r_$c"))): _*)
      .withColumn("__rbin", (unix_timestamp(col("__rts")) / bandSeconds)
        .cast("long"))
    l.join(r, col(key) === col("__rk") && col("__probe") === col("__rbin") &&
        col("__rts") >= col(ts) - expr(s"INTERVAL $bandSeconds SECONDS") &&
        col("__rts") < col(ts))
      // __rts included: leaking the internal right-timestamp column
      // violated the "left columns + right valueCols" contract (and
      // collided with any left frame owning a __rts of its own)
      .drop("__bin", "__probe", "__rbin", "__rk", "__rts")
  }

  /** Banded INTERVAL-OVERLAP join — both sides are [start, end)
    * intervals in epoch seconds (LongType columns); a pair matches iff
    * `l.start < r.end AND r.start < l.end` on the same key. The naive
    * inequality join is a nested loop; here each interval lands in
    * every `bucketSeconds`-wide bucket it covers (explode over the
    * covered bucket range) and candidates equi-join on (key, bucket).
    * A pair overlapping across several shared buckets would duplicate,
    * so it is emitted ONLY from the FIRST bucket both intervals occupy
    * — `bucket == greatest(floor(ls/W), floor(rs/W))`, an exact
    * arithmetic dedup with no distinct() pass.
    *
    * Scale: shuffle key is (key, bucket); per-interval fan-out is
    * `len/W + 1` buckets, so choose W near the typical interval length
    * (fan-out ~2) — work scales with candidates sharing a bucket,
    * never |L| x |R|. Output: left columns + right `valueCols`
    * (inner semantics). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, key: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketSeconds: Long, valueCols: Seq[String]): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    def b(c: Column): Column = floor(c / bucketSeconds).cast("long")
    // [s, e) covers buckets floor(s/W) .. floor((e-1)/W) (half-open end:
    // an interval ending exactly on a boundary does NOT enter that bucket)
    // Empty/inverted intervals (end <= start) can never satisfy the
    // symmetric overlap predicate — drop them BEFORE the bucket explode:
    // sequence(lo, hi) with hi < lo would otherwise generate a DESCENDING
    // bucket range, fanning a malformed row out |delta| times (or
    // throwing on huge deltas) instead of producing no candidates.
    val l = left.filter(col(lEnd) > col(lStart))
      .withColumn("__lb0", b(col(lStart)))
      .withColumn("__b", explode(sequence(col("__lb0"),
        b(col(lEnd) - 1))))
    val r = right.filter(col(rEnd) > col(rStart)).select(
      (col(key).as("__rk") +: col(rStart).as("__rs") +:
        col(rEnd).as("__re") +:
        valueCols.map(c => col(c).as(s"r_$c"))): _*)
      .withColumn("__rb0", b(col("__rs")))
      .withColumn("__b", explode(sequence(col("__rb0"),
        b(col("__re") - 1))))
    l.join(r, col(key) === col("__rk") && l("__b") === r("__b") &&
        col(lStart) < col("__re") && col("__rs") < col(lEnd) &&
        l("__b") === greatest(col("__lb0"), col("__rb0")))
      .drop("__b", "__lb0", "__rb0", "__rk", "__rs", "__re")
  }
}
