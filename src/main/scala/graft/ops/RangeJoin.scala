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
      .drop("__bin", "__probe", "__rbin", "__rk")
  }
}
