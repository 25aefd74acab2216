package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}
import graft.ops.PageRank
import graft.sources.Tables

/** Round-5 graph analytics + physical-layout operators:
  *
  *  - q45: fixed-iteration integer-exact PageRank ([[graft.ops.PageRank]])
  *    over the customer->supplier->nation->region link graph — iterative
  *    joins, oracle-replayed in DuckDB as chained CTEs;
  *  - q48: Z-order (Morton) space-filling-curve layout stats — the
  *    multi-dimensional clustering key a 100 TB table lays files out by
  *    so min/max row-group stats prune BOTH join/filter dimensions; the
  *    query derives the curve buckets and emits per-bucket bounding
  *    boxes, which is exactly the data-skipping evidence a layout job
  *    validates. Pure integer bit arithmetic -> identical in any engine.
  */
object GraphLayout {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // ---- q45 constants: 3 iterations at scale 1e6 (base = 15% * scale) ----
  private val Iters = 3
  private val Scale = 1000000L
  private val Base = 15L * Scale / 100L

  /** One oracle CTE per PageRank step — the SAME formula string the
    * Scaladoc on [[PageRank.run]] pins, so Spark and DuckDB iterate in
    * lockstep: BIGINT contribution sums, IEEE floor-division everywhere. */
  private def prStepSql(prev: String, cur: String): String =
    s"""$cur AS (
       |                SELECT n.id, CAST($Base + CAST(floor(
       |                    85 * COALESCE(c.s, 0) / 100.0) AS BIGINT)
       |                  AS BIGINT) AS pr
       |                FROM nodes n LEFT JOIN (
       |                  SELECT e.dst, CAST(sum(CAST(floor(r.pr / e.deg)
       |                      AS BIGINT)) AS BIGINT) AS s
       |                  FROM e JOIN $prev r ON e.src = r.id
       |                  GROUP BY e.dst) c ON n.id = c.dst)""".stripMargin

  // ---- q48 constants: 10 bits per dimension, top 5 z-bits = 32 buckets ----
  private val ZBits = 10
  private val ZBuckets = 32 // z in [0, 2^20); bucket = z >> 15

  /** Morton interleave of two ZBits-bit non-negative ints: x gets the
    * even bit positions, y the odd. Column form and SQL form generated
    * from the same loop so the engines compute the identical integer. */
  private def zOrder(x: Column, y: Column): Column =
    (0 until ZBits).map { j =>
      shiftleft(shiftright(x, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(y, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)

  private def zOrderSql(x: String, y: String): String =
    (0 until ZBits).map { j =>
      s"((($x >> $j) & 1) << ${2 * j}) + ((($y >> $j) & 1) << ${2 * j + 1})"
    }.mkString(" + ")

  val entries: Seq[Entry] = Seq(

    // Q45 — PageRank, 3 integer-exact damped iterations over the
    // heterogeneous link graph customer -> supplier (distinct order
    // lines) -> nation -> region, node ids disambiguated into one key
    // space by tag bits (id*4 + level). Per iteration: one shuffle on
    // src, one on dst — never a cross product; edges+degrees persist
    // once. The oracle replays all 3 steps as chained CTEs.
    Entry("q45_pagerank",
      (s, dir) => {
        val edges = t(s, dir, "orders")
          .join(t(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 4).cast("long").as("src"),
            (col("l_suppkey") * 4 + 1).cast("long").as("dst"))
          .distinct()
          .union(t(s, dir, "supplier").select(
            (col("s_suppkey") * 4 + 1).cast("long").as("src"),
            (col("s_nationkey") * 4 + 2).cast("long").as("dst")))
          .union(t(s, dir, "nation").select(
            (col("n_nationkey") * 4 + 2).cast("long").as("src"),
            (col("n_regionkey") * 4 + 3).cast("long").as("dst")))
        PageRank.run(edges, Iters, Scale).orderBy("id")
      },
      Some(s"""WITH edges AS (
              SELECT DISTINCT CAST(o_custkey*4 AS BIGINT) AS src,
                     CAST(l_suppkey*4+1 AS BIGINT) AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              UNION
              SELECT CAST(s_suppkey*4+1 AS BIGINT),
                     CAST(s_nationkey*4+2 AS BIGINT) FROM supplier
              UNION
              SELECT CAST(n_nationkey*4+2 AS BIGINT),
                     CAST(n_regionkey*4+3 AS BIGINT) FROM nation),
              nodes AS (SELECT src AS id FROM edges
                        UNION SELECT dst FROM edges),
              deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
              e AS (SELECT edges.src, edges.dst, deg.deg
                    FROM edges JOIN deg ON edges.src = deg.src),
              r0 AS (SELECT id, CAST($Scale AS BIGINT) AS pr FROM nodes),
              ${(1 to Iters).map(i => prStepSql(s"r${i - 1}", s"r$i"))
                .mkString(",\n              ")}
              SELECT id, pr FROM r$Iters ORDER BY id""")),

    // Q48 — Z-order layout audit: interleave (l_partkey % 1024,
    // l_suppkey % 1024) into a 20-bit Morton code, bucket rows by the
    // top 5 curve bits (the "file" a layout job would write), and emit
    // each bucket's bounding box. The bounded per-bucket x/y ranges ARE
    // the data-skipping property (a scan filtered on either dimension
    // prunes most buckets by min/max stats alone — single-column sorts
    // only give it for the leading column). One aggregation, no sort
    // before the 32-row contract ORDER BY.
    Entry("q48_zorder",
      (s, dir) => {
        val x = pmod(col("l_partkey"), lit(1024L))
        val y = pmod(col("l_suppkey"), lit(1024L))
        t(s, dir, "lineitem")
          .select(x.as("x"), y.as("y"))
          .withColumn("z", zOrder(col("x"), col("y")))
          .groupBy(shiftright(col("z"), 15).as("bucket"))
          .agg(count(lit(1)).as("n"),
            min("x").as("x_min"), max("x").as("x_max"),
            min("y").as("y_min"), max("y").as("y_max"))
          .orderBy("bucket")
      },
      Some(s"""WITH xy AS (
              SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y
              FROM lineitem),
              zt AS (SELECT x, y, ${zOrderSql("x", "y")} AS z FROM xy)
              SELECT z >> 15 AS bucket, count(*) AS n,
                     min(x) AS x_min, max(x) AS x_max,
                     min(y) AS y_min, max(y) AS y_max
              FROM zt GROUP BY 1 ORDER BY 1"""))
  )
}
