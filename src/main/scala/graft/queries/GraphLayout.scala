package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

  /** The q51 census over a DIRECTED preference edge frame `topk`
    * (u, w) — u may list w without the reverse. Returns the EAGERLY
    * materialized one-row summary (n_edges, n_wedges, n_triangles,
    * gcc_e6) on the undirected graph {least(u,w), greatest(u,w)}.
    *
    * ONE v-keyed exchange carries the whole census (round-11 rework;
    * the old shape paid a distinct() exchange for edge dedup, this
    * v-keyed exchange for the degree agg, and two more probe-side
    * exchanges for the two triangle join legs). Each DIRECTED row
    * contributes both orientations MAP-SIDE; collect_set dedups the
    * mirrored edge {a,b} picked from both endpoints' lists, so the
    * old distinct() stage folds into this aggregation for free. The
    * sorted neighbor set per vertex yields everything downstream:
    * degree = size(os); the canonical a<b edge list = explode of the
    * higher-neighbor slice (each undirected edge appears exactly
    * once, at its lower endpoint); wedges ride the same rows as
    * sum(d*(d-1)/2). The adjacency is persisted node-sized (for q51's
    * kNN graph m <= 3n by construction) and released before return;
    * the count() is the cache barrier so the two census branches
    * don't race past the still-empty cache and recompute the input
    * pipeline (measured 3x cost in the pre-rework shape).
    *
    * Triangles: for each vertex v, ordered pairs of its HIGHER
    * neighbors are exactly the candidate closings (each triangle
    * a<b<c enumerated once, at v=a, as the pair (b,c)) — fan-out
    * bounded by max degree via the fused orderedPairs kernel — closed
    * by ONE join against the a<b edge list re-derived from the cache.
    * The build side is node-sized; broadcast explicitly while it fits
    * the driver hint budget (with AQE scoped off the planner won't
    * discover the size on its own), shuffle-join fallback on a graph
    * too big to ship (the withinClusterNN budget-gate pattern; both
    * forms are semantically identical). The one-row result is
    * persisted and counted HERE so callers that scope confs (AQE,
    * shuffle partitions) around this method get the execution inside
    * the scope — confs are read at action time.
    *
    * GraphLayoutSpec property-checks this census against the
    * quadratic brute-force definition on random directed graphs. */
  private[graft] def triangleCensus(
      s: SparkSession,
      topk: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val adj = topk
      .select(explode(array(
        struct(col("u").as("v"), col("w").as("o")),
        struct(col("w").as("v"), col("u").as("o")))).as("e"))
      .groupBy(col("e.v").as("v"))
      .agg(sort_array(collect_set(col("e.o"))).as("os"))
      .withColumn("hi", filter(col("os"), o => o > col("v")))
      .persist()
    val nNodes = adj.count()
    // edges + wedges in ONE cached-scan aggregation
    val scal = adj.agg(
      // coalesce: the oracle's n_edges is COUNT(*) over the edges CTE
      // (0 on an empty graph), while sum over zero rows is NULL — the
      // degenerate fixture would hash-mismatch as a phantom engine bug
      // (n_wedges stays a sum on BOTH sides: NULL/NULL agrees)
      expr("coalesce(sum(size(hi)), 0L)").as("n_edges"),
      expr("sum(size(os) * (size(os) - 1) DIV 2)").as("n_wedges"))
    val edgeList = adj.select(col("v").as("a"),
      explode(col("hi")).as("b"))
    val eSide = if (nNodes <= 5000000L) broadcast(edgeList)
                else edgeList
    val tri = adj
      .select(explode(graft.functions.TokenKernelFns.orderedPairs(s,
        col("hi"))).as("p"))
      .join(eSide, col("p.u") === col("a") && col("p.w") === col("b"))
      .agg(count(lit(1)).as("n_triangles"))
    val out = scal.crossJoin(tri)
      .select(col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("3000000 * n_triangles DIV greatest(n_wedges, 1)")
          .as("gcc_e6"))
      .persist()
    out.count()
    adj.unpersist()
    out
  }

  // ---- q45 constants: 3 iterations at scale 1e6 (base = 15% * scale) ----
  private val Iters = 3
  private val Scale = 1000000L
  private val Base = 15L * Scale / 100L

  /** One oracle CTE per PageRank step — the SAME formula string the
    * Scaladoc on [[PageRank.run]] pins, so Spark and DuckDB iterate in
    * lockstep: BIGINT contribution sums; the damping step is integer
    * division (`//` in DuckDB = Spark's `DIV` for non-negative s),
    * exact at all magnitudes — no double rounding anywhere. */
  private def prStepSql(prev: String, cur: String): String =
    s"""$cur AS (
       |                SELECT n.id, CAST($Base +
       |                    85 * COALESCE(c.s, 0) // 100
       |                  AS BIGINT) AS pr
       |                FROM nodes n LEFT JOIN (
       |                  SELECT e.dst, CAST(sum(CAST(floor(r.pr / e.deg)
       |                      AS BIGINT)) AS BIGINT) AS s
       |                  FROM e JOIN $prev r ON e.src = r.id
       |                  GROUP BY e.dst) c ON n.id = c.dst)""".stripMargin

  // ---- q48 constants: 10 bits per dimension, top 5 z-bits = 32 buckets;
  // the bucket shift is DERIVED so changing either constant keeps the
  // Column and SQL forms in lockstep ----
  private val ZBits = 10
  private val ZBuckets = 32 // z in [0, 2^20); bucket = z >> ZShift
  private val ZShift =
    2 * ZBits - (31 - Integer.numberOfLeadingZeros(ZBuckets)) // = 15

  /** Morton interleave of two ZBits-bit non-negative ints: x gets the
    * even bit positions, y the odd. Column form and SQL form generated
    * from the same loop so the engines compute the identical integer. */
  private[graft] def zOrder(x: Column, y: Column): Column =
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
        // broadcast the orders side: projected to two longs it is
        // node-count-sized (~2.4 MB at sf0.1), and the fit session
        // runs AQE-off so the static planner would otherwise
        // sort-merge the edge fill — the single most expensive stage
        // of the whole fit (profiled ~7 s task CPU at sf0.1).
        // SIZE-GATED (round-14 review find): the hint scales linearly
        // with sf, so above 256 MiB of optimizer-estimated projected
        // size it would force a driver collect + per-executor copy
        // that can blow the broadcast limit outright — fall back to
        // the planner's own join choice there.
        val ordersProj = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val ordersSide =
          if (ordersProj.queryExecution.optimizedPlan.stats.sizeInBytes
              < (256L << 20)) broadcast(ordersProj)
          else ordersProj
        val edges = ordersSide
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
          .groupBy(shiftright(col("z"), ZShift).as("bucket"))
          .agg(count(lit(1)).as("n"),
            min("x").as("x_min"), max("x").as("x_max"),
            min("y").as("y_min"), max("y").as("y_max"))
          .orderBy("bucket")
      },
      Some(s"""WITH xy AS (
              SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y
              FROM lineitem),
              zt AS (SELECT x, y, ${zOrderSql("x", "y")} AS z FROM xy)
              SELECT z >> $ZShift AS bucket, count(*) AS n,
                     min(x) AS x_min, max(x) AS x_max,
                     min(y) AS y_min, max(y) AS y_max
              FROM zt GROUP BY 1 ORDER BY 1""")),

    // Q51 — kNN-graph triangle census: build the top-3 co-purchase graph
    // over suppliers (edge a-b if b is among a's 3 strongest partners by
    // shared distinct customers; raw co-occurrence on random-ish data is
    // near-complete, so the top-k sparsification IS the operator that
    // makes triangle counting tractable — m <= 3n edges by construction,
    // the standard kNN-graph move). Then the oriented triangle join:
    // every edge stored a < b, triangles enumerated (a,b)x(b,c)x(a,c) so
    // each counts exactly once and the wedge join never explodes on a
    // hub (max degree is k-bounded). Output: one summary row — edges,
    // wedges, triangles, global clustering coefficient as an exact
    // integer ratio (3e6 * tri DIV wedges).
    Entry("q51_triangles",
      (s, dir) => {
        // census over a 6-month order window (the incremental form a
        // recurring graph job runs; the date predicate pushes down to the
        // orders scan and prunes ~93% before the join) — full-history
        // co-purchase on uniform data is a complete graph, where top-k
        // truncation is arbitrary; the windowed graph has real structure.
        //
        // AQE is scoped OFF for the whole census — on a FitSession
        // clone, so the caller's session (and any concurrent query on
        // it) never sees the toggle (the PageRank/KMeans
        // fit pattern): the chain is 4 fixed
        // exchanges + a one-row summary, and AQE's per-stage
        // materialization turned it into 15 driver round-trip jobs
        // (profiled r11 at sf0.1: 1.45 s AQE vs 0.90 s static with the
        // same physical joins; the distinct-free adjacency rework below
        // then cut the static form to 0.60 s warm — 2.0x the DuckDB
        // oracle). Static shuffle parallelism is scoped to
        // a quarter of the session setting (the heavy stages scan ~600k
        // joined rows — at 8 tasks the per-stage deserialization floor
        // is negligible while the pair explode still fans out; a
        // cluster-sized session conf scales it proportionally). Because
        // confs are read at ACTION time, the one-row result is
        // persisted and counted INSIDE the scope — the caller's later
        // action reads the cache, released by the runner's clearCache.
        val sessPart = s.conf.get("spark.sql.shuffle.partitions").toInt
        val fit = graft.FitSession.aqeOff(s)
        fit.conf.set("spark.sql.shuffle.partitions",
          math.max(2, sessPart / 4).toString)
        // One shuffle then builds each customer's sorted supplier set
        // (collect_set dedups, so no distinct() pre-pass), and ordered
        // pairs (u < w) explode MAP-SIDE — half the rows of the naive
        // self-join and none of its double scan of orders x lineitem
        val lists = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1995-07-01"))
          .join(t(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("v"))
          .groupBy("c").agg(sort_array(collect_set(col("v"))).as("vs"))
        // fused ordered-pair kernel: one flat loop per customer row
        // instead of the interpreted nested-lambda transform/slice form
        // (same pairs, same order; TokenKernelsSpec pins equivalence)
        val half = lists.select(explode(graft.functions.TokenKernelFns
            .orderedPairs(s, col("vs"))).as("p"))
          .groupBy(col("p.u").as("u"), col("p.w").as("w"))
          .agg(count(lit(1)).as("cw"))
        // co-occurrence is symmetric: mirror the u<w counts to get every
        // vertex's full preference list before the per-u top-3 window
        val pairs = half.unionByName(half.select(col("w").as("u"),
          col("u").as("w"), col("cw")))
        val topk = pairs.withColumn("rk",
            row_number().over(Window.partitionBy("u")
              .orderBy(col("cw").desc, col("w").asc)))
          .filter(col("rk") <= 3)
        // the census materializes (persist + count) on the clone, so
        // every census stage plans AQE-off at the scoped parallelism;
        // the rebound one-row result reads the shared cache
        graft.FitSession.rebind(
          triangleCensus(fit, graft.FitSession.rebind(topk, fit)), s)
      },
      Some("""WITH cs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS v
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                  AND o_orderdate < TIMESTAMP '1995-07-01'),
              pairs AS (SELECT a.v AS u, b.v AS w, count(*) AS cw
                        FROM cs a JOIN cs b ON a.c = b.c AND a.v <> b.v
                        GROUP BY 1, 2),
              topk AS (SELECT u, w FROM (
                         SELECT u, w, row_number() OVER (PARTITION BY u
                           ORDER BY cw DESC, w ASC) AS rk FROM pairs)
                       WHERE rk <= 3),
              edges AS (SELECT DISTINCT least(u, w) AS a,
                               greatest(u, w) AS b FROM topk),
              deg AS (SELECT v, count(*) AS d FROM (
                        SELECT a AS v FROM edges
                        UNION ALL SELECT b FROM edges) GROUP BY 1),
              tri AS (SELECT count(*) AS n_tri
                      FROM edges e1 JOIN edges e2 ON e1.b = e2.a
                      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
              SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges)
                       AS n_edges,
                     (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT)
                       FROM deg) AS n_wedges,
                     (SELECT CAST(n_tri AS BIGINT) FROM tri)
                       AS n_triangles,
                     CAST(3000000 * (SELECT n_tri FROM tri)
                       // greatest((SELECT CAST(sum(d * (d - 1) // 2)
                         AS BIGINT) FROM deg), 1) AS BIGINT) AS gcc_e6"""))
  )
}
