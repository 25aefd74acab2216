package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Round-3 analytic surface extensions: distribution window functions,
  * correlation/covariance aggregates, explicit grouping sets, unpivot
  * (melt), correlated/scalar/IN subqueries via the SQL entry point, and
  * source/sink roundtrips (CSV with header+inferSchema — the reference's
  * S1 read semantics, `main.py:34-41` — JSON lines, and a partitioned
  * parquet sink with a partition-pruned read-back).
  *
  * Scale notes: the window queries sort within `o_custkey` partitions
  * (one shuffle, no global sort before the final ORDER BY); grouping
  * sets expand in the aggregate exchange, not the scan; the partitioned
  * sink writes one directory per `l_returnflag` so the read-back filter
  * prunes 2/3 of the files before any IO.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Scratch dir per (query, sf-dir, JVM) for sink roundtrips. The
    * applicationId segment keeps concurrent JVMs (Bench + Verify run
    * side by side, and parallel spec suites execute every registry
    * entry) from overwriting a directory another JVM is mid-read on.
    * Because each JVM now gets fresh paths, mode("overwrite") no longer
    * bounds disk use — a shutdown hook deletes this JVM's dirs on exit
    * (they hold full table copies; leaking them would grow /tmp by
    * hundreds of MB per round). */
  private val createdScratch =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val cleanupHook: Unit = {
    sys.addShutdownHook {
      createdScratch.forEach { p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      }
    }
    ()
  }
  private def scratch(s: SparkSession, name: String, dir: String): String = {
    val p = s"/tmp/graft_q/$name/${new java.io.File(dir).getName}/${s.sparkContext.applicationId}"
    cleanupHook
    createdScratch.add(p)
    p
  }

  /** q35's bucketed table names and data path, shared with the specs so
    * a rename can't silently desynchronize them. The path carries the
    * JVM's application id: two concurrent JVMs (Bench + Verify) each
    * build their own bucketed copy instead of racing on one directory —
    * within a session the write still happens exactly once. */
  def q35Tables(s: SparkSession, dir: String): (String, String, String) = {
    // suffix carries a hash of the FULL fixture path, not just the
    // basename: /a/sf0.1 and /b/sf0.1 share a basename, and keying on
    // it alone made the second invocation's tableExists check reuse the
    // FIRST fixture's bucketed copy — a silent wrong-corpus join
    // (review find). The readable basename stays for debuggability.
    val canon = new java.io.File(dir).getCanonicalPath
    val sfx = new java.io.File(dir).getName.replace(".", "_") + "_" +
      java.lang.Integer.toHexString(canon.hashCode)
    (s"q35_li_$sfx", s"q35_o_$sfx",
      s"${scratch(s, "q35_buckets", dir)}")
  }

  val entries: Seq[Entry] = Seq(

    // Q10b — distribution window functions: ntile / percent_rank /
    // cume_dist / first / last / nth over a totally ordered per-customer
    // window (price desc, orderkey tiebreak → deterministic across
    // engines; pct values are exact IEEE divisions of small ints).
    Entry("q10b_window_fns",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        val wFull = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            ntile(4).over(w).cast("long").as("tile"),
            round(percent_rank().over(w), 4).as("pct_rank"),
            round(cume_dist().over(w), 4).as("cdist"),
            first(col("o_orderkey")).over(w).as("first_ok"),
            last(col("o_orderkey")).over(wFull).as("last_ok"),
            nth_value(col("o_orderkey"), 2).over(wFull).as("second_ok"))
      },
      Some("""SELECT o_orderkey, o_custkey,
                     ntile(4) OVER w AS tile,
                     round(percent_rank() OVER w, 4) AS pct_rank,
                     round(cume_dist() OVER w, 4) AS cdist,
                     first_value(o_orderkey) OVER w AS first_ok,
                     last_value(o_orderkey) OVER
                       (w ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS last_ok,
                     nth_value(o_orderkey, 2) OVER
                       (w ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS second_ok
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC)
              ORDER BY o_orderkey""")),

    // Q17e — correlation + covariance CO-MOMENTS per return flag (the
    // bivariate side of the E5 summarizer semantics). corr is safe to
    // round-and-hash (its sqrt denominator is irrational, so the true
    // value never sits on a rounding half-boundary); raw covariances
    // are ratios of 2-decimal data and CAN — so the oracle gates the
    // co-moment sums instead, and AnalyticsSpec asserts Spark's
    // covar_samp/covar_pop equal the co-moment formulas.
    Entry("q17e_corr",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(corr("l_quantity", "l_extendedprice"), 4).as("r"),
          round(sum(col("l_quantity") * col("l_extendedprice")), 2)
            .as("cm_xy"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
                     round(corr(l_quantity, l_extendedprice), 4) AS r,
                     round(sum(l_quantity * l_extendedprice), 2) AS cm_xy,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS sum_qty,
                     round(sum(l_extendedprice), 2) AS sum_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Q29 — explicit GROUPING SETS (beyond rollup/cube: an arbitrary
    // set list — here (region, nation), (nation), ()) over the
    // broadcast star join. Spark 4's Dataset.groupingSets API.
    Entry("q29_grouping_sets",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupingSets(
          Seq(Seq(col("r_name"), col("n_name")), Seq(col("n_name")), Seq()),
          col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum("c_acctbal"), 4).as("acctbal"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name")),
      Some("""SELECT r_name, n_name, count(*) AS n_cust,
                     round(sum(c_acctbal), 4) AS acctbal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY GROUPING SETS ((r_name, n_name), (n_name), ())
              ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")),

    // Q30 — unpivot/melt: wide part metrics to (key, metric, value)
    // long form. Oracle uses the UNION ALL expansion (same semantics,
    // no dialect-specific UNPIVOT syntax).
    Entry("q30_unpivot",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "value")
        .select(col("p_partkey"), col("metric"),
          round(col("value"), 4).as("value"))
        .orderBy("p_partkey", "metric"),
      Some("""SELECT p_partkey, 'p_size' AS metric,
                     round(CAST(p_size AS DOUBLE), 4) AS value FROM part
              UNION ALL
              SELECT p_partkey, 'p_retailprice' AS metric,
                     round(p_retailprice, 4) AS value FROM part
              ORDER BY p_partkey, metric""")),

    // Q31 — subquery surface through the SQL entry point: correlated
    // EXISTS, scalar subquery, and IN-subquery in one predicate.
    Entry("q31_subqueries",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("q31_customer")
        t(s, dir, "orders").createOrReplaceTempView("q31_orders")
        t(s, dir, "nation").createOrReplaceTempView("q31_nation")
        s.sql("""SELECT c_custkey, round(c_acctbal, 4) AS acctbal
                 FROM q31_customer c
                 WHERE c_acctbal > (SELECT avg(c_acctbal) FROM q31_customer)
                   AND c_nationkey IN (SELECT n_nationkey FROM q31_nation
                                       WHERE n_regionkey <= 2)
                   AND EXISTS (SELECT 1 FROM q31_orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_totalprice > 150000)
                 ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, round(c_acctbal, 4) AS acctbal
              FROM customer c
              WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
                AND c_nationkey IN (SELECT n_nationkey FROM nation
                                    WHERE n_regionkey <= 2)
                AND EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_totalprice > 150000)
              ORDER BY c_custkey""")),

    // Q32 — salted skew join through the oracle gate: the explicit
    // skew-mitigation rewrite (ops.Skew.saltedJoin — salt on the fact
    // side, replicate the other side saltFactor times) must produce
    // results identical to the plain equi-join the oracle runs. Float
    // sums are made order-safe by comparing (n, sum(int qty)).
    Entry("q32_salted_join",
      (s, dir) => graft.ops.Skew.saltedJoin(
        t(s, dir, "lineitem"), t(s, dir, "orders"),
        "l_orderkey", "o_orderkey", 4)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Q35 — bucketed zero-exchange join through the oracle gate: both
    // fact tables are written ONCE bucketed+sorted on the join key, and
    // the join then runs with no shuffle exchange at all (the property
    // ScaleSpec asserts on the plan; this entry proves the RESULT is
    // identical to the plain join the oracle runs). At 100 TB this is
    // the difference between re-shuffling a fact table per query and
    // never shuffling it again.
    Entry("q35_bucketed_join",
      (s, dir) => {
        val (liTable, oTable, base) = q35Tables(s, dir)
        // write-once semantics — the whole point of bucketing is that
        // the shuffle is paid at write time ONCE and every later join
        // reuses it, so re-invocations skip the rewrite
        if (!s.catalog.tableExists(liTable))
          graft.ops.Bucketing.writeBucketed(t(s, dir, "lineitem"),
            liTable, s"$base/li", "l_orderkey", 8)
        if (!s.catalog.tableExists(oTable))
          graft.ops.Bucketing.writeBucketed(t(s, dir, "orders"),
            oTable, s"$base/o", "o_orderkey", 8)
        s.table(liTable)
          .join(s.table(oTable),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("qty"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Q33 — mergeable HLL sketch, two-level: per-(priority, status)
    // register tables (bucket → max rank over the md5-derived hash),
    // MAX-merged up to priority level — the pre-aggregated sketch-table
    // pattern that replaces exact count-distinct at 100 TB (registers
    // merge associatively by elementwise max, so daily partials roll up
    // without re-reading raw data; the two groupBys below ARE that
    // merge). The hash is the portable md5 word (PortableHash), the
    // estimator HyperLogLog's harmonic mean with the small-range
    // linear-counting branch (Flajolet 2007): every term 2^-reg is an
    // exact power of two, so the bucket sum is EXACT in IEEE double
    // regardless of order and DuckDB replays the estimate bit-for-bit
    // at the rounded precision → full hash oracle. Spark's DataSketches
    // builtins (hll_sketch_agg/hll_union_agg) are the drop-in
    // engine-native alternative, pinned against this estimator in
    // SketchSpec. m = 256 buckets: ±6.5% rse, registers are 256 bytes
    // per group.
    Entry("q33_hll_distinct",
      (s, dir) => {
        import graft.functions.PortableHash
        val h = PortableHash.md5w(col("o_custkey"))
        val v = shiftrightunsigned(h, 8) // 24 rank bits above the bucket
        // no spread(): A/B-measured a clear LOSS at sf0.1 (0.57 ->
        // 1.0+ s) — the 32-task md5 stage pays ~0.1 s fixed per task,
        // far more than the single-task register hash costs
        val staged = t(s, dir, "orders").select(
          col("o_orderpriority"), col("o_orderstatus"),
          h.bitwiseAND(255L).as("bucket"),
          when(v === 0, 25).otherwise(lit(25) - length(bin(v))).as("rank"))
        staged
          .groupBy("o_orderpriority", "o_orderstatus", "bucket")
          .agg(max("rank").as("reg"))
          .groupBy("o_orderpriority", "bucket")
          .agg(max("reg").as("reg"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("nb"),
            // 2^-reg via an integer shift (the functions-API shiftleft
            // only takes a literal count; the SQL form shifts by a
            // column) — every term an exact power of two, so the sum
            // is order-independent and engine-exact
            sum(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), reg)")
              .cast("double")).as("snon"))
          .select(col("o_orderpriority"),
            ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)))
              * lit(65536.0)
              / (lit(256.0) - col("nb").cast("double") + col("snon")))
              .as("raw"),
            (lit(256) - col("nb")).as("v"))
          // Flajolet's small-range branch: raw <= 2.5m with empty
          // buckets → linear counting m*ln(m/V) (the raw harmonic mean
          // overshoots ~2x at low fill — SketchSpec's sf0.001 case).
          // ln() differs across libms only in the last ulp; at round-2
          // that cannot move the printed value (the branch PREDICATE
          // compares exact-deterministic doubles, so both engines take
          // the same branch).
          .select(col("o_orderpriority"),
            round(when(col("raw") <= 640.0 && col("v") > 0,
              lit(256.0) * log(lit(256.0) / col("v").cast("double")))
              .otherwise(col("raw")), 2).as("approx_custs"))
          .orderBy("o_orderpriority")
      },
      Some(s"""WITH st AS (
                SELECT o_orderpriority, o_orderstatus,
                       h & 255 AS bucket,
                       CASE WHEN h >> 8 = 0 THEN 25
                            ELSE 25 - length(bin(h >> 8)) END AS rank
                FROM (SELECT o_orderpriority, o_orderstatus,
                        ${graft.functions.PortableHash.md5wSql("o_custkey")}
                          AS h
                      FROM orders)),
              l1 AS (SELECT o_orderpriority, o_orderstatus, bucket,
                            max(rank) AS reg
                     FROM st GROUP BY 1, 2, 3),
              l2 AS (SELECT o_orderpriority, bucket, max(reg) AS reg
                     FROM l1 GROUP BY 1, 2),
              e AS (SELECT o_orderpriority, count(*) AS nb,
                           sum(1.0 / (CAST(1 AS BIGINT) << reg)) AS snon
                    FROM l2 GROUP BY 1),
              r AS (SELECT o_orderpriority,
                           (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                             / (256.0 - nb + snon) AS raw,
                           256 - nb AS v
                    FROM e)
              SELECT o_orderpriority,
                     round(CASE WHEN raw <= 640.0 AND v > 0
                           THEN 256.0 * ln(256.0 / v)
                           ELSE raw END, 2) AS approx_custs
              FROM r ORDER BY o_orderpriority""")),

    // Q34 — approximate quantiles per return flag from a FIXED-GRID
    // histogram sketch: 1024 buckets over the l_extendedprice domain,
    // built in one hash aggregation; the quantile is read off the
    // cumulative histogram with linear interpolation inside the
    // crossing bucket. Grids merge by elementwise ADDITION (same
    // daily-partial rollup algebra as q33/q44), the estimate is a
    // handful of IEEE-deterministic double ops → full hash oracle,
    // error is bounded by one bucket width (~102: SketchSpec brackets
    // it against the exact percentile). Spark's percentile_approx
    // (Greenwald-Khanna) is the engine-native alternative when the
    // domain is unknown a priori; the fixed grid is what a 100 TB
    // pipeline with known value ranges ships — cheaper, mergeable, and
    // engine-portable.
    Entry("q34_approx_quantile",
      (s, dir) => {
        val B = 1024
        val lo = 900.0
        val hi = 105000.0
        val x = col("l_extendedprice").cast("double")
        val bucket = least(greatest(
          floor((x - lit(lo)) / lit(hi - lo) * lit(B.toDouble)), lit(0.0)),
          lit((B - 1).toDouble)).cast("long")
        val hist = t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), bucket.as("bucket"))
          .agg(count(lit(1)).as("c"))
        val cum = hist
          .withColumn("cum", sum("c").over(Window
            .partitionBy("l_returnflag").orderBy("bucket")))
          .withColumn("n", sum("c").over(Window
            .partitionBy("l_returnflag")))
        // one pass for both quantiles: the crossing-bucket estimate as
        // a conditional aggregate per q, instead of two filtered
        // subframes whose join would recompute the histogram scan
        def est(q: Double) = {
          val target = ceil(lit(q) * col("n").cast("double"))
          val crossing = col("cum") >= target &&
            (col("cum") - col("c")) < target
          round(max(when(crossing,
            lit(lo) + (col("bucket").cast("double")
              + (target.cast("double")
                - (col("cum") - col("c")).cast("double"))
                / col("c").cast("double"))
              * lit((hi - lo) / B))), 4)
        }
        cum.groupBy("l_returnflag")
          .agg(est(0.5).as("p50"), est(0.95).as("p95"))
          .orderBy("l_returnflag")
      },
      Some("""WITH h AS (
                SELECT l_returnflag,
                       CAST(least(greatest(floor(
                           (CAST(l_extendedprice AS DOUBLE) - 900.0)
                           / (105000.0 - 900.0) * 1024.0), 0.0), 1023.0)
                         AS BIGINT) AS bucket,
                       count(*) AS c
                FROM lineitem GROUP BY 1, 2),
              cum AS (
                SELECT l_returnflag, bucket, c,
                       sum(c) OVER (PARTITION BY l_returnflag
                         ORDER BY bucket) AS cum,
                       sum(c) OVER (PARTITION BY l_returnflag) AS n
                FROM h),
              p50 AS (
                SELECT l_returnflag,
                       round(900.0 + (bucket + (ceil(0.5 * n) - (cum - c))
                         / c) * ((105000.0 - 900.0) / 1024), 4) AS p50
                FROM cum WHERE cum >= ceil(0.5 * n)
                           AND cum - c < ceil(0.5 * n)),
              p95 AS (
                SELECT l_returnflag,
                       round(900.0 + (bucket + (ceil(0.95 * n) - (cum - c))
                         / c) * ((105000.0 - 900.0) / 1024), 4) AS p95
                FROM cum WHERE cum >= ceil(0.95 * n)
                           AND cum - c < ceil(0.95 * n))
              SELECT p50.l_returnflag, p50.p50, p95.p95
              FROM p50 JOIN p95 USING (l_returnflag)
              ORDER BY l_returnflag""")),

    // Q44 — Count-Min frequency sketch (graft.functions.CountMinAgg,
    // the third mergeable-sketch family next to HLL q33 and quantiles
    // q34): ONE depth-4 x width-256 grid over o_orderpriority, then
    // each distinct priority's point estimate (min over rows) beside
    // its exact count. Over-count-only by construction: est >= exact
    // always, equal here because 5 keys cannot collide across 4 rows
    // of 256 slots (bounds asserted in CountMinAggSpec). The grid runs
    // the md5-affine PORTABLE family, so DuckDB rebuilds the sketch
    // cell-for-cell → full hash oracle (the xxhash64 family remains the
    // engine-internal default of count_min_agg). At 100 TB the sketch
    // is the pre-aggregated daily-partial pattern — grids merge by
    // elementwise addition, so rollups never re-read raw data.
    Entry("q44_cms_freq",
      (s, dir) => {
        val d = 4
        val wdt = 256
        val orders = t(s, dir, "orders")
        val sk = orders.agg(graft.functions.CountMinAgg.countMinAggPortable(
          s, col("o_orderpriority"), d, wdt).as("sk"))
        orders.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("exact"))
          .crossJoin(broadcast(sk))
          .select(col("o_orderpriority"), col("exact"),
            graft.functions.CountMinAgg.estimatePortable(col("sk"),
              col("o_orderpriority"), d, wdt).as("est"))
          .withColumn("overcount", col("est") - col("exact"))
          .orderBy("o_orderpriority")
      },
      Some {
        import graft.functions.PortableHash
        val aL = (0 until 4).map(PortableHash.a).mkString("[", ",", "]")
        val bL = (0 until 4).map(PortableHash.b).mkString("[", ",", "]")
        val w = PortableHash.md5wSql("o_orderpriority")
        s"""WITH g AS (
              SELECT i, ($aL[i + 1] * ($w % ${PortableHash.M})
                         + $bL[i + 1]) % ${PortableHash.P} % 256 AS slot,
                     count(*) AS cnt
              FROM orders CROSS JOIN range(0, 4) s(i) GROUP BY 1, 2),
            keys AS (SELECT o_orderpriority, count(*) AS exact
                     FROM orders GROUP BY 1)
            SELECT k.o_orderpriority, k.exact, min(g.cnt) AS est,
                   min(g.cnt) - k.exact AS overcount
            FROM keys k CROSS JOIN range(0, 4) s(i)
            JOIN g ON g.i = s.i
                  AND g.slot = ($aL[s.i + 1]
                    * (${PortableHash.md5wSql("k.o_orderpriority")}
                       % ${PortableHash.M})
                    + $bL[s.i + 1]) % ${PortableHash.P} % 256
            GROUP BY 1, 2 ORDER BY 1"""
      }),

    // S1 — CSV sink + source roundtrip with the reference's exact read
    // options (header=true, inferSchema=true → the two-pass scan,
    // main.py:34-41), then an aggregation over the re-read table.
    Entry("s1_csv_roundtrip",
      (s, dir) => {
        val tmp = scratch(s, "s1_csv", dir)
        t(s, dir, "nation").write.mode("overwrite")
          .option("header", "true").csv(tmp)
        s.read.option("header", "true").option("inferSchema", "true")
          .csv(tmp)
          .groupBy(col("n_regionkey").cast("long").as("region"))
          .agg(count(lit(1)).as("n"), min("n_name").as("first_nation"))
          .orderBy("region")
      },
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS region, count(*) AS n,
                     min(n_name) AS first_nation
              FROM nation GROUP BY region ORDER BY region""")),

    // S2 — JSON-lines sink + source roundtrip (schema re-inferred from
    // the JSON values on read), aggregated per event type.
    Entry("s2_jsonl_roundtrip",
      (s, dir) => {
        val tmp = scratch(s, "s2_jsonl", dir)
        // spread: the single-row-group input would otherwise serialize
        // BOTH the JSON write and the read-back schema-inference pass
        // (inference parallelizes per file) onto one core
        Tables.spread(t(s, dir, "events")
          .select("event_id", "user_id", "event_type", "value"))
          .write.mode("overwrite").json(tmp)
        s.read.json(tmp)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
                     round(sum(value), 4) AS total
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // W1 — partitioned parquet sink: write lineitem partitioned by
    // l_returnflag, read back with a partition-pruned filter (the 'R'
    // directory only — verified via PushedFilters/partition pruning in
    // AnalyticsSpec) and aggregate by line status.
    Entry("w1_partitioned_sink",
      (s, dir) => {
        val tmp = scratch(s, "w1_part", dir)
        // Salted repartition ON the partition column before the write —
        // the standard partitioned-write recipe at any scale: without
        // it every input task opens one file per partition value
        // (tasks x values small files at 100 TB), and here the
        // single-row-group input would serialize the whole write into
        // ONE task. (values x salt) bounds the file count while giving
        // the writer full parallelism (measured 1.5s -> ~0.7s at sf0.1).
        // Explicit N: AQE coalesces a no-N expression-repartition by
        // SIZE, which on this frame re-serializes the write into 1-2
        // tasks — the very thing the repartition exists to prevent.
        t(s, dir, "lineitem")
          .repartition(24, col("l_returnflag"),
            pmod(xxhash64(col("l_orderkey")), lit(8)))
          .write.mode("overwrite").partitionBy("l_returnflag").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("l_returnflag") === "R")
          .groupBy("l_linestatus")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("qty"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus, count(*) AS n,
                     round(sum(l_quantity), 4) AS qty
              FROM lineitem WHERE l_returnflag = 'R'
              GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // A-pivot — wide-form pivot (the inverse of q30's unpivot): one
    // column per l_linestatus value, sum(l_quantity) cells. Spark's
    // pivot with an EXPLICIT value list compiles to a single hash
    // aggregate of conditional sums — no extra pass to discover values
    // (an implicit pivot runs a distinct() job first; at 100 TB the
    // value list should always be declared). Cells are exact-integer
    // double sums (l_quantity is integral), so the hash gate is safe.
    Entry("q46_pivot",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum("l_quantity"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     sum(CASE WHEN l_linestatus = 'F'
                         THEN l_quantity END) AS "F",
                     sum(CASE WHEN l_linestatus = 'O'
                         THEN l_quantity END) AS "O"
              FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // A-pct — EXACT grouped percentiles (q34 is the approx/sketch form;
    // this is the precise complement): quartiles of l_quantity per
    // return flag. Both engines implement the R-7 linear-interpolation
    // quantile with index p*(n-1); the probe points are binary-exact
    // fractions (.25/.5/.75) over integral data, so every interpolated
    // value is an exact quarter-integer and floor(4*q) is hash-stable
    // (the round() half-boundary dodge, in quarters). Spark plans one
    // sort-based aggregate per group — the exact form shuffles all
    // values (that is the price of exactness; q34's KLL sketch is the
    // 100 TB default, this the small-group verifier).
    Entry("q47_percentile",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
            .as("qs"))
        .select(col("l_returnflag"), col("n"),
          floor(element_at(col("qs"), 1) * 4).cast("long").as("q1_x4"),
          floor(element_at(col("qs"), 2) * 4).cast("long").as("q2_x4"),
          floor(element_at(col("qs"), 3) * 4).cast("long").as("q3_x4"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
                     CAST(floor(quantile_cont(l_quantity, 0.25) * 4)
                       AS BIGINT) AS q1_x4,
                     CAST(floor(quantile_cont(l_quantity, 0.5) * 4)
                       AS BIGINT) AS q2_x4,
                     CAST(floor(quantile_cont(l_quantity, 0.75) * 4)
                       AS BIGINT) AS q3_x4
              FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // S3 — ORC sink + source roundtrip (the third columnar wire format
    // beside parquet/CSV/JSONL; Spark's ORC reader keeps predicate
    // pushdown and column pruning like parquet, so a user switching
    // storage formats loses no plan quality). The oracle reads the
    // ORIGINAL parquet — what the roundtrip must preserve.
    Entry("s3_orc_roundtrip",
      (s, dir) => {
        val tmp = scratch(s, "s3_orc", dir)
        t(s, dir, "supplier").write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .groupBy(col("s_nationkey").cast("long").as("nation"))
          .agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 4).as("bal"))
          .orderBy("nation")
      },
      Some("""SELECT CAST(s_nationkey AS BIGINT) AS nation, count(*) AS n,
                     round(sum(s_acctbal), 4) AS bal
              FROM supplier GROUP BY nation ORDER BY nation""")),

    // A-dedup-latest — CDC-style keep-latest-per-key dedup: one row per
    // (user_id, event_type), the most recent event winning, event_id as
    // the total-order tie-break (two events can share a timestamp; a
    // nondeterministic winner would flap the hash gate AND a real
    // pipeline's output). One shuffle on the dedup key, rank computed
    // inside each partition — the upsert-compaction primitive every
    // incremental ingest needs. row_number (not max ts + join-back)
    // keeps it a single pass.
    Entry("q49_window_dedup",
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"),
            round(col("value"), 4).as("value"))
      },
      Some("""SELECT user_id, event_type, event_id,
                     round(value, 4) AS value
              FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id, event_type
                      -- microsecond truncation mirrors the engine's ts
                      -- (micros fixtures read as-is; nanos fixtures get
                      -- div 1000): two events inside the same
                      -- microsecond must TIE in both engines so the
                      -- event_id tie-break decides identically
                      ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC)
                      AS rn
                    FROM events)
              WHERE rn = 1 ORDER BY user_id, event_type""")),

    // Q62 — MERGE/upsert apply (Delta-style WHEN MATCHED semantics):
    // a deterministic change batch (D/U/I ops derived from the key) is
    // merged into a base table — matched-U updates, matched-D deletes,
    // unmatched-I inserts, matched-I and unmatched-U/D are no-ops.
    // Completes the incremental-ingest family (q49 keep-latest
    // compaction, x21 batch-dedup decisions) with the lakehouse
    // CDC-apply step itself; the emitted `action` column makes every
    // merge decision hash-gated, not just the surviving rows. ONE
    // key-keyed full-outer join — the same single shuffle a Delta
    // MERGE's join phase costs; at 100 TB the base side would be
    // bucketed on the key (ops.Bucketing) to make reruns exchange-free.
    Entry("q62_merge_upsert",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val base = orders
          .filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
          .select(col("o_orderkey"), col("o_totalprice"),
            lit(1L).as("in_base"))
        val changes = orders
          .filter(pmod(col("o_orderkey"), lit(5)) === 0)
          .select(col("o_orderkey"),
            when(pmod(col("o_orderkey"), lit(15)) === 0, "D")
              .when(pmod(col("o_orderkey"), lit(15)) === 5, "U")
              .otherwise("I").as("op"),
            (col("o_totalprice") + 1000.0).as("new_price"))
        val j = base.join(changes, Seq("o_orderkey"), "full_outer")
        val inBase = coalesce(col("in_base"), lit(0L)) === 1L
        val op = coalesce(col("op"), lit(""))
        j.filter((inBase && op =!= "D") || (!inBase && op === "I"))
          .select(col("o_orderkey"),
            round(when(!inBase || op === "U", col("new_price"))
              .otherwise(col("o_totalprice")), 4).as("price"),
            when(!inBase, "inserted").when(op === "U", "updated")
              .otherwise("kept").as("action"))
      },
      Some("""WITH base AS (
                SELECT o_orderkey, o_totalprice
                FROM orders WHERE o_orderkey % 10 <> 0),
              chg AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 15 = 0 THEN 'D'
                            WHEN o_orderkey % 15 = 5 THEN 'U'
                            ELSE 'I' END AS op,
                       o_totalprice + 1000.0 AS new_price
                FROM orders WHERE o_orderkey % 5 = 0),
              j AS (
                SELECT coalesce(b.o_orderkey, c.o_orderkey) AS k,
                       b.o_orderkey IS NOT NULL AS in_base,
                       coalesce(c.op, '') AS op,
                       b.o_totalprice, c.new_price
                FROM base b FULL OUTER JOIN chg c
                  ON b.o_orderkey = c.o_orderkey)
              SELECT k AS o_orderkey,
                     round(CASE WHEN NOT in_base OR op = 'U'
                                THEN new_price
                                ELSE o_totalprice END, 4) AS price,
                     CASE WHEN NOT in_base THEN 'inserted'
                          WHEN op = 'U' THEN 'updated'
                          ELSE 'kept' END AS action
              FROM j
              WHERE (in_base AND op <> 'D') OR (NOT in_base AND op = 'I')
              ORDER BY o_orderkey""")),

    // Q63 — funnel analysis (ordered event-sequence matching): per
    // user, the earliest view -> first click strictly after it ->
    // first purchase strictly after that, plus the furthest stage
    // reached — the product-analytics sequence-pattern class none of
    // the window entries cover (q24's lag/lead is adjacent-row, this
    // is cross-row ordered matching). All three stage times are
    // conditional mins over ONE user-keyed exchange: the three window
    // projections share the same partitioning (no orderBy, so no sort
    // either), and Spark plans them on a single shuffle; timestamps
    // compare as epoch micros (the q49 tie-safe contract). Exact
    // integers end to end -> strict hash gate.
    Entry("q63_funnel",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"))
          .withColumn("t1",
            min(when(col("event_type") === "view", col("tus"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" &&
              col("tus") > col("t1"), col("tus"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" &&
              col("tus") > col("t2"), col("tus"))).over(w))
          .select(col("user_id"), col("t1"), col("t2"), col("t3"))
          .distinct()
          .select(col("user_id"),
            (when(col("t3").isNotNull, 3L)
              .when(col("t2").isNotNull, 2L)
              .when(col("t1").isNotNull, 1L)
              .otherwise(0L)).as("stage"),
            col("t1"), col("t2"), col("t3"))
      },
      Some("""WITH ev AS (
                SELECT user_id, event_type,
                       epoch_ns(ts) // 1000 AS tus
                FROM events),
              s1 AS (
                SELECT *, min(CASE WHEN event_type = 'view' THEN tus END)
                            OVER (PARTITION BY user_id) AS t1
                FROM ev),
              s2 AS (
                SELECT *, min(CASE WHEN event_type = 'click' AND tus > t1
                                   THEN tus END)
                            OVER (PARTITION BY user_id) AS t2
                FROM s1),
              s3 AS (
                SELECT *, min(CASE WHEN event_type = 'purchase' AND tus > t2
                                   THEN tus END)
                            OVER (PARTITION BY user_id) AS t3
                FROM s2)
              SELECT DISTINCT user_id,
                     CAST(CASE WHEN t3 IS NOT NULL THEN 3
                               WHEN t2 IS NOT NULL THEN 2
                               WHEN t1 IS NOT NULL THEN 1
                               ELSE 0 END AS BIGINT) AS stage,
                     t1, t2, t3
              FROM s3 ORDER BY user_id""")),

    // Q64 — cohort retention: users grouped by their signup epoch-week
    // (integer week index, NOT date_trunc('week') — epoch integer
    // division is engine-identical by construction, calendar-week
    // anchoring is a cross-engine convention risk), counted as active
    // per week-offset since signup — the second product-analytics
    // class beside q63's funnel. The signup time rides the same
    // user-keyed window exchange pattern as q63; the retention agg is
    // one (cohort, offset)-keyed exchange with a distinct-count.
    Entry("q64_cohort_retention",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        val wk = 604800000000L // micros per week
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"))
          .withColumn("su",
            min(when(col("event_type") === "signup", col("tus"))).over(w))
          .filter(col("su").isNotNull && col("tus") >= col("su"))
          .select(
            expr(s"su DIV $wk").as("cohort_week"),
            expr(s"(tus - su) DIV $wk").as("week_offset"),
            col("user_id"))
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct("user_id").as("n_users"))
      },
      Some("""WITH ev AS (
                SELECT user_id, event_type,
                       epoch_ns(ts) // 1000 AS tus
                FROM events),
              su AS (
                SELECT *, min(CASE WHEN event_type = 'signup'
                                   THEN tus END)
                            OVER (PARTITION BY user_id) AS su
                FROM ev)
              SELECT su // 604800000000 AS cohort_week,
                     (tus - su) // 604800000000 AS week_offset,
                     count(DISTINCT user_id) AS n_users
              FROM su
              WHERE su IS NOT NULL AND tus >= su
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Q66 — gaps-and-islands: longest consecutive-day activity streak
    // per user (plus streak count and active days) — the engagement-
    // analytics class beside q63's funnel and q64's cohorts that none
    // of the window entries cover: islands form via the classic
    // day-minus-row_number grouping over STRICTLY increasing distinct
    // days (no ties, so row_number is deterministic), then two
    // aggregations. Days are epoch-second integer division (the q64
    // epoch-week rationale: no calendar convention risk). Shape: one
    // distinct on (user, day), one user-keyed window (same exchange),
    // two cheap aggs — exact integers end to end.
    Entry("q66_streaks",
      (s, dir) => {
        val days = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_timestamp(ts) DIV 86400").as("d"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("d")
        days.withColumn("grp", col("d") - row_number().over(w))
          .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").as("max_streak"),
            count(lit(1)).as("n_streaks"),
            sum("len").as("active_days"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (
                SELECT DISTINCT user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
                FROM events),
              g AS (
                SELECT user_id, d,
                       d - row_number() OVER (PARTITION BY user_id
                         ORDER BY d) AS grp
                FROM days),
              st AS (SELECT user_id, grp, count(*) AS len
                     FROM g GROUP BY 1, 2)
              SELECT user_id, max(len) AS max_streak,
                     count(*) AS n_streaks,
                     CAST(sum(len) AS BIGINT) AS active_days
              FROM st GROUP BY 1 ORDER BY 1""")),

    // Q67 — SCD Type-2 change-collapse: rebuild the slowly-changing
    // dimension a warehouse keeps for each customer's order priority —
    // consecutive orders with the SAME priority collapse into one
    // validity run [valid_from, valid_to), valid_to = the next run's
    // start (NULL while current). Runs form by the null-safe
    // lag-compare + running-sum island id; (o_orderdate, o_orderkey)
    // is a total order per customer so row frames are deterministic.
    // Shape: ONE o_custkey exchange end to end — the run-id windows,
    // the (custkey, run) aggregation (hash(custkey) already clusters
    // it), and the lead() stitching all reuse the same partitioning;
    // at 100 TB this is a single shuffle of the orders fact followed
    // by partition-local sorts.
    Entry("q67_scd2",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val runs = t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
          .withColumn("chg",
            when(lag("o_orderpriority", 1).over(w) <=> col("o_orderpriority"),
              lit(0L)).otherwise(lit(1L)))
          .withColumn("run_id", sum("chg").over(wr))
          .groupBy(col("o_custkey"), col("run_id"))
          .agg(min("o_orderpriority").as("priority"),
            min("o_orderdate").as("valid_from"),
            count(lit(1)).as("n_orders"))
        val wl = Window.partitionBy("o_custkey").orderBy("run_id")
        runs.select(col("o_custkey"), col("run_id"), col("priority"),
            col("valid_from"),
            lead("valid_from", 1).over(wl).as("valid_to"),
            col("n_orders"))
          .orderBy("o_custkey", "run_id")
      },
      Some("""WITH o AS (
                SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                       CASE WHEN lag(o_orderpriority) OVER w
                                 IS NOT DISTINCT FROM o_orderpriority
                            THEN 0 ELSE 1 END AS chg
                FROM orders
                WINDOW w AS (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey)),
              r AS (
                SELECT *, sum(chg) OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey
                            ROWS UNBOUNDED PRECEDING) AS run_id
                FROM o),
              runs AS (
                SELECT o_custkey, CAST(run_id AS BIGINT) AS run_id,
                       min(o_orderpriority) AS priority,
                       min(o_orderdate) AS valid_from,
                       count(*) AS n_orders
                FROM r GROUP BY 1, 2)
              SELECT o_custkey, run_id, priority, valid_from,
                     lead(valid_from) OVER (PARTITION BY o_custkey
                       ORDER BY run_id) AS valid_to,
                     CAST(n_orders AS BIGINT) AS n_orders
              FROM runs ORDER BY o_custkey, run_id""")),

    // X31 — robust per-key outlier detection (median / MAD): flag
    // events whose |value - median| exceeds 3x the median absolute
    // deviation of their user — the z-score's robust cousin, immune to
    // the outliers it is hunting (a data-QA pass a curation pipeline
    // runs per source/user before trusting engagement stats). Both
    // medians ride ONE user_id exchange: two whole-partition window
    // aggregates back to back reuse the same hash partitioning and
    // sort. The holistic window buffers one user's events — bounded by
    // per-key cardinality, not corpus size; at 100 TB swap the exact
    // median for approx_percentile per group (two-pass) if a single
    // key's events outgrow an executor, a documented degradation the
    // fixture never needs.
    Entry("x31_mad_outliers",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"))
          .withColumn("med", percentile(col("value"), lit(0.5)).over(w))
          .withColumn("mad",
            percentile(abs(col("value") - col("med")), lit(0.5)).over(w))
          .filter(abs(col("value") - col("med")) > lit(3.0) * col("mad") &&
            col("mad") > lit(0.0))
          .select("user_id", "event_id", "value", "med", "mad")
          .orderBy("user_id", "event_id")
      },
      Some("""WITH m AS (
                SELECT event_id, user_id, value,
                       median(value) OVER (PARTITION BY user_id) AS med
                FROM events),
              mm AS (
                SELECT *, median(abs(value - med))
                            OVER (PARTITION BY user_id) AS mad
                FROM m)
              SELECT user_id, event_id, value, med, mad
              FROM mm
              WHERE abs(value - med) > 3 * mad AND mad > 0
              ORDER BY user_id, event_id""")),

    // Q68 — Misra-Gries heavy hitters (functions/MisraGriesAgg): top-10
    // corpus tokens from an O(capacity)-state mergeable summary — the
    // fourth sketch family (HLL q33, KLL q34, Count-Min q44) and
    // Count-Min's dual: MG UNDER-counts and keeps only candidates, CM
    // over-counts and keeps none. Capacity 64 exceeds the fixture's
    // ~31-token vocabulary, so every counter is exact and the summary
    // is hash-gated against the true frequency table regardless of
    // partitioning or merge order (the approximate regime — real
    // vocabularies — is SketchSpec-gated on adversarial streams where
    // decrements fire). Shape: partial summaries per partition, ONE
    // capacity-sized row through the exchange, never the token
    // universe.
    Entry("q68_mg_topk",
      (s, dir) => t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(graft.functions.MisraGriesAgg.mgSummary(s, col("tok"), 64)
          .as("mg"))
        .select(explode(col("mg")).as("p"))
        .select(col("p.item").as("token"), col("p.est").as("est"))
        .orderBy(col("est").desc, col("token").asc).limit(10),
      Some("""SELECT tok AS token, count(*) AS est
              FROM (SELECT unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY 1 ORDER BY est DESC, token ASC LIMIT 10""")),

    // Q68b — GROUPED Misra-Gries: top-5 tokens per language, each
    // group's summary built from per-partition partials merged by the
    // PODS-2012 rule — the form a 100 TB "heavy hitters per segment"
    // job actually runs (q33/q44 demonstrate the same grouped-partials
    // story for HLL/Count-Min; this completes it for MG). The exchange
    // carries one O(capacity) summary per (partition, lang), never the
    // token stream; the per-group top-5 is a SLICE of the summary —
    // eval() emits (est desc, item asc) sorted, a total order, so the
    // cut is deterministic and needs no window over exploded rows.
    // Exact regime as q68 (capacity 64 > per-lang vocabulary), so
    // hash-gated; grouped trims firing under merge are SketchSpec-gated.
    Entry("q68b_mg_by_lang",
      (s, dir) => t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang")
        .agg(graft.functions.MisraGriesAgg.mgSummary(s, col("tok"), 64)
          .as("mg"))
        .select(col("lang"), explode(slice(col("mg"), 1, 5)).as("p"))
        .select(col("lang"), col("p.item").as("token"),
          col("p.est").as("est"))
        .orderBy(col("lang"), col("est").desc, col("token").asc),
      Some("""SELECT lang, token, est FROM (
                SELECT lang, tok AS token,
                       CAST(count(*) AS BIGINT) AS est,
                       row_number() OVER (PARTITION BY lang
                         ORDER BY count(*) DESC, tok ASC) AS rk
                FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY lang, tok)
              WHERE rk <= 5
              ORDER BY lang, est DESC, token ASC""")),

    // X32 — duplicate-multiplicity histogram: how many dup clusters of
    // each size the corpus holds (and how many docs they absorb) — the
    // "how duplicated is this crawl" report a dedup policy decision
    // starts from (a corpus where 30% of docs sit in 1000-deep
    // clusters dedups very differently from one with pair dups only).
    // The cluster key is the sha of the SORTED DISTINCT TOKEN SET —
    // the bag-of-words fingerprint (order- and repetition-insensitive,
    // the normalization tier between x1's byte-exact sha and x4's
    // probabilistic near-dup; on this fixture raw sha finds zero
    // clusters while the token-set key finds up to 29-deep ones). One
    // digest-keyed exchange for cluster sizes — the x1 shape, and the
    // shuffle carries 32-byte digests, never text — then a second
    // aggregation over the O(distinct sizes) frame; n_docs =
    // sz * n_clusters stays exact-integer.
    Entry("x32_dup_histogram",
      (s, dir) => t(s, dir, "documents")
        .select(sha2(concat_ws(" ",
          array_sort(array_distinct(split(col("text"), " ")))), 256)
          .as("d"))
        .groupBy("d").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
        .select(col("sz"), col("n_clusters"),
          (col("sz") * col("n_clusters")).as("n_docs"))
        .orderBy("sz"),
      Some("""SELECT sz, count(*) AS n_clusters,
                     CAST(sz * count(*) AS BIGINT) AS n_docs
              FROM (SELECT count(*) AS sz
                    FROM (SELECT array_to_string(list_sort(list_distinct(
                            string_split(text, ' '))), ' ') AS d
                          FROM documents)
                    GROUP BY d)
              GROUP BY sz ORDER BY sz""")),

    // Q70 — join-key skew report: the pre-pass a 100 TB join PLANS
    // from — before picking q32's salt factor or q35's bucket count
    // you measure the key distribution, not guess it. Top-5 hottest
    // keys with their row share plus the global skew ratio
    // (max_cnt / mean_cnt, e6 fixed-point) — skew_e6 ~ 1e6 means
    // uniform; 30e6 means the hottest key holds 30x its fair share and
    // a plain hash join stalls on one task. Shape: ONE user-keyed
    // exchange (map-side partial counts) -> O(keys) counts frame; the
    // 1-row totals aggregate and the top-5 TakeOrdered BOTH read that
    // same grouped subtree (the t_oov_rate reused-exchange pattern),
    // and the totals row broadcasts back by construction. All ratios
    // are exact integer division on any engine; the triple product
    // 1e6 * max_cnt * n_keys runs in DECIMAL(38,0) — it exceeds
    // BIGINT past ~9e12 key-rows, well inside the 100 TB regime this
    // report exists for, and a silently wrapped skew ratio is worse
    // than none. One decimal multiply on a ONE-ROW frame costs
    // nothing; the per-key share stays in BIGINT (1e6 * cnt <= 1e6 *
    // n_rows can only overflow past ~9e12 rows under ONE key, at
    // which point the report's answer is self-evident).
    Entry("q70_skew_report",
      (s, dir) => {
        val counts = t(s, dir, "events").groupBy("user_id")
          .agg(count(lit(1)).as("cnt"))
        val tot = counts.agg(
          sum("cnt").cast("long").as("n_rows"),
          count(lit(1)).as("n_keys"),
          max("cnt").as("max_cnt"))
        counts.crossJoin(broadcast(tot))
          .select(col("user_id"), col("cnt"),
            expr("1000000 * cnt DIV n_rows").as("share_e6"),
            col("n_rows"), col("n_keys"),
            expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * max_cnt * n_keys" +
              " DIV n_rows AS BIGINT)").as("skew_e6"))
          .orderBy(col("cnt").desc, col("user_id").asc).limit(5)
      },
      Some("""WITH c AS (SELECT user_id, count(*) AS cnt
                         FROM events GROUP BY 1),
              tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                             count(*) AS n_keys, max(cnt) AS max_cnt
                      FROM c)
              SELECT user_id, cnt,
                     CAST(1000000 * cnt // n_rows AS BIGINT) AS share_e6,
                     n_rows, n_keys,
                     CAST(CAST(1000000 AS DECIMAL(38,0)) * max_cnt * n_keys
                       // n_rows AS BIGINT) AS skew_e6
              FROM c, tot
              ORDER BY cnt DESC, user_id ASC LIMIT 5""")),

    // Q71 — chi-square independence of (source, lang): the "is language
    // mix homogeneous across sources" test a mixture designer runs
    // before stratifying (a high chi2 means per-source language quotas
    // are load-bearing; near-dof means one global quota suffices).
    // Includes ZERO-observed cells (src6 has no 'fr' docs): the full
    // source x lang grid is rebuilt from the marginals — the lang
    // marginal collapses to a 1-row array that explodes against the
    // source marginal (the whitelisted 1-row crossJoin pattern), so no
    // many-to-many nested loop exists in the plan. Exactness: each
    // cell's term is floored to e4 fixed-point IN BIGINT before the
    // sum — integer addition is order-independent, so partitioning
    // cannot move the result. 64-bit bound (the q50 pattern):
    // 1e4 * (o*n - r*c)^2 needs o*n < ~3e7, i.e. ~17k docs at worst-
    // case skew; past that drop the e4 scaling to double — the exact-
    // integer form is the ORACLE contract at verification scale, not a
    // 100 TB requirement. Shape: ONE corpus exchange (the contingency
    // groupBy); everything after runs on O(cells) frames.
    Entry("q71_chi2",
      (s, dir) => {
        val cont = t(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("o"))
        val srcTot = cont.groupBy("source").agg(sum("o").as("r"))
        val langTot = cont.groupBy("lang").agg(sum("o").as("c"))
          .agg(collect_list(struct(col("lang"), col("c"))).as("lcs"))
        val tot = cont.agg(sum("o").as("n"))
        srcTot.crossJoin(broadcast(langTot))
          .select(col("source"), col("r"), explode(col("lcs")).as("lc"))
          .select(col("source"), col("r"),
            col("lc.lang").as("lang"), col("lc.c").as("c"))
          .join(broadcast(cont), Seq("source", "lang"), "left")
          .na.fill(0L, Seq("o"))
          .crossJoin(broadcast(tot))
          .agg(
            sum(expr("10000 * (o*n - r*c) * (o*n - r*c) DIV (r*c*n)"))
              .as("chi2_e4"),
            ((countDistinct("source") - 1) * (countDistinct("lang") - 1))
              .as("dof"),
            max("n").as("n_docs"))
      },
      Some("""WITH cont AS (SELECT source, lang, count(*) AS o
                            FROM documents GROUP BY 1, 2),
              r AS (SELECT source, CAST(sum(o) AS BIGINT) AS r
                    FROM cont GROUP BY 1),
              c AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c
                    FROM cont GROUP BY 1),
              tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cont),
              j AS (SELECT r.source, c.lang, r.r, c.c,
                           coalesce(o, 0) AS o
                    FROM r CROSS JOIN c
                    LEFT JOIN cont ON r.source = cont.source
                                  AND c.lang = cont.lang)
              SELECT CAST(sum(10000 * (o*n - r*c) * (o*n - r*c)
                               // (r*c*n)) AS BIGINT) AS chi2_e4,
                     (count(DISTINCT j.source) - 1)
                       * (count(DISTINCT j.lang) - 1) AS dof,
                     max(n) AS n_docs
              FROM j, tot""")),

    // Q72 — column profile report (the engine's "describe"): per
    // column of `orders` — row count, null count, exact distinct
    // count, min/max — the dataset-card / ingest-QA pass every ETL run
    // starts or ends with. Shape: one independent single-column
    // aggregation PER COLUMN, unioned — on columnar storage each
    // branch's scan prunes to its one column, so the six branches
    // together read each column exactly once (the same total bytes as
    // a single full-width scan) while each distinct-agg shuffles only
    // its own column's values. Measured 2x faster at sf0.1 than the
    // one-scan stack() form, whose multi-column DISTINCT plans an
    // Expand — a 7x row multiplication through the aggregation — and
    // that gap WIDENS at scale: Expand multiplies the full corpus row
    // count, while the union's branches are independent pruned scans
    // that schedule concurrently. min/max are computed on the NATIVE
    // type and cast to string AFTER (BIGINT lexicographic min would
    // say "10" < "9"); the DOUBLE column (o_totalprice) reports NULL
    // min/max — float-to-string formatting is not engine-portable
    // (Spark switches to scientific notation at 1e7 where DuckDB does
    // not), and its numeric profile is q17's fit stats. n_null is
    // count(*) - count(col) in both engines.
    Entry("q72_profile",
      (s, dir) => {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        val floatCols = Set("o_totalprice")
        cols.map { c =>
          // the float column's NULL min/max still ride an aggregate
          // (min of an all-null literal) so the projection stays legal
          // inside agg()
          val (mn, mx) =
            if (floatCols(c))
              (min(lit(null).cast("string")), min(lit(null).cast("string")))
            else (min(col(c)).cast("string"), max(col(c)).cast("string"))
          t(s, dir, "orders").select(col(c))
            .agg(count(lit(1)).as("n_rows"),
              (count(lit(1)) - count(col(c))).as("n_null"),
              countDistinct(col(c)).as("n_distinct"),
              mn.as("min_s"), mx.as("max_s"))
            .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
              col("n_distinct"), col("min_s"), col("max_s"))
        }.reduce(_.unionAll(_)).orderBy("col_name")
      },
      Some(Seq(
        ("o_orderkey", true), ("o_custkey", true), ("o_orderstatus", true),
        ("o_totalprice", false), ("o_orderdate", true),
        ("o_orderpriority", true)).map { case (c, portable) =>
          val mn = if (portable) s"CAST(min($c) AS VARCHAR)"
                   else "CAST(NULL AS VARCHAR)"
          val mx = if (portable) s"CAST(max($c) AS VARCHAR)"
                   else "CAST(NULL AS VARCHAR)"
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
                     count(*) - count($c) AS n_null,
                     count(DISTINCT $c) AS n_distinct,
                     $mn AS min_s, $mx AS max_s FROM orders"""
        }.mkString(" UNION ALL ") + " ORDER BY col_name")),

    // A-gini — per-source language-purity (Gini impurity of the lang
    // distribution, the mixture-skew diagnostic a corpus balancing job
    // watches). Kept EXACT: gini = 1 - sum(c_i^2)/n^2 is rational, so
    // emit floor(1e6 * gini) computed entirely in BIGINT division —
    // bit-identical on any engine, no float in sight. Two aggregations,
    // the second over O(sources x langs) rows. 64-bit bound: n^2 * 1e6
    // overflows past ~3e6 docs PER SOURCE; beyond that, drop the 1e6
    // scaling to double (ranking needs ~1e-6 relative accuracy, which
    // double gives) — the exact-integer form is the ORACLE contract at
    // verification scale, not a 100 TB requirement.
    Entry("q50_gini",
      (s, dir) => t(s, dir, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").as("n_docs"), sum(col("c") * col("c")).as("ss"))
        .select(col("source"), col("n_docs"),
          expr("(n_docs * n_docs - ss) * 1000000 DIV (n_docs * n_docs)")
            .as("gini_e6"))
        .orderBy("source"),
      Some("""SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
                     CAST((sum(c) * sum(c) - sum(c * c))
                       * 1000000 // (sum(c) * sum(c)) AS BIGINT)
                       AS gini_e6
              FROM (SELECT source, lang, count(*) AS c
                    FROM documents GROUP BY 1, 2)
              GROUP BY source ORDER BY source""")),

    // A-skyline — 2-D Pareto frontier over part (minimize price,
    // maximize size): the multi-objective filter (quality-vs-length
    // tradeoff curves in data selection). The naive form is a quadratic
    // NOT-EXISTS anti-join (the oracle); the engine instead runs the
    // O(n log n) sweep twice: a LOCAL sweep per hash bucket first — any
    // subset's local skyline is a superset of its global-skyline members,
    // so the pruning is lossless — then the global sweep over the few
    // survivors. Sorted by (price asc, size desc), a distinct point is
    // on the frontier iff its size beats the running max of everything
    // cheaper-or-equal before it. The global pass sorts only survivors
    // (bounded by skyline size x buckets), never the input.
    Entry("q52_skyline",
      (s, dir) => graft.ops.Skyline.frontier(
          t(s, dir, "part")
            .select(col("p_retailprice").as("price"),
              col("p_size").cast("long").as("size")),
          "price", "size")
        .orderBy("price", "size"),
      Some("""WITH pts AS (SELECT DISTINCT p_retailprice AS price,
                       CAST(p_size AS BIGINT) AS size FROM part)
              SELECT price, size FROM pts p
              WHERE NOT EXISTS (
                SELECT 1 FROM pts q
                WHERE q.price <= p.price AND q.size >= p.size
                  AND (q.price < p.price OR q.size > p.size))
              ORDER BY price, size""")),

    // A-hist — equi-width histogram (16 buckets over the global
    // [min, max] of o_totalprice): the distribution profiler behind
    // every data-quality dashboard. The bucket formula floor((x-mn)*16
    // /(mx-mn)) is written CHARACTER-IDENTICAL in both engines over the
    // same parquet doubles — same IEEE ops, same result, no rounding
    // tolerance needed (the x7 thr pattern). Max value clamps into the
    // last bucket. Plan: one 2-value global agg broadcast onto the
    // scan, one bucket agg — two passes, both full-scan-parallel.
    Entry("q53_histogram",
      (s, dir) => {
        val mm = t(s, dir, "orders")
          .agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
        // mx = mn (constant column) guard: 0/0 would be NaN, where the
        // engines diverge (Spark casts to 0, DuckDB errors) — pin the
        // degenerate case to bucket 0 explicitly in BOTH forms
        t(s, dir, "orders")
          .crossJoin(broadcast(mm))
          .select(when(col("mx") === col("mn"), lit(0L))
            .otherwise(least(
              floor((col("o_totalprice") - col("mn")) * 16
                / (col("mx") - col("mn"))).cast("long"),
              lit(15L))).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket")
      },
      Some("""WITH mm AS (SELECT min(o_totalprice) AS mn,
                       max(o_totalprice) AS mx FROM orders)
              SELECT CASE WHEN mx = mn THEN 0
                       ELSE least(CAST(floor((o_totalprice - mn) * 16
                         / (mx - mn)) AS BIGINT), 15) END AS bucket,
                     count(*) AS n
              FROM orders CROSS JOIN mm
              GROUP BY 1 ORDER BY 1""")),

    // A-fuzzy — blocked fuzzy matching (record linkage): within each
    // p_brand block, count part-name pairs at edit distance <= 3 and
    // the exact-duplicate subset — the approximate-dedup primitive for
    // DIRTY keys (typos) that hash equality misses entirely.
    // levenshtein is the textbook DP — exact integers, identical in
    // both engines. The block key bounds the quadratic: pairs are
    // per-brand, never global; at scale the block key widens (brand x
    // length-band x first-char) and AQE's skew split handles hot
    // blocks. One equi-shuffle on the block key; the distance filter
    // runs codegen'd inside the join output.
    Entry("q54_fuzzy_match",
      (s, dir) => {
        val p = t(s, dir, "part")
        // spread the STREAM side: part is a 25-key block join, so Spark
        // broadcasts the other side and keeps the stream side's scan
        // partitioning — which is ONE partition on the single-row-group
        // fixture, serializing all pair distances on one core (measured
        // 8.7s -> 1.3s at sf0.1; see Tables.spread)
        val a = graft.sources.Tables.spread(p)
          .select(col("p_brand"), col("p_partkey").as("k1"),
            col("p_name").as("n1"))
        val b = p.select(col("p_brand"), col("p_partkey").as("k2"),
          col("p_name").as("n2"))
        // levenshtein WITH threshold (SPARK-44510): the banded DP costs
        // O((m+n)·k) instead of O(m·n) and returns -1 the moment the
        // distance provably exceeds k (length-gap pairs exit in O(1)).
        // Only pairs at d <= 3 survive the filter either way, and the
        // thresholded form returns the exact distance for those, so the
        // result is identical — same-session A/B best-of-3 at sf0.1:
        // full DP 1.62-1.73s, thresholded 1.23-1.29s. (An explicit
        // per-side length-band prefilter was MEASURED SLOWER — 1.76s —
        // the extra filter breaks the fused pipeline for a check the
        // banded kernel already does in O(1).)
        a.join(b, Seq("p_brand")).filter(col("k1") < col("k2"))
          .withColumn("d", levenshtein(col("n1"), col("n2"), 3))
          .filter(col("d") >= 0)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_fuzzy"),
            sum(when(col("d") === 0, 1L).otherwise(0L)).as("n_exact"))
          .orderBy("p_brand")
      },
      Some("""SELECT a.p_brand, count(*) AS n_fuzzy,
                     CAST(sum(CASE WHEN levenshtein(a.p_name, b.p_name) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
              FROM part a JOIN part b
                ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
              WHERE levenshtein(a.p_name, b.p_name) <= 3
              GROUP BY a.p_brand ORDER BY a.p_brand"""))
  )
}
