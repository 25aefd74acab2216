package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational core: scan / project / filter / union / joins / aggregation /
  * grouping sets / windows / top-k / date / json / set ops / string fns.
  *
  * Descends from the reference's operator surface (SURVEY.md §2.1–§2.4,
  * §2.7): CSV scan+project (`main.py:34-41`), positional union
  * (`main.py:39,42`), the fit-time aggregations behind every ML stage
  * (`utils/data_preprocessing.py:24,35`), plus the engine-declared
  * additions (filters, joins, windows) that make those semantics usable
  * as a query engine.
  *
  * Scale notes (100 TB): every query here is a declarative single plan —
  * filters/projections reach the parquet scan (verified via
  * `PushedFilters`/`ReadSchema` in RelationalSpec), dimension joins are
  * explicitly `broadcast()`, fact-fact joins shuffle on their join keys
  * and rely on AQE for skew/partition-coalescing.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val entries: Seq[Entry] = Seq(

    // Q1 — full scan + projection (S1/P1; reference main.py:34-41).
    // No output ORDER BY: the correctness gate canonicalizes (sorts all
    // rows before hashing — tools/selfcheck.py canon()), so a global
    // sort of the 600k-row output would be pure overhead. Precedent:
    // x4_simhash, commit efbfce9. The oracle SQL keeps its ORDER BY
    // (harmless under canonicalization, cheap single-process sort).
    Entry("q01_scan_project",
      (s, dir) => t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              ORDER BY l_orderkey, l_linenumber""")),

    // Q2 — predicate + projection (P3). Both predicates push to parquet.
    Entry("q02_filter",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
              FROM lineitem
              WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
              ORDER BY l_orderkey, l_linenumber""")),

    // Q3 — positional UNION ALL (U1; reference main.py:39,42): split
    // orders on parity, re-union, prove no rows were lost or deduped.
    Entry("q03_union_all",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val u = o.filter(col("o_orderkey") % 2 === 0)
          .union(o.filter(col("o_orderkey") % 2 === 1))
        u.agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 4).as("sum_price"))
      },
      Some("""SELECT count(*) AS cnt, round(sum(o_totalprice), 4) AS sum_price
              FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 0
                    UNION ALL
                    SELECT * FROM orders WHERE o_orderkey % 2 = 1)""")),

    // Q4 — fact-fact equi-join + aggregation (TPC-H Q3 shape). Shuffle
    // join on the key; AQE coalesces post-shuffle partitions.
    Entry("q04_join_agg",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                     round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
                     count(*) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Q5 — star-schema dims joined with explicit broadcast (E2-transform
    // analog: tiny lookup side replicated to every task, zero shuffle of
    // the fact table).
    Entry("q05_broadcast_join",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"),
          round(sum("c_acctbal"), 4).as("acctbal"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name, count(*) AS n_cust,
                     round(sum(c_acctbal), 4) AS acctbal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // Q6 — left semi (EXISTS) / left anti (NOT EXISTS).
    Entry("q06_semi_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select("c_custkey").orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    Entry("q06_anti_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select("c_custkey").orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    // Q7 — left outer join, null-aware aggregation on the probe side.
    Entry("q07_outer_join",
      (s, dir) => t(s, dir, "supplier")
        .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"),
          "left_outer")
        .groupBy("s_suppkey")
        .agg(count(col("l_orderkey")).as("n_items"),
          round(coalesce(sum("l_quantity"), lit(0.0)), 4).as("qty")),
      Some("""SELECT s_suppkey, count(l_orderkey) AS n_items,
                     round(coalesce(sum(l_quantity), 0.0), 4) AS qty
              FROM supplier LEFT JOIN lineitem ON s_suppkey = l_suppkey
              GROUP BY s_suppkey ORDER BY s_suppkey""")),

    // Q7b — FULL outer join: both unmatched sides survive with nulls
    // (customers who never ordered AND orders whose customer filter
    // carved away their account rows). The per-side key is re-coalesced
    // into one grouping key; null-aware counts distinguish the three
    // match classes. One shuffle per side, same as any fact-fact join.
    Entry("q07b_full_outer",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_acctbal") > 7000)
          .select(col("c_custkey"), col("c_acctbal"))
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
          .select(col("o_custkey"), col("o_totalprice"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .groupBy(coalesce(col("c_custkey"), col("o_custkey")).as("k"))
          .agg(count(col("c_acctbal")).as("n_cust"),
            count(col("o_totalprice")).as("n_ord"))
          .orderBy("k")
      },
      Some("""SELECT coalesce(c_custkey, o_custkey) AS k,
                     count(c_acctbal) AS n_cust,
                     count(o_totalprice) AS n_ord
              FROM (SELECT c_custkey, c_acctbal FROM customer
                    WHERE c_acctbal > 7000) c
              FULL JOIN (SELECT o_custkey, o_totalprice FROM orders
                         WHERE o_totalprice > 150000) o
                ON c_custkey = o_custkey
              GROUP BY 1 ORDER BY 1""")),

    // Q8 — TPC-H Q1-shape grouped aggregation (the fit-aggregation
    // pattern of E1/E5: partial map-side combine + final merge).
    Entry("q08_agg_tpch_q1",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))), 4).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
                     round(sum(l_quantity), 4) AS sum_qty,
                     round(sum(l_extendedprice), 4) AS sum_base,
                     round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
                     round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) AS sum_charge,
                     round(avg(l_quantity), 4) AS avg_qty,
                     round(avg(l_extendedprice), 4) AS avg_price,
                     round(avg(l_discount), 4) AS avg_disc,
                     count(*) AS n
              FROM lineitem
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // Q9 — ROLLUP grouping sets over the broadcast star join.
    Entry("q09_rollup",
      (s, dir) => {
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          // rollup(Column*): the String* overload resolves the names
          // through Dataset.col's ambiguous-self-join tagging, which
          // false-positives after two joins (Spark 4.1 quirk)
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"),
            round(sum("c_acctbal"), 4).as("acctbal"))
          .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_cust,
                     round(sum(c_acctbal), 4) AS acctbal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY ROLLUP(r_name, n_name)
              ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")),

    // Q9b — CUBE over the same star join (all four grouping sets).
    Entry("q09b_cube",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .cube(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum("c_acctbal"), 4).as("acctbal"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name")),
      Some("""SELECT r_name, n_name, count(*) AS n_cust,
                     round(sum(c_acctbal), 4) AS acctbal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY CUBE(r_name, n_name)
              ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")),

    // Q10 — ranking window (the StringIndexer-fit ordering primitive, E2).
    Entry("q10_rank_window",
      (s, dir) => {
        val wRn = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        val wRk = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 4).as("price"),
            row_number().over(wRn).cast("long").as("rn"),
            rank().over(wRk).cast("long").as("rk"),
            dense_rank().over(wRk).cast("long").as("drk"))
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                     rank() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC) AS rk,
                     dense_rank() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC) AS drk
              FROM orders ORDER BY o_custkey, rn""")),

    // Q11 — analytic window with an explicit frame: running sum per user.
    Entry("q11_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            round(sum("value").over(w), 4).as("run_sum"))
      },
      Some("""SELECT user_id, event_id,
                     round(sum(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                       AS run_sum
              FROM events ORDER BY user_id, event_id""")),

    // Q12 — per-group top-k = ranking window + filter.
    Entry("q12_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 4).as("price"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price, rn
              FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                           row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
                    FROM orders)
              WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // Q12b — lag/lead offsets: per-user inter-event value deltas.
    Entry("q24_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            round(col("value") - lag("value", 1).over(w), 4).as("delta_prev"),
            round(lead("value", 1).over(w) - col("value"), 4).as("delta_next"))
      },
      Some("""SELECT user_id, event_id,
                     round(value - lag(value, 1) OVER w, 4) AS delta_prev,
                     round(lead(value, 1) OVER w - value, 4) AS delta_next
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY user_id, event_id""")),

    // Q25 — distinct aggregation (exact; the approx_count_distinct HLL
    // variant is engine-specific and lives in DistinctSpec, not the
    // cross-engine hash gate).
    Entry("q25_distinct_agg",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                     count(DISTINCT o_custkey) AS n_cust,
                     count(*) AS n_orders
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // Q26 — as-of join (ops.AsOf): for every click, the user's latest
    // purchase value at or before the click. Oracle = DuckDB ASOF JOIN.
    Entry("q26_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "ts", "event_id")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "value")
        graft.ops.AsOf.asofJoin(clicks, purchases, "user_id", "ts",
          Seq("value"))
          .select(col("user_id"), col("event_id"),
            round(col("asof_value"), 4).as("last_purchase"))
      },
      Some("""SELECT l.user_id, l.event_id,
                     round(r.value, 4) AS last_purchase
              FROM (SELECT user_id, ts, event_id FROM events
                    WHERE event_type = 'click') l
              ASOF LEFT JOIN (
                    -- dedupe tied purchase timestamps to the max value:
                    -- the engine's as-of window breaks right-row ts ties
                    -- toward the largest value tuple, and ASOF on
                    -- duplicate r.ts is unspecified — this pins both
                    SELECT user_id, ts, max(value) AS value FROM events
                    WHERE event_type = 'purchase' GROUP BY 1, 2) r
                ON l.user_id = r.user_id AND l.ts >= r.ts
              ORDER BY l.user_id, l.event_id""")),

    // Q27 — banded range join (ops.RangeJoin): per error event, count
    // the same user's clicks in the preceding 10 minutes.
    Entry("q27_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select("user_id", "ts", "event_id")
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "ts", "value")
        graft.ops.RangeJoin.bandJoin(errors, clicks, "user_id", "ts",
          600L, Seq("value"))
          .groupBy("user_id", "event_id")
          .agg(count(lit(1)).as("n_clicks"),
            round(sum("r_value"), 4).as("click_value"))
      },
      Some("""SELECT l.user_id, l.event_id, count(*) AS n_clicks,
                     round(sum(r.value), 4) AS click_value
              FROM (SELECT user_id, ts, event_id FROM events
                    WHERE event_type = 'error') l
              JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'click') r
                ON l.user_id = r.user_id
               AND r.ts >= l.ts - INTERVAL 600 SECONDS
               AND r.ts < l.ts
              GROUP BY l.user_id, l.event_id
              ORDER BY l.user_id, l.event_id""")),

    // Q65 — banded INTERVAL-OVERLAP join (ops.RangeJoin
    // .intervalOverlapJoin): both sides are [start, end) intervals —
    // error incidents vs click activity windows per user — matched iff
    // they overlap. Distinct from q27 (point-in-band) and q26 (as-of):
    // the incident/session overlap shape (outage x activity,
    // ad-slot x view). Interval lengths are deterministic integer
    // functions of event_id, ends are epoch-second exact, and the op's
    // first-shared-bucket arithmetic dedup means the pair SET — not
    // just counts — matches the oracle's naive inequality join.
    // Bucket width 300 s ~ the max interval length, so per-interval
    // fan-out is <= 2 buckets.
    Entry("q65_interval_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        def iv(kind: String, lenMod: Int, lenMin: Int) = ev
          .filter(col("event_type") === kind)
          .select(col("user_id"), col("event_id"),
            unix_timestamp(col("ts")).as("s0"),
            (unix_timestamp(col("ts")) +
              pmod(col("event_id"), lit(lenMod)) + lenMin).as("e0"))
        val errors = iv("error", 241, 60)
        val clicks = iv("click", 181, 30)
          .select(col("user_id"), col("s0").as("rs0"), col("e0").as("re0"),
            col("event_id").as("r_id"))
        graft.ops.RangeJoin.intervalOverlapJoin(
            errors, clicks, "user_id", "s0", "e0", "rs0", "re0",
            bucketSeconds = 300L, valueCols = Seq("r_id"))
          .groupBy("user_id", "event_id")
          .agg(count(lit(1)).as("n_overlap"), min("r_r_id").as("first_click"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH l AS (
                SELECT user_id, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS ls,
                       CAST(floor(epoch(ts)) AS BIGINT)
                         + event_id % 241 + 60 AS le
                FROM events WHERE event_type = 'error'),
              r AS (
                SELECT user_id, event_id AS r_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS rs,
                       CAST(floor(epoch(ts)) AS BIGINT)
                         + event_id % 181 + 30 AS re
                FROM events WHERE event_type = 'click')
              SELECT l.user_id, l.event_id, count(*) AS n_overlap,
                     min(r_id) AS first_click
              FROM l JOIN r ON l.user_id = r.user_id
                AND l.ls < r.re AND r.rs < l.le
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Q12b — the same top-3-per-customer via the bounded-heap custom
    // aggregate (graft.functions.TopKAgg): k rows per group shuffle
    // instead of the window form's full sort. Same oracle as Q12.
    Entry("q12b_topk_agg",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val top = o.groupBy("o_custkey")
          .agg(graft.functions.TopKAgg
            .topkAgg(s, col("o_totalprice"), col("o_orderkey"), 3).as("t"))
          .select(col("o_custkey"), posexplode(col("t")))
        top.select(col("o_custkey"), col("col.id").as("o_orderkey"),
            round(col("col.score"), 4).as("price"),
            (col("pos") + 1).cast("long").as("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price, rn
              FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                           row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
                    FROM orders)
              WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // Q13 — date bucketing: revenue by ship year / order month.
    Entry("q13_date_year",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(year(col("l_shipdate")).cast("long").as("yr"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT year(l_shipdate) AS yr,
                     round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
                     count(*) AS n
              FROM lineitem GROUP BY yr ORDER BY yr""")),

    Entry("q13_date_month",
      (s, dir) => t(s, dir, "orders")
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
          .as("mon"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price")),
      Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
                     count(*) AS n, round(sum(o_totalprice), 4) AS sum_price
              FROM orders GROUP BY mon ORDER BY mon""")),

    // Q13b — JSON scalar extraction over events.props strings.
    // (n, sum) instead of round(avg,4): avg of 2-decimal values over a
    // small group lands on x.xxxx5 half-boundaries where the engines
    // round apart — observed at sf0.001 (28.8462 vs 28.8463), the same
    // class as the round-2 q22 fix.
    Entry("q13b_json",
      // no spread(): A/B-measured a wash-to-loss at sf0.1 (the JSON
      // parse CPU saved ≈ the shuffle of the wide props strings)
      (s, dir) => t(s, dir, "events")
        .groupBy(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy(asc_nulls_first("k")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                     count(*) AS n, round(sum(value), 2) AS sum_value
              FROM events GROUP BY k ORDER BY k NULLS FIRST""")),

    // Q13d — parsed-JSON map functions: from_json + map_keys.
    Entry("q13d_json_map",
      (s, dir) => {
        val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))
        t(s, dir, "events")
          .select(coalesce(size(map_keys(m)).cast("long"), lit(-1L))
            .as("n_keys"),
            m.getItem("k").as("k"))
          .groupBy("n_keys")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      },
      Some("""SELECT coalesce(len(json_keys(props)), -1) AS n_keys,
                     count(*) AS n,
                     CAST(sum(CAST(json_extract_string(props, '$.k')
                       AS BIGINT)) AS BIGINT) AS sum_k
              FROM events GROUP BY n_keys ORDER BY n_keys""")),

    // Q14 — INTERSECT / EXCEPT (distinct set semantics in both engines).
    Entry("q14_intersect",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select("o_custkey")
          .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
              INTERSECT
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
              ORDER BY o_custkey""")),

    Entry("q14_except",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select("o_custkey")
          .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
              EXCEPT
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
              ORDER BY o_custkey""")),

    // Q15 — scalar string functions (X3 building blocks).
    Entry("q15_string_fns",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          lower(col("p_type")).as("type_lc"),
          upper(col("p_brand")).as("brand_uc"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type")),
      // no output sort: gate canonicalizes rows (see q01 note)
      Some("""SELECT p_partkey, lower(p_type) AS type_lc,
                     upper(p_brand) AS brand_uc, length(p_name) AS name_len,
                     substring(p_name, 1, 5) AS name_pfx,
                     concat_ws('|', p_brand, p_type) AS brand_type
              FROM part ORDER BY p_partkey""")),

    // Q15c — math scalar functions over lineitem.
    Entry("q15_math_fns",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_discount") - lit(0.05)), 4).as("abs_d"),
          round(sqrt(col("l_quantity")), 4).as("sqrt_q"),
          round(log(col("l_extendedprice") + lit(1.0)), 4).as("log_p"),
          round(pow(col("l_tax"), 2), 4).as("tax_sq")),
      // no output sort: gate canonicalizes rows (see q01 note)
      Some("""SELECT l_orderkey, l_linenumber,
                     round(abs(l_discount - 0.05), 4) AS abs_d,
                     round(sqrt(l_quantity), 4) AS sqrt_q,
                     round(ln(l_extendedprice + 1.0), 4) AS log_p,
                     round(pow(l_tax, 2), 4) AS tax_sq
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // Q15d — regexp extraction.
    Entry("q15_regexp",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head")),
      Some("""SELECT p_partkey,
                     regexp_extract(p_type, '^(\w+)', 1) AS type_head
              FROM part ORDER BY p_partkey""")),

    // Q13c — month-of-year seasonality across all years.
    Entry("q13c_month_of_year",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(month(col("l_shipdate")).cast("long").as("mon"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("qty"))
        .orderBy("mon"),
      Some("""SELECT month(l_shipdate) AS mon, count(*) AS n,
                     round(sum(l_quantity), 4) AS qty
              FROM lineitem GROUP BY mon ORDER BY mon""")),

    // Q28 — array functions: per-order sorted quantity list, projected
    // back to scalars (array stringification differs across engines).
    Entry("q28_array_fns",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_quantity"))).as("qs"))
        .select(col("l_orderkey"),
          size(col("qs")).cast("long").as("n"),
          round(element_at(col("qs"), 1), 4).as("q_min"),
          round(element_at(col("qs"), -1), 4).as("q_max"),
          round(aggregate(col("qs"), lit(0.0), (a, x) => a + x), 4)
            .as("q_sum")),
      Some("""SELECT l_orderkey, count(*) AS n,
                     round(min(l_quantity), 4) AS q_min,
                     round(max(l_quantity), 4) AS q_max,
                     round(sum(l_quantity), 4) AS q_sum
              FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // Q15b — generator: split + explode token counts.
    Entry("q15_explode_tokens",
      (s, dir) => t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n")),
      Some("""SELECT token, count(*) AS n
              FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
              GROUP BY token ORDER BY token"""))
  )
}
