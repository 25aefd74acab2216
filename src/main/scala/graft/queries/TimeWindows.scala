package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Time-window aggregations (SURVEY.md §2.8, Q21–Q23) run in batch mode.
  *
  * The exact same `window()` / `session_window()` expressions run
  * unchanged under Structured Streaming (`graft.streaming.EventStreams`
  * wires them behind `readStream` + watermark); batch mode makes them
  * DuckDB-checkable via epoch bucketing. Window starts are emitted as
  * epoch seconds — timezone-proof across engines.
  */
object TimeWindows {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  val entries: Seq[Entry] = Seq(

    // Q-TS — fixture-unit sanity gate. Round 7's regenerated fixtures
    // silently changed events.ts from TIMESTAMP(NANOS)-as-int64 to
    // logical TIMESTAMP_MICROS; the stale div-1000 conversion compressed
    // 30 days of events into ~43 minutes and every time-window query
    // failed with no indication why. This entry pins the loaded time
    // range itself (year + day span), so a unit error fails loudly by
    // name in the correctness gate instead of surfacing as mysterious
    // row-count drift in five downstream queries.
    Entry("q_ts_sanity",
      (s, dir) => t(s, dir, "events")
        .agg(year(min(col("ts"))).as("min_year"),
          year(max(col("ts"))).as("max_year"),
          datediff(max(col("ts")), min(col("ts"))).as("span_days"),
          count(lit(1)).as("n")),
      Some("""SELECT year(min(ts)) AS min_year, year(max(ts)) AS max_year,
                     date_diff('day', CAST(min(ts) AS DATE),
                               CAST(max(ts) AS DATE)) AS span_days,
                     count(*) AS n
              FROM events""")),

    // Q21 — tumbling 5-minute window count/sum per event_type.
    Entry("q21_tumbling_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type"),
      Some("""SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS w_start,
                     event_type, count(*) AS n, round(sum(value), 4) AS sum_value
              FROM events GROUP BY w_start, event_type
              ORDER BY w_start, event_type""")),

    // Q22 — sliding 10-minute window, 2-minute slide: each event lands in
    // exactly 5 windows. Compared on (n, sum) rather than avg: sums of
    // ~4-decimal values stay exactly representable, while avg = sum/n
    // frequently lands exactly on a x.xxxx5 half-boundary where Spark and
    // DuckDB round opposite ways (the round-1 hash mismatch).
    Entry("q22_sliding_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "2 minutes"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("n"), col("sum_value"))
        .orderBy("w_start"),
      Some("""SELECT ws AS w_start, count(*) AS n, round(sum(value), 4) AS sum_value
              FROM (SELECT CAST(floor(epoch(ts) / 120) * 120 AS BIGINT) - 120 * i
                             AS ws, value
                    FROM events CROSS JOIN range(0, 5) t(i))
              GROUP BY ws ORDER BY ws""")),

    // Q23 — session window: 30-minute inactivity gap per user. Spark
    // semantics (verified empirically in TimeWindowsSpec): an event
    // exactly at the previous session's end EXTENDS it — a new session
    // starts only when the gap is STRICTLY greater than 30 minutes
    // (strict > in the oracle's gaps-and-islands form).
    Entry("q23_session_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("s_start"),
          unix_timestamp(col("session_window.end")).as("s_end"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "s_start"),
      Some("""WITH e AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              sess AS (
                SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
                FROM e)
              SELECT user_id,
                     CAST(floor(epoch(min(ts))) AS BIGINT) AS s_start,
                     CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT)
                       AS s_end,
                     count(*) AS n, round(sum(value), 4) AS sum_value
              FROM sess GROUP BY user_id, sid
              ORDER BY user_id, s_start""")),

    // Q55 — resample to a GAP-FILLED minute grid + forward fill (the
    // time-series normalization every monitoring/feature pipeline does
    // before joins or models: irregular events -> a dense regular grid,
    // empty buckets carrying the last observation forward). The grid is
    // generated from the data's own [min, max] minute — sequence() +
    // explode, no driver loop — and the fill is last(.., ignoreNulls)
    // over the time order. Emitted as epoch seconds (the Q21-Q23
    // timezone-proof contract); the carried metric is the rounded
    // per-minute sum+count pair, never an avg (half-boundary hashing).
    //
    // Measured non-win (round 10, don't re-try): executing this whole
    // pipeline with AQE scoped off + eager materialization (the
    // PageRank pattern) to collapse its 13 tiny driver round-trip jobs
    // was ~2x SLOWER (0.6s -> 1.5s at sf0.1) — AQE's value here is
    // COALESCING each 32-task stage to 1 task (closure deserialization
    // alone is ~50 ms/task on these byte-small exchanges); static
    // planning pays 32x deser per stage. The remaining gap to the
    // oracle is the per-stage scheduling floor x the pipeline's
    // inherent stage count, not a plan defect.
    //
    // SCALE SHAPE: the fill window is PARTITIONED BY DAY — grid minutes
    // fill within their own day in parallel, and day boundaries are
    // stitched with a per-day carry frame (the last observation of every
    // PRECEDING day, computed with a running last over the day axis).
    // The only unpartitioned window left runs on that day axis:
    // O(time-range / 1 day) rows (a year = 365), constant in both event
    // volume and grid resolution, and broadcast back onto the grid. The
    // earlier form ran one global window over the whole O(range/minute)
    // grid — fine at a year (526k rows) but a single-task serialization
    // at decade ranges / second resolutions; this shape is flat in
    // range/resolution.
    Entry("q55_resample_ffill",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val agg = t(s, dir, "events")
          .groupBy(date_trunc("minute", col("ts")).as("m"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sm"))
        // one row per day in [lo, hi]; repartition by day so the
        // per-day minute explode below fans out across tasks instead of
        // inheriting the 1-row bounds frame's single partition
        val days = agg.agg(min("m").as("lo"), max("m").as("hi"))
          .select(explode(sequence(date_trunc("day", col("lo")),
            date_trunc("day", col("hi")), expr("interval 1 day"))).as("day"),
            col("lo"), col("hi"))
          .repartition(col("day"))
        val grid = days.select(col("day"), explode(sequence(
          greatest(col("day"), col("lo")),
          least(expr("day + interval 23 hours 59 minutes"), col("hi")),
          expr("interval 1 minute"))).as("m"))
        // within-day fill: window partitioned by day — parallel
        val wDay = Window.partitionBy("day").orderBy("m")
          .rowsBetween(Window.unboundedPreceding, 0)
        val filled = grid.join(agg, Seq("m"), "left")
          .withColumn("lm_day",
            last(when(col("n").isNotNull, col("m")), ignoreNulls = true)
              .over(wDay))
          .withColumn("sm_day", last(col("sm"), ignoreNulls = true).over(wDay))
        // boundary carry: last observation of each day (one keyed agg),
        // run forward over the tiny day axis, broadcast onto the grid
        val perDay = agg
          .groupBy(date_trunc("day", col("m")).as("day"))
          // dsm = the day's last NON-NULL sm, not sm at the day's last
          // minute: a trailing minute whose value column is all NULL
          // has sm NULL, and carrying that NULL skipped the whole day
          // where the oracle's last_value(sm IGNORE NULLS) carries the
          // day's earlier non-null sum (latent on the fixture — no
          // NULL values — but the contract is any regenerated data).
          // max-over-struct skips the NULL-sm rows null-safely.
          .agg(max(col("m")).as("dlm"),
            max(when(col("sm").isNotNull, struct(col("m"), col("sm"))))
              .getField("sm").as("dsm"))
        val wDays = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = days.select("day").join(perDay, Seq("day"), "left")
          .withColumn("carry_m", last(col("dlm"), ignoreNulls = true).over(wDays))
          .withColumn("carry_sm", last(col("dsm"), ignoreNulls = true).over(wDays))
          .select("day", "carry_m", "carry_sm")
        filled.join(broadcast(carry), Seq("day"))
          .select(unix_timestamp(col("m")).as("m_epoch"),
            coalesce(col("n"), lit(0L)).as("n"),
            unix_timestamp(coalesce(col("lm_day"), col("carry_m")))
              .as("last_epoch"),
            coalesce(col("sm_day"), col("carry_sm")).as("f_sum"))
          .orderBy("m_epoch")
      },
      Some("""WITH agg AS (
                SELECT date_trunc('minute', ts) AS m, count(*) AS n,
                       round(sum(value), 4) AS sm
                FROM events GROUP BY 1),
              mm AS (SELECT min(m) AS lo, max(m) AS hi FROM agg),
              grid AS (SELECT unnest(generate_series(lo, hi,
                         INTERVAL 1 MINUTE)) AS m FROM mm),
              j AS (SELECT g.m, a.n, a.sm
                    FROM grid g LEFT JOIN agg a USING (m)),
              f AS (SELECT m, coalesce(n, 0) AS n,
                           max(CASE WHEN n IS NOT NULL THEN m END)
                             OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
                             AS last_m,
                           last_value(sm IGNORE NULLS)
                             OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
                             AS f_sum
                    FROM j)
              SELECT CAST(floor(epoch(m)) AS BIGINT) AS m_epoch, n,
                     CAST(floor(epoch(last_m)) AS BIGINT) AS last_epoch,
                     f_sum
              FROM f ORDER BY m_epoch"""))
  )
}
