package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Conf-isolated execution scope for the engine's iterative fits.
  *
  * The four driver-loop operators (PageRank, k-means, cluster
  * resolution, triangle census) plan their loops with AQE off and a
  * data-sized static shuffle parallelism — per-stage adaptive
  * materialization adds 3x driver round-trips per tiny cached-join
  * stage and re-plans nothing the cache stats don't already decide
  * (profiled on each operator; see their scaladocs). Through round 11
  * they scoped those confs by mutating the CALLER's session with a
  * save/restore, which was single-session-safe but hazardous under
  * concurrency: any query planned on the same session mid-fit silently
  * lost AQE.
  *
  * This helper runs the fit on a `cloneSession()` instead — Spark's
  * session fork: same `SparkContext`, same `SharedState` (so the block
  * manager and the CACHE MANAGER are shared — frames the fit persists
  * are visible to the caller's session, and the caller's
  * `clearCache()` releases them), but an isolated `SQLConf` snapshot
  * the fit may mutate freely. The caller's conf is never touched;
  * concurrent queries keep AQE (SessionIsolationSpec probes a query
  * mid-fit and asserts exactly that).
  *
  * Usage shape (conf is read at ACTION time, so laziness does the
  * heavy lifting): build the input frame anywhere, [[rebind]] it onto
  * the clone, run + materialize the loop there, then [[rebind]] the
  * persisted result back onto the caller so downstream consumers plan
  * under the caller's own conf (hitting the shared cache for the
  * already-built fit state).
  */
object FitSession {

  // ONE clone per caller session, reused across fits: a fresh clone's
  // first analyses/plannings run on a cold SessionState (new analyzer/
  // optimizer/planner instances), measured ~+1 s per fit entry at
  // sf0.1 (bench q45 1.9 s -> 3.5 s with clone-per-fit; Probe puts the
  // first clone action at +0.1-0.6 s and the driver gaps between a
  // fresh clone's jobs at ~1.2 s for the PageRank chain). Reuse warms
  // the clone once per session.
  //
  // Lifetime: the clone STRONGLY reaches its own key (cloneSession
  // keeps the caller's SessionState as parentSessionState, whose
  // closures capture the caller session), so the WeakHashMap's weak
  // keys never become collectable while their value lives — a dropped
  // caller session would leak one session pair per entry. A
  // SoftReference value was MEASURED WRONG here (round 12): the bench
  // JVM's GC clears soft refs under shuffle heap pressure, and a
  // cleared clone re-pays the cold-SessionState warmup mid-run (q36
  // best 2.5 s -> 4.9 s, worst attempt 6.5 s -> 18.6 s). Instead the
  // cache is size-CAPPED with LRU single-eviction: beyond MaxClones
  // entries only the least-recently-fitting caller's clone is dropped
  // (access-ordered LinkedHashMap), so a hot caller never re-pays the
  // one-time warmup because OTHER sessions churned — the round-12
  // clear-all variant made all 15 surviving sessions re-warm on
  // overflow. Retained footprint stays bounded at MaxClones session
  // pairs. Single-session drivers (the common case) never hit the cap.
  //
  // Consequence of reuse, documented: two fits running CONCURRENTLY on
  // the same caller share the clone, so one fit's shuffle-partition
  // scoping can transiently apply to the other's stages — that perturbs
  // fit PARALLELISM only, never results (SessionIsolationSpec pins
  // concurrent fits bit-identical) and never the caller's conf, which
  // is the hazard this class exists to remove.
  private val MaxClones = 16
  // accessOrder = true: `get` refreshes recency, so eviction order is
  // least-recently-FIT, not insertion. removeEldestEntry evicts exactly
  // one entry at put time once the cap is exceeded.
  private val clones = new java.util.LinkedHashMap[
    SparkSession, SparkSession](MaxClones + 1, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[SparkSession, SparkSession]): Boolean =
      size() > MaxClones
  }

  /** Clone of `caller` with AQE disabled — the fit planning regime.
    * Reused per caller (see above). Every call re-syncs the caller's
    * CURRENT modifiable conf onto the clone before applying the fit
    * scoping, so a conf the caller changed after the first fit (ANSI
    * mode, codegen flags, a new shuffle parallelism) is seen by later
    * fits, and a previous fit's data-sized parallelism never leaks
    * into the next fit's upper bound. */
  def aqeOff(caller: SparkSession): SparkSession = {
    val s = clones.synchronized {
      var c = clones.get(caller)
      if (c == null) {
        c = org.apache.spark.sql.graft.SessionInterop.cloneSession(caller)
        clones.put(caller, c)
      }
      c
    }
    // full re-sync, caller -> clone: set what differs, unset what the
    // caller no longer carries (falls back to defaults). try/catch, not
    // isModifiable: static/core entries THROW on set (skipped), while
    // unregistered "spark.my.key" entries — which isModifiable would
    // wrongly skip — set fine. O(conf size) driver work per fit.
    val want = caller.conf.getAll
    val have = s.conf.getAll
    for ((k, v) <- want if !have.get(k).contains(v))
      try s.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    for (k <- have.keysIterator if !want.contains(k))
      try s.conf.unset(k)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  /** Re-bind `df`'s logical plan to `to` (lazy; cached frames resolve
    * across sessions — see [[aqeOff]]). */
  def rebind(df: DataFrame, to: SparkSession): DataFrame =
    org.apache.spark.sql.graft.SessionInterop.rebind(df, to)
}
