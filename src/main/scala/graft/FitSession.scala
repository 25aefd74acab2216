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

  /** Clone of `caller` with AQE disabled — the fit planning regime.
    * Cheap (a conf snapshot; no context, no listener bus); safe to
    * create per fit and simply drop when done. */
  def aqeOff(caller: SparkSession): SparkSession = {
    val s = org.apache.spark.sql.graft.SessionInterop.cloneSession(caller)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  /** Re-bind `df`'s logical plan to `to` (lazy; cached frames resolve
    * across sessions — see [[aqeOff]]). */
  def rebind(df: DataFrame, to: SparkSession): DataFrame =
    org.apache.spark.sql.graft.SessionInterop.rebind(df, to)
}
