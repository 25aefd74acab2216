package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The two `private[sql]` doors the engine's conf-isolated iterative
  * fits need, opened from an `org.apache.spark.sql` subpackage — the
  * standard interop move for Spark libraries (Delta, Sedona, et al.
  * ship the same shim shape). Nothing here touches execution
  * internals: `cloneSession()` is Spark's own session-fork primitive
  * (shared `SparkContext` + `SharedState` — block manager, cache
  * manager — with a CLONED `SessionState`, i.e. an isolated `SQLConf`
  * snapshot of the parent, cloned function registry, and the parent's
  * injected extensions), and `Dataset.ofRows` is how Spark itself
  * binds a logical plan to a session.
  *
  * Why it exists: the iterative fits ([[graft.ops.PageRank.run]],
  * [[graft.ops.KMeans.fit]], [[graft.ops.Dedup.resolveClusters]], the
  * q51 triangle census) scope AQE off / shuffle parallelism down for
  * the duration of their driver loops. Mutating the CALLER's session
  * conf for that window (the round-9..11 shape) was single-session
  * safe but a concurrency hazard: a concurrent query on the same
  * session would silently plan without AQE mid-fit. Cloning gives the
  * fit a private conf to mutate freely while the caller's session —
  * and any concurrent query on it — keeps planning under its own
  * unchanged conf. The public `newSession()` is NOT equivalent: it
  * starts from a blank conf (losing the caller's tuning) and drops the
  * session-registered functions the fits' kernels rely on.
  */
object SessionInterop {

  /** Fork `s`: shared context/cache, isolated conf (see class doc). */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[ClassicSession].cloneSession()

  /** Re-bind `df`'s logical plan to session `to` (no-op when already
    * bound). Lazy — nothing executes; actions on the result plan under
    * `to`'s conf. Frames persisted under EITHER session are honored in
    * both directions: the cache manager lives in `SharedState` and
    * matches by canonicalized plan, not by session.
    *
    * Analysis subtlety: `ofRows` re-analyzes the plan under `to`, but
    * only `df`'s TOP operator is still raw — every child layer was
    * analyzed eagerly when its Dataset was constructed, so
    * session-registered functions buried in child plans arrive as
    * already-resolved expressions and need no registry lookup in `to`.
    * A caller that puts a registry-resolved `call_function` Column in
    * the OUTERMOST operator of the frame it rebinds must have that
    * name registered in `to` as well (clones copy the parent registry
    * at clone time, so this only bites for names registered AFTER the
    * clone was created — none of the engine's fit paths do that). */
  def rebind(df: DataFrame, to: SparkSession): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    if (cdf.sparkSession eq to) df
    else ClassicDataset.ofRows(to.asInstanceOf[ClassicSession],
      cdf.queryExecution.logical)
  }

  /** Block until the async listener bus has delivered every queued
    * event, or `timeoutMs` elapses (false on timeout). The third
    * `private[spark]` door (round-14 review find): Bench's per-query
    * job counts are collected in a SparkListener, and a fixed sleep is
    * the wrong guard against bus lag — on a loaded host the counts
    * would be silently low, on a quiet one the sleep is wasted wall. */
  def drainListeners(s: SparkSession, timeoutMs: Long): Boolean =
    try { s.sparkContext.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
