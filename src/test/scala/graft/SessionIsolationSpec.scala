package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import scala.concurrent.{Await, Future}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, KMeans, PageRank}

/** Task gates for pinning a fit mid-loop: the blocking closure must not
  * capture the latches directly (Spark serializes task closures even in
  * local mode; CountDownLatch is not serializable) — it references this
  * STATIC object instead, which deserializes to the same JVM-wide
  * instance under local[*].
  */
object FitGate {
  @volatile var started: CountDownLatch = _
  @volatile var release: CountDownLatch = _
  def reset(): Unit = {
    started = new CountDownLatch(1)
    release = new CountDownLatch(1)
  }
  /** Park the first materialization of the partition until released. */
  def block[T](it: Iterator[T]): Iterator[T] = {
    started.countDown()
    release.await(120, TimeUnit.SECONDS)
    it
  }
}

/** The FitSession contract (round-12 verdict #1): the iterative fits
  * (PageRank, k-means, cluster resolution, q51 triangle census) scope
  * AQE / shuffle parallelism on a session CLONE — the caller's conf is
  * never mutated, and a CONCURRENT query on the caller's session planned
  * while a fit is mid-loop still plans adaptively. Each test also pins
  * the cross-session cache contract: the returned frame is rebound to
  * the caller's session and reads the fit-built cache.
  */
class SessionIsolationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def knobs(): (String, String) = (
    spark.conf.get("spark.sql.adaptive.enabled"),
    spark.conf.get("spark.sql.shuffle.partitions"))

  /** Run a small agg on the CALLER session and assert it planned (and
    * executed) adaptively — the exact hazard the clone removes. */
  private def probeCallerStillAdaptive(): Unit = {
    val probe = spark.range(0, 1000).groupBy((col("id") % 7).as("g"))
      .agg(count(lit(1)).as("n"))
    assert(probe.queryExecution.executedPlan.toString
      .contains("AdaptiveSparkPlan"),
      "caller-session query lost AQE while a fit was mid-loop")
    assert(probe.collect().length == 7)
  }

  test("PageRank.run: caller conf untouched; concurrent probe keeps AQE") {
    val before = knobs()
    assert(before._1 == "true", "fixture session must start with AQE on")
    FitGate.reset()
    // first materialization of the edge frame parks inside the fit's
    // AQE-off scope (raw.persist().count() is the loop's first action)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L))
      .toDS().repartition(1)
      .mapPartitions(FitGate.block[(Long, Long)])
      .toDF("src", "dst")
    val fut = Future(PageRank.run(edges, iters = 2))
    assert(FitGate.started.await(60, TimeUnit.SECONDS), "fit never started")
    // fit is now mid-loop, parked inside its clone's AQE-off scope
    assert(knobs() == before, "fit leaked conf into the caller session")
    probeCallerStillAdaptive()
    FitGate.release.countDown()
    val ranks = Await.result(fut, 120.seconds)
    assert(ranks.sparkSession eq spark,
      "result frame must be rebound to the caller session")
    // the caller-side plan must READ the clone-persisted result — a
    // cross-session cache miss would silently re-run the whole fit
    assert(ranks.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"),
      "rebound result did not resolve to the fit-built cache")
    assert(ranks.count() == 3)
    assert(knobs() == before)
    ranks.unpersist()
  }

  test("resolveClusters: caller conf untouched; concurrent probe keeps AQE") {
    val before = knobs()
    FitGate.reset()
    // chain c->b->a plus noise; parked on first materialization
    val assign = Seq(("a", "b"), ("b", "c"), ("x", "y"))
      .toDS().repartition(1)
      .mapPartitions(FitGate.block[(String, String)])
      .toDF("d1", "d2")
    val fut = Future(Dedup.resolveClusters(assign))
    assert(FitGate.started.await(60, TimeUnit.SECONDS), "loop never started")
    assert(knobs() == before, "loop leaked conf into the caller session")
    probeCallerStillAdaptive()
    FitGate.release.countDown()
    val roots = Await.result(fut, 120.seconds)
    assert(roots.sparkSession eq spark)
    assert(roots.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"),
      "rebound result did not resolve to the fit-built cache")
    val m = roots.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("c") == "a" && m("b") == "a" && m("y") == "x")
    assert(knobs() == before)
    roots.unpersist()
  }

  test("KMeans.fit: caller conf untouched; assignment rebound to caller") {
    val before = knobs()
    val rows = (0 until 12).map { i =>
      (i.toLong, Seq.fill(3)(if (i % 2 == 0) 0.0f else 10.0f))
    }
    val (_, assign) = KMeans.fit(rows.toDF("id", "vec"), "vec", "id",
      k = 2, iters = 2)
    assert(knobs() == before, "fit leaked conf into the caller session")
    assert(assign.sparkSession eq spark)
    // the caller-side action reads the clone-persisted quantized cache
    assert(assign.count() == 12)
    // and the caller plans its own downstream stages adaptively
    assert(assign.groupBy("cluster").count()
      .queryExecution.executedPlan.toString.contains("AdaptiveSparkPlan"))
  }

  test("two fits run CONCURRENTLY on one session without interference") {
    // each fit gets its own clone, so neither sees the other's AQE-off
    // scope or partition scoping; results must match the sequential
    // runs bit for bit and the shared caller conf must never move
    val before = knobs()
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L))
      .toDF("src", "dst")
    val assign = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("d1", "d2")
    val seqRanks = PageRank.run(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seqRoots = Dedup.resolveClusters(assign).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    spark.catalog.clearCache()
    val f1 = Future(PageRank.run(edges, iters = 2))
    val f2 = Future(Dedup.resolveClusters(assign))
    val ranks = Await.result(f1, 120.seconds)
    val roots = Await.result(f2, 120.seconds)
    assert(ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == seqRanks)
    assert(roots.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      == seqRoots)
    assert(knobs() == before)
    ranks.unpersist(); roots.unpersist()
  }

  test("q51 census entry: caller conf untouched; result rebound to caller") {
    val before = knobs()
    val entry = graft.queries.Registry.all.find(_.name == "q51_triangles").get
    val out = entry.run(spark, TestSpark.sf0001)
    assert(knobs() == before, "census leaked conf into the caller session")
    assert(out.sparkSession eq spark)
    val row = out.collect()
    assert(row.length == 1 && row.head.getLong(0) > 0L)
    assert(knobs() == before)
    out.unpersist()
  }

  test("clone-cache overflow evicts LRU only: a hot caller's clone " +
      "survives churn from other sessions") {
    // round-13 verdict #5: at cap overflow the round-12 cache cleared
    // the WHOLE map, so every live session re-paid the ~1 s cold-
    // SessionState warmup. The LRU cache must evict exactly the
    // least-recently-fitting entry.
    val hot = spark.newSession()
    val hotClone = FitSession.aqeOff(hot)
    val churn = (0 until 20).map(_ => spark.newSession())
    val firstChurnClone = FitSession.aqeOff(churn.head)
    churn.tail.foreach { s =>
      FitSession.aqeOff(s)
      // keep the hot caller most-recently-used, as a real concurrent
      // fit workload would
      assert(FitSession.aqeOff(hot) eq hotClone,
        "hot caller lost its warmed clone to churn from other sessions")
    }
    // the eldest churn entry was evicted (gets a FRESH clone on return)
    assert(!(FitSession.aqeOff(churn.head) eq firstChurnClone),
      "cache never evicted despite exceeding the cap")
  }

  test("caller conf changes AFTER the first fit reach later fits " +
      "(full re-sync, not just the scoped knobs)") {
    // warm the clone
    FitSession.aqeOff(spark)
    val key = "spark.sql.ansi.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, (prev != "true").toString)
      val clone = FitSession.aqeOff(spark)
      assert(clone.conf.get(key) == spark.conf.get(key),
        "clone kept a stale conf snapshot")
      // a conf the caller UNSETS falls back on the clone too
      spark.conf.set("spark.sql.graft.test.marker", "x")
      assert(FitSession.aqeOff(spark)
        .conf.get("spark.sql.graft.test.marker", "absent") == "x")
      spark.conf.unset("spark.sql.graft.test.marker")
      assert(FitSession.aqeOff(spark)
        .conf.get("spark.sql.graft.test.marker", "absent") == "absent")
      // the fit scoping still applies on top of the re-sync
      assert(clone.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    } finally {
      spark.conf.set(key, prev)
      spark.conf.unset("spark.sql.graft.test.marker")
    }
  }
}
