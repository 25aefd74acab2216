package graft

import org.apache.spark.sql.SparkSession

/** TEMP dev probe (deleted before round end): phase breakdown of warm
  * registry entries — plan-build (analysis+optimize+physical planning)
  * vs execution — at bench CPU count. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q13b_json", "x7_mixture", "t_lang_id", "q72_profile",
        "q33_hll_distinct", "x8_fold_split", "q07_outer_join",
        "t_oov_rate", "t_fingerprint", "q55_resample_ffill",
        "q34_approx_quantile", "x5c_frame_sample", "q01_scan_project",
        "q08_agg_tpch_q1", "t_quality", "x3_text_stats", "q63_funnel",
        "x16_collocations", "t_bm25", "t_entropy")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def phases(name: String): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+opt+planning
      val t2 = System.nanoTime()
      try df.write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache()
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }

    try { phases("q08_agg_tpch_q1"); phases(names.head) }
    catch { case e: Throwable => println("warmup err: " + e) }

    println(f"${"entry"}%-22s ${"build"}%6s ${"plan"}%6s ${"exec"}%6s ${"total"}%6s   (warm 2nd run)")
    for (n <- names) {
      try {
        phases(n)
        val (b, p, e) = phases(n)
        println(f"$n%-22s $b%6.3f $p%6.3f $e%6.3f ${b + p + e}%6.3f")
      } catch { case ex: Throwable => println(s"$n ERR ${ex.getMessage}") }
    }
    spark.stop()
  }
}
