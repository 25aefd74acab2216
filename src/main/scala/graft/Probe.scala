package graft

import org.apache.spark.sql.SparkSession

/** TEMP dev probe (deleted before commit): warm same-JVM A/B of the
  * registry tail entries with AQE on vs off at bench CPU count. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q13b_json", "x7_mixture", "t_lang_id", "q72_profile",
        "q33_hll_distinct", "x8_fold_split", "q07_outer_join",
        "t_oov_rate", "t_fingerprint", "q55_resample_ffill",
        "s2_jsonl_roundtrip", "q34_approx_quantile", "x5c_frame_sample")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var jobCount = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount += 1
      })

    def run(name: String, aqe: Boolean): (Double, Int) = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      jobCount = 0
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache()
      Thread.sleep(100)
      ((System.nanoTime() - t0) / 1e9, jobCount)
    }

    // warmup
    try { run("q08_agg_tpch_q1", aqe = true); run(names.head, aqe = true) }
    catch { case e: Throwable => println("warmup err: " + e) }

    println(f"${"entry"}%-22s ${"aqe1"}%6s ${"aqe2"}%6s ${"off1"}%6s ${"off2"}%6s  jobsOn jobsOff")
    for (n <- names) {
      try {
        val (a1, _) = run(n, aqe = true)
        val (a2, jOn) = run(n, aqe = true)
        val (o1, _) = run(n, aqe = false)
        val (o2, jOff) = run(n, aqe = false)
        println(f"$n%-22s $a1%6.2f $a2%6.2f $o1%6.2f $o2%6.2f  $jOn%5d $jOff%5d")
      } catch { case e: Throwable => println(s"$n ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
