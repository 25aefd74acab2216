package graft

import org.apache.spark.sql.SparkSession

/** TEMP dev probe (deleted before round end): spread-width A/B under
  * the data-sized bench regime — defaultParallelism (32) vs the
  * session's shuffle partitions (8) as the fan-out target. Width is
  * forced via SPARK_GRAFT_SPREAD_W by temporarily patching spread?
  * No — spread() reads defaultParallelism; emulate width-8 by running
  * the same entries in a local[8] session (defaultParallelism = 8,
  * same shuffle partitions). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("t_oov_rate", "t_entropy", "t_lang_id", "x8_fold_split",
        "x4_jaccard_neardup", "x14_containment", "t_decontaminate",
        "s2_jsonl_roundtrip", "x4e_jaccard_sparse")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.dataSizedLocalConf(
      GraftSession.configure(SparkSession.builder()
        .master(s"local[$cpus]")), sfDir, cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    try { run("q08_agg_tpch_q1"); run(names.head) }
    catch { case e: Throwable => println("warmup err: " + e) }
    for (n <- names) {
      try {
        val walls = (1 to 3).map(_ => run(n))
        println(f"$n%-22s ${walls.map(w => f"$w%.2f").mkString(",")}")
      } catch { case e: Throwable => println(s"$n ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
