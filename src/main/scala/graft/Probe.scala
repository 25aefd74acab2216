package graft

import org.apache.spark.sql.SparkSession

/** TEMP dev probe (deleted before round end): q42 session-spread
  * diagnostic — 4 consecutive runs + generated-method bytecode-size
  * histogram (the q41 bimodality playbook: a method near the 8 KB
  * HotSpot JIT ceiling runs interpreted depending on JIT state). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q42_rnn_train")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.dataSizedLocalConf(
      GraftSession.configure(SparkSession.builder()
        .master(s"local[$cpus]")), sfDir, cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.DEBUG)

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    try run("q08_agg_tpch_q1") catch { case _: Throwable => () }
    for (n <- names) {
      val walls = (1 to 4).map(_ => run(n))
      println(f"$n%-22s walls=${walls.map(w => f"$w%.2f").mkString(",")}")
    }
    val h = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_GENERATED_METHOD_BYTECODE_SIZE.getSnapshot
    println(f"generated method bytecode sizes: max=${h.getMax}%d " +
      f"p99=${h.getValue(0.99)}%.0f p95=${h.getValue(0.95)}%.0f " +
      f"median=${h.getMedian}%.0f n=${h.size()}%d")
    val hc = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getSnapshot
    println(f"compile times ms: max=${hc.getMax}%d mean=${hc.getMean}%.0f")
    spark.stop()
  }
}
