package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** Dump `.explain("formatted")` for named registry queries to files —
  * the optimization-round before/after plan evidence
  * (`plans/r<N>/<query>_{before,after}.txt`). Runs under the SAME
  * data-sized session regime as Bench/Verify so the dumped plan is the
  * plan that gets measured. Dev tool; not part of the driver contract.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [names]
  * (names comma-separated; default = all registered queries).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only = args.lift(3).map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.dataSizedLocalConf(
      GraftSession.configure(SparkSession.builder().master("local[8]")),
      sfDir, 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        val txt =
          try {
            val df = fn(spark, sfDir)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } catch { case e: Throwable => s"PLAN FAILED: $e" }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        Console.err.println(s"[plandump] $name")
      }
    }
    spark.stop()
  }
}
