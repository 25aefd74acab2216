package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

import scala.collection.mutable

/** Local perf diagnosis: run selected registry entries with a listener
  * attached and print per-query JOB and STAGE breakdowns — the tool
  * that separates "bad plan" from "scheduler floor x N jobs" when a
  * bench number looks high. Not part of the driver contract; dev-only.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <name1,name2,...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // PROFILE_CONF="k=v;k=v": extra session confs for A/B experiments
    // (codegen toggles, AQE coalescing variants) without code edits
    val extra = sys.env.get("PROFILE_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2)).collect {
        case Array(k, v) => (k.trim, v.trim)
      }
    val b0 = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, var desc: String = "",
      var start: Long = 0L, var end: Long = 0L,
      val stages: mutable.Buffer[(Int, String, Long, Int)] = mutable.Buffer())

    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.Map[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId)
        r.start = e.time
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized { jobs(e.jobId) = r }
        e.stageIds.foreach(sid => stageToJob.synchronized { stageToJob(sid) = e.jobId })
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val jid = stageToJob.synchronized { stageToJob.getOrElse(si.stageId, -1) }
        val dur = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
        // run = sum of task wall, cpu = sum of task CPU: dur >> run/cores
        // means scheduling floor; run >> cpu means IO/lock wait, not math
        val m = si.taskMetrics
        val lbl = f"run=${m.executorRunTime / 1e3}%.2fs cpu=${m.executorCpuTime / 1e9}%.2fs deser=${m.executorDeserializeTime / 1e3}%.2fs  " +
          si.name.takeWhile(_ != '\n').take(40)
        jobs.synchronized {
          jobs.get(jid).foreach(_.stages +=
            ((si.stageId, lbl, dur, si.numTasks)))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def exec(name: String): Unit = {
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache()
    }

    // PROFILE_EXPLAIN=1: also print the FINAL adaptive plan (collect's
    // own queryExecution reflects AQE's runtime decisions post-run)
    def explainFinal(name: String): Unit =
      if (sys.env.get("PROFILE_EXPLAIN").contains("1")) {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        spark.catalog.clearCache()
      }

    // warmup pays JIT/codegen/FS once
    exec(names.head)
    Thread.sleep(300)

    for (name <- names) {
      jobs.synchronized { jobs.clear() }; stageToJob.synchronized { stageToJob.clear() }
      val t0 = System.nanoTime()
      exec(name)
      val wall = (System.nanoTime() - t0) / 1e9
      explainFinal(name)
      Thread.sleep(500) // let the listener bus drain
      println(f"\n== $name%s  wall=$wall%.2fs  jobs=${jobs.size}%d")
      jobs.synchronized {
        jobs.values.foreach { j =>
          val jdur = (j.end - j.start) / 1e3
          println(f"  job ${j.id}%3d  ${jdur}%6.2fs  ${j.desc.take(70)}%s")
          j.stages.sortBy(_._1).foreach { case (sid, nm, dur, nt) =>
            println(f"    stage $sid%4d ${dur / 1e3}%6.2fs tasks=$nt%3d  $nm%s")
          }
        }
      }
    }
    spark.stop()
  }
}
