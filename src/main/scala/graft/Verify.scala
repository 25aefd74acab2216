package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same data-sized regime as Bench: the gate must gate the plans
    // the bench measures (AQE off + right-sized fan-out at fixture
    // scale; no-op at cluster-scale inputs)
    val spark = GraftSession.dataSizedLocalConf(
      GraftSession.configure(SparkSession.builder()
        .master(s"local[$cpus]")),
      sfDir, cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=name1,name2 restricts the dump (local iteration
    // on one query without paying the full registry).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release entry-internal persists (see Bench.exec note)
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // restricted dumps write a matching restricted oracle map: the
    // selfcheck gate treats an oracle key with NO dumped directory as
    // a crashed query (FAIL), so the dump must be self-describing.
    // MERGE, don't overwrite (round-14 review find): a restricted run
    // into an outDir holding a prior full dump used to replace the full
    // oracle map with the filtered one, which reclassified every stale
    // oracle-backed dump as rows-only (pass on any nonzero rows) and
    // silently weakened the gate. Keeping the prior entries for dirs
    // this run didn't touch preserves their oracle checks; entries for
    // queries dropped from the registry are pruned so selfcheck never
    // FAILs on a dir that no current query produces.
    val oraclePath = Paths.get(s"$outDir/oracle_sql.json")
    val fresh = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
    val merged =
      if (only.isEmpty || !Files.exists(oraclePath)) fresh
      else {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val prior = try {
          val m = mapper.readValue(Files.readString(oraclePath),
            classOf[java.util.Map[String, String]])
          import scala.jdk.CollectionConverters._
          m.asScala.toMap
        } catch { case _: Throwable => Map.empty[String, String] }
        val known = SparkEntry.oracleSql.keySet
        prior.view.filterKeys(known).toMap ++ fresh
      }
    val json = merged
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(oraclePath, json)
    spark.stop()
  }
}
