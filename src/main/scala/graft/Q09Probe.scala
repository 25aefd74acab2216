package graft
import org.apache.spark.sql.functions._
object Q09Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = "/root/testdata/sf0.001"
    def joined = graft.sources.Tables.load(spark, dir, "customer")
      .join(broadcast(graft.sources.Tables.load(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(graft.sources.Tables.load(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
    try { joined.rollup("r_name", "n_name").agg(count(lit(1))).collect(); println("V1 plain-rollup OK") }
    catch { case e: Exception => println("V1 FAIL: " + e.getMessage.take(80)) }
    try { joined.select("r_name", "n_name", "c_acctbal").rollup("r_name", "n_name").agg(count(lit(1))).collect(); println("V2 select-first OK") }
    catch { case e: Exception => println("V2 FAIL: " + e.getMessage.take(80)) }
    try {
      val j = joined.select(col("r_name").as("rn"), col("n_name").as("nn"), col("c_acctbal"))
      j.rollup("rn", "nn").agg(count(lit(1))).collect(); println("V3 rename-first OK")
    } catch { case e: Exception => println("V3 FAIL: " + e.getMessage.take(80)) }
    spark.stop()
  }
}
