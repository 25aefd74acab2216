package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temp dev probe (deleted after use): p6_cdc_chunk with and without a
  * spread() fan-out of the explode+md5 scan stage, one session. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.dataSizedLocalConf(
      GraftSession.configure(SparkSession.builder().master("local[32]")),
      sfDir, 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def p6(spreadIn: Boolean): DataFrame = {
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val src = if (spreadIn) graft.sources.Tables.spread(base) else base
      src.select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("word"))
        .withColumn("is_b",
          when(graft.functions.PortableHash.md5w(col("word")) % 16 === 0,
            1L).otherwise(0L))
        .withColumn("chunk_id", coalesce(sum("is_b").over(w), lit(0L)))
        .groupBy("doc_id", "chunk_id")
        .agg(count(lit(1)).as("n_toks"),
          md5(array_join(transform(
            sort_array(collect_list(struct(col("pos"), col("word")))),
            x => x.getField("word")), " ")).as("h"))
    }

    def time(name: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-14s best=${runs.min}%.3fs runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    time("p6_plain")(p6(false))
    time("p6_spread")(p6(true))
    time("p6_plain#2")(p6(false))
    time("p6_spread#2")(p6(true))
    spark.stop()
  }
}
