package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Scratch A/B harness: time candidate expression forms over the
  * documents fixture to locate a hot spot the stage profile can't
  * attribute. Dev-only; not part of the driver contract. */
object Exp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TokenKernelFns

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def reps = graft.ops.Dedup.exact(docs, "text", "doc_id")
    def perDoc = reps
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .select(col("doc_id"),
        TokenKernelFns.minhashSig(spark, col("__t"), 32).as("sig"),
        TokenKernelFns.tokenXx64Set(spark, col("__t")).as("toks"))
    def buckets = graft.ops.Dedup.bucketRowsPortable(
      perDoc.select(col("doc_id"), col("sig")), "doc_id", 8, 32)
    def keepers = graft.ops.Dedup.lshKeepers(buckets, "doc_id")
    def full = graft.ops.Dedup.minhashLshDedupPortable(
      docs, "text", "doc_id", 32, 8, 0.5)

    def time(name: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best=${runs.min}%.3fs  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }

    // driver-side kernel microbench: true single-thread cost of the
    // fused kernels over the real texts, outside all Spark plumbing
    val texts = docs.select("text").collect().map(_.getString(0))
    val arrs = texts.map { t =>
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        t.split(" ").map(org.apache.spark.unsafe.types.UTF8String.fromString(_))
          .asInstanceOf[Array[Any]])
    }
    def micro(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3fs for ${arrs.length} docs")
    }
    micro("kernel_bands")(arrs.foreach(a =>
      graft.functions.TokenKernels.minhashBandBuckets(a, 32, 8)))
    micro("kernel_toks")(arrs.foreach(a =>
      graft.functions.TokenKernels.tokenXx64Set(a)))

    time("reps_only")(reps)
    time("perdoc_kernels")(perDoc)
    time("buckets")(buckets)
    time("keepers")(keepers)
    time("full_pipeline")(full)
    spark.stop()
  }
}
