package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction and sorted layout — the table-maintenance
  * operators a 100 TB parquet lake needs between query rounds:
  *
  *  - streaming sinks and fine-grained partitioned writes leave
  *    thousands of KB-sized files; scan task scheduling then dominates
  *    IO. [[rewrite]] coalesces a directory to ~targetBytes files.
  *  - [[sortedRewrite]] additionally range-partitions and sorts by the
  *    given columns, so every output file covers a narrow key range and
  *    parquet row-group min/max stats let later filtered scans skip
  *    whole files (poor-man's clustering; same intent as Z-ordering for
  *    the single-key case).
  */
object Compact {

  final case class Stats(inputFiles: Long, inputBytes: Long,
      outputFiles: Long)

  private def parquetFiles(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive: partitioned layouts nest files under key=value dirs —
    // a top-level listing would see zero files and size the rewrite at
    // one giant output file
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer[
      org.apache.hadoop.fs.LocatedFileStatus]()
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet")) buf += s
    }
    buf.toArray
  }

  private def targetFileCount(bytes: Long, targetBytes: Long): Int =
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

  /** Compact `inDir` to `outDir` with ~targetBytes per file. */
  def rewrite(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 256L << 20): Stats = {
    val files = parquetFiles(spark, inDir)
    val bytes = files.map(_.getLen).sum
    val n = targetFileCount(bytes, targetBytes)
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    Stats(files.length.toLong, bytes,
      parquetFiles(spark, outDir).length.toLong)
  }

  /** Compact AND cluster: range-partition on `sortCols` then sort
    * within each partition, so output file key ranges are disjoint and
    * row-group stats become selective for later scans. */
  def sortedRewrite(spark: SparkSession, inDir: String, outDir: String,
      sortCols: Seq[String],
      targetBytes: Long = 256L << 20): Stats = {
    val files = parquetFiles(spark, inDir)
    val bytes = files.map(_.getLen).sum
    val n = targetFileCount(bytes, targetBytes)
    val cols = sortCols.map(col)
    spark.read.parquet(inDir)
      .repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(outDir)
    Stats(files.length.toLong, bytes,
      parquetFiles(spark, outDir).length.toLong)
  }
}
