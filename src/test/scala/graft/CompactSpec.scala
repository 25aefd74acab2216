package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Compact
import graft.sources.Tables

class CompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fragmented(): String = {
    val dir = "/tmp/graft_spec/compact_in"
    Tables.load(spark, TestSpark.sf0001, "events")
      .repartition(40) // simulate a streaming sink's small files
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("rewrite collapses small files without losing rows") {
    val in = fragmented()
    val out = "/tmp/graft_spec/compact_out"
    val stats = Compact.rewrite(spark, in, out, targetBytes = 64L << 20)
    assert(stats.inputFiles >= 40)
    assert(stats.outputFiles == 1) // tiny fixture fits one target file
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(in).count())
  }

  test("sortedRewrite produces disjoint per-file key ranges") {
    val in = fragmented()
    val out = "/tmp/graft_spec/compact_sorted"
    // a small targetBytes forces several output files so range
    // disjointness is observable — and exercises the REAL operator
    val stats = Compact.sortedRewrite(spark, in, out, Seq("user_id"),
      targetBytes = 32L << 10)
    assert(stats.outputFiles >= 3, stats)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 3)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("user_id"), max("user_id")).head()
      (r.getLong(0), r.getLong(1))
    }
    // each file covers a narrow range; ranges must not interleave
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"overlapping file ranges: ${sorted.mkString(",")}")
      case _ =>
    }
    // row preservation
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(in).count())
  }

  test("rewrite sizes from nested files in partitioned layouts") {
    val in = "/tmp/graft_spec/compact_part_in"
    Tables.load(spark, TestSpark.sf0001, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(in)
    val out = "/tmp/graft_spec/compact_part_out"
    val stats = Compact.rewrite(spark, in, out, targetBytes = 64L << 20)
    // files live under event_type=... subdirs; a non-recursive listing
    // would report inputFiles=0 and inputBytes=0
    assert(stats.inputFiles > 0 && stats.inputBytes > 0, stats)
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(in).count())
  }
}
