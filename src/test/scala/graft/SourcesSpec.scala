package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Sources, Tables}

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CSV round-trip preserves rows; explicit schema matches inference") {
    val cust = Tables.load(spark, dir, "customer")
    val path = tmp("csv")
    Sources.writeCsv(cust, path)
    val explicit = Sources.csv(spark, path, Tables.customer)
    val inferred = Sources.csvInferred(spark, path)
    assert(explicit.count() == cust.count())
    assert(inferred.count() == cust.count())
    // same data through both read shapes — but note inference NARROWS
    // small long keys to int (the schema-drift risk the explicit path
    // avoids), so compare numerically, not by type
    val a = explicit.orderBy("c_custkey").collect()
    val b = inferred.orderBy("c_custkey").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getAs[Number](0).longValue())
      assert(math.abs(x.getDouble(3) - y.getAs[Number](3).doubleValue()) < 1e-9)
    }
  }

  test("partitioned write enables partition pruning at the scan") {
    val orders = Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    val path = tmp("part")
    Sources.writePartitioned(orders, path, Seq("o_year"))
    val back = spark.read.parquet(path)
    val years = back.select("o_year").distinct().collect().map(_.getInt(0))
    assert(years.length > 1)
    val probe = back.filter(col("o_year") === years.min)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(600))
    // pruned scan reads strictly fewer files than the full table
    assert(probe.count() < orders.count())
    assert(probe.count() ==
      orders.filter(col("o_year") === years.min).count())
  }

  test("JSON source reads an events-shaped dump") {
    val events = Tables.load(spark, dir, "events").limit(100)
    val path = tmp("json")
    events.write.mode("overwrite").json(path)
    val schema = org.apache.spark.sql.types.StructType(
      Tables.events.fields.map(f =>
        if (f.name == "ts")
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.TimestampType)
        else f))
    val back = Sources.json(spark, path, schema)
    assert(back.count() == 100)
    assert(back.agg(sum("value")).head().getDouble(0) ==
      events.agg(sum("value")).head().getDouble(0))
  }

  test("compression codecs round-trip and zstd beats snappy on size") {
    val docs = Tables.load(spark, dir, "documents")
    def bytesOf(p: String): Long = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val zDir = tmp("codec_zstd")
    val sDir = tmp("codec_snappy")
    Sources.writeParquet(docs.coalesce(1), zDir, codec = "zstd")
    Sources.writeParquet(docs.coalesce(1), sDir, codec = "snappy")
    assert(spark.read.parquet(zDir).count() == docs.count())
    assert(spark.read.parquet(sDir).count() == docs.count())
    val (z, s) = (bytesOf(zDir), bytesOf(sDir))
    assert(z < s, s"zstd=$z snappy=$s")
    // mixed-codec directory reads transparently (parquet self-describes)
    val mixed = tmp("codec_mixed")
    Seq(zDir, sDir).zipWithIndex.foreach { case (d, i) =>
      val f = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(s"$mixed/part-$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    assert(spark.read.parquet(mixed).count() == 2 * docs.count())
  }

  test("typed loaders expose case-class rows over the same scans") {
    val docs = Tables.documents(spark, dir)
    val first = docs.filter(_.doc_id == 0L).head()
    assert(first.text.nonEmpty && first.n_chars == first.text.length)
    val ev = Tables.events(spark, dir).head()
    assert(ev.event_id >= 0L && ev.ts != null)
    val emb = Tables.embeddings(spark, dir).head()
    assert(emb.embedding.length == 64)
  }

  test("spread fans a one-partition scan out to defaultParallelism") {
    val docs = Tables.load(spark, dir, "documents")
    // the single-row-group fixture scans as one partition — the
    // condition spread exists to fix
    assert(docs.rdd.getNumPartitions <= 2, "fixture unexpectedly split")
    val s = Tables.spread(docs)
    assert(s.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // content preserved exactly (round-robin is a reshuffle, not a map)
    assert(s.count() == docs.count())
    assert(s.select(sum("doc_id")).head().getLong(0) ==
      docs.select(sum("doc_id")).head().getLong(0))
  }

  test("events loader reads both ts encodings to identical timestamps") {
    // The fixture generator has shipped events.ts as TIMESTAMP(NANOS)
    // (inferred LongType under nanosAsLong → div-1000 conversion) and as
    // logical TIMESTAMP_MICROS (inferred TimestampType → direct read).
    // Write one dir in each encoding and assert Tables.load lands on the
    // same wall-clock instants. Spark cannot WRITE nanos-annotated
    // parquet, so the nanos generation is modeled as plain int64 — which
    // infers as LongType exactly like a NANOS column does under the
    // flag, exercising the same sniff branch.
    val src = Tables.load(spark, dir, "events").limit(50)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val microsDir = tmp("ev_micros")
    val nanosDir = tmp("ev_nanos")
    src.write.mode("overwrite").parquet(s"$microsDir/events.parquet")
    src.withColumn("ts",
        unix_micros(col("ts")) * 1000L) // int64 epoch-nanos
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    val a = Tables.load(spark, microsDir, "events")
    val b = Tables.load(spark, nanosDir, "events")
    assert(a.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(b.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val av = a.orderBy("event_id").select("ts").collect().map(_.getTimestamp(0))
    val bv = b.orderBy("event_id").select("ts").collect().map(_.getTimestamp(0))
    assert(av.sameElements(bv))
    // and the sniffed range is the fixture's real range (the q_ts_sanity
    // contract): events span days, not minutes
    val span = a.agg(max(unix_timestamp(col("ts"))) -
      min(unix_timestamp(col("ts")))).head().getLong(0)
    assert(span > 3600L, s"ts span $span s — unit regression?")
  }

  test("load hands back one analyzed handle per (session, dir, table)") {
    // the handle cache contract: same coordinates -> the SAME DataFrame
    // object (no re-listing / re-analysis), different table -> different
    val a = Tables.load(spark, dir, "orders")
    val b = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "lineitem")
    assert(a eq b)
    assert(!(a eq c))
  }
}
