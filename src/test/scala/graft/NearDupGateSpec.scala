package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.NearDupGate

/** Streaming LSH near-dup gate: stream/batch/declarative three-way
  * agreement, estimator thresholding, and watermark-horizon state
  * eviction. (The p12 entry's DuckDB hash gate independently re-derives
  * every signature component; these pin the STREAMING semantics.)
  */
class NearDupGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int) =
    java.sql.Timestamp.from(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").toInstant
        .plusSeconds(min * 60L))

  // near-dup pair: 40 shared tokens, variant swaps two (J ~ 0.90);
  // the unrelated docs share no token with anything else
  private val base = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val variant = ((1 to 38).map(i => s"tok$i") ++
    Seq("changed1", "changed2")).mkString(" ")
  private val otherY = (1 to 30).map(i => s"why$i").mkString(" ")
  private val otherZ = (1 to 30).map(i => s"zed$i").mkString(" ")

  private def runStream(stream: MemoryStream[Doc],
      batches: Seq[Seq[Doc]]): Seq[(Long, Long, Long, Long)] = {
    val plan = NearDupGate.verdicts(stream.toDF(), "text", "doc_id", "ts")
    val name = s"neardup_sink_${System.nanoTime()}"
    val q = plan.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b =>
        stream.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
  }

  test("stream verdicts == batch flatMapGroups run == declarative " +
      "p12 plan when arrival follows id order") {
    import spark.implicits._
    val docs = Seq(Doc(1, ts(1), base), Doc(2, ts(2), otherY),
      Doc(3, ts(3), variant), Doc(4, ts(4), base))
    val stream = MemoryStream[Doc](spark)
    val streamed = runStream(stream,
      Seq(docs.take(2), docs.drop(2)))

    val batchDf = docs.toDF()
    val batched = NearDupGate.verdicts(batchDf, "text", "doc_id", "ts")
      .collect().map(v => (v.d1, v.d2, v.band, v.est_e6)).toSeq.sorted

    val dir = java.nio.file.Files
      .createTempDirectory("neardupgate").toString
    docs.toDF().selectExpr("doc_id", "text", "'en' AS lang",
        "'a' AS source", "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val declarative = graft.queries.TextOps.entries
      .find(_.name == "p12_neardup_gate").get.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

    assert(streamed == batched, "stream vs batch flatMapGroups")
    assert(streamed == declarative, "stream vs declarative window plan")
    // the exact dup (doc 4) must flag on every band at est 1.0; the
    // near-dup (doc 3) on at least one band; the unrelated doc never
    val flagged = streamed.map(_._2).distinct
    assert(flagged.toSet == Set(3L, 4L),
      s"expected docs 3 and 4 flagged, got $flagged")
    assert(streamed.filter(_._2 == 4L).map(_._1).distinct == Seq(1L))
    assert(streamed.filter(_._2 == 4L).forall(_._4 == 1000000L),
      "byte-identical dup must estimate 1.0 on every colliding band")
    assert(streamed.filter(_._2 == 3L).forall(v =>
      v._1 == 1L && v._4 >= 500000L))
  }

  test("bucket state evicts once the watermark passes the TTL: a " +
      "near-dup arriving after the horizon is NOT flagged") {
    import spark.implicits._
    val stream = MemoryStream[Doc](spark)
    val got = runStream(stream, Seq(
      Seq(Doc(1, ts(0), base)),
      // advances the watermark to 200 - 60 = 140 min, past doc 1's
      // 60-min timeout...
      Seq(Doc(2, ts(200), otherY)),
      // ...and this batch's processing evicts doc 1's timed-out
      // buckets (timeouts fire for keys with no new data)
      Seq(Doc(3, ts(202), otherZ)),
      // same text as doc 1, but its state is gone: becomes the new
      // representative instead of flagging
      Seq(Doc(4, ts(203), base))))
    assert(got.isEmpty,
      s"no verdict may cross the eviction horizon, got $got")
  }

  test("a doc arriving within the horizon IS flagged against the " +
      "representative (positive control for the eviction test)") {
    import spark.implicits._
    val stream = MemoryStream[Doc](spark)
    val got = runStream(stream, Seq(
      Seq(Doc(1, ts(0), base)),
      Seq(Doc(4, ts(30), base))))
    assert(got.nonEmpty && got.forall(v => v._1 == 1L && v._2 == 4L))
  }

  test("a same-doc re-fetch refreshes the representative's activity " +
      "time: no watermark-violating timeout, bucket stays alive") {
    // regression: the same-doc branch used to leave last_ms at the
    // ORIGINAL arrival, so once the watermark passed last_ms + ttl the
    // re-fetch's setTimeoutTimestamp fell below the watermark — a
    // query-fatal IllegalArgumentException — and an actively
    // re-crawled bucket would otherwise evict at original + TTL
    import spark.implicits._
    val stream = MemoryStream[Doc](spark)
    val got = runStream(stream, Seq(
      Seq(Doc(1, ts(0), base)),
      // advances the watermark to 200 - 60 = 140 min, past doc 1's
      // original 60-min timeout (but doc 1's buckets see no data, and
      // timeouts only fire from the NEXT batch on)
      Seq(Doc(2, ts(200), otherY)),
      // the re-fetch: same doc_id, same buckets, processed while the
      // watermark (140) is already past the stale last_ms + ttl (60) —
      // crashes without the refresh; with it, last_ms moves to 202
      Seq(Doc(1, ts(202), base)),
      // near-dup probe: the bucket must still be alive (timeout now
      // 262 > watermark 142), so this flags against representative 1
      Seq(Doc(5, ts(210), variant))))
    assert(got.nonEmpty && got.forall(v => v._1 == 1L && v._2 == 5L),
      s"probe must flag against the refreshed representative, got $got")
  }

  test("gate runs unchanged under the RocksDB state store") {
    // the 100 TB state backend for the per-bucket signature store:
    // same verdicts, disk-backed state
    import spark.implicits._
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Doc](spark)
      val got = runStream(stream, Seq(
        Seq(Doc(1, ts(1), base), Doc(2, ts(2), otherY)),
        Seq(Doc(3, ts(3), variant), Doc(4, ts(4), base))))
      val flagged = got.map(_._2).distinct
      assert(flagged.toSet == Set(3L, 4L),
        s"RocksDB run must flag the same docs, got $flagged")
      assert(got.filter(_._2 == 4L).forall(_._4 == 1000000L))
    } finally prev match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }
}
