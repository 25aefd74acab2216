package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.{Media, StubCodec}
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def media = Multimodal.mediaFromDocuments(
    Tables.load(spark, dir, "documents"))

  test("stub decode is deterministic and emits width*height pixels") {
    val a = StubCodec.decode("hello".getBytes, 4, 3)
    val b = StubCodec.decode("hello".getBytes, 4, 3)
    assert(a.length == 12 && a.sameElements(b))
    assert(!StubCodec.decode("other".getBytes, 4, 3).sameElements(a))
  }

  test("resize produces the requested plane from real arithmetic") {
    // 2x2 checkerboard upscaled 4x4 keeps quadrant structure
    val src: Array[Byte] = Array(0, 100, 100, 0).map(_.toByte)
    val out = StubCodec.resize(src, 2, 2, 4, 4)
    assert(out.length == 16)
    assert(out(0) == 0 && out(3) == 100.toByte)
    assert(out(12) == 100.toByte && out(15) == 0)
  }

  test("decodeFrames maps every media item to a frame-0 plane") {
    val frames = Multimodal.decodeFrames(media)
    val rows = frames.collect()
    assert(rows.length == media.count())
    assert(rows.forall(f => f.pixels.length == f.width * f.height))
    assert(rows.forall(_.frame_no == 0))
  }

  test("sampleFrames emits min(n_frames, max) rows per item") {
    val sampled = Multimodal.sampleFrames(media, maxFrames = 3)
    val perItem = sampled.collect().groupBy(_.media_id)
    val declared = media.collect().map(m => m.media_id -> m.n_frames).toMap
    perItem.foreach { case (id, fs) =>
      assert(fs.length == math.min(declared(id), 3))
      assert(fs.map(_.frame_no).sorted.sameElements(0 until fs.length))
    }
    // frames of the same item differ (frame_no seeds the stub decode)
    val multi = perItem.values.find(_.length > 1).get.sortBy(_.frame_no)
    assert(!multi(0).pixels.sameElements(multi(1).pixels))
  }

  test("feature extraction yields fixed-dim vectors usable downstream") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(_.feature.length == 8))
    // mean pixel (dim 0) must lie in [min, max] (dims 1, 2)
    feats.foreach { f =>
      assert(f.feature(0) >= f.feature(1) && f.feature(0) <= f.feature(2))
    }
  }

  test("metadata-only query prunes the binary payload at the scan") {
    // write media as parquet so the scan has a real ReadSchema to prune
    val path = java.nio.file.Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(path)
    val meta = Multimodal.metadata(
      spark.read.parquet(path).as[Media](media.encoder))
    val plan = meta.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("bytes"), s"binary column not pruned:\n$plan")
  }

  test("x5 media queries execute through the registry") {
    val metaRows = graft.queries.Registry.all.find(_.name == "x5_media_meta")
      .get.run(spark, dir).collect()
    assert(metaRows.map(_.getAs[String]("kind")).sorted
      .sameElements(Array("audio", "image", "video")))
    val top = graft.queries.Registry.all.find(_.name == "x5_media_features")
      .get.run(spark, dir).collect()
    assert(top.length == 10 && top.head.getLong(0) == 0L)
  }
}
