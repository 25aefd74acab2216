package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Similarity}
import graft.ops.Multimodal.{ImageIoCodec, Media, StubCodec}
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

  /** A deterministic RGB PNG written by the JDK itself — a REAL image
    * payload, no fixtures on disk, no new dependencies. */
  private def png(seed: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (seed * 37 + x * 11 + y * 23) & 0xff
      val g = (seed * 13 + x * 29 + y * 7) & 0xff
      val b = (seed * 53 + x * 3 + y * 41) & 0xff
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes real PNG bytes: dims from header, 601 luma") {
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(2, 0, 0x0000ff); img.setRGB(0, 1, 0xffffff)
    img.setRGB(1, 1, 0x000000); img.setRGB(2, 1, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    // declared dims are deliberately wrong: a real codec must read the
    // payload's own header, not trust the metadata columns
    val p = ImageIoCodec.decodePlane(bos.toByteArray, 99, 99)
    assert(p.width == 3 && p.height == 2)
    val luma = p.pixels.map(_ & 0xff)
    assert(luma.sameElements(Array(76, 149, 29, 255, 0, 128)))
    assert(intercept[IllegalArgumentException] {
      ImageIoCodec.decodePlane("not an image".getBytes, 1, 1)
    }.getMessage.contains("undecodable"))
  }

  test("real codec swap: decode→resize→features→top-k on PNG payloads") {
    import spark.implicits._
    // metadata dims are a decoy (-1): everything downstream must carry
    // the codec's true dims, proving the swap changes pixels, not the
    // operator contract
    val rows = (0L until 12L).map(i => Media(i, "image",
      png(i.toInt, 8 + (i % 3).toInt, 6 + (i % 2).toInt), -1, -1, 1))
    val mediaDs = spark.createDataset(rows)

    val frames = Multimodal.decodeFrames(mediaDs, ImageIoCodec)
    val fr = frames.collect().sortBy(_.media_id)
    assert(fr.length == 12)
    assert(fr.forall(f => f.pixels.length == f.width * f.height))
    assert(fr(0).width == 8 && fr(0).height == 6)
    assert(fr(1).width == 9 && fr(1).height == 7)

    val resized = Multimodal.resizeFrames(frames, 4, 4).collect()
    assert(resized.forall(f =>
      f.width == 4 && f.height == 4 && f.pixels.length == 16))

    val feats = Multimodal.extractFeatures(mediaDs, ImageIoCodec)
    val fRows = feats.collect()
    assert(fRows.forall(_.feature.length == 8))
    fRows.foreach(f =>
      assert(f.feature(0) >= f.feature(1) && f.feature(0) <= f.feature(2)))
    // deterministic: a second distributed run is bit-identical
    val again = Multimodal.extractFeatures(mediaDs, ImageIoCodec).collect()
    assert(fRows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })

    val top = Similarity.cosineTopK(feats.toDF(), "feature", "media_id",
      probeId = 0L, k = 5).collect()
    assert(top.length == 5 && top.head.getLong(0) == 0L)
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
