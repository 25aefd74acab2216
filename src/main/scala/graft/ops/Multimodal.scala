package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns beside typed metadata;
  * decode / resize / frame-sample / feature-extract run as partition-wise
  * batch maps (`mapPartitions` over typed Datasets — the JVM analog of
  * arrow-batched Python UDFs: one iterator per partition, codec state
  * reused across the whole batch, never per-row setup).
  *
  * !! DECODE IS A STUB !! — no image/audio codec ships in this
  * environment, so [[StubCodec]] produces a deterministic fake
  * (byte-hash-seeded). Schema, partitioning, operator signatures and
  * batch shape are the real contract and are tested; swap StubCodec for
  * a real codec (javax.imageio / ffmpeg bindings) to productionize.
  *
  * Scale: payload bytes never shuffle except where the plan says so —
  * decode/resize/extract are narrow maps; metadata-only queries prune
  * the binary column at the scan (tested in MultimodalSpec).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class Media(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, n_frames: Int)

  /** Decoded frame: pixel plane + provenance. */
  case class Frame(media_id: Long, frame_no: Int, width: Int, height: Int,
      pixels: Array[Byte])

  /** Extracted feature vector per media item. */
  case class MediaFeature(media_id: Long, kind: String,
      feature: Array[Float])

  /** Deterministic stand-in for a real codec. Every output is a pure
    * function of (bytes, dims) so tests are reproducible. */
  object StubCodec {
    /** STUB decode: fake pixel plane seeded by a rolling byte hash. */
    def decode(bytes: Array[Byte], width: Int, height: Int): Array[Byte] =
      decodeSeeded(bytes, width, height, None)

    /** [[decode]] of `bytes :+ seed` WITHOUT materializing the copy:
      * the rolling hash folds the trailing seed byte after the payload
      * loop — bit-identical output, and the frame-sampling generator
      * no longer allocates a payload-sized array per emitted frame. */
    def decodeSeeded(bytes: Array[Byte], width: Int, height: Int,
        seed: Option[Byte]): Array[Byte] = {
      val out = new Array[Byte](width * height)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      seed.foreach(b => h = 31 * h + b)
      i = 0
      while (i < out.length) { h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = (h >>> 56).toByte; i += 1 }
      out
    }

    /** Nearest-neighbor resize on a decoded plane — real arithmetic,
      * works unchanged on real pixels. */
    def resize(pixels: Array[Byte], w: Int, h: Int, outW: Int,
        outH: Int): Array[Byte] = {
      val out = new Array[Byte](outW * outH)
      var y = 0
      while (y < outH) {
        val sy = y * h / outH
        var x = 0
        while (x < outW) { out(y * outW + x) = pixels(sy * w + x * w / outW)
          x += 1 }
        y += 1
      }
      out
    }

    /** STUB feature extraction: 8-dim moment-style summary of the
      * plane (mean/extremes/quadrant means) — deterministic, and the
      * right output shape for the downstream similarity operators. */
    def features(pixels: Array[Byte]): Array[Float] = {
      if (pixels.isEmpty) return new Array[Float](8)
      val q = math.max(pixels.length / 4, 1)
      val sums = new Array[Long](4)
      var mn = 255; var mx = 0; var total = 0L
      var i = 0
      while (i < pixels.length) {
        val v = pixels(i) & 0xff
        total += v; mn = math.min(mn, v); mx = math.max(mx, v)
        sums(math.min(i / q, 3)) += v
        i += 1
      }
      Array(total.toFloat / pixels.length, mn.toFloat, mx.toFloat,
        (mx - mn).toFloat,
        sums(0).toFloat / q, sums(1).toFloat / q,
        sums(2).toFloat / q, sums(3).toFloat / q)
    }
  }

  /** A deterministic media table derived from `documents` — text bytes
    * as payload, dims derived from length. Stands in for a real
    * (id, bytes, meta) parquet/blob-store table. */
  def mediaFromDocuments(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"),
        (col("doc_id") % 7 + 1).cast("int").as("n_frames"))
      .as[Media]
  }

  /** Decode every item to frame 0 — one codec per PARTITION, reused
    * across its whole iterator (the batch shape that matters when the
    * real codec costs ~100ms to construct). */
  def decodeFrames(media: Dataset[Media]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: construct the codec HERE, once per partition
      it.map(m => Frame(m.media_id, 0, m.width, m.height,
        StubCodec.decode(m.bytes, m.width, m.height)))
    }
  }

  /** Frame-sample videos: emit n_frames frames per item (generator
    * shape — one input row, many output rows). */
  def sampleFrames(media: Dataset[Media], maxFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      (0 until math.min(m.n_frames, maxFrames)).iterator.map(f =>
        Frame(m.media_id, f, m.width, m.height,
          StubCodec.decodeSeeded(m.bytes, m.width, m.height,
            Some(f.toByte))))
    }
  }

  /** Resize decoded frames to a fixed plane. */
  def resizeFrames(frames: Dataset[Frame], outW: Int,
      outH: Int): Dataset[Frame] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions(_.map(f => Frame(f.media_id, f.frame_no, outW, outH,
      StubCodec.resize(f.pixels, f.width, f.height, outW, outH))))
  }

  /** Feature-extract per media item: decode → fixed-dim Array[Float],
    * ready for the Similarity operators (cosine top-k / near-dup). */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      MediaFeature(m.media_id, m.kind,
        StubCodec.features(StubCodec.decode(m.bytes, m.width, m.height)))
    })
  }

  /** [[extractFeatures]] with a PORTABLE stub: 8 integer-valued dims
    * from the payload's md5 (16-bit windows of the digest), instead of
    * the LCG plane summary — deterministic like the LCG stub, but
    * reproducible by any engine with md5 over the same bytes, which is
    * what lets x5_media_features carry a full DuckDB oracle. The
    * Spark-side plumbing is identical and REAL: binary column in, one
    * codec ("digest") constructed per PARTITION and reused across its
    * iterator — the batch shape a ~100ms-construction real codec
    * needs — typed Dataset[MediaFeature] out. */
  def extractFeaturesPortable(media: Dataset[Media]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val d = digest.digest(m.bytes)
        val f = Array.tabulate(8)(j =>
          (((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)).toFloat)
        MediaFeature(m.media_id, m.kind, f)
      }
    }
  }

  /** Metadata-only projection — must NOT read payload bytes at the scan
    * (column pruning on the binary column; asserted in MultimodalSpec). */
  def metadata(media: Dataset[Media]): DataFrame =
    media.toDF().select(col("media_id"), col("kind"),
      col("width"), col("height"), col("n_frames"))
}
