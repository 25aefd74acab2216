package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.{Multimodal, Similarity}

/** Multimodal-column queries: binary payloads + typed metadata derived
  * deterministically from `documents` (no binary fixture table exists).
  * The metadata aggregation is oracle-checkable — byte lengths prove the
  * binary column plumbing end-to-end; decode/feature extraction is the
  * stubbed-codec path (rows-only check).
  */
object MultimodalOps {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  val entries: Seq[Entry] = Seq(

    // X5 — metadata + payload-size aggregation over the media table.
    // Binary payload length is computed Spark-side on the binary column
    // and oracle-side on the UTF-8 encoding of the source text.
    Entry("x5_media_meta",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(t(s, dir, "documents"))
        media.toDF()
          .groupBy("kind")
          .agg(count(lit(1)).as("n"),
            sum(length(col("bytes"))).as("total_bytes"),
            sum(col("width").cast("long")).as("sum_w"),
            sum(col("n_frames").cast("long")).as("sum_frames"))
          .orderBy("kind")
      },
      Some("""SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
                                     WHEN 1 THEN 'audio'
                                     ELSE 'video' END AS kind,
                     count(*) AS n,
                     CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
                     CAST(sum(n_chars % 64 + 1) AS BIGINT) AS sum_w,
                     CAST(sum(doc_id % 7 + 1) AS BIGINT) AS sum_frames
              FROM documents GROUP BY kind ORDER BY kind""")),

    // X5c — frame sampling, oracle-gated on PROVENANCE: sampleFrames is
    // the one-row-in/many-rows-out generator shape (video -> frame
    // batch) running as a typed flatMap with the per-partition codec
    // contract; everything about it EXCEPT pixel content is exact
    // integer arithmetic — which media ids emit which frame_no, the
    // carried dims, and each decoded plane's byte size (width*height) —
    // so the full generator output rides the strict hash oracle while
    // pixel values stay stub-codec spec-gated (MultimodalSpec). A real
    // codec swap changes pixels, NOT this contract.
    Entry("x5c_frame_sample",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(t(s, dir, "documents"))
        Multimodal.sampleFrames(media, maxFrames = 4).toDF()
          .select(col("media_id"),
            col("frame_no").cast("long").as("frame_no"),
            col("width").cast("long").as("w"),
            col("height").cast("long").as("h"),
            length(col("pixels")).cast("long").as("plane_bytes"))
          .orderBy("media_id", "frame_no")
      },
      Some("""SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_no,
                     CAST(n_chars % 64 + 1 AS BIGINT) AS w,
                     CAST(n_chars % 48 + 1 AS BIGINT) AS h,
                     CAST((n_chars % 64 + 1) * (n_chars % 48 + 1)
                       AS BIGINT) AS plane_bytes
              FROM documents CROSS JOIN range(0, 4) t(f)
              WHERE f < doc_id % 7 + 1
              ORDER BY media_id, frame_no""")),

    // X5b — stubbed decode -> feature extraction -> cosine top-10 vs the
    // media_id=0 probe: the multimodal-to-similarity composition. The
    // PORTABLE stub (md5-window features, integer-valued floats) makes
    // the whole composition DuckDB-replayable -> full hash oracle; the
    // LCG-plane stub stays on the frame pipeline (decode/resize/sample,
    // MultimodalSpec).
    Entry("x5_media_features",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(t(s, dir, "documents"))
        val feats = Multimodal.extractFeaturesPortable(media).toDF()
        Similarity.cosineTopK(feats, "feature", "media_id", 0L, 10)
      },
      Some {
        val dims = (1 to 8).map(j =>
          s"""CAST(CAST(concat('0x', substring(md5(text),
              ${(j - 1) * 4 + 1}, 4)) AS BIGINT) AS DOUBLE)""")
          .mkString("[", ",\n ", "]")
        s"""WITH feats AS (
              SELECT doc_id AS media_id, $dims AS f FROM documents),
            probe AS (SELECT f AS p FROM feats WHERE media_id = 0),
            d AS (SELECT c.media_id,
                    sum(c.f[i] * p.p[i]) AS dp,
                    sqrt(sum(c.f[i] * c.f[i])) AS na,
                    sqrt(sum(p.p[i] * p.p[i])) AS nb
                  FROM feats c CROSS JOIN probe p, range(1, 9) t(i)
                  GROUP BY c.media_id)
            SELECT media_id, round(dp / (na * nb), 4) AS cos_sim
            FROM d ORDER BY cos_sim DESC, media_id LIMIT 10"""
      })
  )
}
