package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the corpus-cleaning pipeline — the recurring-crawl
  * ingest shape (`readStream` over landing files / a queue) with the
  * SAME row-local expressions as the batch `CorpusClean.clean`
  * (reference lineage: the batch pipeline descends from the reference's
  * preprocessing chain, `utils/data_preprocessing.py`; this surface is
  * the engine's §2.8 extension of it):
  *
  *  1. quality gate — the fused `text_quality_counts` kernel columns
  *     (token count, symbol ratio, stopword ratio); pure row-local
  *     projection, streams unchanged.
  *  2. optional digit-run redaction — row-local `regexp_replace`.
  *  3. exact dedup — `dropDuplicatesWithinWatermark` on the sha256
  *     content digest: the ONE stateful operator in the plan, and its
  *     state is digest-sized and watermark-bounded (a crawl re-fetching
  *     the same page within the horizon collapses; state evicts as
  *     event time passes — unbounded-corpus-safe where a batch-style
  *     global dedup would grow state forever).
  *  4. decontamination flag — shared-shingle count against the
  *     benchmark's shingle-hash set carried as PLAN STATE in the
  *     `long_set_count` kernel (sorted once at construction, binary
  *     search per row element). The benchmark side is eval-set-sized
  *     by construction (the t_decontam_bloom contract), so the driver
  *     state here is the same O(bench) the batch broadcast path ships
  *     — and the stream side stays row-local: no shingle ever enters a
  *     shuffle or a state store.
  *
  * Every stage except (3) is a stateless projection, so the plan runs
  * on a batch frame too; there the dedup swaps to the deterministic
  * min-id keeper window (`dropDuplicatesWithinWatermark` is
  * streaming-only) — CorpusIngestSpec asserts stream/batch agreement
  * on data where first-arrival and min-id coincide, the standing
  * evidence pattern for the engine's streaming surfaces.
  *
  * Semantics vs batch `CorpusClean.clean`: the quality gate, redaction,
  * digest, and the shared-shingle count are expression-identical; the
  * differences are inherent to streaming — dedup keeps the FIRST
  * arrival (not the min id) and only within the watermark horizon, and
  * the decontamination cap (`maxShingleDf`) does not apply because the
  * training-side document frequency is unknowable mid-stream (the
  * benchmark-membership flag never needs it: the literal set is exact).
  *
  * Output: the surviving rows with `shared_shingles` (LONG) and
  * `contaminated` (BOOLEAN) appended — flagged, not dropped, so the
  * sink can route contaminated docs to quarantine rather than lose the
  * audit trail.
  */
object CorpusIngest {

  /** Collect the benchmark's distinct shingle-hash keys for
    * [[ingest]]'s literal set — eval-set-sized driver fit state (the
    * same bound as the batch broadcast side). Sorted for a
    * deterministic plan literal. */
  def benchShingleKeys(bench: DataFrame, textCol: String,
      shingleN: Int = 3): Array[Long] = {
    // sort DRIVER-side: the frame is eval-set-sized, and a distributed
    // orderBy here pays a range-exchange (bounds-sampling re-executes
    // the child) plus one extra job for a sort over ~10^3-10^5 longs
    val keys = bench.select(
        explode(graft.functions.TokenKernelFns.ngramXx64Set(
          bench.sparkSession, split(col(textCol), " "), shingleN)).as("k"))
      .distinct()
      .collect().map(_.getLong(0))
    java.util.Arrays.sort(keys)
    keys
  }

  /** Quality → redact → watermark-bounded digest dedup → decontam flag
    * over a (possibly streaming) documents frame. `benchShingles`
    * empty disables the decontamination stage (columns still emitted,
    * zero/false). */
  def ingest(docs: DataFrame, textCol: String, idCol: String,
      tsCol: String,
      benchShingles: Seq[Long] = Nil,
      watermark: String = "1 hour",
      minTokens: Long = 5,
      maxSymbolRatio: Double = 0.3,
      maxStopwordRatio: Double = 0.9,
      redactDigits: Boolean = false,
      contaminationShingles: Int = 3,
      shingleN: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val gated = graft.ops.TextStats.qualityColumns(docs, textCol)
      .filter(col("n_tok") >= minTokens &&
        col("symbol_ratio") <= maxSymbolRatio &&
        col("stopword_ratio") <= maxStopwordRatio)
      .drop("n_tok", "mean_tok_len", "stopword_ratio", "symbol_ratio")
    val redacted =
      if (redactDigits)
        gated.withColumn(textCol,
          regexp_replace(col(textCol), "[0-9]+", "<NUM>"))
      else gated
    val hashed = redacted.withColumn("content_hash", sha2(col(textCol), 256))
    // dropDuplicatesWithinWatermark is streaming-only (analysis rejects
    // it on batch frames); the batch twin keeps the DETERMINISTIC
    // min-(id, ts) row per digest — first-arrival vs min-id is the one
    // documented semantic difference between the two modes. row_number
    // (not min(id) == id) so a corpus carrying DUPLICATE ids with
    // identical text still yields exactly one survivor per digest, the
    // contract the streaming side and the oracle both assume
    // (round-12 ADVICE).
    val deduped =
      (if (hashed.isStreaming)
        hashed.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("content_hash")
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("content_hash").orderBy(col(idCol), col(tsCol))
        hashed
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }).drop("content_hash")
    if (benchShingles.isEmpty)
      deduped.withColumn("shared_shingles", lit(0L))
        .withColumn("contaminated", lit(false))
    else
      // membership count via the long_set_count kernel — the bench set
      // sorts ONCE into plan state and each row binary-searches its
      // (per-row-distinct) shingle hashes; size(array_intersect(arr,
      // lit(keys))) is the same number but rebuilds a hash set from the
      // keys literal on EVERY row (kernel scaladoc; spec pins parity)
      deduped
        .withColumn("shared_shingles",
          graft.functions.LongSetCountExpr.longSetCount(spark,
            graft.functions.TokenKernelFns.ngramXx64Set(
              spark, split(col(textCol), " "), shingleN),
            benchShingles))
        .withColumn("contaminated",
          col("shared_shingles") >= contaminationShingles)
  }
}
