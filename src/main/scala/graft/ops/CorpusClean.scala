package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-cleaning pipeline a training-data run executes
  * before tokenization — the operators of this engine chained in their
  * canonical order (cheap row-local filters first, exact dedup next,
  * near-dedup last, because each stage shrinks the next stage's input):
  *
  *  1. quality gate: row-local ratio filters (no shuffle);
  *  2. exact dedup: one hash aggregation on the content digest;
  *  3. near-dedup: MinHash+LSH keeper assignment, transitively resolved
  *     ([[Dedup.resolveClusters]]), non-roots dropped.
  *
  * Returns the surviving documents plus a per-stage audit frame — a
  * pipeline that silently drops data is undebuggable at 100 TB.
  */
object CorpusClean {

  final case class Config(
      minTokens: Long = 5,
      maxSymbolRatio: Double = 0.3,
      maxStopwordRatio: Double = 0.9,
      minHashes: Int = 32,
      bands: Int = 8,
      jaccardThreshold: Double = 0.8)

  /** @return (cleaned corpus, audit rows (stage, rows_in, rows_out)) */
  def clean(docs: DataFrame, textCol: String, idCol: String,
      config: Config = Config()): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._

    val n0 = docs.count()
    val quality = TextStats.qualityColumns(docs, textCol)
      .filter(col("n_tok") >= config.minTokens &&
        col("symbol_ratio") <= config.maxSymbolRatio &&
        col("stopword_ratio") <= config.maxStopwordRatio)
      .drop("n_tok", "mean_tok_len", "stopword_ratio", "symbol_ratio")
    val n1 = quality.count()

    val exact = Dedup.exact(quality, textCol, idCol)
    val n2 = exact.count()

    val assignments = Dedup.minhashLshDedup(exact, textCol, idCol,
      config.minHashes, config.bands, config.jaccardThreshold)
    val dropIds = Dedup.resolveClusters(assignments)
      .select(col("doc").as(idCol))
    val cleaned = exact.join(dropIds, Seq(idCol), "left_anti")
    val n3 = cleaned.count()

    val audit = Seq(
      ("quality_filter", n0, n1),
      ("exact_dedup", n1, n2),
      ("near_dedup", n2, n3)
    ).toDF("stage", "rows_in", "rows_out")
    (cleaned, audit)
  }
}
