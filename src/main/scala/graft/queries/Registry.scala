package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark plan builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Names of computed columns MUST match
  * between the two — the correctness gate hashes column-name-sorted
  * values.
  */
final case class Entry(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Entries declaring the same token build byte-identical cached
      * input frames (e.g. the x4 family's hashed token-set kernel
      * output); Bench runs such siblings back-to-back against ONE
      * warmed cache instead of paying the identical persist() fill per
      * entry per attempt — modeling the real pipeline, which tokenizes
      * the corpus once and scores it several ways. Correctness runs
      * (Verify) still isolate every entry with a full cache clear. */
    sharedInput: Option[String] = None)

object Registry {
  /** Full declared inventory (SURVEY.md §2.9 + LLM-pipeline extensions). */
  def all: Seq[Entry] =
    Relational.entries ++ Analytics.entries ++ MLRelational.entries ++
      TimeWindows.entries ++ TextOps.entries ++ SimilarityOps.entries ++
      MultimodalOps.entries ++ NeuralOps.entries ++ CorpusOps.entries ++
      GraphLayout.entries
}
