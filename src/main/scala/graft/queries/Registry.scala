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
    oracle: Option[String])

object Registry {
  /** Full declared inventory (SURVEY.md §2.9 + LLM-pipeline extensions). */
  def all: Seq[Entry] =
    Relational.entries ++ Analytics.entries ++ MLRelational.entries ++
      TimeWindows.entries ++ TextOps.entries ++ SimilarityOps.entries ++
      MultimodalOps.entries ++ NeuralOps.entries ++ CorpusOps.entries ++
      GraphLayout.entries
}
