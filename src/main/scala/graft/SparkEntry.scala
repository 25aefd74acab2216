package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shape grouped aggregation (SURVEY §7.2 minimum slice). */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_agg_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(e => e.name -> e.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for engine-hash-based ops (MinHash
    * LSH, SimHash) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(e => e.oracle.map(o => e.name -> o)).toMap
}
