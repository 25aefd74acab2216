package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Non-parquet sources and the write sinks (SURVEY.md §2.1).
  *
  * The reference's only source is header CSV with `inferSchema=True`
  * (reference `main.py:34-41`) — which costs a full extra pass per file.
  * The engine supports both forms but defaults to an explicit schema:
  * at 100 TB the inference pass is the difference between reading the
  * data once and twice, and an inferred schema can silently drift
  * between files.
  */
object Sources {

  /** Header CSV with explicit schema — one pass, stable types. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Header CSV with schema inference — the reference's exact read shape
    * (two passes; kept for compatibility). */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** JSON lines with explicit schema. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Partitioned parquet sink: the layout that makes partition pruning
    * work downstream — a filter on a partition column skips whole
    * directories at the scan (asserted in SourcesSpec). At 100 TB,
    * partition on the column your queries filter by (dates, tenants). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Plain CSV sink with header (round-trips through `csv` above). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Parquet sink with an explicit compression codec. The tradeoff at
    * 100 TB: `zstd` ~30-40% smaller files than the `snappy` default
    * (less IO + storage, slightly more CPU), `none` only for
    * scratch data that is written once and read once. Read side needs
    * nothing — parquet files self-describe their codec per column
    * chunk, so mixed-codec directories read transparently. */
  def writeParquet(df: DataFrame, path: String,
      codec: String = "zstd"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", codec)
      .parquet(path)
}
