package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's ML preprocessing stages re-expressed as pure
  * relational fit/transform pairs (SURVEY.md §2.5, E1–E5).
  *
  * Each stage is two dataflow operators: a *fit* (an aggregation
  * producing O(columns) of model state on the driver) and a *transform*
  * (a stateless per-row map, broadcast-safe). This is exactly the shape
  * the reference relies on via `pyspark.ml` (reference
  * `utils/data_preprocessing.py:7-65`), decomposed so the semantics are
  * oracle-checkable and streaming-safe.
  *
  * Scale: fits are single hash-aggregations with map-side partials; the
  * only driver materialization is the tiny model state (means/stds: one
  * row; indexer maps: #distinct-categories rows) — never data rows.
  */
object RelationalML {

  /** StringIndexer fit (E2, reference `main.py:50`,
    * `data_preprocessing.py:27,38`): distinct values ordered by
    * frequency descending, ties broken alphabetically ascending; index 0
    * is the most frequent. Returned frame: (value, cnt, idx).
    */
  def stringIndexerFit(df: DataFrame, c: String): DataFrame = {
    // Global (unpartitioned) window = single-partition sort, normally a
    // scale smell — justified here because its input is the ALREADY
    // AGGREGATED distinct-category frame: O(cardinality) rows, not
    // O(data). Same rationale as stringIndexerFitMulti's per-column
    // window below, which partitions by column name.
    val w = Window.orderBy(desc("cnt"), asc(c))
    df.groupBy(c).agg(count(lit(1)).as("cnt"))
      .withColumn("idx", (row_number().over(w) - 1).cast("long"))
  }

  /** StringIndexer transform: broadcast-join the tiny fitted map. Rows
    * with values unseen at fit time get a null idx (the caller decides
    * between error / skip — MLlib default `handleInvalid=error`).
    */
  def stringIndexerTransform(df: DataFrame, c: String, model: DataFrame,
      out: String): DataFrame = {
    val m = broadcast(model.select(col(c).as(s"__val_$c"), col("idx").as(out)))
    df.join(m, df(c) === m(s"__val_$c"), "left").drop(s"__val_$c")
  }

  /** Multi-column StringIndexer fit in ONE Spark job (the reference
    * eagerly fits one indexer per categorical column — one job each,
    * `data_preprocessing.py:27`; SURVEY §4 collapses them): explode
    * (column-name, value) pairs, aggregate counts once, rank within
    * each column. Returned frame: (column, value, cnt, idx). */
  def stringIndexerFitMulti(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = df.select(explode(map(
      cols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*)))
      .toDF("column", "value")
    val w = Window.partitionBy("column").orderBy(desc("cnt"), asc("value"))
    pairs.groupBy("column", "value").agg(count(lit(1)).as("cnt"))
      .withColumn("idx", (row_number().over(w) - 1).cast("long"))
  }

  /** Imputer fit (E1, reference `data_preprocessing.py:24`): per-column
    * mean ignoring null AND NaN (MLlib strategy `mean`). One aggregation
    * over all columns at once — the reference runs these per-stage; we
    * collapse to a single job.
    */
  def imputerFit(df: DataFrame, cols: Seq[String]): Map[String, Double] = {
    val aggs = cols.map(c =>
      avg(when(!isnan(col(c)), col(c))).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      // avg over an entirely null/NaN column is null — surface a clear
      // error (MLlib's Imputer does the same) instead of an NPE
      if (row.isNullAt(i))
        throw new IllegalArgumentException(
          s"imputerFit: surrogate for column '$c' is undefined " +
            "(all values null/NaN)")
      c -> row.getDouble(i)
    }.toMap
  }

  /** Imputer transform: in-place overwrite (inputCols == outputCols),
    * matching the reference quirk (SURVEY §7.4.7). */
  def imputerTransform(df: DataFrame, means: Map[String, Double]): DataFrame =
    means.foldLeft(df) { case (d, (c, m)) =>
      d.withColumn(c,
        when(col(c).isNull || isnan(col(c)), lit(m)).otherwise(col(c)))
    }

  /** StandardScaler fit (E5, reference `data_preprocessing.py:35`):
    * per-column SAMPLE stddev (Bessel-corrected). MLlib defaults are
    * `withStd=true, withMean=false` — division only, no centering
    * (must-preserve semantic, SURVEY §7.4.1-2).
    */
  def scalerFit(df: DataFrame, cols: Seq[String]): Map[String, Double] = {
    val aggs = cols.map(c => stddev_samp(col(c)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      // explicit error over getDouble's opaque NPE (the imputerFit
      // guard): stddev_samp is NULL on an empty frame or all-null
      // column, and a single-row column yields NaN — scalerTransform's
      // zero-variance guard handles the NaN downstream
      require(!row.isNullAt(i),
        s"scalerFit: column '$c' has no non-null values")
      c -> row.getDouble(i)
    }.toMap
  }

  /** StandardScaler transform: x / std; zero-variance columns pass
    * through as 0.0 (MLlib guard). */
  def scalerTransform(df: DataFrame, stds: Map[String, Double],
      suffix: String = "_scaled"): DataFrame =
    stds.foldLeft(df) { case (d, (c, s)) =>
      val scaled = if (s == 0.0 || s.isNaN) lit(0.0) else col(c) / lit(s)
      d.withColumn(c + suffix, scaled)
    }

  /** OneHotEncoder transform (E3, reference `data_preprocessing.py:28`):
    * indicator columns in fitted index order with `dropLast=true` — the
    * last (least frequent / alphabetically last among ties) category maps
    * to the all-zeros vector. `categories` must be in index order.
    */
  def oneHotColumns(c: String, categories: Seq[String],
      dropLast: Boolean = true): Seq[Column] = {
    val kept = if (dropLast) categories.dropRight(1) else categories
    kept.zipWithIndex.map { case (cat, i) =>
      when(col(c) === lit(cat), 1L).otherwise(0L).as(s"v$i")
    }
  }

  /** VectorAssembler analog (E4, reference `main.py:57`,
    * `data_preprocessing.py:34,41-44`): horizontal concat of scalar
    * columns into one ArrayType(Double) column, in declared order. */
  def assemble(cols: Seq[String], out: String): Column =
    array(cols.map(c => col(c).cast("double")): _*).as(out)

  /** Pipeline composition (E7, reference `main.py:60-64`,
    * `data_preprocessing.py:50-58`) in relational form: an ordered chain
    * of DataFrame => DataFrame transforms. Fit state for each stage is
    * produced by the stage's fit function on the TRAIN frame only; the
    * composed transform then applies to train and test alike. */
  def pipeline(stages: Seq[DataFrame => DataFrame]): DataFrame => DataFrame =
    stages.reduceLeft(_ andThen _)

  /** The reference's full preprocess chain (minus PCA) as one relational
    * fit: impute numerics -> scale numerics -> index label, fit on
    * `train` only. Returns the composed transform. */
  def preprocessFit(train: DataFrame, numCols: Seq[String],
      labelCol: String): DataFrame => DataFrame = {
    val means = imputerFit(train, numCols)
    val stds = scalerFit(imputerTransform(train, means), numCols)
    val labelMap = stringIndexerFit(train, labelCol)
    pipeline(Seq(
      df => imputerTransform(df, means),
      df => scalerTransform(df, stds),
      df => stringIndexerTransform(df, labelCol, labelMap, "label")))
  }

  /** PCA fit (E6, reference `data_preprocessing.py:47`): the sample
    * covariance matrix is one distributed aggregation — d*(d+3)/2 sums
    * (pair products + means), O(d^2) driver state, never O(rows) — then
    * a driver-local Breeze eigendecomposition, exactly MLlib's shape
    * (treeAggregate Gramian + local SVD). Returns the top-k principal
    * components as rows, eigenvalue-descending. Component SIGN is
    * arbitrary (both engines pick one) — compare |projections| in tests
    * (SURVEY §5.2). */
  def pcaFit(df: DataFrame, cols: Seq[String], k: Int): Array[Array[Double]] = {
    val d = cols.length
    require(k <= d, s"k=$k > d=$d")
    val pairs = for (i <- 0 until d; j <- i until d) yield (i, j)
    // cast to double INSIDE the sums: integer feature columns would
    // otherwise aggregate as LongType and getDouble below would throw
    // ClassCastException (avg already returns double for any numeric)
    val aggs = cols.map(c => avg(col(c)).as(s"m_$c")) ++
      pairs.map { case (i, j) =>
        sum(col(cols(i)).cast("double") * col(cols(j)).cast("double"))
          .as(s"s_${i}_$j") } ++
      Seq(count(lit(1)).as("n"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    require(!row.isNullAt(0),
      "pcaFit: empty input frame (no rows to fit on)")
    val means = (0 until d).map(row.getDouble(_)).toArray
    val n = row.getLong(row.length - 1).toDouble
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    pairs.zipWithIndex.foreach { case ((i, j), pi) =>
      val sij = row.getDouble(d + pi)
      val c = (sij - n * means(i) * means(j)) / (n - 1)
      cov(i, j) = c; cov(j, i) = c
    }
    val es = breeze.linalg.eigSym(cov)
    // eigSym returns ascending eigenvalues — take the top k, descending
    (1 to k).map(i => es.eigenvectors(::, d - i).toArray).toArray
  }

  /** PCA transform: k dot products per row against the broadcast
    * component matrix — a stateless codegen'd map, streaming-safe. */
  def pcaTransform(df: DataFrame, cols: Seq[String],
      components: Array[Array[Double]], out: String): DataFrame = {
    val projections = components.toIndexedSeq.map { comp =>
      cols.zipWithIndex.map { case (c, i) => col(c) * lit(comp(i)) }
        .reduce(_ + _)
    }
    df.withColumn(out, array(projections: _*))
  }
}
