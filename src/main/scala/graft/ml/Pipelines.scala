package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}
import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.feature._
import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator

/** The reference's ML pipelines re-built on MLlib built-ins — the
  * estimator-parity layer beside the relational decompositions in
  * [[RelationalML]] (SURVEY.md §2.5 E1–E7, §2.6 M1–M8).
  *
  * Shape preserved from the reference:
  *  - schema-driven column selection — numeric vs string partition of the
  *    inferred schema, never a hard-coded list (reference
  *    `utils/data_preprocessing.py:17-21`, `main.py:53-54`);
  *  - fit on train only, transform train and test (reference
  *    `utils/data_preprocessing.py:54-58`);
  *  - stage order imputer → indexers → encoders → numeric assembler →
  *    scaler → label indexer → final assembler → PCA (reference
  *    `utils/data_preprocessing.py:50`).
  *
  * Consciously fixed (flag-gated): the reference leaks its binary label
  * into the feature list because the numeric column partition excludes
  * nothing (`data_preprocessing.py:20-21`, SURVEY §7.4.6) — default here
  * excludes label columns; `compatLabelLeak = true` reproduces it.
  */
object Pipelines {

  /** Numeric / string feature-column partition off the schema. */
  def featureColumns(df: DataFrame, exclude: Set[String])
      : (Seq[String], Seq[String]) = {
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType]
        && !exclude.contains(f.name) => f.name
    }.toSeq
    val strings = df.schema.fields.collect {
      case f if f.dataType == StringType && !exclude.contains(f.name) => f.name
    }.toSeq
    (numeric, strings)
  }

  /** Raw-path pipeline (reference `main.py:47-66`): label indexer +
    * assembler over numeric columns, nothing else. */
  def rawPipeline(df: DataFrame, labelCol: String): Pipeline = {
    // same exclusion set as preprocessPipeline's default: a numeric
    // "Label" column is the exact leak the class doc calls fixed —
    // omitting it here left the leak alive on the raw path
    val (numeric, _) = featureColumns(df, Set(labelCol, "label", "Label"))
    new Pipeline().setStages(Array(
      new StringIndexer().setInputCol(labelCol).setOutputCol("label"),
      new VectorAssembler().setInputCols(numeric.toArray)
        .setOutputCol("features")))
  }

  /** Full preprocessing pipeline (reference
    * `utils/data_preprocessing.py:7-65`). */
  def preprocessPipeline(df: DataFrame, labelCol: String, pcaK: Int,
      compatLabelLeak: Boolean = false): Pipeline = {
    val exclude: Set[String] =
      if (compatLabelLeak) Set(labelCol) else Set(labelCol, "label", "Label")
    val (numeric, strings) = featureColumns(df, exclude)

    // The reference imputes in place (inputCols == outputCols,
    // `data_preprocessing.py:24`); Spark 4's Imputer appends its output
    // columns, so in-place duplicates the name — the MLlib layer uses a
    // suffix and feeds the imputed names downstream (the in-place quirk
    // is preserved verbatim in RelationalML.imputerTransform).
    val imputed = numeric.map(c => s"${c}_imp")
    val imputer = new Imputer().setStrategy("mean")
      .setInputCols(numeric.toArray).setOutputCols(imputed.toArray)
    val indexers = strings.map(c => new StringIndexer()
      .setInputCol(c).setOutputCol(s"${c}_idx"))
    val encoders = strings.map(c => new OneHotEncoder()
      .setInputCol(s"${c}_idx").setOutputCol(s"${c}_vec"))
    val numAssembler = new VectorAssembler()
      .setInputCols(imputed.toArray).setOutputCol("numeric_features")
    val scaler = new StandardScaler() // defaults: withStd, NOT withMean
      .setInputCol("numeric_features").setOutputCol("scaled_numeric_features")
    val labelIndexer = new StringIndexer()
      .setInputCol(labelCol).setOutputCol("label")
    val finalAssembler = new VectorAssembler()
      .setInputCols(("scaled_numeric_features" +: strings.map(c => s"${c}_vec"))
        .toArray)
      .setOutputCol("features_raw")
    val pca = new PCA().setInputCol("features_raw").setOutputCol("features")
      .setK(pcaK)

    new Pipeline().setStages(
      (Seq(imputer) ++ indexers ++ encoders ++
        Seq(numAssembler, scaler, labelIndexer, finalAssembler, pca))
        .toArray[PipelineStage])
  }

  /** Fit on train ONLY, transform both (reference
    * `data_preprocessing.py:54-58`), projecting to (features, label). */
  def fitTransform(pipeline: Pipeline, train: DataFrame, test: DataFrame)
      : (PipelineModel, DataFrame, DataFrame) = {
    val model = pipeline.fit(train)
    def out(df: DataFrame) = model.transform(df).select("features", "label")
    (model, out(train), out(test))
  }

  /** Classifier surface for M1–M4. MLlib has no conv/recurrent layers —
    * all four reference architectures (MLP `mlp_model.py:19-26`, CNN
    * `cnn_model.py:21-32`, RNN `rnn_model.py:19-26`, LSTM
    * `lstm_model.py:19-26`) map onto MultilayerPerceptronClassifier with
    * the architecture's dense tail as hidden layers (documented delta,
    * SURVEY §7.5; the reference itself imports this exact MLlib class at
    * `cnn_model.py:1` and never uses it). */
  def classifier(arch: String, inputDim: Int, numClasses: Int,
      maxIter: Int = 100, seed: Long = 42L)
      : MultilayerPerceptronClassifier = {
    val hidden = arch match {
      case "mlp" => Array(256, 128, 64)   // mlp_model.py:19-26 dense sizes
      case "cnn" => Array(128)            // cnn_model.py dense tail
      case "rnn" | "lstm" => Array(64)    // rnn/lstm dense tail
      case other => throw new IllegalArgumentException(s"unknown arch $other")
    }
    new MultilayerPerceptronClassifier()
      .setLayers(inputDim +: hidden :+ numClasses)
      .setMaxIter(maxIter)
      .setSeed(seed)
      .setFeaturesCol("features").setLabelCol("label")
  }

  /** M6: accuracy = avg(prediction == label). */
  def accuracy(scored: DataFrame): Double =
    new MulticlassClassificationEvaluator().setMetricName("accuracy")
      .setLabelCol("label").setPredictionCol("prediction")
      .evaluate(scored)

  /** M7: confusion matrix as groupBy(label).pivot(prediction).count()
    * (the relational form of reference `visualization.py:128-161`). */
  def confusionMatrix(scored: DataFrame): DataFrame =
    scored.groupBy("label").pivot("prediction").count()
      .na.fill(0L).orderBy("label")

  /** M8: per-model metrics emitted as a queryable DataFrame instead of
    * the reference's dict-of-history + PNG sink. */
  def metricsFrame(spark: SparkSession,
      rows: Seq[(String, Double, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("model", "accuracy", "train_seconds")
  }
}
