package graft

import org.apache.spark.sql.DataFrame
import graft.ml.Pipelines
import graft.sources.Tables

/** End-to-end replay of the reference's driver flow (`main.py:132-158`)
  * on the fixture data: ingest → raw pipeline (label-index + assemble,
  * `main.py:47-66`) AND full preprocess pipeline
  * (`data_preprocessing.py`) → per-architecture train/evaluate loop with
  * wall-clock timing (`main.py:69-111`) → metrics emitted as a
  * DataFrame (M8) instead of printed dicts + PNG sinks.
  *
  * Usage: `sbt "runMain graft.ReferencePipeline [sfDir] [maxIter]"`.
  */
object ReferencePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val maxIter = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "reference-pipeline")

    // events stands in for the UNSW-NB15 flow table: numeric features,
    // a 5-class categorical label (event_type)
    val data = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "value", "event_type")
    val Array(train, test) = data.randomSplit(Array(0.75, 0.25), seed = 42)

    // inputDim derived from the transformed frame, not hardcoded: a
    // change to the select list above or to pcaK below would otherwise
    // silently disagree with the MLP's layers(0) and fail at fit()
    def dimOf(df: DataFrame): Int =
      df.head().getAs[org.apache.spark.ml.linalg.Vector]("features").size

    // returns the fitted models keyed by arch so downstream consumers
    // (the confusion matrix) reuse them instead of re-fitting — the
    // fit is the single most expensive step in this driver
    def evalVariant(tag: String, trainF: DataFrame, testF: DataFrame)
        : (Seq[(String, Double, Double)],
           Map[String, org.apache.spark.ml.Transformer]) = {
      val fitted = Seq("mlp", "cnn").map { arch =>
        val t0 = System.nanoTime()
        val model = Pipelines.classifier(arch, dimOf(trainF),
          numClasses = 5, maxIter = maxIter).fit(trainF)
        val secs = (System.nanoTime() - t0) / 1e9
        val acc = Pipelines.accuracy(model.transform(testF))
        println(f"[$tag/$arch] accuracy=$acc%.4f train=${secs}%.1f s")
        (arch, model, (s"$tag/$arch", acc, secs))
      }
      (fitted.map(_._3), fitted.map(f => f._1 -> f._2).toMap)
    }

    // raw path (main.py prepare_raw_data)
    val rawModel = Pipelines.rawPipeline(train, "event_type").fit(train)
    def raw(df: DataFrame) = rawModel.transform(df).select("features", "label")
    val (rawMetrics, _) = evalVariant("raw", raw(train), raw(test))

    // processed path (data_preprocessing.preprocess_data, PCA k=2)
    val (_, procTrain, procTest) = Pipelines.fitTransform(
      Pipelines.preprocessPipeline(train, "event_type", pcaK = 2),
      train, test)
    val (procMetrics, procModels) =
      evalVariant("processed", procTrain, procTest)

    val metrics = Pipelines.metricsFrame(spark, rawMetrics ++ procMetrics)
    metrics.show(truncate = false)
    val confusion = Pipelines.confusionMatrix(
      procModels("mlp").transform(procTest))
    confusion.show(truncate = false)
    spark.stop()
  }
}
