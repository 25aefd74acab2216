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

    def evalVariant(tag: String, trainF: DataFrame, testF: DataFrame,
        inputDim: Int): Seq[(String, Double, Double)] =
      Seq("mlp", "cnn").map { arch =>
        val t0 = System.nanoTime()
        val model = Pipelines.classifier(arch, inputDim, numClasses = 5,
          maxIter = maxIter).fit(trainF)
        val secs = (System.nanoTime() - t0) / 1e9
        val acc = Pipelines.accuracy(model.transform(testF))
        println(f"[$tag/$arch] accuracy=$acc%.4f train=${secs}%.1f s")
        (s"$tag/$arch", acc, secs)
      }

    // raw path (main.py prepare_raw_data)
    val rawModel = Pipelines.rawPipeline(train, "event_type").fit(train)
    def raw(df: DataFrame) = rawModel.transform(df).select("features", "label")
    val rawMetrics = evalVariant("raw", raw(train), raw(test), inputDim = 3)

    // processed path (data_preprocessing.preprocess_data, PCA k=2)
    val (_, procTrain, procTest) = Pipelines.fitTransform(
      Pipelines.preprocessPipeline(train, "event_type", pcaK = 2),
      train, test)
    val procMetrics = evalVariant("processed", procTrain, procTest,
      inputDim = 2)

    val metrics = Pipelines.metricsFrame(spark, rawMetrics ++ procMetrics)
    metrics.show(truncate = false)
    val confusion = Pipelines.confusionMatrix(
      Pipelines.classifier("mlp", 2, 5, maxIter).fit(procTrain)
        .transform(procTest))
    confusion.show(truncate = false)
    spark.stop()
  }
}
