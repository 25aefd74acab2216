package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import graft.ml.{Pipelines, RelationalML}
import graft.sources.Tables

/** Estimator-parity layer: the MLlib pipeline mirrors the reference's
  * stage list; relational PCA matches MLlib PCA up to component sign;
  * the M1 classifier surface trains and scores end-to-end. */
class MLPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("featureColumns partitions schema into numeric/string") {
    val cust = Tables.load(spark, dir, "customer")
    val (num, str) = Pipelines.featureColumns(cust, Set("c_mktsegment"))
    assert(num == Seq("c_custkey", "c_nationkey", "c_acctbal"))
    assert(str == Seq("c_name"))
  }

  test("preprocess pipeline runs the reference stage order end-to-end") {
    val cust = Tables.load(spark, dir, "customer")
      .select("c_nationkey", "c_acctbal", "c_mktsegment", "c_name")
      .withColumn("lbl", substring(col("c_name"), -1, 1))
      .drop("c_name")
    val Array(train, test) = cust.randomSplit(Array(0.8, 0.2), seed = 42)
    val pipeline = Pipelines.preprocessPipeline(train, "lbl", pcaK = 3)
    val (model, trainOut, testOut) = Pipelines.fitTransform(pipeline, train, test)
    assert(trainOut.columns.toSeq == Seq("features", "label"))
    val v = trainOut.head().getAs[Vector]("features")
    assert(v.size == 3) // PCA k
    assert(testOut.count() > 0)
    // fit state came from train only: stages exist for imputer..pca
    assert(model.stages.length == 1 + 2 * 1 + 5) // imputer + idx/enc + 5 tail
  }

  test("relational PCA matches MLlib PCA up to component sign") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val cols = li.columns.toSeq
    val comps = RelationalML.pcaFit(li, cols, 2)
    val ours = RelationalML.pcaTransform(li, cols, comps, "proj")
      .select("proj").limit(5).collect().map(_.getSeq[Double](0))

    val assembled = new VectorAssembler().setInputCols(cols.toArray)
      .setOutputCol("fv").transform(li)
    val mllib = new PCA().setInputCol("fv").setOutputCol("proj").setK(2)
      .fit(assembled).transform(assembled)
      .select("proj").limit(5).collect().map(_.getAs[Vector](0).toArray.toSeq)

    ours.zip(mllib).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(math.abs(x) - math.abs(y)) < 1e-6,
          s"|$x| != |$y|") }
    }
  }

  test("M1 classifier surface trains and scores on the embeddings fixture") {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(array_to_vector(col("embedding")).as("features"),
        col("label").cast("double").as("label"))
    val Array(train, test) = emb.randomSplit(Array(0.8, 0.2), seed = 42)
    val clf = Pipelines.classifier("rnn", inputDim = 64, numClasses = 10,
      maxIter = 5)
    val scored = clf.fit(train).transform(test)
    val acc = Pipelines.accuracy(scored)
    assert(acc >= 0.0 && acc <= 1.0)
    val preds = scored.select("prediction").distinct()
      .collect().map(_.getDouble(0))
    assert(preds.forall(p => p >= 0 && p <= 9))
    val cm = Pipelines.confusionMatrix(scored)
    val cmTotal = cm.columns.filter(_ != "label")
      .map(c => cm.agg(sum(col(s"`$c`"))).head().getLong(0)).sum
    assert(cmTotal == scored.count())
  }

  test("all four reference architectures resolve to an estimator") {
    Seq("mlp", "cnn", "rnn", "lstm").foreach { arch =>
      val c = Pipelines.classifier(arch, 10, 3)
      assert(c.getLayers.head == 10 && c.getLayers.last == 3)
    }
    intercept[IllegalArgumentException](Pipelines.classifier("gru", 10, 3))
  }

  test("metricsFrame emits the M8 record as a queryable DataFrame") {
    val m = Pipelines.metricsFrame(spark,
      Seq(("mlp", 0.9, 12.5), ("cnn", 0.8, 30.1)))
    assert(m.filter(col("accuracy") > 0.85).count() == 1)
  }
}
