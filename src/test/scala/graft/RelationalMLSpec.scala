package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{Imputer, OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import graft.ml.RelationalML

/** The relational decompositions must reproduce MLlib's semantics
  * exactly (SURVEY.md §2.5 — each stage tested decomposition ≡ built-in,
  * including the reference's quirk list §7.4). */
class RelationalMLSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stringIndexerFit matches MLlib frequencyDesc order incl. ties") {
    // b:3, a:2, c:2, d:1 — a/c tie broken alphabetically
    val df = Seq("b", "b", "b", "a", "a", "c", "c", "d").toDF("v")
    val ours = RelationalML.stringIndexerFit(df, "v")
      .orderBy("idx").select("v").as[String].collect()
    val mllib = new StringIndexer().setInputCol("v").setOutputCol("i")
      .fit(df).labelsArray(0)
    assert(ours.sameElements(mllib))
    assert(ours.sameElements(Array("b", "a", "c", "d")))
  }

  test("stringIndexerTransform matches MLlib transform output") {
    val df = Seq("b", "b", "a", "c").toDF("v")
    val model = RelationalML.stringIndexerFit(df, "v")
    val ours = RelationalML.stringIndexerTransform(df, "v", model, "idx")
      .select(col("v"), col("idx").cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    val mllib = new StringIndexer().setInputCol("v").setOutputCol("idx")
      .fit(df).transform(df).select("v", "idx").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(ours == mllib)
  }

  test("multi-column indexer fit matches per-column fits in one job") {
    val cust = graft.sources.Tables.load(spark, TestSpark.sf0001, "customer")
    val multi = RelationalML.stringIndexerFitMulti(cust,
      Seq("c_mktsegment", "c_name"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("idx"))
      .toMap
    Seq("c_mktsegment", "c_name").foreach { c =>
      RelationalML.stringIndexerFit(cust, c).collect().foreach { r =>
        assert(multi((c, r.getString(0))) == r.getAs[Long]("idx"),
          s"$c/${r.getString(0)}")
      }
    }
  }

  test("imputer mean matches MLlib (nulls and NaNs ignored)") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (3.0, Double.NaN), (null, 20.0), (5.0, 30.0))
      .toDF("x", "y")
    val means = RelationalML.imputerFit(df, Seq("x", "y"))
    val mllib = new Imputer().setInputCols(Array("x", "y"))
      .setOutputCols(Array("xi", "yi")).setStrategy("mean").fit(df)
    val surrogate = mllib.surrogateDF.head()
    assert(math.abs(means("x") - surrogate.getDouble(0)) < 1e-12)
    assert(math.abs(means("y") - surrogate.getDouble(1)) < 1e-12)
    // transform overwrites in place, matching inputCols==outputCols quirk
    val imputed = RelationalML.imputerTransform(df, means)
      .select("x").as[Double].collect().sorted
    assert(imputed.sameElements(Array(1.0, 3.0, 3.0, 5.0)))
  }

  test("scaler divides by sample stddev and does NOT center (MLlib default)") {
    val df = Seq(2.0, 4.0, 6.0, 8.0).toDF("x")
    val stds = RelationalML.scalerFit(df, Seq("x"))
    val ours = RelationalML.scalerTransform(df, stds)
      .select("x_scaled").as[Double].collect().sorted
    val assembler = new VectorAssembler().setInputCols(Array("x"))
      .setOutputCol("fv")
    val scaled = new StandardScaler().setInputCol("fv").setOutputCol("sv")
      .fit(assembler.transform(df)).transform(assembler.transform(df))
      .select("sv").collect().map(_.getAs[Vector](0)(0)).sorted
    ours.zip(scaled).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    // not centered: all positive inputs stay positive
    assert(ours.forall(_ > 0))
  }

  test("zero-variance column scales to 0.0 like MLlib") {
    val df = Seq(5.0, 5.0, 5.0).toDF("x")
    val stds = RelationalML.scalerFit(df, Seq("x"))
    val out = RelationalML.scalerTransform(df, stds)
      .select("x_scaled").as[Double].collect()
    assert(out.forall(_ == 0.0))
  }

  test("oneHotColumns matches MLlib dropLast semantics") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("v")
    val fitted = RelationalML.stringIndexerFit(df, "v")
      .orderBy("idx").select("v").as[String].collect().toSeq
    val inds = RelationalML.oneHotColumns("v", fitted)
    assert(inds.length == 2) // 3 categories, last dropped
    val ours = df.select(inds: _*).collect()
      .map(r => (0 until 2).map(r.getLong).toList)
    // MLlib path
    val indexed = new StringIndexer().setInputCol("v").setOutputCol("i")
      .fit(df).transform(df)
    val enc = new OneHotEncoder().setInputCol("i").setOutputCol("o")
      .fit(indexed).transform(indexed)
      .select("o").collect().map(_.getAs[Vector](0).toArray.map(_.toLong).toList)
    assert(ours.toSeq == enc.toSeq)
    // 'c' (last) is the all-zeros row
    val cRow = df.withColumn("z", concat_ws(",", inds.map(_.cast("string")): _*))
      .filter(col("v") === "c").select("z").head().getString(0)
    assert(cRow == "0,0")
  }

  test("relational pipeline composes fit-on-train transforms (E7)") {
    import spark.implicits._
    val train = Seq((1.0, "yes"), (3.0, "no"), (Double.NaN, "yes"))
      .toDF("x", "lbl")
    val test = Seq((2.0, "yes"), (Double.NaN, "no")).toDF("x", "lbl")
    val transform = RelationalML.preprocessFit(train, Seq("x"), "lbl")
    val out = transform(test).select("x_scaled", "label").collect()
    // NaN imputed with TRAIN mean (2.0), then divided by TRAIN stddev of
    // imputed column; labels indexed by TRAIN frequency (yes=0, no=1)
    val trainStd = math.sqrt(((1.0 - 2.0) * (1.0 - 2.0) +
      (3.0 - 2.0) * (3.0 - 2.0) + 0.0) / 2)
    assert(math.abs(out(0).getDouble(0) - 2.0 / trainStd) < 1e-12)
    assert(math.abs(out(1).getDouble(0) - 2.0 / trainStd) < 1e-12)
    assert(out(0).getLong(1) == 0L && out(1).getLong(1) == 1L)
  }

  test("assemble concatenates scalars in declared order") {
    val df = Seq((1.0, 2.0, 3.0)).toDF("a", "b", "c")
    val out = df.select(RelationalML.assemble(Seq("c", "a", "b"), "f"))
      .head().getSeq[Double](0)
    assert(out == Seq(3.0, 1.0, 2.0))
  }
}
