package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Pipelines

/** Reference-compat on the UNSW-NB15 *shape* (FIXTURES.md §B): CSV with
  * header+inferSchema, schema-driven numeric/string column partition
  * (reference `main.py:53-54`, `data_preprocessing.py:17-21`),
  * hex-valued ports inferring as string, the binary `Label` leak column
  * (SURVEY §7.4.6 — reproduced under `compatLabelLeak`, excluded by
  * default), and StringIndexer's unseen-category error (§7.4.3).
  */
class UnswCompatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val csvDir: String = {
    val dir = "/tmp/graft_spec/unsw_csv"
    val header = "srcip,sport,proto,service,state,dur,sbytes,dbytes,Label,attack_cat"
    val protos = Seq("tcp", "udp", "arp")
    val cats = Seq("Normal", "Exploits", "DoS", "Fuzzers")
    val rows = (0 until 48).map { i =>
      // sport mixes decimal and hex values => inferSchema must fall
      // back to string for the whole column (the real UNSW quirk)
      val sport = if (i % 7 == 0) "0x20205321" else (1024 + i).toString
      s"10.40.85.${i % 16},$sport,${protos(i % 3)}," +
        s"${if (i % 2 == 0) "dns" else "http"},${if (i % 5 == 0) "FIN" else "CON"}," +
        s"${0.1 * (i % 9)},${100 + i},${200 + 2 * i},${i % 2}," +
        cats(i % 4)
    }
    val f = new java.io.File(dir)
    f.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/UNSW-NB15_1.csv"),
      (header +: rows).mkString("\n").getBytes)
    dir
  }

  private lazy val df = spark.read
    .option("header", "true").option("inferSchema", "true").csv(csvDir)

  test("inferSchema types the UNSW shape like the reference expects") {
    import org.apache.spark.sql.types._
    val t = df.schema.map(f => f.name -> f.dataType).toMap
    assert(t("sport") == StringType)  // hex values force string
    assert(t("dur") == DoubleType)
    assert(t("sbytes") == IntegerType)
    assert(t("Label") == IntegerType) // the leak column rides as numeric
    assert(t("attack_cat") == StringType)
  }

  test("schema partition sends strings to indexers, numerics to scaler") {
    val (numeric, strings) =
      Pipelines.featureColumns(df, Set("attack_cat", "label", "Label"))
    assert(strings.toSet == Set("srcip", "sport", "proto", "service",
      "state"))
    assert(numeric.toSet == Set("dur", "sbytes", "dbytes"))
  }

  test("compatLabelLeak reproduces the reference's Label leakage") {
    // assert on the PIPELINE the flag built, not on hand-made column
    // sets: the numeric assembler's inputCols must carry Label iff the
    // compat flag is on — a regression dropping the flag fails here
    def numericAssemblerInputs(compat: Boolean): Set[String] = {
      val p = Pipelines.preprocessPipeline(df, "attack_cat", pcaK = 2,
        compatLabelLeak = compat)
      p.getStages.collectFirst {
        case va: org.apache.spark.ml.feature.VectorAssembler
            if va.getOutputCol == "numeric_features" =>
          va.getInputCols.toSet
      }.getOrElse(fail("no numeric VectorAssembler stage"))
    }
    // the assembler consumes the Imputer's suffixed outputs
    val compat = numericAssemblerInputs(compat = true)
    val default = numericAssemblerInputs(compat = false)
    assert(compat.contains("Label_imp") && !default.contains("Label_imp"))
    assert(compat - "Label_imp" == default)
    // and both variants fit + transform end-to-end
    val p = Pipelines.preprocessPipeline(df, "attack_cat", pcaK = 2,
      compatLabelLeak = true)
    val (_, train, _) = Pipelines.fitTransform(p, df, df)
    assert(train.head()
      .getAs[org.apache.spark.ml.linalg.Vector]("features").size == 2)
  }

  test("unseen test category fails like the reference (handleInvalid)") {
    import org.apache.spark.sql.functions._
    val train = df.filter(col("proto") =!= "arp")
    val test = df // contains 'arp' (and arp-only sports), unseen at fit
    val p = Pipelines.preprocessPipeline(train, "attack_cat", pcaK = 2)
    val err = intercept[Exception] {
      Pipelines.fitTransform(p, train, test)._3.collect()
    }
    // pin the StringIndexer handleInvalid=error behavior specifically
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("Unseen label")),
      messages(err).mkString(" | "))
  }
}
