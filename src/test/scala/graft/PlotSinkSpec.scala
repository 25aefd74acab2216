package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PlotSink
import graft.ml.Pipelines
import java.nio.file.{Files, Paths}

/** Plot sink (S4/M9): the four reference charts render as valid SVG
  * with the reference's annotations (per-bar values, per-cell counts,
  * contrast flip past half-max) and land at the reference's file-name
  * shapes. */
class PlotSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    Files.createTempDirectory("plots").toString

  private def occurrences(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("line chart renders one polyline per series plus legend") {
    val svg = PlotSink.lineChart(
      Seq("Train acc" -> Seq(0.5, 0.7, 0.9), "Validation acc" -> Seq(0.4, 0.6, 0.8)),
      "m - Accuracy")
    assert(svg.startsWith("<svg"))
    assert(occurrences(svg, "<polyline") == 2)
    assert(svg.contains("Train acc") && svg.contains("Validation acc"))
  }

  test("bar chart annotates every bar with its value") {
    val svg = PlotSink.barChart(Seq("mlp", "cnn"), Seq(0.8512, 0.9034),
      "cmp", "Model", "Accuracy", v => f"$v%.4f", Some(1.1))
    assert(occurrences(svg, "class=\"bar\"") == 2)
    assert(svg.contains("0.8512") && svg.contains("0.9034"))
    assert(svg.contains("mlp") && svg.contains("cnn"))
  }

  test("heatmap renders k*k annotated cells and flips text past half max") {
    val svg = PlotSink.heatmap(
      Seq(Seq(90L, 2L), Seq(5L, 40L)), Seq("a", "b"), "cm")
    assert(occurrences(svg, "class=\"cell\"") == 4)
    assert(svg.contains(">90<") && svg.contains(">40<"))
    // 90 > 45 = half max -> white text; 40 < 45 -> black
    assert(svg.contains("fill=\"white\">90<"))
    assert(svg.contains("fill=\"black\">40<"))
  }

  test("reference-shaped entry points write the reference's file names") {
    import spark.implicits._
    val dir = tmpDir()
    val metrics = Pipelines.metricsFrame(spark,
      Seq(("mlp", 0.85, 12.5), ("cnn", 0.90, 30.25)))
    val p1 = PlotSink.compareModelsAccuracy(metrics, "raw", dir)
    val p2 = PlotSink.plotTrainingTime(metrics, "raw", dir)
    val p3 = PlotSink.plotAccuracyLoss(
      Map("accuracy" -> Seq(0.5, 0.9), "loss" -> Seq(1.2, 0.3)),
      "mlp", "raw", dir)
    val cm = Seq((0L, 1L), (0L, 0L), (1L, 1L)).toDF("label", "prediction")
    val p4 = PlotSink.plotConfusionMatrix(
      Pipelines.confusionMatrix(cm.select($"label", $"prediction")),
      "mlp", "raw", dir)
    assert(Paths.get(p1).getFileName.toString == "comparison_raw_accuracy.svg")
    assert(Paths.get(p2).getFileName.toString == "comparison_raw_training_time.svg")
    assert(Paths.get(p3).getFileName.toString == "mlp_raw_accuracy_loss.svg")
    assert(Paths.get(p4).getFileName.toString == "mlp_raw_confusion_matrix.svg")
    Seq(p1, p2, p3, p4).foreach { p =>
      val s = Files.readString(Paths.get(p))
      assert(s.startsWith("<svg") && s.endsWith("</svg>"), p)
    }
    // training-time labels carry the reference's seconds format
    assert(Files.readString(Paths.get(p2)).contains("30.25s"))
    // the reference's actual artifact format (matplotlib PNG) lands too:
    // same stem, .png extension, decodable at the shared chart geometry
    Seq(p1, p2, p3, p4).foreach { p =>
      val png = Paths.get(p.stripSuffix(".svg") + ".png")
      assert(Files.exists(png), png)
      val img = javax.imageio.ImageIO.read(png.toFile)
      assert(img != null, s"not decodable as an image: $png")
      assert(img.getWidth == 640 && img.getHeight == 420, png)
    }
  }

  test("png charts paint the palette and respect the heatmap contract") {
    import graft.sources.PlotPng
    // bar 0 paints palette(0) = #1f77b4 somewhere in the plot area
    val bars = PlotPng.barChart(Seq("a", "b"), Seq(0.5, 1.0), "t", "x", "y",
      v => f"$v%.1f")
    val blue = 0x1f77b4
    val hasBlue = (0 until bars.getWidth).exists(x =>
      (0 until bars.getHeight).exists(y =>
        (bars.getRGB(x, y) & 0xffffff) == blue))
    assert(hasBlue, "bar chart missing palette(0) pixels")
    // negative bars refuse loudly, matching the SVG contract
    intercept[IllegalArgumentException] {
      PlotPng.barChart(Seq("a"), Seq(-1.0), "t", "x", "y", _.toString)
    }
    // oversized confusion matrices refuse rather than degenerate
    intercept[IllegalArgumentException] {
      PlotPng.heatmap(Seq.fill(400)(Seq.fill(400)(1L)),
        (1 to 400).map(_.toString), "cm")
    }
    // max cell shades to the deepest blue (75,75,255); zero stays white-ish
    val hm = PlotPng.heatmap(Seq(Seq(10L, 0L), Seq(0L, 10L)), Seq("a", "b"), "cm")
    val deepest = new java.awt.Color(75, 75, 255).getRGB & 0xffffff
    val hasDeep = (0 until hm.getWidth).exists(x =>
      (0 until hm.getHeight).exists(y => (hm.getRGB(x, y) & 0xffffff) == deepest))
    assert(hasDeep, "heatmap missing max-intensity cells")
  }
}
