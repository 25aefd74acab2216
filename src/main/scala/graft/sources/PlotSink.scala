package graft.sources

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}

/** Plot sink (S4/M9): the reference renders four matplotlib PNGs —
  * per-model accuracy/loss curves (`utils/visualization.py:16-52`),
  * model-accuracy and training-time comparison bars (`:55-127`), and a
  * confusion-matrix heatmap (`:129-161`). This sink renders the same
  * four charts as dependency-free SVG (a PNG rasterizer is a heavyweight
  * native dependency; SVG is what CI artifacts and dashboards ingest
  * anyway) with the reference's annotations: per-bar value labels,
  * per-cell counts with the >half-max contrast flip, axis titles.
  *
  * Driver-side by design: every input is fit-state-sized (O(models),
  * O(epochs), O(k²) confusion cells) — the same collect class the ML
  * fit surface already uses. Never point this at a fact table.
  *
  * Each reference-shaped entry point writes BOTH formats — the `.svg`
  * built here and a pixel-identical-in-intent `.png` rasterized by
  * [[PlotPng]] (JDK `BufferedImage`, headless, no native codecs) — so
  * the reference's PNG artifact contract is met exactly while the SVG
  * remains for dashboards that prefer vectors.
  */
object PlotSink {

  // geometry + palette shared with the raster renderer ([[PlotPng]]) so
  // the SVG and PNG outputs depict identical charts
  private[sources] val W = 640
  private[sources] val H = 420
  private[sources] val ML = 70  // left margin
  private[sources] val MB = 60  // bottom margin
  private[sources] val MT = 40  // top margin
  private[sources] val MR = 20  // right margin

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def header(title: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 $W $H" font-family="sans-serif">
       |<rect width="$W" height="$H" fill="white"/>
       |<text x="${W / 2}" y="24" text-anchor="middle" font-size="16">${esc(title)}</text>""".stripMargin

  private def axes(xLabel: String, yLabel: String): String =
    s"""<line x1="$ML" y1="${H - MB}" x2="${W - MR}" y2="${H - MB}" stroke="black"/>
       |<line x1="$ML" y1="$MT" x2="$ML" y2="${H - MB}" stroke="black"/>
       |<text x="${(ML + W - MR) / 2}" y="${H - 12}" text-anchor="middle" font-size="12">${esc(xLabel)}</text>
       |<text x="18" y="${(MT + H - MB) / 2}" text-anchor="middle" font-size="12" transform="rotate(-90 18 ${(MT + H - MB) / 2})">${esc(yLabel)}</text>""".stripMargin

  private[sources] val palette = Seq("#1f77b4", "#2ca02c", "#d62728",
    "#ff7f0e", "#9467bd", "#8c564b")

  /** Chart geometry shared by the SVG and PNG renderers — ONE set of
    * scale formulas, so the two outputs cannot drift (the constants
    * were shared but the lo/hi/x/y/bar/cell math was copy-pasted,
    * and the copies had already diverged on single-point series:
    * the PNG drew a dot where the SVG polyline rendered nothing). */
  private[sources] object Geom {
    /** (lo, hi, n) for a line chart: y spans [min, max] (degenerate
      * flat series get a unit span), x spans the longest series. */
    def lineScales(series: Seq[(String, Seq[Double])])
        : (Double, Double, Int) = {
      val all = series.flatMap(_._2)
      val lo = all.min
      val hi0 = all.max
      (lo, if (hi0 == lo) lo + 1.0 else hi0, series.map(_._2.length).max)
    }
    def lineX(n: Int, i: Int): Double =
      ML + (W - ML - MR) * (if (n == 1) 0.5 else i.toDouble / (n - 1))
    def lineY(lo: Double, hi: Double, v: Double): Double =
      (H - MB) - (H - MB - MT) * (v - lo) / (hi - lo)
    def barHi(values: Seq[Double], yMax: Option[Double]): Double =
      yMax.getOrElse(math.max(values.max, 1e-12) * 1.1)
    def barWidth(n: Int): Double = (W - ML - MR) / (n * 2.0)
    def barCx(n: Int, i: Int): Double = ML + (W - ML - MR) * (i + 0.5) / n
    def barY(hi: Double, v: Double): Double =
      (H - MB) - (H - MB - MT) * (v / hi)
    def heatCell(k: Int): Int =
      math.min((W - ML - MR) / k, (H - MB - MT) / k)
    /** white -> blue shade channel; >half-max cells flip to white text. */
    def heatShade(v: Long, hi: Long): Int =
      (255 - v.toDouble / hi * 180).toInt
  }

  /** Multi-series line chart (the accuracy/loss curve shape): series =
    * (name, per-epoch values). Y spans [min, max] of the data, X is the
    * epoch index. */
  def lineChart(series: Seq[(String, Seq[Double])], title: String,
      xLabel: String = "Epoch", yLabel: String = "Value"): String = {
    require(series.nonEmpty && series.forall(_._2.nonEmpty), "empty series")
    val (lo, hi, n) = Geom.lineScales(series)
    def x(i: Int) = Geom.lineX(n, i)
    def y(v: Double) = Geom.lineY(lo, hi, v)
    val lines = series.zipWithIndex.map { case ((name, vs), si) =>
      val pts = vs.zipWithIndex
        .map { case (v, i) => f"${x(i)}%.1f,${y(v)}%.1f" }.mkString(" ")
      val legendY = MT + 16 * si
      // single-point series: a polyline with one point renders nothing
      // — draw the same dot the PNG renderer draws
      val mark =
        if (vs.length == 1)
          f"""<circle cx="${x(0)}%.1f" cy="${y(vs.head)}%.1f" r="2" fill="${palette(si % palette.length)}"/>"""
        else
          s"""<polyline fill="none" stroke="${palette(si % palette.length)}" stroke-width="2" points="$pts"/>"""
      s"""$mark
         |<text x="${W - MR - 120}" y="$legendY" font-size="12" fill="${palette(si % palette.length)}">${esc(name)}</text>""".stripMargin
    }
    val yTicks = Seq(lo, (lo + hi) / 2, hi).map(v =>
      f"""<text x="${ML - 6}" y="${y(v)}%.1f" text-anchor="end" font-size="10">$v%.3f</text>""")
    (header(title) +: axes(xLabel, yLabel) +: (yTicks ++ lines) :+ "</svg>")
      .mkString("\n")
  }

  /** Labeled bar chart with per-bar value annotations (the reference's
    * comparison plots put the number on top of every bar). */
  def barChart(labels: Seq[String], values: Seq[Double], title: String,
      xLabel: String, yLabel: String, fmt: Double => String,
      yMax: Option[Double] = None): String = {
    require(labels.length == values.length && labels.nonEmpty, "bad bars")
    // The y scale is anchored at 0 (hi derives from max only), so a
    // negative value would place the bar top below the baseline and emit a
    // negative rect height — invalid SVG. Both reference charts this sink
    // renders (accuracy, training seconds) are non-negative by construction;
    // make that contract explicit rather than silently clamping.
    require(values.forall(_ >= 0), "barChart requires non-negative values")
    val hi = Geom.barHi(values, yMax)
    val n = labels.length
    val bw = Geom.barWidth(n) // bar width = half the slot
    def y(v: Double) = Geom.barY(hi, v)
    val bars = labels.indices.map { i =>
      val cx = Geom.barCx(n, i)
      val top = y(values(i))
      s"""<rect class="bar" x="${cx - bw / 2}" y="$top" width="$bw" height="${(H - MB) - top}" fill="${palette(i % palette.length)}"/>
         |<text x="$cx" y="${top - 5}" text-anchor="middle" font-size="11">${esc(fmt(values(i)))}</text>
         |<text x="$cx" y="${H - MB + 16}" text-anchor="middle" font-size="11">${esc(labels(i))}</text>""".stripMargin
    }
    (header(title) +: axes(xLabel, yLabel) +: bars :+ "</svg>").mkString("\n")
  }

  /** Confusion-matrix heatmap with per-cell counts; cells past half the
    * max flip to white text (reference `visualization.py:150-156`). */
  def heatmap(cm: Seq[Seq[Long]], classes: Seq[String],
      title: String): String = {
    require(cm.nonEmpty && cm.forall(_.length == cm.head.length), "ragged cm")
    val k = cm.length
    val hi = math.max(cm.map(_.max).max, 1L)
    val cell = Geom.heatCell(k)
    // Integer division: past ~320 classes the per-cell size truncates to 0
    // and every rect degenerates. The sink is documented O(k²) driver-side,
    // so failing loudly on oversized matrices is the consistent contract.
    require(cell >= 1, s"confusion matrix too large to render: $k classes")
    val cells = for (i <- 0 until k; j <- 0 until k) yield {
      val v = cm(i)(j)
      val shade = Geom.heatShade(v, hi) // white -> blue
      val (cx, cy) = (ML + j * cell, MT + i * cell)
      val textFill = if (v > hi / 2) "white" else "black"
      s"""<rect class="cell" x="$cx" y="$cy" width="$cell" height="$cell" fill="rgb($shade,$shade,255)" stroke="#ccc"/>
         |<text x="${cx + cell / 2}" y="${cy + cell / 2 + 4}" text-anchor="middle" font-size="11" fill="$textFill">$v</text>""".stripMargin
    }
    val xt = classes.zipWithIndex.map { case (c, j) =>
      s"""<text x="${ML + j * cell + cell / 2}" y="${MT + k * cell + 16}" text-anchor="middle" font-size="11">${esc(c)}</text>""" }
    val yt = classes.zipWithIndex.map { case (c, i) =>
      s"""<text x="${ML - 6}" y="${MT + i * cell + cell / 2 + 4}" text-anchor="end" font-size="11">${esc(c)}</text>""" }
    (header(title) +: (cells ++ xt ++ yt) :+ "</svg>").mkString("\n")
  }

  private def write(dir: String, name: String, svg: String): String = {
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(dir, name)
    Files.writeString(p, svg)
    p.toString
  }

  // ---- reference-shaped entry points over engine frames ----

  /** `plot_accuracy_loss` (`visualization.py:16-52`): train/val curves.
    * history: metric name -> per-epoch values (the reference's Keras
    * history dict). Writes `{model}_{dataType}_accuracy_loss.svg`. */
  def plotAccuracyLoss(history: Map[String, Seq[Double]], modelName: String,
      dataType: String, dir: String): String = {
    val acc = Seq("accuracy", "val_accuracy").flatMap(k =>
      history.get(k).map(v => (if (k.startsWith("val")) "Validation" else "Train") -> v))
    val loss = Seq("loss", "val_loss").flatMap(k =>
      history.get(k).map(v => (if (k.startsWith("val")) "Validation" else "Train") -> v))
    val curves = acc.map { case (n, v) => (s"$n acc", v) } ++
      loss.map { case (n, v) => (s"$n loss", v) }
    val chartTitle = s"$modelName - Accuracy/Loss ($dataType data)"
    PlotPng.write(dir, s"${modelName}_${dataType}_accuracy_loss.png",
      PlotPng.lineChart(curves, chartTitle))
    write(dir, s"${modelName}_${dataType}_accuracy_loss.svg",
      lineChart(curves, chartTitle))
  }

  /** `compare_models_accuracy` (`:55-89`) over the engine's metrics
    * frame (model, accuracy, train_seconds). O(models) collect. */
  def compareModelsAccuracy(metrics: DataFrame, dataType: String,
      dir: String): String = {
    val rows = metrics.select("model", "accuracy").collect()
    val (ls, vs) =
      (rows.map(_.getString(0)).toSeq, rows.map(_.getDouble(1)).toSeq)
    val chartTitle = s"Model accuracy comparison ($dataType data)"
    PlotPng.write(dir, s"comparison_${dataType}_accuracy.png",
      PlotPng.barChart(ls, vs, chartTitle, "Model", "Accuracy",
        v => f"$v%.4f", yMax = Some(1.1)))
    write(dir, s"comparison_${dataType}_accuracy.svg",
      barChart(ls, vs, chartTitle, "Model", "Accuracy",
        v => f"$v%.4f", yMax = Some(1.1)))
  }

  /** `plot_training_time` (`:92-127`). */
  def plotTrainingTime(metrics: DataFrame, dataType: String,
      dir: String): String = {
    val rows = metrics.select("model", "train_seconds").collect()
    val (ls, vs) =
      (rows.map(_.getString(0)).toSeq, rows.map(_.getDouble(1)).toSeq)
    val chartTitle = s"Training time comparison ($dataType data)"
    PlotPng.write(dir, s"comparison_${dataType}_training_time.png",
      PlotPng.barChart(ls, vs, chartTitle, "Model", "Seconds",
        v => f"$v%.2fs"))
    write(dir, s"comparison_${dataType}_training_time.svg",
      barChart(ls, vs, chartTitle, "Model", "Seconds", v => f"$v%.2fs"))
  }

  /** `plot_confusion_matrix` (`:129-161`) over the engine's pivoted
    * confusion frame (label + one column per predicted class, as
    * `Pipelines.confusionMatrix` emits). O(k²) collect. */
  def plotConfusionMatrix(cm: DataFrame, modelName: String,
      dataType: String, dir: String): String = {
    val preds = cm.columns.filter(_ != "label").toSet
    val rows = cm.orderBy("label").collect()
    // square the matrix over the UNION of label values and predicted
    // classes: the pivot only emits columns for classes the model
    // actually predicted, so indexing rows by pivot position crashed
    // (row length < k) when some class was never predicted, and a
    // prediction absent from the labels mislabeled the ticks. Missing
    // cells are true zeros.
    val classes = (rows.map(_.get(0).toString) ++ preds).distinct.sorted.toSeq
    val byLabel = rows.map(r => r.get(0).toString -> r).toMap
    val matrix = classes.map { lc =>
      classes.map { pc =>
        byLabel.get(lc).filter(_ => preds.contains(pc))
          .map(_.getAs[Any](pc)) match {
          case Some(l: Long) => l
          case Some(i: Int) => i.toLong
          case _ => 0L
        }
      }
    }
    val chartTitle = s"Confusion matrix - $modelName ($dataType data)"
    PlotPng.write(dir, s"${modelName}_${dataType}_confusion_matrix.png",
      PlotPng.heatmap(matrix, classes, chartTitle))
    write(dir, s"${modelName}_${dataType}_confusion_matrix.svg",
      heatmap(matrix, classes, chartTitle))
  }
}
