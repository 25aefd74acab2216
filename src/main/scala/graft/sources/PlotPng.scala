package graft.sources

import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.nio.file.{Files, Paths}
import javax.imageio.ImageIO

/** Raster (PNG) renderer for the reference's four matplotlib charts
  * (`utils/visualization.py:16-161`) — the same chart semantics as
  * [[PlotSink]]'s SVG output, rasterized with the JDK's own 2D stack
  * (`BufferedImage` + `ImageIO`, headless-safe: no display, no native
  * codecs, no new dependencies). The reference emits PNG files; with
  * this renderer the engine does too, closing the S4 format delta —
  * [[PlotSink]]'s entry points write both `.svg` and `.png`.
  *
  * Geometry, palette, and annotation rules (per-bar value labels, the
  * heatmap's >half-max contrast flip) are SHARED CODE with the SVG
  * sink ([[PlotSink.Geom]] — constants and scale formulas both), so
  * the two outputs depict identical charts by construction.
  */
object PlotPng {

  import PlotSink.{Geom, H, MB, ML, MR, MT, W, palette}

  private def awt(hex: String): Color = Color.decode(hex)

  /** Fresh white canvas + antialiased graphics; callers must dispose. */
  private def canvas(): (BufferedImage, Graphics2D) = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_ON)
    g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
      RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, W, H)
    (img, g)
  }

  private def centered(g: Graphics2D, s: String, cx: Int, y: Int): Unit = {
    val w = g.getFontMetrics.stringWidth(s)
    g.drawString(s, cx - w / 2, y)
  }

  private def rightAligned(g: Graphics2D, s: String, rx: Int, y: Int): Unit =
    g.drawString(s, rx - g.getFontMetrics.stringWidth(s), y)

  private def title(g: Graphics2D, t: String): Unit = {
    g.setColor(Color.BLACK)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 16))
    centered(g, t, W / 2, 24)
  }

  private def axes(g: Graphics2D, xLabel: String, yLabel: String): Unit = {
    g.setColor(Color.BLACK)
    g.setStroke(new BasicStroke(1f))
    g.drawLine(ML, H - MB, W - MR, H - MB)
    g.drawLine(ML, MT, ML, H - MB)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
    centered(g, xLabel, (ML + W - MR) / 2, H - 12)
    val old = g.getTransform
    g.rotate(-math.Pi / 2, 18, (MT + H - MB) / 2.0)
    centered(g, yLabel, 18, (MT + H - MB) / 2)
    g.setTransform(old)
  }

  /** Multi-series line chart — geometry identical to
    * [[PlotSink.lineChart]]. */
  def lineChart(series: Seq[(String, Seq[Double])], chartTitle: String,
      xLabel: String = "Epoch", yLabel: String = "Value"): BufferedImage = {
    require(series.nonEmpty && series.forall(_._2.nonEmpty), "empty series")
    val (lo, hi, n) = Geom.lineScales(series)
    def x(i: Int): Double = Geom.lineX(n, i)
    def y(v: Double): Double = Geom.lineY(lo, hi, v)
    val (img, g) = canvas()
    title(g, chartTitle)
    axes(g, xLabel, yLabel)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 10))
    Seq(lo, (lo + hi) / 2, hi).foreach(v =>
      rightAligned(g, f"$v%.3f", ML - 6, y(v).toInt + 4))
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
    series.zipWithIndex.foreach { case ((name, vs), si) =>
      g.setColor(awt(palette(si % palette.length)))
      g.setStroke(new BasicStroke(2f))
      vs.indices.drop(1).foreach(i => g.drawLine(
        x(i - 1).toInt, y(vs(i - 1)).toInt, x(i).toInt, y(vs(i)).toInt))
      if (vs.length == 1)
        g.fillOval(x(0).toInt - 2, y(vs(0)).toInt - 2, 4, 4)
      g.drawString(name, W - MR - 120, MT + 16 * si)
    }
    g.dispose()
    img
  }

  /** Labeled bar chart with per-bar value annotations — geometry and the
    * non-negative contract identical to [[PlotSink.barChart]]. */
  def barChart(labels: Seq[String], values: Seq[Double], chartTitle: String,
      xLabel: String, yLabel: String, fmt: Double => String,
      yMax: Option[Double] = None): BufferedImage = {
    require(labels.length == values.length && labels.nonEmpty, "bad bars")
    require(values.forall(_ >= 0), "barChart requires non-negative values")
    val hi = Geom.barHi(values, yMax)
    val n = labels.length
    val bw = Geom.barWidth(n)
    def y(v: Double): Double = Geom.barY(hi, v)
    val (img, g) = canvas()
    title(g, chartTitle)
    axes(g, xLabel, yLabel)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
    labels.indices.foreach { i =>
      val cx = Geom.barCx(n, i)
      val top = y(values(i))
      g.setColor(awt(palette(i % palette.length)))
      g.fillRect((cx - bw / 2).toInt, top.toInt, bw.toInt,
        ((H - MB) - top).toInt)
      g.setColor(Color.BLACK)
      centered(g, fmt(values(i)), cx.toInt, top.toInt - 5)
      centered(g, labels(i), cx.toInt, H - MB + 16)
    }
    g.dispose()
    img
  }

  /** Confusion-matrix heatmap with per-cell counts and the >half-max
    * white-text flip — geometry identical to [[PlotSink.heatmap]]. */
  def heatmap(cm: Seq[Seq[Long]], classes: Seq[String],
      chartTitle: String): BufferedImage = {
    require(cm.nonEmpty && cm.forall(_.length == cm.head.length), "ragged cm")
    val k = cm.length
    val hi = math.max(cm.map(_.max).max, 1L)
    val cell = Geom.heatCell(k)
    require(cell >= 1, s"confusion matrix too large to render: $k classes")
    val (img, g) = canvas()
    title(g, chartTitle)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
    for (i <- 0 until k; j <- 0 until k) {
      val v = cm(i)(j)
      val shade = Geom.heatShade(v, hi)
      val (cx, cy) = (ML + j * cell, MT + i * cell)
      g.setColor(new Color(shade, shade, 255))
      g.fillRect(cx, cy, cell, cell)
      g.setColor(Color.decode("#cccccc"))
      g.drawRect(cx, cy, cell, cell)
      g.setColor(if (v > hi / 2) Color.WHITE else Color.BLACK)
      centered(g, v.toString, cx + cell / 2, cy + cell / 2 + 4)
    }
    g.setColor(Color.BLACK)
    classes.zipWithIndex.foreach { case (c, j) =>
      centered(g, c, ML + j * cell + cell / 2, MT + k * cell + 16) }
    classes.zipWithIndex.foreach { case (c, i) =>
      rightAligned(g, c, ML - 6, MT + i * cell + cell / 2 + 4) }
    g.dispose()
    img
  }

  /** Write an image as PNG under `dir` and return the path. */
  def write(dir: String, name: String, img: BufferedImage): String = {
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(dir, name)
    ImageIO.write(img, "png", p.toFile)
    p.toString
  }
}
