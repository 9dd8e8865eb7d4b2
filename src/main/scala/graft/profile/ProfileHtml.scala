package graft.profile

/** Self-contained HTML report sink (reference: `to_html`,
  * profile_report.py:304-330 renders a Jinja2 template; here a
  * dependency-free renderer — no JS, histograms as inline SVG). */
object ProfileHtml {

  def toHtml(p: TableProfile): String = {
    val sb = new StringBuilder
    sb ++= s"""<!DOCTYPE html><html><head><meta charset="utf-8">
      |<title>graft profile</title><style>
      |body{font-family:system-ui,sans-serif;margin:2em;color:#222}
      |h1,h2{border-bottom:1px solid #ddd;padding-bottom:.2em}
      |table{border-collapse:collapse;margin:.5em 0}
      |td,th{border:1px solid #ccc;padding:.25em .6em;font-size:.9em;text-align:left}
      |.alert{display:inline-block;background:#fee;border:1px solid #c99;
      |border-radius:3px;padding:.1em .5em;margin:.15em;font-size:.85em}
      |.var{margin:1.5em 0;padding:1em;border:1px solid #eee;border-radius:6px}
      |.cols{display:flex;gap:2em;flex-wrap:wrap}
      |svg{border:1px solid #eee}
      |</style></head><body>
      |<h1>graft profile report</h1>""".stripMargin

    // overview
    sb ++= "<h2>Overview</h2><table>"
    sb ++= row("Rows", p.table.n.toString)
    sb ++= row("Variables", p.table.nVar.toString)
    sb ++= row("Missing cells", s"${p.table.nCellsMissing} (${pct(p.table.pCellsMissing)})")
    sb ++= row("Duplicate rows", p.nDuplicates.toString)
    p.table.typeCounts.toSeq.sortBy(_._1).foreach { case (t, n) =>
      sb ++= row(s"$t columns", n.toString)
    }
    sb ++= "</table>"

    if (p.alerts.nonEmpty) {
      sb ++= "<h2>Alerts</h2><div>"
      p.alerts.foreach { a =>
        sb ++= s"""<span class="alert"><b>${esc(a.kind)}</b> ${esc(
          a.column.getOrElse("table"))}: ${esc(a.detail)}</span>"""
      }
      sb ++= "</div>"
    }

    // variables
    sb ++= "<h2>Variables</h2>"
    p.columns.foreach { c =>
      sb ++= s"""<div class="var"><h3>${esc(c.name)} <small>(${c.profileType.name}, ${esc(c.sparkType)})</small></h3><div class="cols">"""
      sb ++= "<table>"
      sb ++= row("count", c.common.count.toString)
      sb ++= row("missing", s"${c.common.nMissing} (${pct(c.common.pMissing)})")
      sb ++= row("distinct", c.common.nDistinct.toString)
      // nUnique < 0 = not computed (sketch mode): omit instead of "-1"
      if (c.common.nUnique >= 0)
        sb ++= row("unique", c.common.nUnique.toString)
      sb ++= "</table>"
      c.typed match {
        case n: NumericStats =>
          sb ++= "<table>"
          Seq("mean" -> n.mean, "std" -> n.std, "min" -> n.min,
            "median" -> n.median, "max" -> n.max, "sum" -> n.sum,
            "skewness" -> n.skewness, "kurtosis" -> n.kurtosis,
            "mad" -> n.mad, "iqr" -> n.iqr, "cv" -> n.cv)
            .foreach { case (k, v) => sb ++= row(k, fmt(v)) }
          sb ++= row("zeros", n.nZeros.toString)
          sb ++= row("infinite", n.nInfinite.toString)
          sb ++= "</table>"
          n.histogram.foreach(h => sb ++= svgHist(h))
        case cat: CategoricalStats =>
          sb ++= "<table><tr><th>value</th><th>count</th></tr>"
          cat.topValues.take(10).foreach { case (v, n) =>
            sb ++= s"<tr><td>${esc(v)}</td><td>$n</td></tr>"
          }
          sb ++= "</table>"
          cat.lengths.foreach { l =>
            sb ++= s"<table>${row("len min", l.minLength.toString)}${row(
              "len mean", fmt(l.meanLength))}${row("len max", l.maxLength.toString)}</table>"
          }
        case b: BooleanStats =>
          sb ++= s"<table>${row("true", b.nTrue.toString)}${row("false", b.nFalse.toString)}</table>"
        case d: DateTimeStats =>
          sb ++= s"<table>${row("min", epochFmt(d.minEpochSec))}${row(
            "max", epochFmt(d.maxEpochSec))}${row("range (days)",
            (d.rangeSec / 86400).toString)}</table>"
          d.histogram.foreach(h => sb ++= svgHist(h))
        case _ => sb ++= "<p><i>unsupported type</i></p>"
      }
      sb ++= "</div></div>"
    }

    // correlations
    if (p.correlations.nonEmpty || p.cramers.nonEmpty) {
      sb ++= "<h2>Correlations</h2>"
      p.correlations.foreach { m =>
        sb ++= s"<h3>${esc(m.method)}</h3><table><tr><th></th>"
        m.columns.foreach(c => sb ++= s"<th>${esc(c)}</th>")
        sb ++= "</tr>"
        m.columns.zipWithIndex.foreach { case (rn, i) =>
          sb ++= s"<tr><th>${esc(rn)}</th>"
          m.values(i).foreach(v => sb ++= s"<td>${fmt(v)}</td>")
          sb ++= "</tr>"
        }
        sb ++= "</table>"
      }
      if (p.cramers.nonEmpty) {
        sb ++= "<h3>Cramér's V</h3><table><tr><th>A</th><th>B</th><th>V</th><th>χ²</th></tr>"
        p.cramers.foreach(cr => sb ++=
          s"<tr><td>${esc(cr.colA)}</td><td>${esc(cr.colB)}</td><td>${fmt(cr.v)}</td><td>${fmt(cr.chi2)}</td></tr>")
        sb ++= "</table>"
      }
    }

    // sample
    if (p.sampleHead.nonEmpty) {
      val cols = p.columns.map(_.name)
      sb ++= "<h2>Sample</h2><table><tr>"
      cols.foreach(c => sb ++= s"<th>${esc(c)}</th>")
      sb ++= "</tr>"
      p.sampleHead.foreach { r =>
        sb ++= "<tr>"
        cols.foreach(c => sb ++= s"<td>${esc(
          Option(r.getOrElse(c, null)).map(_.take(60)).getOrElse(""))}</td>")
        sb ++= "</tr>"
      }
      sb ++= "</table>"
    }
    sb ++= "</body></html>"
    sb.toString
  }

  private def svgHist(h: Histogram): String = {
    val w = 360; val ht = 90; val n = h.counts.size
    val mx = math.max(1L, h.counts.max)
    val bw = w.toDouble / n
    val bars = h.counts.zipWithIndex.map { case (c, i) =>
      val bh = ht * c.toDouble / mx
      f"""<rect x="${i * bw}%.1f" y="${ht - bh}%.1f" width="${math.max(bw - 1, 1)}%.1f" height="$bh%.1f" fill="#69c"/>"""
    }.mkString
    s"""<svg width="$w" height="$ht" viewBox="0 0 $w $ht">$bars</svg>"""
  }

  private def row(k: String, v: String) = s"<tr><th>${esc(k)}</th><td>$v</td></tr>"
  private def pct(d: Double) = f"${d * 100}%.1f%%"
  private def fmt(d: Double) =
    if (d.isNaN) "–" else if (d == d.floor && math.abs(d) < 1e15) f"$d%.0f"
    else f"$d%.4f"
  private def epochFmt(sec: Long) =
    java.time.Instant.ofEpochSecond(sec).toString
  private def esc(s: String) =
    Option(s).getOrElse("").replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
}
