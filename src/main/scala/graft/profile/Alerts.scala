package graft.profile

/** Rule-based data-quality alerts — pure driver-side functions over the
  * computed profile, mirroring the reference's 14 MessageTypes
  * (`model/messages.py:13-57`, orchestrated at `model/summary.py:512-518`).
  * Zero Spark work.
  */
object Alerts {

  def compute(p: TableProfile, cfg: ProfileConfig): Seq[Alert] = {
    val colAlerts = p.columns.flatMap(c => columnAlerts(c, cfg))
    val tableAlerts = scala.collection.mutable.ArrayBuffer[Alert]()

    // DUPLICATES (reference: messages.py:112,309-310 — > duplicatesFraction of rows)
    if (p.table.n > 0 &&
        p.nDuplicates.toDouble / p.table.n > cfg.duplicatesFraction)
      tableAlerts += Alert("DUPLICATES", None,
        s"dataset has ${p.nDuplicates} (${"%.1f".format(100.0 * p.nDuplicates / p.table.n)}%) duplicate rows")

    // HIGH_CORRELATION (reference: correlations.py:570-590)
    for (m <- p.correlations; i <- m.columns.indices; j <- m.columns.indices
         if i < j && math.abs(m.values(i)(j)) >= cfg.correlationThreshold)
      tableAlerts += Alert("HIGH_CORRELATION", Some(m.columns(i)),
        s"${m.method}: |corr(${m.columns(i)}, ${m.columns(j)})| = ${m.values(i)(j)}")
    for (cr <- p.cramers if cr.v >= cfg.correlationThreshold)
      tableAlerts += Alert("HIGH_CORRELATION", Some(cr.colA),
        s"cramers: V(${cr.colA}, ${cr.colB}) = ${cr.v}")

    colAlerts ++ tableAlerts
  }

  private def columnAlerts(c: ColumnProfile, cfg: ProfileConfig): Seq[Alert] = {
    val out = scala.collection.mutable.ArrayBuffer[Alert]()
    val s = c.common

    if (c.profileType == ProfileType.Unsupported) {
      out += Alert("UNSUPPORTED", Some(c.name), s"type ${c.sparkType} is not supported")
      out += Alert("REJECTED", Some(c.name), "unsupported column is rejected")
      return out.toSeq
    }
    if (s.nMissing > 0)
      out += Alert("MISSING", Some(c.name), s"${s.nMissing} missing values")
    if (s.count > 0 && s.nDistinct == 1) {
      out += Alert("CONSTANT", Some(c.name), "column is constant")
      out += Alert("REJECTED", Some(c.name), "constant column is rejected")
    }
    if (s.count > 0 && s.isUnique)
      out += Alert("UNIQUE", Some(c.name), "all values are distinct")
    if (s.nDistinct > cfg.highCardinalityThreshold &&
        c.profileType == ProfileType.Categorical)
      out += Alert("HIGH_CARDINALITY", Some(c.name),
        s"${s.nDistinct} distinct values")

    c.typed match {
      case n: NumericStats =>
        if (n.nZeros > 0)
          out += Alert("ZEROS", Some(c.name), s"${n.nZeros} zeros")
        if (n.nInfinite > 0)
          out += Alert("INFINITE", Some(c.name), s"${n.nInfinite} infinite values")
        if (!n.skewness.isNaN && math.abs(n.skewness) > cfg.skewnessThreshold)
          out += Alert("SKEWED", Some(c.name), s"skewness = ${n.skewness}")
        n.chiSquaredP.foreach { pv =>
          if (pv > cfg.uniformPThreshold)
            out += Alert("UNIFORM", Some(c.name), s"chi-square p = $pv")
        }
      case cat: CategoricalStats =>
        cat.lengths.foreach { l =>
          if (s.count > 0 && l.minLength == l.maxLength && s.nDistinct > 1)
            out += Alert("CONSTANT_LENGTH", Some(c.name),
              s"all values have length ${l.minLength}")
        }
        cat.chiSquaredP.foreach { pv =>
          if (pv > cfg.uniformPThreshold)
            out += Alert("UNIFORM", Some(c.name), s"chi-square p = $pv")
        }
      case _: DateTimeStats =>
        out += Alert("TYPE_DATE", Some(c.name), "date/time column")
      case _ => ()
    }
    out.toSeq
  }
}
