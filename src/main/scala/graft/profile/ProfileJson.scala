package graft.profile

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** JSON sink. Top-level keys mirror the reference's description dict
  * (`model/describe.py:201-222`, asserted at `tests/unit/test_output.py:14-29`):
  * analysis, table, variables, scatter, correlations, missing, messages,
  * package, sample, duplicates. Histograms serialize as
  * {"counts": [...], "bin_edges": [...]} (model/summarizer.py:148-153). */
object ProfileJson {

  def toJson(p: TableProfile): String =
    JsonMethods.pretty(JsonMethods.render(toJValue(p)))

  def toJValue(p: TableProfile): JValue = {
    val variables: JObject = JObject(p.columns.map(c =>
      JField(c.name, columnJson(c))).toList)

    def pairList(m: Map[(String, String), Double]): JValue =
      JArray(m.toList.sortBy(_._1).map { case ((a, b), v) =>
        (("colA" -> a) ~ ("colB" -> b) ~ ("value" -> jd(v))): JValue
      })
    val correlations: JObject = JObject(
      p.correlations.map(m => JField(m.method, matrixJson(m))).toList ++
        (if (p.cramers.nonEmpty)
          List(JField("cramers", JArray(p.cramers.map(cr =>
            ("colA" -> cr.colA) ~ ("colB" -> cr.colB) ~
              ("chi2" -> jd(cr.chi2)) ~ ("pValue" -> jd(cr.pValue)) ~
              ("v" -> jd(cr.v)): JValue).toList)))
        else Nil) ++
        (if (p.kendall.nonEmpty)
          List(JField("kendall", pairList(p.kendall))) else Nil) ++
        (if (p.phik.nonEmpty)
          List(JField("phik", pairList(p.phik))) else Nil))

    ("analysis" -> (("title" -> "graft profile") ~
      ("engine" -> "spark"))) ~
      ("table" -> (("n" -> p.table.n) ~ ("n_var" -> p.table.nVar) ~
        ("n_cells_missing" -> p.table.nCellsMissing) ~
        ("p_cells_missing" -> jd(p.table.pCellsMissing)) ~
        ("types" -> JObject(p.table.typeCounts.map { case (k, v) =>
          JField(k, JInt(v)) }.toList)))) ~
      ("variables" -> variables) ~
      ("scatter" -> JObject(Nil)) ~
      ("correlations" -> correlations) ~
      ("missing" -> JObject(p.missingCounts.toList.sortBy(_._1).map {
        case (k, v) => JField(k, JInt(v)) })) ~
      ("messages" -> JArray(p.alerts.map(a =>
        JString(s"[${a.kind}] ${a.column.getOrElse("table")}: ${a.detail}")).toList)) ~
      ("package" -> (("name" -> "graft") ~ ("version" -> "0.1.0"))) ~
      ("sample" -> JArray(p.sampleHead.map(row =>
        JObject(row.toList.sortBy(_._1).map { case (k, v) =>
          JField(k, Option(v).map(JString).getOrElse(JNull)) })).toList)) ~
      ("duplicates" -> (("n_duplicates" -> p.nDuplicates) ~
        ("head" -> JArray(p.duplicateRows.map { case (row, cnt) =>
          (("count" -> cnt): JObject) ~ ("row" -> JObject(
            row.toList.sortBy(_._1).map { case (k, v) =>
              JField(k, Option(v).map(JString).getOrElse(JNull)) })): JValue
        }.toList))))
  }

  private def columnJson(c: ColumnProfile): JValue = {
    // nUnique < 0 is the "not computed" sentinel (sketch mode skips the
    // exact uniqueness pass, like the reference's spark path) — the
    // uniqueness fields are omitted rather than reporting -1 / negative
    // p_unique to a consumer
    val uniqueKnown = c.common.nUnique >= 0
    val common: JObject =
      ("type" -> c.profileType.name) ~ ("spark_type" -> c.sparkType) ~
        ("n" -> c.common.n) ~ ("count" -> c.common.count) ~
        ("n_missing" -> c.common.nMissing) ~
        ("p_missing" -> jd(c.common.pMissing)) ~
        ("n_distinct" -> c.common.nDistinct) ~
        ("n_unique" -> (if (uniqueKnown) Some(c.common.nUnique) else None)) ~
        ("p_distinct" -> jd(c.common.pDistinct)) ~
        ("p_unique" -> (if (uniqueKnown) Some(jd(c.common.pUnique)) else None)) ~
        ("is_unique" -> (if (uniqueKnown) Some(c.common.isUnique) else None))

    val typed: JObject = c.typed match {
      case n: NumericStats =>
        ("mean" -> jd(n.mean)) ~ ("std" -> jd(n.std)) ~
          ("variance" -> jd(n.variance)) ~ ("min" -> jd(n.min)) ~
          ("max" -> jd(n.max)) ~ ("sum" -> jd(n.sum)) ~
          ("skewness" -> jd(n.skewness)) ~ ("kurtosis" -> jd(n.kurtosis)) ~
          ("mad" -> jd(n.mad)) ~ ("range" -> jd(n.range)) ~
          ("iqr" -> jd(n.iqr)) ~ ("cv" -> jd(n.cv)) ~
          ("n_zeros" -> n.nZeros) ~ ("p_zeros" -> jd(n.pZeros)) ~
          ("n_infinite" -> n.nInfinite) ~ ("p_infinite" -> jd(n.pInfinite)) ~
          ("monotonic" -> n.monotonic) ~
          ("quantiles" -> JObject(n.quantiles.toList.sortBy(_._1).map {
            // reference key style: "5%", "25%", ... (describe.py quantile keys)
            case (q, v) => JField(f"${q * 100}%.0f%%", jd(v)) })) ~
          ("chi_squared_p" -> n.chiSquaredP.map(jd).getOrElse(JNull: JValue)) ~
          ("histogram" -> n.histogram.map(histJson).getOrElse(JNull: JValue))
      case cat: CategoricalStats =>
        ("top" -> cat.mode.map(JString).getOrElse(JNull: JValue)) ~
          ("freq" -> cat.modeFreq) ~
          ("value_counts" -> JArray(cat.topValues.map { case (v, n) =>
            (("value" -> v) ~ ("count" -> n)): JValue }.toList)) ~
          ("length" -> cat.lengths.map(l =>
            (("mean" -> jd(l.meanLength)) ~ ("min" -> l.minLength) ~
              ("max" -> l.maxLength) ~ ("median" -> jd(l.medianLength))): JValue)
            .getOrElse(JNull: JValue)) ~
          ("characters" -> cat.chars.map(ch =>
            (("n_characters" -> ch.nCharacters) ~
              ("n_characters_distinct" -> ch.nCharactersDistinct) ~
              ("top" -> JArray(ch.topChars.map { case (v, n) =>
                (("char" -> v) ~ ("count" -> n)): JValue }.toList)) ~
              ("categories" -> sortedCounts(ch.categoryCounts)) ~
              ("blocks" -> sortedCounts(ch.blockCounts)) ~
              ("scripts" -> sortedCounts(ch.scriptCounts))): JValue)
            .getOrElse(JNull: JValue)) ~
          ("chi_squared_p" -> cat.chiSquaredP.map(jd).getOrElse(JNull: JValue))
      case b: BooleanStats =>
        ("top" -> b.top) ~ ("freq" -> b.freq) ~
          ("n_true" -> b.nTrue) ~ ("n_false" -> b.nFalse)
      case d: DateTimeStats =>
        ("min_epoch_sec" -> d.minEpochSec) ~ ("max_epoch_sec" -> d.maxEpochSec) ~
          ("range_sec" -> d.rangeSec) ~
          ("histogram" -> d.histogram.map(histJson).getOrElse(JNull: JValue))
      case _ => JObject(Nil)
    }
    common ~ typed
  }

  private def matrixJson(m: CorrelationMatrix): JValue =
    ("columns" -> m.columns.toList) ~
      ("values" -> JArray(m.values.map(row =>
        JArray(row.map(jd).toList)).toList))

  private def histJson(h: Histogram): JValue =
    ("counts" -> h.counts.toList) ~ ("bin_edges" -> h.binEdges.map(jd).toList)

  private def sortedCounts(m: Map[String, Long]): JObject =
    JObject(m.toList.sortBy { case (k, v) => (-v, k) }.map { case (k, v) =>
      JField(k, JInt(v)) })

  /** NaN/Inf are not valid JSON — encode as null like the reference's
    * format_summary does via pandas JSON encoding. */
  private def jd(d: Double): JValue =
    if (d.isNaN || d.isInfinite) JNull else JDouble(d)
}
