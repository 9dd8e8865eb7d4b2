package graft.profile

import org.apache.spark.sql.types._

/** Profile type ADT.
  *
  * Reference has two type layers: the pandas `visions` typeset
  * (`model/typeset.py:237-259`) and the Spark schema-declared one
  * (`model/typeset.py:197-234`, selection at `model/summary.py:108-112`).
  * We use the declared Spark schema as the base layer and add the
  * value-based demotion (numeric -> categorical at low cardinality) the
  * pandas path has (`model/typeset_relations.py:68-77`).
  *
  * Note: the reference's Spark path never selects Boolean (a bug at
  * `model/summary.py:108-112`); we make Boolean reachable as SURVEY §2
  * directs.
  */
sealed trait ProfileType { def name: String }
object ProfileType {
  case object Numeric extends ProfileType { val name = "Numeric" }
  case object Categorical extends ProfileType { val name = "Categorical" }
  case object Bool extends ProfileType { val name = "Boolean" }
  case object DateTime extends ProfileType { val name = "DateTime" }
  case object Unsupported extends ProfileType { val name = "Unsupported" }

  /** Schema-declared assignment (reference: typeset.py:197-234 plus the
    * numeric-type widening at dataframe_wrappers.py:402-416 which adds
    * Byte and Decimal). */
  def fromDataType(dt: DataType): ProfileType = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | _: DecimalType =>
      Numeric
    case StringType           => Categorical
    case BooleanType          => Bool
    case DateType             => DateTime
    case _: TimestampType     => DateTime
    case TimestampNTZType     => DateTime
    case _                    => Unsupported
  }
}

/** Fixed-width histogram, serialized as {"counts": [...], "bin_edges": [...]}
  * (reference: model/summarizer.py:148-153). */
final case class Histogram(counts: Seq[Long], binEdges: Seq[Double])

/** Stats computed for every supported column
  * (reference: describe_counts/generic/supported chain,
  * model/summary_algorithms.py:449-535). */
final case class CommonStats(
    n: Long,
    count: Long,
    nDistinct: Long,
    nUnique: Long
) {
  def nMissing: Long = n - count
  def pMissing: Double = if (n == 0) 0.0 else nMissing.toDouble / n
  def pDistinct: Double = if (count == 0) 0.0 else nDistinct.toDouble / count
  def pUnique: Double = if (count == 0) 0.0 else nUnique.toDouble / count
  def isUnique: Boolean = count > 0 && nUnique == count
}

sealed trait TypedStats

/** Numeric profile (reference: numeric_stats_spark +
  * describe_numeric_spark_1d, model/summary_algorithms.py:166-197,539-668).
  * skewness/kurtosis are the bias-corrected (pandas) estimators G1/G2,
  * not Spark's population g1/g2 — see SURVEY §2.3. */
final case class NumericStats(
    mean: Double,
    std: Double,
    variance: Double,
    min: Double,
    max: Double,
    sum: Double,
    skewness: Double,
    kurtosis: Double,
    quantiles: Map[Double, Double],
    mad: Double,
    nZeros: Long,
    nInfinite: Long,
    nonNullCount: Long,
    histogram: Option[Histogram],
    chiSquaredP: Option[Double]
) extends TypedStats {
  def median: Double = quantiles.getOrElse(0.5, Double.NaN)
  def iqr: Double =
    quantiles.getOrElse(0.75, Double.NaN) - quantiles.getOrElse(0.25, Double.NaN)
  def range: Double = max - min
  def cv: Double = if (mean != 0) std / mean else Double.NaN
  def pZeros: Double = if (nonNullCount == 0) 0.0 else nZeros.toDouble / nonNullCount
  def pInfinite: Double =
    if (nonNullCount == 0) 0.0 else nInfinite.toDouble / nonNullCount
  /** Spark has no row order; parity with reference spark path
    * (summary_algorithms.py:600-606). */
  def monotonic: Boolean = false
}

/** String-length stats (reference: _length_summary_spark,
  * summary_helpers.py:94-114). */
final case class LengthStats(
    meanLength: Double,
    minLength: Long,
    maxLength: Long,
    medianLength: Double
)

/** Unicode rollups (reference: summary_helpers.py:331-435; we use
  * java.lang.Character instead of tangled_up_in_unicode). */
final case class CharStats(
    nCharacters: Long,
    nCharactersDistinct: Long,
    topChars: Seq[(String, Long)],
    categoryCounts: Map[String, Long],
    blockCounts: Map[String, Long],
    scriptCounts: Map[String, Long]
)

final case class CategoricalStats(
    topValues: Seq[(String, Long)],
    lengths: Option[LengthStats],
    chars: Option[CharStats],
    chiSquaredP: Option[Double]
) extends TypedStats {
  def mode: Option[String] = topValues.headOption.map(_._1)
  def modeFreq: Long = topValues.headOption.map(_._2).getOrElse(0L)
}

final case class BooleanStats(
    nTrue: Long,
    nFalse: Long
) extends TypedStats {
  def top: Boolean = nTrue >= nFalse
  def freq: Long = math.max(nTrue, nFalse)
}

/** Date/time profile over epoch seconds (reference pandas-only path:
  * summary_algorithms.py:281-308; the spark fork lacked it). */
final case class DateTimeStats(
    minEpochSec: Long,
    maxEpochSec: Long,
    histogram: Option[Histogram]
) extends TypedStats {
  def rangeSec: Long = maxEpochSec - minEpochSec
}

case object UnsupportedStats extends TypedStats

final case class ColumnProfile(
    name: String,
    sparkType: String,
    profileType: ProfileType,
    common: CommonStats,
    typed: TypedStats
)

/** Alert rules output (reference: model/messages.py:13-57). */
final case class Alert(kind: String, column: Option[String], detail: String)

/** Table-level rollup (reference: model/summary.py:263-310). */
final case class TableStats(
    n: Long,
    nVar: Int,
    nCellsMissing: Long,
    pCellsMissing: Double,
    typeCounts: Map[String, Int]
)

final case class CorrelationMatrix(
    method: String,
    columns: Seq[String],
    /** Row-major, columns.size x columns.size. */
    values: Seq[Seq[Double]]
)

final case class CramersResult(
    colA: String,
    colB: String,
    chi2: Double,
    pValue: Double,
    v: Double
)

final case class TableProfile(
    table: TableStats,
    columns: Seq[ColumnProfile],
    missingCounts: Map[String, Long],
    nDuplicates: Long,
    duplicateRows: Seq[(Map[String, String], Long)],
    correlations: Seq[CorrelationMatrix],
    cramers: Seq[CramersResult],
    sampleHead: Seq[Map[String, String]],
    alerts: Seq[Alert],
    /** (colA, colB) -> Kendall tau-b, when enabled. */
    kendall: Map[(String, String), Double] = Map.empty,
    /** (colA, colB) -> phi-k, when enabled. */
    phik: Map[(String, String), Double] = Map.empty
)
