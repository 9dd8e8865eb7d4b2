package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/* exact-name column reference; col("a.b") would parse the dot */

/** Value-based type inference — the pandas-path semantics
  * (`model/typeset.py:237-259`, `model/typeset_relations.py:39-101`) that
  * the reference's Spark backend never implemented (it dispatches on the
  * declared schema only, `model/typeset.py:197-234`).
  *
  * Pandas infers by probing values eagerly; on Spark that becomes ONE
  * aggregation job over all string columns at once: per column, count
  * how many non-null values are boolean tokens / numerically castable /
  * date castable, then promote when ALL non-null values pass
  * (`typeset_relations.py:85-101` uses the same all-coerce rule).
  */
object TypeInference {

  /** Boolean token map (reference: typeset_relations.py:39-65). */
  val boolTokens: Seq[String] =
    Seq("yes", "no", "y", "n", "true", "false", "t", "f")

  final case class InferredType(
      column: String,
      declared: ProfileType,
      inferred: ProfileType,
      /** Cast expression producing the inferred-type column. */
      cast: Column)

  /** One aggregation job inferring promotions for every string column. */
  def infer(df: DataFrame): Seq[InferredType] = {
    val stringCols = df.schema.fields.filter(_.dataType == StringType).toSeq
    val nonString = df.schema.fields.filterNot(_.dataType == StringType).toSeq
      .map { f =>
        val t = ProfileType.fromDataType(f.dataType)
        InferredType(f.name, t, t, col("`" + f.name.replace("`", "``") + "`"))
      }
    if (stringCols.isEmpty) return nonString

    val aggs = stringCols.flatMap { f =>
      val c = col("`" + f.name.replace("`", "``") + "`")
      val lc = lower(trim(c))
      Seq(
        count(c).as(s"${f.name}::n"),
        count(when(lc.isin(boolTokens.map(x => x: Any): _*), 1)).as(s"${f.name}::bool"),
        count(c.try_cast("double")).as(s"${f.name}::num"),
        count(coalesce(
          c.try_cast("timestamp"),
          c.try_cast("date").cast("timestamp"))).as(s"${f.name}::date"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()

    val inferredStrings = stringCols.map { f =>
      val n = row.getAs[Long](s"${f.name}::n")
      val c = col("`" + f.name.replace("`", "``") + "`")
      def allPass(k: String): Boolean = n > 0 && row.getAs[Long](s"${f.name}::$k") == n
      if (allPass("bool"))
        InferredType(f.name, ProfileType.Categorical, ProfileType.Bool,
          lower(trim(c)).isin(Seq("yes", "y", "true", "t"): _*))
      else if (allPass("num"))
        InferredType(f.name, ProfileType.Categorical, ProfileType.Numeric,
          c.cast("double"))
      else if (allPass("date"))
        InferredType(f.name, ProfileType.Categorical, ProfileType.DateTime,
          coalesce(c.try_cast("timestamp"), c.try_cast("date").cast("timestamp")))
      else
        InferredType(f.name, ProfileType.Categorical, ProfileType.Categorical, c)
    }
    nonString ++ inferredStrings
  }

  /** Cast every promotable column to its inferred type (the analogue of
    * the reference's `cast_to_inferred`, model/summary.py:90-91). */
  def castToInferred(df: DataFrame): DataFrame = {
    val inferred = infer(df)
    df.select(df.schema.fieldNames.toSeq.map { name =>
      inferred.find(_.column == name)
        .map(i => i.cast.as(name))
        .getOrElse(col("`" + name.replace("`", "``") + "`"))
    }: _*)
  }
}
