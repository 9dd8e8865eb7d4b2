package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DeltaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oldDf = Seq(
    (1L, Option("a"), Option(10L)), // unchanged
    (2L, Option("b"), Option(20L)), // value change
    (3L, Option("c"), Option(30L)), // removed
    (4L, None: Option[String], Option(40L)), // null -> null unchanged
    (5L, Option("e"), None: Option[Long]) // null -> value change
  ).toDF("id", "s", "n")

  private lazy val newDf = Seq(
    (1L, Option("a"), Option(10L)),
    (2L, Option("B"), Option(20L)),
    (4L, None: Option[String], Option(40L)),
    (5L, Option("e"), Option(50L)),
    (6L, Option("f"), Option(60L)) // added
  ).toDF("id", "s", "n")

  test("snapshotDiff: status + changed_cols per row, null-safe") {
    val got = Delta.snapshotDiff(oldDf, newDf, Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, "unchanged", ""),
      (2L, "changed", "s"),
      (3L, "removed", ""),
      (4L, "unchanged", ""), // null == null, not a change
      (5L, "changed", "n"),
      (6L, "added", "")))
  }

  test("snapshotDiff: multi-column change lists names in schema order") {
    val o = Seq((1L, "x", 1L)).toDF("id", "s", "n")
    val n = Seq((1L, "y", 2L)).toDF("id", "s", "n")
    val r = Delta.snapshotDiff(o, n, Seq("id")).collect()(0)
    assert(r.getString(1) == "changed" && r.getString(2) == "s,n")
  }

  test("snapshotDiff: schema mismatch and key-only schemas rejected") {
    intercept[IllegalArgumentException] {
      Delta.snapshotDiff(oldDf, newDf.withColumnRenamed("n", "m"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Delta.snapshotDiff(oldDf.select("id"), newDf.select("id"), Seq("id"))
    }
  }
}
