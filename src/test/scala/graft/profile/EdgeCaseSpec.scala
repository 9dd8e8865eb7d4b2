package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = ProfileConfig.default.copy(persist = false)

  test("empty DataFrame profiles without errors") {
    val schema = StructType(Seq(
      StructField("x", DoubleType), StructField("s", StringType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    val p = Profiler.profile(empty, cfg)
    assert(p.table.n == 0)
    assert(p.columns.size == 2)
    assert(p.nDuplicates == 0)
    val c = p.columns.head.common
    assert(c.count == 0 && c.nDistinct == 0 && !c.isUnique)
  }

  test("all-null column profiles cleanly") {
    val df = Seq[(Option[Double], String)]((None, "a"), (None, "b"))
      .toDF("x", "s")
    val p = Profiler.profile(df, cfg)
    val x = p.columns.find(_.name == "x").get
    assert(x.common.nMissing == 2)
    assert(p.alerts.exists(a => a.kind == "MISSING" && a.column.contains("x")))
  }

  test("sketch mode survives empty and all-null inputs") {
    // HLL/GK aggregates over zero rows must come back 0/absent, not
    // null-NPE — the sketch path has its own result extraction
    val sketchCfg = cfg.copy(exactDistinct = false, exactQuantiles = false,
      computeSpearman = true)
    val schema = StructType(Seq(
      StructField("x", DoubleType), StructField("s", StringType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    val pe = Profiler.profile(empty, sketchCfg)
    assert(pe.table.n == 0)
    assert(pe.columns.forall(_.common.nDistinct == 0))
    val nulls = Seq[(Option[Double], String)]((None, "a"), (None, "b"))
      .toDF("x", "s")
    val pn = Profiler.profile(nulls, sketchCfg)
    val x = pn.columns.find(_.name == "x").get
    assert(x.common.nMissing == 2 && x.common.nDistinct == 0)
    val s = pn.columns.find(_.name == "s").get
    assert(s.common.nDistinct == 2)
  }

  test("single-row table") {
    val p = Profiler.profile(Seq((1.0, "only")).toDF("x", "s"), cfg)
    assert(p.table.n == 1)
    val x = p.columns.find(_.name == "x").get
    // n=1: std/skew/kurt undefined -> NaN, no crash (ANSI guards)
    assert(x.common.count == 1)
  }

  test("column names with dots and spaces survive") {
    val df = Seq((1.0, "a")).toDF("the.value", "a name")
    val p = Profiler.profile(df, cfg)
    assert(p.columns.map(_.name).toSet == Set("the.value", "a name"))
  }
}
