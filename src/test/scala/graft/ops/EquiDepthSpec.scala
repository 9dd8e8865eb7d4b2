package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class EquiDepthSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("bin",
        ntile(k).over(Window.orderBy(col("v"), col("id"))))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    EquiDepth.equiDepthHistogram(df, "v", k, Seq("id"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

  test("matches SQL ntile bin-for-bin, including heavy ties and n%k != 0") {
    val rnd = new scala.util.Random(3)
    // heavy ties (values 0..19 over 503 rows) and a non-divisible n
    val df = (0 until 503).map(i => (i.toLong, rnd.nextInt(20).toDouble))
      .toDF("id", "v")
    for (k <- Seq(1, 7, 10, 64)) {
      assert(run(df, k) == reference(df, k), s"k=$k")
    }
  }

  test("fewer rows than bins: one row per bin, ntile numbering") {
    val df = Seq((1L, 5.0), (2L, 3.0), (3L, 9.0)).toDF("id", "v")
    assert(run(df, 10) == reference(df, 10))
  }

  test("empty input / all-null column yields an empty histogram, no NPE") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(EquiDepth.equiDepthHistogram(empty, "v", 5, Seq("id"))
      .count() == 0)
    val allNull = Seq((1L, None: Option[Double]), (2L, None))
      .toDF("id", "v")
    assert(EquiDepth.equiDepthHistogram(allNull, "v", 5, Seq("id"))
      .count() == 0)
  }

  test("non-numeric string values are dropped, not crashed on (ANSI)") {
    val df = Seq((1L, "3.5"), (2L, "abc"), (3L, "1.0"), (4L, "2.0"))
      .toDF("id", "v")
    val out = EquiDepth.equiDepthHistogram(df, "v", 3, Seq("id"))
    assert(out.agg(sum("n")).head().getLong(0) == 3) // 'abc' dropped
  }

  test("nulls dropped; plan has no single-partition exchange") {
    val df = (0 until 100).map(i =>
      (i.toLong, if (i % 5 == 0) None else Some(i.toDouble)))
      .toDF("id", "v")
    val out = EquiDepth.equiDepthHistogram(df, "v", 4, Seq("id"))
    assert(out.agg(sum("n")).head().getLong(0) == 80)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global window leaked into the plan:\n$plan")
  }
}
