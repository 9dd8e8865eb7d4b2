package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins that sort_array(map_entries(m)) — a plain thread-safe
  * expression — canonicalizes exactly like the interpreted-HOF
  * array_sort it replaced in Decompose.canonicalizeMaps (non-null
  * entries: both use natural struct ordering). */
class MapSortEquivSpec extends SparkSpec {
  import spark.implicits._

  test("sort_array and array_sort agree on map_entries canonicalization") {
    val df = Seq(1, 2, 3, 4).toDF("i").select(
      when(col("i") % 2 === 0, map(lit("a"), lit("x"), lit("b"), lit("y")))
        .otherwise(map(lit("b"), lit("y"), lit("a"), lit("x"))).as("m"),
      map(col("i").cast("string"), col("i") * 2).as("m2"))
    val rows = df.select(
      array_sort(map_entries(col("m"))).cast("string").as("hof"),
      sort_array(map_entries(col("m"))).cast("string").as("plain"),
      array_sort(map_entries(col("m2"))).cast("string").as("hof2"),
      sort_array(map_entries(col("m2"))).cast("string").as("plain2"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(r.getString(2) == r.getString(3))
    }
    assert(rows.map(_.getString(1)).distinct.toSeq == Seq("[{a, x}, {b, y}]"))
    // empty and null maps keep their representations
    val edge = Seq(1).toDF("i").select(
      map().as("me"), lit(null).cast("map<string,string>").as("mn"))
    val e = edge.select(
      sort_array(map_entries(col("me"))).cast("string").as("se"),
      sort_array(map_entries(col("mn"))).cast("string").as("sn")).collect()(0)
    assert(e.getString(0) == "[]" && e.isNullAt(1))
  }
}
