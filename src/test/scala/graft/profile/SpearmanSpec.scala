package graft.profile

import graft.SparkSpec

class SpearmanSpec extends SparkSpec {
  import spark.implicits._

  test("rank-join spearman matches MLlib on real data") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")

    val fast = Profiler.spearmanMatrix(df, cols)

    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.stat.Correlation
    val assembled = new VectorAssembler().setInputCols(cols.toArray)
      .setOutputCol("f").transform(df)
    val m = Correlation.corr(assembled, "f", "spearman").head()
      .getAs[org.apache.spark.ml.linalg.Matrix](0)

    for (i <- cols.indices; j <- cols.indices)
      assert(math.abs(fast.values(i)(j) - m(i, j)) < 1e-10,
        s"($i,$j): ${fast.values(i)(j)} vs ${m(i, j)}")
  }

  test("spearman handles ties and perfect monotonicity") {
    val df = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 25.0), (3.0, 30.0))
      .toDF("x", "y")
    val m = Profiler.spearmanMatrix(df, Seq("x", "y"))
    assert(m.values(0)(1) > 0.9)
    val inv = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    assert(math.abs(Profiler.spearmanMatrix(inv, Seq("x", "y"))
      .values(0)(1) + 1.0) < 1e-12)
  }
}
