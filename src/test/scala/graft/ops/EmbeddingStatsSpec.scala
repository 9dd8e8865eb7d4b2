package graft.ops

import graft.SparkSpec

class EmbeddingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("nulls, zero vectors, ragged dims, and norms all reported") {
    val df = Seq(
      Some(Array(3.0f, 4.0f)), // norm 5
      Some(Array(0.0f, 0.0f)), // zero vector
      Some(Array(1.0f, 0.0f)), // norm 1
      Some(Array(1.0f, 1.0f, 1.0f)), // ragged (3 dims)
      None
    ).toDF("emb")
    val r = EmbeddingStats.normStats(df, "emb").head()
    assert(r.getLong(0) == 5) // n
    assert(r.getLong(1) == 1) // n_null
    assert(r.getLong(2) == 1) // n_zero
    assert(r.getInt(3) == 2) // modal dims
    assert(r.getLong(4) == 1) // ragged
    assert(r.getDouble(5) == 0.0) // min norm (the zero vector)
    assert(r.getDouble(7) == 5.0) // max norm
    // avg over non-null norms: (5 + 0 + 1 + sqrt(3)) / 4
    val exp = (5.0 + 0.0 + 1.0 +
      BigDecimal(math.sqrt(3)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) / 4
    assert(math.abs(r.getDouble(6) - exp) < 1e-8, s"avg: $r vs $exp")
  }

  test("modal dimension tie breaks to the smaller length") {
    val df = Seq(Array(1.0f), Array(2.0f), Array(1.0f, 2.0f),
      Array(3.0f, 4.0f)).toDF("emb")
    val r = EmbeddingStats.normStats(df, "emb").head()
    assert(r.getInt(3) == 1)
    assert(r.getLong(4) == 2) // the two 2-dim rows count as ragged
  }

  test("int8 quantization error bounded by half a step, zero vec dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.127f, -0.254f, 0.0635f, 0.0f)),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f)), // exact codes -> zero error
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // zero vector -> excluded
    ).toDF("id", "emb")
    val rows = EmbeddingStats.int8QuantizationError(df, "id", "emb")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!rows.contains(3L))
    assert(rows(2L).getAs[Double]("sse") === 0.0)
    assert(rows(2L).getAs[Double]("max_abs_err") === 0.0)
    val r1 = rows(1L)
    val amax = r1.getAs[Double]("amax")
    // every element's error is at most half a quantization step
    assert(r1.getAs[Double]("max_abs_err") <= amax / 127.0 / 2 + 1e-9)
    assert(r1.getAs[Long]("n_dims") === 4L)
    assert(r1.getAs[Double]("rel_err") >= 0.0)
  }

  test("truncation fidelity: exact ratios on a hand-built vector") {
    import spark.implicits._
    // v = [3,4,0,0]: half keeps all the energy, quarter keeps 3/5
    val df = Seq((7, Array(3.0f, 4.0f, 0.0f, 0.0f))).toDF("label", "emb")
    val r = EmbeddingStats.truncationFidelity(df, "label", "emb").head()
    assert(r.getAs[Long]("n") === 1L)
    assert(math.abs(r.getAs[Double]("avg_keep_half") - 1.0) < 1e-7)
    assert(math.abs(r.getAs[Double]("avg_keep_quarter") - 0.6) < 1e-6)
    assert(r.getAs[Double]("min_keep_half") === 1.0)
  }
}
