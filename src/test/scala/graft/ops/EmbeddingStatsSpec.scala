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
}
