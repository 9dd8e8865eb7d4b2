package graft.ops

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("separable classes classify to a perfect diagonal") {
    val df = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog ate the bone"),
      (3L, "fr", "le chat dort sur le tapis"),
      (4L, "fr", "le chien mange le os")
    ).toDF("doc_id", "lang", "text")
    val got = NaiveBayes.confusionSelfTrain(df, "doc_id", "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(("en", "en") -> 2L, ("fr", "fr") -> 2L))
  }

  test("shared-vocabulary doc falls to the prior-favored class on tie") {
    // 'x' appears equally in both classes; class a has more docs, so
    // the prior decides; tie impossible here by construction
    val df = Seq(
      (1L, "a", "x x"), (2L, "a", "x"), (3L, "b", "x")
    ).toDF("doc_id", "lang", "text")
    val got = NaiveBayes.confusionSelfTrain(df, "doc_id", "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // all docs predicted 'a' (higher prior, likelihoods comparable)
    assert(got.keys.forall(_._2 == "a"))
    assert(got.values.sum == 3L)
  }
}
