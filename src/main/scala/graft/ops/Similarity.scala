package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StatFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k with a broadcast probe set — exact,
  * O(|corpus| x |probes|), the right tool when probes are few. Scale path:
  * deterministic random-hyperplane LSH bucketing, which cuts the candidate
  * set per probe to one bucket (+ neighbors), then the exact scorer runs
  * only within buckets.
  */
object Similarity {

  /** Exact brute-force cosine top-k. The probe set is broadcast (it is
    * small by construction); the corpus is scanned once, no shuffle until
    * the bounded per-probe top-k. */
  def bruteForceTopK(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(p))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    // rank on the ROUNDED similarity with id tie-break: deterministic
    // across engines even when two raw cosines differ in the last ulp
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane projection: plane p dotted
    * with v, where plane component i is +1/-1 by parity of a 60-bit hash
    * of (p, i). No RNG state — reproducible across runs and engines. */
  private def hyperplaneSign(vecCol: String, plane: Int) = {
    // component sign: hash64 of "plane:i" — computed per element via
    // transform over the vector's index range
    val signs = transform(sequence(lit(0), size(col(vecCol)) - 1), i =>
      when(pmod(hash64(concat(lit(plane.toString), lit("_"), i.cast("string")), 7919), lit(2)) === 0,
        lit(1.0)).otherwise(lit(-1.0)))
    aggregate(
      zip_with(col(vecCol), signs, (x, s) => x.cast("double") * s),
      lit(0.0), (acc, v) => acc + v)
  }

  /** Random-hyperplane (SRP) LSH bucket id: `planes` sign bits packed to a
    * long. Cosine-similar vectors collide with probability
    * (1 - theta/pi)^planes. */
  def hyperplaneLshBuckets(
      df: DataFrame, idCol: String, vecCol: String, planes: Int): DataFrame = {
    val bucket = (0 until planes).map { p =>
      when(hyperplaneSign(vecCol, p) >= 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a + b)
    df.select(col(idCol).as("id"), bucket.as("bucket"))
  }

  /** ANN top-k via SRP-LSH: score only within the probe's bucket. Recall
    * is tunable via `planes` (fewer planes = bigger buckets = higher
    * recall, more compute). */
  def lshTopK(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int): DataFrame = {
    val cb = hyperplaneLshBuckets(corpus, idCol, vecCol, planes)
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("cv")), "id")
      .select(col("id").as("neighbor_id"), col("bucket"), col("cv"))
    val pb = hyperplaneLshBuckets(probes, idCol, vecCol, planes)
      .join(probes.select(col(idCol).as("id"), col(vecCol).as("qv")), "id")
      .select(col("id").as("query_id"), col("bucket"), col("qv"))
    val scored = cb.join(broadcast(pb), "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosineSimilarity(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }
}
