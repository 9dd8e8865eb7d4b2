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

  /** Multi-band SRP-LSH bucket table: `bands` independent bucket ids per
    * vector, each from `planesPerBand` sign bits. Two vectors at cosine c
    * share >= 1 band-bucket with probability 1-(1-p^r)^B, p = 1-acos(c)/pi
    * — bands trade compute for recall, the classic LSH amplification.
    *
    * The sign matrix is the SAME deterministic hash family as
    * [[hyperplaneSign]] (parity of hash64("plane_i", 7919)), but
    * materialized ONCE per partition as a primitive array and applied in
    * a flat mapPartitions pass: one scan, bands*planes fused dot
    * products per row, no md5 in the per-row hot path. Output:
    * (id, band, bucket) — n*bands rows, ready for a hash-partitioned
    * self-join on (band, bucket). */
  def srpBandBuckets(
      df: DataFrame, idCol: String, vecCol: String,
      planesPerBand: Int, bands: Int, seed: Int = 7919): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val nPlanes = planesPerBand * bands
    val r = planesPerBand
    // id passes through as an opaque Row field — its ORIGINAL type is
    // preserved (a cast to long would null out string ids and silently
    // return zero pairs downstream). Null embeddings are dropped here
    // rather than NPE-ing the task: a row with no vector has no bucket.
    val in = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<float>").as("vec"))
      .where(col("vec").isNotNull)
    val outSchema = StructType(Seq(
      in.schema.fields(0),
      StructField("band", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false)))
    in.mapPartitions { it =>
      // per-(partition, dim) sign matrix; md5 runs nPlanes*dim times per
      // partition, never per row (deterministic: parity of the same
      // hash64 family used by the SQL-expression hyperplaneSign)
      val md = java.security.MessageDigest.getInstance("MD5")
      def signOf(plane: Int, i: Int): Double = {
        val hex = md.digest(s"$seed:${plane}_$i".getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString.take(15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      }
      val cache = scala.collection.mutable.Map.empty[Int, Array[Array[Double]]]
      def signsFor(dim: Int): Array[Array[Double]] =
        cache.getOrElseUpdate(dim,
          Array.tabulate(nPlanes)(p => Array.tabulate(dim)(i => signOf(p, i))))
      it.flatMap { row =>
        val id = row.get(0)
        val v = row.getSeq[Float](1).toArray
        val s = signsFor(v.length)
        (0 until bands).iterator.map { b =>
          var bucket = 0L
          var p = 0
          while (p < r) {
            val plane = s(b * r + p)
            var dot = 0.0
            var i = 0
            while (i < v.length) { dot += v(i) * plane(i); i += 1 }
            if (dot >= 0) bucket |= (1L << p)
            p += 1
          }
          Row(id, b, bucket)
        }
      }
    }(Encoders.row(outSchema))
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
