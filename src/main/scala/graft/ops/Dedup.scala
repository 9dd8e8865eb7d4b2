package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StatFunctions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design (100 TB): every op here is a constant number of shuffles
  * over keys that distribute uniformly (hashes / shingles), no driver
  * materialization. The pairwise verifiers only ever run on LSH-bucketed
  * candidates, never on the full cross product.
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `keepBy` per duplicate
    * group. One shuffle on the dedup key (hash partitioning). */
  def exactDedup(df: DataFrame, keyCols: Seq[String], keepBy: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(keepBy))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Normalized text key for exact near-exact dedup: lowercase, collapse
    * whitespace. */
  def normalizedText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Distinct character k-shingles per document: (id, shingle) rows.
    * Documents shorter than k yield no rows. */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.where(length(col(textCol)) >= k)
      .select(col(idCol).as("id"),
        explode(array_distinct(shingles(col(textCol), k))).as("g"))

  /** Exact n-gram Jaccard similarity for all pairs sharing at least one
    * shingle. The shingle self-join is the scale bottleneck — at 100 TB
    * route candidates through [[minhashLshPairs]] first and use this only
    * as the verifier on candidates. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    val sh = shingleTable(df, idCol, textCol, k)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = sh.as("a"); val b = sh.as("b")
    val common = a.join(b, col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "i").withColumnRenamed("sz", "szi"), "i")
      .join(sizes.withColumnRenamed("id", "j").withColumnRenamed("sz", "szj"), "j")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("szi") + col("szj") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signatures: numHashes seeded 60-bit md5 hashes, min per doc.
    * One explode + one shuffle regardless of numHashes. */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame = {
    val sh = shingleTable(df, idCol, textCol, k)
    val aggs = (0 until numHashes).map(i => min(hash64(col("g"), i)).as(s"s$i"))
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH candidate pairs: band the signature (bands x rowsPerBand
    * = numHashes), bucket-join on (band, md5 of band slice), emit each
    * candidate pair once. Collision probability follows the standard
    * (1-(1-s^r)^b) S-curve. */
  def minhashLshPairs(
      signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"s${b * rowsPerBand + r}"))
      struct(lit(b).as("band"),
        md5(concat_ws(",", slice: _*)).as("key"))
    }
    val buckets = signatures
      .select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = buckets.as("a"); val b = buckets.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
  }

  /** End-to-end MinHash near-dup detection: LSH candidates verified with
    * exact shingle Jaccard. */
  def minhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String, k: Int,
      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = minhashSignatures(df, idCol, textCol, k, numHashes)
    val candidates = minhashLshPairs(sigs, bands, numHashes / bands)
    val sh = shingleTable(df, idCol, textCol, k)
    verifyJaccard(candidates, sh, threshold)
  }

  private def verifyJaccard(
      candidates: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val shi = sh.select(col("id").as("i"), col("g"))
    val shj = sh.select(col("id").as("j"), col("g"))
    val common = candidates.join(shi, "i").join(shj, Seq("j", "g"))
      .groupBy("i", "j").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("i"), col("sz").as("szi")), "i")
      .join(sizes.select(col("id").as("j"), col("sz").as("szj")), "j")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("szi") + col("szj") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash (Charikar) over the distinct-word set with 60-bit word
    * hashes folded to `bits` sign-sums. Near-dups then reduce to Hamming
    * distance on the signature — O(n) bucketing instead of O(n^2). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame = {
    val words = df.select(col(idCol).as("id"),
      explode(array_distinct(split(lower(col(textCol)), "\\s+"))).as("w"))
      .where(length(col("w")) > 0)
      .withColumn("h", hash64(col("w"), 0))
    val bitSums = (0 until bits).map(b =>
      sum(when((shiftright(col("h"), b).bitwiseAND(1)) === 1, 1L)
        .otherwise(-1L)).as(s"b$b"))
    val sums = words.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce((a, b) => a + b)
    sums.select(col("id"), sig.as("simhash"))
  }

  /** Embedding near-duplicates: all pairs with cosine >= threshold.
    * Quadratic verifier — at scale, bucket with
    * [[Similarity.hyperplaneLshBuckets]] first. */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("i"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("j"), col(vecCol).as("vb"))
    a.crossJoin(b).where(col("i") < col("j"))
      .withColumn("cos", cosineSimilarity(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("i"), col("j"), round(col("cos"), 6).as("cos"))
  }
}
