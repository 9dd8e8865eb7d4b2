package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k) distinct sketches and
  * cross-group overlap ESTIMATION — the theta-sketch family's scale
  * path for "how much distinct vocabulary do two sources share?"
  * when the exact pairwise overlap (q127's Jaccard matrix) stops
  * fitting. Bar-Yossef et al. 2002 / the DataSketches theta sketch:
  * keep the k smallest hash values of the distinct key set; with
  * R = kth-smallest / 2^60, distinct ≈ (k−1)/R; two sketches merge by
  * taking the k smallest of their union, and the fraction of the
  * merged sketch present in BOTH inputs estimates Jaccard.
  *
  * Determinism is the design constraint (gates compare exactly): the
  * hash is the repo's md5-60-bit convention — Spark
  * `conv(substr(md5(x),1,15),16,10)` == DuckDB
  * `('0x'||substr(md5(x),1,15))::BIGINT` — so the q376 oracle replays
  * every sketch bit-for-bit; when a group holds fewer than k distinct
  * keys the sketch IS the key set and the estimate is exact.
  *
  * Scale shape: one distinct on (group, hash) (the only corpus-sized
  * shuffle), then the mergeable [[graft.functions.BoundedTopK]] heap
  * (O(k) per partition per group — never a per-group window sort);
  * the pairwise stage runs on the GROUP-sized sketch table
  * (broadcast self-join, array ops only). */
object KmvSketch {

  private def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Per-group bottom-k sketch over the DISTINCT values of `keyCol`:
    * (group, kmv array<long> ascending, n_kmv). */
  def sketch(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2, 65536]: $k")
    df.select(col(groupCol).as("g"), h60(col(keyCol)).as("h"))
      .distinct()
      .groupBy("g")
      .agg(graft.functions.BoundedTopK
        .topK(-col("h"), col("h"), k).as("tk"))
      .select(col("g").as(groupCol),
        array_sort(transform(col("tk"), x => x.getField("id")))
          .as("kmv"),
        size(col("tk")).as("n_kmv"))
  }

  /** Pairwise overlap estimates between every two groups (a < b):
    * merged-sketch union estimate, Jaccard estimate (shared fraction
    * of the merged sketch), and the implied intersection estimate.
    * Exact when both groups hold < k distinct keys. */
  def overlap(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    val sk = sketch(df, groupCol, keyCol, k)
    val a = sk.select(col(groupCol).as("src_a"), col("kmv").as("ka"))
    val b = sk.select(col(groupCol).as("src_b"), col("kmv").as("kb"))
    val two60 = lit(math.pow(2, 60))
    val ku = slice(array_sort(array_distinct(
      concat(col("ka"), col("kb")))), 1, k)
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("ka"), col("kb"),
        ku.as("ku"))
      .select(col("src_a"), col("src_b"),
        size(col("ku")).as("k_eff"),
        size(filter(col("ku"), x =>
          array_contains(col("ka"), x) && array_contains(col("kb"), x)))
          .as("n_shared"),
        when(size(col("ku")) < k, size(col("ku")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * two60 /
            element_at(col("ku"), size(col("ku"))).cast("double"))
          .as("est_union"))
      .select(col("src_a"), col("src_b"), col("k_eff"), col("n_shared"),
        round(col("est_union"), 6).as("est_union"),
        round(col("n_shared").cast("double") /
          col("k_eff").cast("double"), 6).as("jaccard_est"),
        round(col("est_union") * col("n_shared").cast("double") /
          col("k_eff").cast("double"), 6).as("est_intersection"))
  }
}
