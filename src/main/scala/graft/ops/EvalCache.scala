package graft.ops

import org.apache.spark.sql.DataFrame

/** Session-scoped memo for expensive EVAL-FAMILY intermediates that
  * several gate rows re-derive from identical inputs — the same
  * amortization contract as the shingle ([[Dedup]]) and IVF-index
  * ([[IvfIndex]]) caches: PQ codebooks and the encoded codes table
  * (q254 trains them, q255 reuses them), the exact-L2 rank table both
  * recall rows score against, and q256's probe cosine cross join.
  * Values are lazily localCheckpoint'ed so a hit replays materialized
  * partitions instead of the training/cross-join lineage. Amortizes
  * WITHIN a Bench pass; [[clear]] runs between passes so min-of-two
  * still prices one cold build per pass. */
object EvalCache {

  private val cache = new SessionCache[(Int, String), DataFrame](8)

  /** `key` must encode every input that determines the result — use
    * [[semKey]] for DataFrame inputs plus the scalar params. */
  def cached(spark: org.apache.spark.sql.SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((System.identityHashCode(spark), key))(
      build.localCheckpoint(false))

  /** Semantic fingerprint of a DataFrame input for cache keys. */
  def semKey(df: DataFrame): Int = df.queryExecution.analyzed.semanticHash()

  /** Kept for targeted test use; Bench now clears the whole registry
    * via [[SessionCache.clearAll]]. */
  def clear(): Unit = cache.clear()
}
