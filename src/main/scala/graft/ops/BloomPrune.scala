package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain

/** Bloom-accelerated EXACT anti join — decontamination when the deny
  * list is too big to broadcast but its Bloom filter is not. The
  * result is bit-identical to `corpus LEFT ANTI JOIN deny`:
  *
  *   1. build a Bloom filter over xxhash64(deny key) on the deny side
  *      (driver-merged sketch via `stat.bloomFilter`, fpp-sized);
  *   2. rows whose key is bloom-NEGATIVE are definitely clean (no
  *      false negatives) → pass through MAP-ONLY, never shuffled;
  *   3. bloom-POSITIVE rows — true hits + fpp·|corpus| false
  *      positives + any xxhash64 collisions — go through the exact
  *      anti join for verification.
  *
  * At 100 TB the shuffle carries only the survivors of step 2 (≈ fpp
  * of the corpus) instead of the whole corpus; the corpus is scanned
  * twice (both scans map-only, column-pruned), which is far cheaper
  * than shuffling it once. Hash collisions only route extra rows to
  * the verify branch — exactness never depends on the hash or the
  * filter. Null corpus keys are always kept, matching anti-join
  * semantics: xxhash64(null) is the SEED constant (Spark hash
  * functions never return null), so a null key lands in whichever
  * branch the seed-hash probe picks — the map-only branch keeps it
  * directly, and the verify branch keeps it because the equality
  * join never matches null. */
object BloomPrune {

  /** `corpus LEFT ANTI JOIN deny ON corpusKey = denyKey`, bloom-pruned.
    * `expectedDenyItems <= 0` triggers a count of the deny side (one
    * cheap scan of the small side) to size the filter. */
  def antiJoin(
      corpus: DataFrame, corpusKey: String,
      deny: DataFrame, denyKey: String,
      expectedDenyItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // xxhash64 hashes the NATIVE type: INT 5 and BIGINT 5 hash
    // differently even though the verify join's === would up-cast and
    // match — a silent bloom FALSE NEGATIVE that would let
    // contaminated rows through the map-only branch. Demand identical
    // key types so the hash domain and the join's equality agree.
    val ct = corpus.schema(corpusKey).dataType
    val dt = deny.schema(denyKey).dataType
    require(ct == dt,
      s"key types must match exactly (got ${ct.sql} vs ${dt.sql}) — " +
        "equal values of different types hash differently, turning " +
        "bloom false-negatives into silently-kept contaminated rows; " +
        "cast one side first")
    val items =
      if (expectedDenyItems > 0) expectedDenyItems
      else math.max(deny.count(), 1L)
    val hashed = deny.select(xxhash64(col(denyKey)).as("__h"))
    val bloom = hashed.stat.bloomFilter("__h", items, fpp)

    val dk = Iterator.iterate("__dk")("_" + _)
      .dropWhile(corpus.columns.contains).next()
    val maybe = BloomMightContain.probe(xxhash64(col(corpusKey)), bloom)
    val clean = corpus.where(!coalesce(maybe, lit(false)))
    val suspects = corpus.where(coalesce(maybe, lit(false)))
      .join(deny.select(col(denyKey).as(dk)),
        col(corpusKey) === col(dk), "left_anti")
    clean.unionByName(suspects)
  }
}
