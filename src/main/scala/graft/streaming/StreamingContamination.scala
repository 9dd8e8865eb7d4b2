package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time decontamination screen — the STATELESS streaming member
  * of the winnowing family: each arriving document is fingerprinted
  * in-row ([[graft.functions.WinnowExpr]], map-only) and its distinct
  * hashes are intersected with the benchmark fingerprint set; documents
  * sharing at least `minShared` fingerprints are flagged before they
  * ever reach the training corpus.
  *
  * Why stateless matters: the batch decontamination rows (q52/q99/
  * q129/q307) re-scan the corpus; this runs at ingest with ZERO state
  * store — no watermark, no timeout, no state growth on an unbounded
  * stream — because the benchmark side is a bounded, frozen artifact
  * (that is what benchmarks are). The exact set rides the plan as a
  * literal array (one broadcast); at web-benchmark scale swap in the
  * codegen'd [[graft.functions.BloomMightContain]] probe and verify
  * flagged docs offline — same shape, same statelessness.
  *
  * Output (Append-safe): (idCol, n_shared) for flagged documents only.
  */
object StreamingContamination {

  def flagContaminated(stream: DataFrame, idCol: String, textCol: String,
      benchHashes: Array[Long], k: Int, w: Int,
      minShared: Int): DataFrame = {
    require(benchHashes.nonEmpty, "benchmark fingerprint set is empty")
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val fp = graft.functions.WinnowExpr.winnow(col(textCol), k, w)
    val hs = array_distinct(transform(fp, f => f.getField("h")))
    val shared =
      size(array_intersect(hs, typedlit(benchHashes.toSeq))).cast("long")
    stream
      .select(col(idCol), shared.as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** The web-benchmark-scale swap-in for [[flagContaminated]]:
    * identical shape and statelessness, but the benchmark fingerprint
    * set rides a BLOOM FILTER instead of a literal array — O(bits)
    * per task instead of O(set), the form that holds when the frozen
    * benchmark suite has 10^9 fingerprints. Per-hash false POSITIVES
    * only (a Bloom filter has no false negatives), so every exactly
    * contaminated document is still flagged and each row's
    * `n_shared` is >= the exact count; a bloom-flagged document is a
    * candidate for offline exact verification. Expected inflation per
    * document ~ Binomial(n_clean_probes, fpp); doc-level false flags
    * need `minShared` bloom-positive clean hashes to line up
    * (~C(n, minShared)·fpp^minShared — fpp=1% and minShared=2 on a
    * 100-fingerprint doc is ~0.5%). */
  def flagContaminatedBloom(stream: DataFrame, idCol: String,
      textCol: String, bloom: org.apache.spark.util.sketch.BloomFilter,
      k: Int, w: Int, minShared: Int): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val fp = graft.functions.WinnowExpr.winnow(col(textCol), k, w)
    val hs = array_distinct(transform(fp, f => f.getField("h")))
    val shared = size(filter(hs, h => coalesce(
      graft.functions.BloomMightContain.probe(h, bloom),
      lit(false)))).cast("long")
    stream
      .select(col(idCol), shared.as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
