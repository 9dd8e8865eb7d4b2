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
}
