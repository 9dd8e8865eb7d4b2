package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP redirect-chain resolution — the missing seam between fetching
  * and the canonical frontier: a crawler that records `src → dst`
  * redirect pairs (301/302/307/308) must map every URL to the
  * TERMINAL location it actually serves from, detect loops, and cap
  * pathological chains (browsers cap around 20 hops; crawl policies
  * 5–10). Resolved targets are what the link graph, dedup keys, and
  * the frontier should carry — compose with
  * [[UrlResolve.canonicalize]] for the full equivalence key. q409
  * gates it on a corpus-scale construction with planted 4-cycles.
  *
  * Semantics: `redirects` is a FUNCTIONAL graph (one outgoing edge
  * per src — HTTP gives one Location per URL; duplicate srcs are
  * rejected loudly, a crawl log with disagreeing redirects needs
  * versioning, not silent last-wins). A probe URL with no outgoing
  * edge is its own terminal (n_hops 0). Chains resolve with EXACT hop
  * counts; a chain still unterminated after `maxHops` advances —
  * a loop, or longer than policy allows (a crawler treats both
  * identically) — emits status `loop_or_limit` with null final/hops.
  *
  * Shape: `maxHops` rounds of one left equi-join each (pending ⋈
  * edges on the current position), pending-set localCheckpointed per
  * level (the [[Sitemap.frontier]] discipline: flat lineage, bounded
  * driver actions — one empty-check per level, ≤ maxHops of them).
  * The edge table is checkpointed once and reused; each level's
  * pending set only SHRINKS. Hop counts stay exact — the
  * pointer-doubling alternative halves the rounds but loses them. */
object Redirects {

  def resolveChains(redirects: DataFrame, srcCol: String,
      dstCol: String, probes: DataFrame, urlCol: String,
      maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1: $maxHops")
    val edges = redirects
      .select(col(srcCol).cast("string").as("__src"),
        col(dstCol).cast("string").as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val dupSrc = edges.groupBy("__src").count().where(col("count") > 1)
    require(dupSrc.isEmpty,
      "redirects must be functional (one Location per src URL) — " +
        "version disagreeing crawl logs before resolving")

    var pending = probes
      .select(col(urlCol).cast("string").as("url"))
      .where(col("url").isNotNull)
      .distinct()
      .select(col("url"), col("url").as("cur"), lit(0).as("hops"))
      .localCheckpoint(true)
    var resolved: DataFrame = null
    var hop = 0
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      val stepped = pending
        .join(edges, pending("cur") === edges("__src"), "left")
        .select(col("url"), col("cur"), col("hops"), col("__dst"))
        .localCheckpoint(true)
      val done = stepped.where(col("__dst").isNull)
        .select(col("url"), col("cur").as("final_url"),
          col("hops").as("n_hops"), lit("ok").as("status"))
      resolved = if (resolved == null) done
        else resolved.unionByName(done)
      pending = stepped.where(col("__dst").isNotNull)
        .select(col("url"), col("__dst").as("cur"),
          (col("hops") + 1).as("hops"))
        .localCheckpoint(true)
      hop += 1
      if (pending.head(1).isEmpty) exhausted = true
    }
    // a pending row after maxHops advances either loops or exceeds
    // policy; one final terminal check rescues chains of EXACTLY
    // maxHops (the last advance may have landed on a terminal)
    val last = pending
      .join(edges, pending("cur") === edges("__src"), "left")
      .select(col("url"),
        when(col("__dst").isNull, col("cur")).as("final_url"),
        when(col("__dst").isNull, col("hops")).as("n_hops"),
        when(col("__dst").isNull, lit("ok"))
          .otherwise(lit("loop_or_limit")).as("status"))
    resolved.unionByName(last)
  }
}
