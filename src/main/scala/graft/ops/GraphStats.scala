package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph structural statistics over an undirected edge list —
  * the connectivity diagnostics next to [[ConnectedComponents]]: how
  * clustered is the co-occurrence / interaction graph a pipeline just
  * built?
  *
  * Scale design (100 TB): triangle counting uses the degree-ordered
  * orientation (each undirected edge points from its lower-(degree,
  * node) endpoint to the higher) — the classic bound that caps every
  * node's out-degree at O(√m), so the wedge join materializes O(m^1.5)
  * rows worst-case instead of Σ deg² (a hub of degree d contributes d²
  * wedges under naive orientation but only O(m) oriented ones). All
  * three steps — degree groupBy, wedge self-join, closing-edge
  * semi-join — are hash-partitioned equi-joins; nothing touches the
  * driver.
  */
object GraphStats {

  /** Canonical undirected edges: (u, w) with u < w, self-loops dropped,
    * duplicates collapsed. */
  private def canonical(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges
      .where(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("w"))
      .distinct()

  /** One-row summary of an undirected graph: node/edge counts, wedge
    * (open two-path) count, triangle count, and the global clustering
    * coefficient 3·triangles / wedges (6 dp, null for wedge-free
    * graphs). Node ids must be orderable (numeric or string); the
    * edge list may contain duplicates, self-loops, or both directions
    * — all canonicalized away first. All counts are integer-exact. */
  def triangleStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = canonical(edges, srcCol, dstCol)
      .localCheckpoint(false) // degrees + orientation + closure share it
    val deg = canon.select(col("u").as("n"))
      .unionAll(canon.select(col("w").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // orient by (deg, node): lower endpoint -> higher; total order, so
    // every undirected edge gets exactly one direction
    val ranked = canon
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("deg", "du"),
        "u")
      .join(deg.withColumnRenamed("n", "w").withColumnRenamed("deg", "dw"),
        "w")
    val rankU = struct(col("du").as("d"), col("u").as("n"))
    val rankW = struct(col("dw").as("d"), col("w").as("n"))
    val uLower = rankU < rankW
    val directed = ranked.select(
      when(uLower, col("u")).otherwise(col("w")).as("src"),
      when(uLower, rankW).otherwise(rankU).as("dst_rank"))
      .withColumn("dst", col("dst_rank").getField("n"))
      .localCheckpoint(false)
    // wedges at the lowest-rank corner; closing edge always oriented
    // b -> c because the orientation is the SAME total order
    val d1 = directed.select(col("src"), col("dst").as("b"),
      col("dst_rank").as("rb"))
    val d2 = directed.select(col("src"), col("dst").as("c"),
      col("dst_rank").as("rc"))
    val wedges = d1.join(d2, Seq("src")).where(col("rb") < col("rc"))
    val closing = directed.select(col("src").as("b"), col("dst").as("c"))
    val triangles = wedges.join(closing, Seq("b", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    // deg*(deg-1) is always even, so the per-term integer halving is
    // exact and the sum never routes through a double
    val degStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val edgeCount = canon.agg(count(lit(1)).as("n_edges"))
    degStats.crossJoin(edgeCount).crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0, round(
          lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("clustering_coeff"))
  }

  /** Fixed-iteration PageRank over a directed edge list, computed
    * ENTIRELY in integer "rank quanta" (the unit mass `scale` split
    * across nodes) so the result is bit-exact and engine-reproducible —
    * no float accumulation order to disagree about. Per iteration, with
    * d = dampNum/dampDen and N = |nodes|:
    *
    *   q'(v) = (scale - scale*dampNum div dampDen) div N
    *           + dampNum * (danglingSum div N + Σ_{u→v} q(u) div outdeg(u))
    *             div dampDen
    *
    * where every division is integer floor division (truncation loses a
    * few quanta of mass per iteration — a deterministic, documented
    * variant; the ordering it induces is the standard PageRank one).
    *
    * Scale design (100 TB): each iteration is one hash join of the rank
    * table with the edge list plus a map-side-combined groupBy on the
    * destination — the canonical iterative-join PageRank plan. The
    * dangling mass is a single-row aggregate collected to the driver
    * (bounded: one long per iteration), and each iteration's rank table
    * is lazily localCheckpointed so the loop's lineage stays flat.
    * Duplicate edges are collapsed; nodes absent from the edge list are
    * dangling and still ranked. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, idCol: String, iterations: Int = 5,
      scale: Long = 1000000000000L, dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iterations >= 1 && dampNum > 0 && dampNum < dampDen)
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val nd = nodes.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint(false)
    val n = nd.count()
    require(n > 0, "empty node set")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val base = (scale - scale * dampNum / dampDen) / n
    // superseded rank tables are freed through the ring (round-12, the
    // ConnectedComponents discipline). r16: the per-iteration dangling
    // mass no longer round-trips through the driver — it rides the plan
    // as a broadcast one-row aggregate (`__ds div n` is the same
    // non-negative integer floor division the driver computed), so each
    // iteration is exactly ONE action: the EAGER checkpoint of the new
    // rank table (previously: one dangling head() job + one lazy
    // materialization job). rotate() sits after the checkpoint — the
    // materialization point — so q_{i-2} is freed only once q_i's
    // blocks exist. e/nd/outdeg are loop-invariant and deliberately NOT
    // on the ring.
    val ring = new CheckpointRing(edges.sparkSession)
    // r17 (ADVICE r16): the initial rank table stays OFF the ring — it
    // is a pure projection of the already-checkpointed nd, read exactly
    // once (by iteration 1's join), so checkpointing it only wrote one
    // generation of blocks that the next rotate() dropped unread-again.
    var q = nd.select(col("id"), lit(scale / n).as("q"))
    for (_ <- 1 to iterations) {
      val withDeg = q.join(outdeg, q("id") === outdeg("src"), "left")
        .select(col("id"), col("q"), col("outdeg"))
      val dangling = withDeg.where(col("outdeg").isNull)
        .agg(coalesce(sum(col("q")), lit(0L)).as("__ds"))
      val inSums = withDeg.where(col("outdeg").isNotNull)
        .select(col("id"), expr("q div outdeg").as("c"))
        .join(e, col("id") === e("src"))
        .groupBy("dst").agg(sum(col("c")).as("in_sum"))
      q = ring.checkpoint(nd.join(inSums, nd("id") === inSums("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(nd("id"),
          (lit(base) + expr(
            s"(${dampNum}L * ((__ds div ${n}L) + coalesce(in_sum, 0L))) div ${dampDen}L"))
            .as("q")))
      ring.rotate()
    }
    q.select(col("id").as(idCol), col("q").as("rank_q"))
  }

  /** k-core extraction (Seidman 1983): iteratively peel every vertex
    * of degree < k until the fixpoint — the densest-backbone filter a
    * graph-curation pass runs before trusting co-occurrence edges
    * (low-core vertices are the long noisy tail; spam/link-farm
    * pruning on web graphs). Returns the surviving vertices with their
    * WITHIN-CORE degree: (node `n`, core_deg ≥ k), empty when the
    * whole graph peels away.
    *
    * Distributed loop, no driver data: each round is one
    * map-side-combined degree groupBy + two anti joins removing edges
    * with a sub-k endpoint, the round's edge table localCheckpointed
    * so lineage stays flat (the pageRank discipline). Peeling is
    * MONOTONE — the edge set only shrinks, every round's work is
    * bounded by the previous round's edges — and the early exit fires
    * the first round nothing peels, so `maxIter` is a safety valve,
    * not a tuning knob: the fixpoint reached within it is THE k-core
    * (rounds beyond convergence are no-ops, which is also what lets a
    * fixed-depth oracle unroll over-provision safely). Throws if the
    * fixpoint is not reached in `maxIter` rounds. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxIter: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // superseded peel rounds freed through the ring (round-12, the
    // ConnectedComponents discipline): lazy checkpoints, so round i's
    // edge table materializes during round i+1's isEmpty action —
    // rotate() fires right after it, freeing round i-1's blocks.
    val ring = new CheckpointRing(edges.sparkSession)
    var e = ring.checkpoint(canonical(edges, srcCol, dstCol),
      eager = false)
    def degrees(ed: DataFrame): DataFrame =
      ed.select(col("u").as("n"))
        .unionAll(ed.select(col("w").as("n")))
        .groupBy("n").agg(count(lit(1)).as("core_deg"))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      it += 1
      val bad = ring.checkpoint(degrees(e).where(col("core_deg") < k)
        .select(col("n")), eager = false)
      val empty = bad.isEmpty
      ring.rotate()
      if (empty) converged = true
      else e = ring.checkpoint(e
        .join(bad.withColumnRenamed("n", "u"), Seq("u"), "left_anti")
        .join(bad.withColumnRenamed("n", "w"), Seq("w"), "left_anti")
        .select("u", "w"), eager = false)
    }
    require(converged,
      s"k-core did not reach the fixpoint in $maxIter rounds")
    degrees(e)
  }

  /** Degree assortativity coefficient (Newman, PRL 2002): the Pearson
    * correlation of end-point degrees over all directed edge
    * instances (each undirected edge counted in both orientations).
    * Positive = hubs attach to hubs (a near-dup graph with assortative
    * duplicate families collapses well under canonical-doc selection);
    * negative = star-like boilerplate hubs.
    *
    * All sums are exact integer arithmetic over long degrees (no
    * double accumulation anywhere — the correlation's five sufficient
    * statistics are Σx, Σx², Σxy over integer degrees), so the result
    * is bit-reproducible at any partitioning. Cost: one groupBy for
    * degrees + two broadcast-or-hash joins back to the edge list.
    * Returns one row (n_nodes, n_edges, assortativity 6dp — null for
    * degree-regular graphs where the variance is zero). */
  def assortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = canonical(edges, srcCol, dstCol)
      .localCheckpoint(false) // degrees + both orientations share it
    val deg = canon.select(col("u").as("n"))
      .unionAll(canon.select(col("w").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val directed = canon.select(col("u").as("a"), col("w").as("b"))
      .unionAll(canon.select(col("w").as("a"), col("u").as("b")))
    val joined = directed
      .join(deg.select(col("n").as("a"), col("deg").as("dx")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("dy")), Seq("b"))
    val stats = joined.agg(
      count(lit(1)).as("m2"), // 2·|E|
      sum(col("dx")).as("sx"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dx") * col("dy")).as("sxy"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    // by symmetry of the doubled edge list, Σy = Σx and Σy² = Σx²
    val m = col("m2").cast("double")
    val sx2 = col("sx").cast("double") * col("sx").cast("double")
    val num = (col("sxy").cast("double") * m) - sx2
    val den = (col("sxx").cast("double") * m) - sx2
    stats.crossJoin(broadcast(nNodes))
      .select(col("n_nodes"), (col("m2") / 2).cast("long").as("n_edges"),
        when(den > 0.0, round(num / den, 6)).as("assortativity"))
  }

  /** HITS (Kleinberg, "Authoritative sources in a hyperlinked
    * environment", JACM 1999) — the hub/authority complement of
    * [[pageRank]]: an AUTHORITY is pointed to by good hubs, a HUB
    * points to good authorities; the mutual recursion a(j) = Σ h(i)
    * over in-edges, h(i) = Σ a(j) over out-edges, normalized each
    * half-step. Where PageRank scores global endorsement flow, HITS
    * separates directories/link-lists (hubs) from the pages worth
    * fetching (authorities) — the classic crawl-frontier pairing.
    *
    * INTEGER variant (the q393 quota discipline — Kleinberg's L2
    * normalization needs a sqrt no two float engines agree on):
    * scores live on [0, scale]; each half-iteration computes the
    * exact BIGINT in-sums, then max-normalizes with floor division
    * score = scale·raw div max(raw). Deterministic in any 64-bit
    * engine; the induced RANKING is the standard HITS one (max- vs
    * L2-normalization rescales, it does not reorder). Sums are exact
    * while max-indegree·scale < 2⁶³ — at scale=10⁶ that is ~9·10¹²
    * in-edges on one node, beyond any real host graph.
    *
    * Scale design: each half-iteration is one hash join of the score
    * table with the edge list + a map-side-combined groupBy, exactly
    * the [[pageRank]] plan; the max is a single-row aggregate
    * (bounded driver traffic: one long per half-iteration); score
    * tables rotate through a [[CheckpointRing]] so lineage stays
    * flat. Output (id, auth_q, hub_q); isolated-direction nodes
    * carry 0. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 4, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(scale >= 2, s"scale must be >= 2: $scale")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val nd = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(false)
    // r16: each half-iteration's max-normalizer rides the plan as a
    // broadcast one-row aggregate instead of a driver head() — one
    // EAGER checkpoint action per half-iteration (previously two jobs:
    // the max collect + the lazy materialization). The normalization
    // multiply runs in DECIMAL(38,0) (exact; IntegralDivide on decimals
    // returns the same floor-division long), which also removes the
    // silent Long wrap the plain `scale * raw` multiply hit once a
    // node's in-degree exceeded 2^63/scale² — sums are exact while
    // max-indegree·scale < 2^63, and the normalization now never
    // overflows below that same bound.
    def normalized(nd0: DataFrame, raw: DataFrame, key: String): DataFrame =
      nd0.join(raw, nd0("id") === raw(key), "left")
        .crossJoin(broadcast(
          raw.agg(coalesce(max(col("raw")), lit(0L)).as("__m"))))
        .select(nd0("id"),
          when(col("__m") === 0L, lit(0L)).otherwise(expr(
            s"CAST($scale AS DECIMAL(38,0)) * coalesce(raw, 0L) div __m"))
            .as("s"))
    val ring = new CheckpointRing(edges.sparkSession)
    // r17 (ADVICE r16): h0 stays OFF the ring (like e/nd) — it is a
    // trivial projection of the checkpointed nd, read exactly once by
    // a1's job; checkpointing it materialized one generation of blocks
    // that the second rotate() dropped immediately after.
    var h = nd.select(col("id"), lit(scale).as("s"))
    var a: DataFrame = null
    for (_ <- 1 to iterations) {
      val rawA = e.join(h, e("src") === h("id"))
        .groupBy("dst").agg(sum(col("s")).as("raw"))
      // rotate BEFORE each eager checkpoint (the lazy-era cadence): the
      // generation freed is two back, never the one the materialization
      // below reads, and the loop ends with BOTH final score tables
      // (a_n in the last-but-one generation, h_n in the last) alive for
      // the output join.
      ring.rotate()
      a = ring.checkpoint(normalized(nd, rawA, "dst"))
      val rawH = e.join(a, e("dst") === a("id"))
        .groupBy("src").agg(sum(col("s")).as("raw"))
      ring.rotate()
      h = ring.checkpoint(normalized(nd, rawH, "src"))
    }
    nd.join(a.select(col("id").as("__ai"), col("s").as("auth_q")),
        nd("id") === col("__ai"), "left")
      .join(h.select(col("id").as("__hi"), col("s").as("hub_q")),
        nd("id") === col("__hi"), "left")
      .select(nd("id"), coalesce(col("auth_q"), lit(0L)).as("auth_q"),
        coalesce(col("hub_q"), lit(0L)).as("hub_q"))
  }
}
