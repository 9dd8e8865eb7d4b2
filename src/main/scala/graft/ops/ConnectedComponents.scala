package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step of near-duplicate dedup. The LSH family ([[Dedup]]) emits
  * near-dup PAIRS; an actual dedup pass needs every document labeled
  * with a component id so one representative per component can be
  * kept. Transitivity matters: A~B and B~C put A and C in one cluster
  * even when (A,C) itself never collided in any band.
  *
  * Algorithm: alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * ACM SoCC 2014) — the standard shuffle-based union-find. Each round
  * is two hash shuffles (a map-side-combined `groupBy.min` and an
  * equi-join on the node id); rounds converge in O(log² n). Crucially
  * there is NO neighbor-list materialization anywhere: the hub of a
  * 10M-member component costs a partial-aggregated min, never a
  * `collect_list`, so a pathological boilerplate cluster (the classic
  * 100 TB failure mode) cannot OOM an executor. Hub-join skew is the
  * AQE skew-join case and is further bounded because star rounds keep
  * flattening hubs toward the component minimum.
  *
  * Edges are held oriented (hi, lo); both star steps preserve that
  * orientation, so the fixpoint is exactly the star graph
  * (member → component-min). Node ids may be any orderable Spark type
  * (long, string, ...). Reference behavior target:
  * chanedwin/pandas-profiling-personal has no graph operator — this is
  * part of the beyond-reference LLM-pipeline surface (SURVEY §2.4).
  */
object ConnectedComponents {

  /** Component label for every node that appears in `edges`:
    * `(node, component)` with component = the minimum node id reachable
    * from `node`. Self-loops and nulls are dropped; duplicate and
    * reversed edges are fine. Deterministic — no randomness anywhere.
    *
    * Each round localCheckpoints the shrinking edge set (iterative
    * plans otherwise grow lineage exponentially) and stops at the
    * proven fixpoint (edge multiset unchanged), checked with a
    * count+hash signature rather than a full self-join. Superseded
    * checkpoints are freed per round through a [[CheckpointRing]]
    * (round-12): leaving dozens of dead edge-set copies to GC +
    * ContextCleaner put eviction/spill pressure on the storage pool of
    * a long-lived session — the round-11 driver-host stress trips on
    * exactly this operator family. */
  def run(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    require(maxIter >= 1, "maxIter must be >= 1")
    val ring = new CheckpointRing(edges.sparkSession)
    var e = ring.checkpoint(edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .distinct())
    ring.rotate()

    // count + XOR-of-hashes: a sound set signature because the edge
    // set is distinct() each round (and ANSI-safe — sum(hash) would
    // overflow LongType).
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // large-star: key by EVERY endpoint; each strictly-larger
      // neighbor re-points at min(Γ(u) ∪ {u}).
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = ring.checkpoint(sym.where(col("v") > col("u"))
        .join(lsMin, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .distinct())
      // small-star: key by the LARGER endpoint only; it and all its
      // smaller neighbors re-point at the smallest of them.
      val ssMin = ls.groupBy("u").agg(min(col("v")).as("m"))
      val ss = ring.checkpoint(ls.join(ssMin, "u")
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .distinct())
      val next = signature(ss)
      converged = next == sig && signature(ls) == sig
      sig = next
      e = ss
      // this round's reads are done: the edge table from TWO rounds
      // back (and its intermediate) can't be referenced again — free
      // its blocks now instead of leaving them to GC
      ring.rotate()
      it += 1
    }
    require(converged,
      s"connected components did not converge in $maxIter rounds")
    // fixpoint is the star graph: edges ARE the member→root mapping.
    // Joining back to the ORIGINAL node set keeps roots and nodes that
    // only ever appeared in self-loop pairs (filtered from e above) —
    // the "one row per node that appears in pairs" contract.
    val nodes = edges.select(col(srcCol).as("node"))
      .union(edges.select(col(dstCol).as("node")))
      .where(col("node").isNotNull)
      .distinct()
    nodes
      .join(e.select(col("u").as("node"), col("v").as("__comp")),
        Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__comp"), col("node")).as("component"))
  }

  /** Label EVERY row of `df` with its component: nodes absent from the
    * pair list are singletons (component = own id). The left join is a
    * plain hash join on the id — scale-safe; the label table is at
    * most one row per paired node. */
  def labelAll(
      df: DataFrame, idCol: String,
      pairs: DataFrame, srcCol: String, dstCol: String,
      outCol: String = "component", maxIter: Int = 50): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' collides with an input column")
    val labels = run(pairs, srcCol, dstCol, maxIter)
      .withColumnRenamed("node", idCol)
      .withColumnRenamed("component", outCol)
    df.join(labels, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol), col(idCol)))
  }
}
