package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.StatFunctions.dotProduct

/** Spherical k-means (cosine Lloyd iterations) over an embedding
  * column — the clustering step a corpus-curation pipeline runs for
  * topic bucketing, diversity-aware sampling, or training the coarse
  * quantizer an IVF index consumes ([[IvfIndex]] takes exactly this
  * centroid shape).
  *
  * Determinism and scale design:
  *   - init is the k lowest-id corpus vectors — no RNG, reproducible;
  *   - each Lloyd round is ONE codegen'd corpus scan: the k centroids
  *     ride into the assignment expression as array literals (no join,
  *     no shuffle except the bounded k*d centroid-update groupBy);
  *   - assignment argmax runs on 6-dp-rounded cosines with centroid-id
  *     tie-break, so it is reproducible across engines and runs;
  *   - centroid means come from exact integer sums of
  *     floor(x*1e6+0.5)-quantized components (order-invariant; the
  *     long sum holds to ~9e12 rows at |x| <= 1), re-quantized to
  *     9 dp in-engine — the iterative float sequence is engine-exact;
  *   - a cluster that empties carries its previous centroid forward.
  *
  * Driver state is k*d doubles per round (the standard broadcast-Lloyd
  * layout) — bounded regardless of corpus size, so the loop holds at
  * 100 TB; per-round cost is the unavoidable O(n*k*d) scan.
  */
object Clustering {

  /** One Lloyd assignment pass: adds `cid` = argmax_i cos(vec, c_i)
    * (rounded 6 dp, ties to the lowest centroid id). Pure projection —
    * no shuffle, stays inside whole-stage codegen. */
  def assign(corpus: DataFrame, vecCol: String,
      centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val xd = col(vecCol).cast("array<double>")
    val xn = sqrt(dotProduct(xd, xd))
    val scored = centroids.map { case (cid, c) =>
      // centroid norm on the driver: Array.sum folds left-to-right in
      // index order, the same sequence as an in-engine dot product
      val cn = math.sqrt(c.map(v => v * v).sum)
      struct(
        (lit(-1.0) * round(
          dotProduct(xd, typedLit(c.toSeq)) / (xn * lit(cn)), 6)).as("nc"),
        lit(cid).as("cid"))
    }
    corpus.withColumn("cid",
      sort_array(array(scored: _*)).getItem(0).getField("cid"))
  }

  /** `rounds` Lloyd iterations from the deterministic lowest-id init;
    * returns the final centroids in long format: (cid, n, pos, val) —
    * n = final-assignment cluster size, val = 9-dp component mean. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k > 0 && rounds > 0, "k and rounds must be positive")
    val spark = corpus.sparkSession
    val clean = corpus.where(col(vecCol).isNotNull)
    val xd = col(vecCol).cast("array<double>")

    // deterministic init: the k lowest-id vectors (TakeOrdered, bounded)
    var cents: Seq[(Int, Array[Double])] = clean
      .select(col(idCol), xd.as("v")).orderBy(col(idCol)).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1).toArray }.toSeq
    var counts: Map[Int, Long] = Map.empty

    for (_ <- 1 to rounds) {
      val upd = assign(clean, vecCol, cents)
        .select(col("cid"), posexplode(xd).as(Seq("pos", "xv")))
        .groupBy("cid", "pos")
        .agg(
          // floor(x*1e6+0.5): half-up quantization both engines agree
          // on bit-for-bit (round() half-rule differs across engines)
          round(
            sum(floor(col("xv") * lit(1e6) + lit(0.5)).cast("long"))
              .cast("double") / lit(1e6) / count(lit(1)), 9).as("val"),
          count(lit(1)).as("n"))
        .collect() // bounded: k*d rows
      val byCid = upd.groupBy(_.getInt(0))
      counts = byCid.map { case (cid, rs) => cid -> rs.head.getLong(3) }
      cents = cents.map { case (cid, prev) =>
        byCid.get(cid) match {
          case Some(rs) =>
            val next = prev.clone()
            rs.foreach(r => next(r.getInt(1)) = r.getDouble(2))
            cid -> next
          case None => cid -> prev // emptied cluster: carry forward
        }
      }
    }

    import spark.implicits._
    cents.flatMap { case (cid, c) =>
      c.iterator.zipWithIndex.map { case (v, pos) =>
        (cid, counts.getOrElse(cid, 0L), pos, v)
      }
    }.toDF("cid", "n", "pos", "val").orderBy("cid", "pos")
  }

  /** Nearest-class-mean classifier evaluation: class centroids from
    * the labeled vectors (same exact floor-quantized means as the
    * Lloyd update), every vector assigned to its max-cosine centroid,
    * confusion counts out — the fastest "are these embeddings
    * linearly class-separable, and which classes bleed into which"
    * readout a labeling pipeline runs before training anything.
    *
    * Two corpus scans: one bounded (labels·d) centroid aggregate
    * collected to the driver, one [[assign]] projection pass; counts
    * are exact integers. Returns (label, pred, cnt) ordered. */
  def nearestCentroidEval(corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String): DataFrame = {
    val clean = corpus
      .where(col(vecCol).isNotNull && col(labelCol).isNotNull)
    val xd = col(vecCol).cast("array<double>")
    val cent = clean
      .select(col(labelCol).cast("int").as("lab"),
        posexplode(xd).as(Seq("pos", "xv")))
      .groupBy("lab", "pos")
      .agg(round(
        sum(floor(col("xv") * lit(1e6) + lit(0.5)).cast("long"))
          .cast("double") / lit(1e6) / count(lit(1)), 9).as("val"))
      .collect() // bounded: labels * d rows
    val centroids = cent.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (lab, rs) =>
        val d = rs.map(_.getInt(1)).max + 1
        val c = new Array[Double](d)
        rs.foreach(r => c(r.getInt(1)) = r.getDouble(2))
        lab -> c
      }
    assign(clean, vecCol, centroids)
      .groupBy(col(labelCol).cast("int").as("label"),
        col("cid").as("pred"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("label", "pred")
  }

  /** Pairwise cosine similarity between per-group embedding centroids
    * — "which corpus domains are semantically close": the source-level
    * map a mixing/curation pipeline reads to spot near-duplicate
    * domains and isolated outliers before setting mix weights.
    *
    * One corpus scan builds the exact floor-quantized per-(group, pos)
    * means ([[kmeansCentroids]]' recipe); the bounded groups·d table
    * collects to the driver and the groups² similarity matrix is
    * computed there — dot products fold left-to-right in index order
    * (the same sequence an in-engine dot product runs) and round
    * HALF_UP at 6 dp, so any engine reproduces the values. Returns
    * (src_i, src_j, cos) for i < j by group name. */
  def groupCentroidSimilarity(corpus: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val spark = corpus.sparkSession
    val clean = corpus
      .where(col(vecCol).isNotNull && col(groupCol).isNotNull)
    val xd = col(vecCol).cast("array<double>")
    val rows = clean
      .select(col(groupCol).cast("string").as("grp"),
        posexplode(xd).as(Seq("pos", "xv")))
      .groupBy("grp", "pos")
      .agg(round(
        sum(floor(col("xv") * lit(1e6) + lit(0.5)).cast("long"))
          .cast("double") / lit(1e6) / count(lit(1)), 9).as("val"))
      .collect() // bounded: groups * d
    val cents = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1)
      .map { case (g, rs) =>
        val c = new Array[Double](rs.map(_.getInt(1)).max + 1)
        rs.foreach(r => c(r.getInt(1)) = r.getDouble(2))
        g -> c
      }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = for {
      i <- cents.indices; j <- (i + 1) until cents.size
    } yield {
      val (gi, ci) = cents(i); val (gj, cj) = cents(j)
      (gi, gj,
        r6(dot(ci, cj) / (math.sqrt(dot(ci, ci)) * math.sqrt(dot(cj, cj)))))
    }
    import spark.implicits._
    out.toDF("src_i", "src_j", "cos").orderBy("src_i", "src_j")
  }

  /** Exact per-label mean silhouette over cosine distance — "how
    * cleanly does this labeling partition the embedding space": for
    * each point, a = mean distance to its own label (self excluded),
    * b = min over other labels of the mean distance, s = (b−a)/max.
    * O(n²) pairwise like [[Similarity.knnGraph]] — the small/medium
    * corpus diagnostic and the oracle for sampled variants at scale.
    *
    * Exactness discipline: per-pair distance quantizes to 10⁻⁶ units
    * (round((1−cos)·10⁶) as long) so every mean is an exact-integer
    * sum divided once; per-point silhouettes re-quantize the same way
    * before the per-label mean — no order-dependent double summation
    * anywhere. Singleton labels take s = 0 by convention. Returns
    * (label, n, mean_sil 6dp) ordered by label. */
  def silhouetteByLabel(corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String): DataFrame = {
    import graft.functions.StatFunctions.{dotProduct, l2Norm}
    val labeled = corpus
      .where(col(vecCol).isNotNull && col(labelCol).isNotNull)
    val a = labeled.select(col(idCol).as("i"),
        col(labelCol).cast("int").as("li"), col(vecCol).as("qv"),
        l2Norm(col(vecCol)).as("qn"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val b = broadcast(labeled.select(col(idCol).as("j"),
      col(labelCol).cast("int").as("lj"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn")))
    val byLab = a.crossJoin(b).where(col("i") =!= col("j"))
      .select(col("i"), col("li"), col("lj"),
        round((lit(1.0) - dotProduct(col("qv"), col("cv")) /
          (col("qn") * col("cn"))) * 1e6, 0).cast("long").as("du"))
      .groupBy("i", "li", "lj")
      .agg(sum(col("du")).as("su"), count(lit(1)).as("c"))
    val mean = col("su").cast("double") / col("c") / 1e6
    val per = byLab
      .groupBy("i", "li")
      .agg(
        max(when(col("li") === col("lj"), mean)).as("aa"),
        min(when(col("li") =!= col("lj"), mean)).as("bb"))
    // degenerate max(a,b) = 0 (all-identical points) takes s = 0 too —
    // 0/0 would be NaN and engines disagree on NaN propagation
    val s = when(col("aa").isNull || col("bb").isNull ||
        greatest(col("aa"), col("bb")) === 0.0, lit(0.0))
      .otherwise((col("bb") - col("aa")) /
        greatest(col("aa"), col("bb")))
    per.select(col("li").as("label"),
        round(s * 1e6, 0).cast("long").as("sq"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(sum(col("sq")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_sil"))
      .orderBy("label")
  }

  /** Synchronous semi-supervised label propagation over an undirected
    * edge list: seeds keep their label forever; every other node takes,
    * each round, the majority label among its CURRENTLY-labeled
    * neighbors (tie → smallest label), or keeps its previous label if
    * no neighbor is labeled yet. `iterations` fixed rounds — all
    * arithmetic is integer counts with a deterministic tie-break, so
    * the result is engine-reproducible (same family as the
    * integer-quanta PageRank).
    *
    * Scale design: each round is one hash join of the label table with
    * the (doubled) edge list plus a map-side-combined groupBy on
    * (node, label) and a bounded max-struct argmax — no windows over
    * raw data, no driver transfer at all; per-round localCheckpoint
    * keeps the loop's lineage flat.
    *
    * `nodes` must carry (idCol, seedCol) where seedCol is the seed
    * label or null. Labels must be non-negative ints (the argmax rides
    * a (count, -label) struct max). Returns (idCol, label) with label
    * null where propagation never reached. */
  def labelPropagation(
      nodes: DataFrame, idCol: String, seedCol: String,
      edges: DataFrame, aCol: String, bCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1)
    val nd = nodes.select(col(idCol).cast("long").as("id"),
      col(seedCol).cast("int").as("seed")).localCheckpoint(false)
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .unionAll(edges.select(col(bCol).cast("long").as("a"),
        col(aCol).cast("long").as("b")))
      .distinct()
      .localCheckpoint(false)
    var cur = nd.select(col("id"), col("seed").as("lab"))
      .localCheckpoint(false)
    for (_ <- 1 to iterations) {
      val nbr = und
        .join(cur.where(col("lab").isNotNull)
          .select(col("id").as("b"), col("lab")), "b")
        .groupBy(col("a"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
      val best = nbr.groupBy("a")
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("m"))
        .select(col("a").as("id"), (-col("m.nl")).as("best"))
      cur = nd.join(best, Seq("id"), "left")
        .join(cur.select(col("id"), col("lab").as("prev")), "id")
        .select(col("id"),
          when(col("seed").isNotNull, col("seed"))
            .otherwise(coalesce(col("best"), col("prev"))).as("lab"))
        .localCheckpoint(false)
    }
    cur.select(col("id").as(idCol), col("lab").as("label"))
  }

  /** Greedy k-center (farthest-first traversal) coreset selection —
    * the diversity-selection step of data-pruning pipelines (the
    * Gonzalez 1985 2-approximation to the k-center objective; the
    * selection primitive behind D4-style "dedup then diversify"
    * curation): seed with the minimum id, then repeatedly pick the
    * point FARTHEST (squared L2) from the already-selected set. Each
    * selected row reports the distance that made it the pick — the
    * running coverage radius, which is non-increasing and tells you
    * when the corpus is "covered" and selection can stop.
    *
    * Determinism / oracle contract: distances are
    * round(x·x − 2 x·c + c·c, 6) on double-cast vectors (the q26
    * family's rounding discipline), the argmax tie-breaks on minimum
    * id, and points at rounded distance 0 from the selected set
    * (exact duplicates) are never picked — if every remaining point
    * is a duplicate of a center, selection STOPS early with fewer
    * than k rows rather than re-picking.
    *
    * Scale design (100 TB): the selected set is a bounded driver list
    * (k ≤ 64 — require-guarded) broadcast into each pass as literal
    * center vectors; each of the k rounds is ONE corpus scan ending
    * in a 1-row TakeOrdered (argmax — never a global sort), and the
    * corpus is localCheckpoint'ed once so the k scans re-read
    * materialized partitions. Greedy k-center is inherently k passes;
    * at web scale you run it on the post-dedup sampled pool (the D4
    * shape), not the raw crawl. Returns (rnk, idCol, min_dist) with
    * min_dist NULL on the seed row. */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 64,
      s"k must be in [1, 64] (bounded driver state); got $k")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val v = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("xx", dotProduct(col("v"), col("v")))
      .localCheckpoint(false)
    val seedRow = v.orderBy("id").limit(1)
      .select(col("id"), col("v")).collect()
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    if (seedRow.nonEmpty) {
      var centers = List(
        (seedRow(0).getLong(0),
          seedRow(0).getSeq[Double](1).toArray))
      out += Row(1, centers.head._1, null)
      var exhausted = false
      while (centers.size < k && !exhausted) {
        // rounded min squared-L2 distance to the selected set
        val dists = centers.map { case (_, c) =>
          val cc = c.map(x => x * x).sum
          val litC = array(c.map(lit(_)): _*)
          round(col("xx") - lit(2.0) * dotProduct(col("v"), litC) +
            lit(cc), 6)
        }
        val minD =
          if (dists.size == 1) dists.head else least(dists: _*)
        val pick = v.withColumn("d", minD)
          .where(col("d") > 0)
          .orderBy(col("d").desc, col("id"))
          .limit(1).select(col("id"), col("v"), col("d")).collect()
        if (pick.isEmpty) exhausted = true
        else {
          val r = pick(0)
          centers = (r.getLong(0),
            r.getSeq[Double](1).toArray) :: centers
          out += Row(centers.size, r.getLong(0), r.getDouble(2))
        }
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(
        StructField("rnk", IntegerType, nullable = false),
        StructField(idCol, LongType, nullable = false),
        StructField("min_dist", DoubleType, nullable = true))))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein,
    * SIGIR 1998) — the relevance-AND-diversity greedy that RAG
    * retrieval re-ranking runs where [[kCenterGreedy]] optimizes
    * diversity alone: seed with the most query-similar vector, then
    * repeatedly pick
    *
    *   argmax  λ·cos(x, q) − (1−λ)·max over selected s of cos(x, s)
    *
    * (6-dp-rounded cosines and score, min-id tie-break — the catalog's
    * reproducible-argmax discipline). The query vector is the corpus
    * row with id `queryId` (seed VECTORS, not trained centroids, so
    * any engine replays the sequence), which never selects itself.
    *
    * Scale design mirrors [[kCenterGreedy]]: the selected set is a
    * bounded driver list (k ≤ 64) whose vectors ride each pass as
    * literals; each of the k rounds is ONE scan over the
    * localCheckpoint'ed (id, v, norm, rel) table ending in a 1-row
    * TakeOrdered argmax. Returns (rnk, idCol, rel, max_sim) with
    * max_sim NULL on the seed row. */
  def mmrSelect(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && k <= 64,
      s"k must be in [1, 64] (bounded driver state); got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0, 1], got $lambda")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val e = df.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
    val qRow = e.where(col("id") === queryId).limit(1).collect()
    require(qRow.nonEmpty, s"query id $queryId not found / null vector")
    val qv = qRow(0).getSeq[Double](1).toArray
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val base = e.where(col("id") =!= queryId)
      .withColumn("n", sqrt(dotProduct(col("v"), col("v"))))
      .withColumn("rel", round(
        dotProduct(col("v"), typedLit(qv.toSeq)) / (col("n") * lit(qn)), 6))
      .localCheckpoint(false)
    var selected = List.empty[(Long, Array[Double], Double)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    val seed = base.orderBy(col("rel").desc, col("id")).limit(1)
      .select(col("id"), col("v"), col("n"), col("rel")).collect()
    if (seed.nonEmpty) {
      val s0 = seed(0)
      selected = (s0.getLong(0), s0.getSeq[Double](1).toArray,
        s0.getDouble(2)) :: selected
      out += Row(1, s0.getLong(0), s0.getDouble(3), null)
      var exhausted = false
      while (selected.size < k && !exhausted) {
        val sims = selected.map { case (_, sv, sn) =>
          round(dotProduct(col("v"), typedLit(sv.toSeq)) /
            (col("n") * lit(sn)), 6)
        }
        val ms = if (sims.size == 1) sims.head else greatest(sims: _*)
        val pick = base
          .where(!col("id").isin(selected.map(_._1): _*))
          .withColumn("ms", ms)
          .withColumn("score",
            round(lit(lambda) * col("rel") - lit(1.0 - lambda) * col("ms"), 6))
          .orderBy(col("score").desc, col("id"))
          .limit(1).select(col("id"), col("v"), col("n"), col("rel"),
            col("ms")).collect()
        if (pick.isEmpty) exhausted = true
        else {
          val r = pick(0)
          selected = (r.getLong(0), r.getSeq[Double](1).toArray,
            r.getDouble(2)) :: selected
          out += Row(selected.size, r.getLong(0), r.getDouble(3),
            r.getDouble(4))
        }
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(
        StructField("rnk", IntegerType, nullable = false),
        StructField(idCol, LongType, nullable = false),
        StructField("rel", DoubleType, nullable = false),
        StructField("max_sim", DoubleType, nullable = true))))
  }
}
