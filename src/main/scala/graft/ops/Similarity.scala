package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StatFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k with a broadcast probe set — exact,
  * O(|corpus| x |probes|), the right tool when probes are few. Scale path:
  * deterministic banded random-hyperplane LSH ([[srpBandBuckets]]), which
  * cuts the candidate set per probe to the rows sharing a band-bucket,
  * then the exact scorer runs only on candidates ([[lshTopK]]).
  */
object Similarity {

  /** Corpus bound for the blocked exact-kNN tools (knnGraph and the
    * operators built on it): 2M 64-dim double vectors ≈ 1 GiB
    * broadcast — the practical ceiling of the broadcast contract.
    * Past it the answer is the ANN ladder, not a bigger driver. */
  val MaxExactCorpus: Long = 2000000L

  /** Exact brute-force cosine top-k. The probe set is broadcast (it is
    * small by construction); the corpus is scanned once, and since
    * round 11 the per-probe ranking rides the mergeable
    * [[graft.functions.BoundedTopK]] heap on the 10⁻⁶-quantized cosine
    * (exact integer recovery of the 6-dp-rounded score, so (ord desc,
    * id asc) IS (cos desc, neighbor_id asc)) instead of a row_number
    * window — the window formulation shuffled and SORTED the full
    * |corpus|·|probes| scored stream, while the heap ships O(k) per
    * probe per map task and the partial-aggregation map holds at most
    * |probes| bounded buffers. Ranking on the ROUNDED similarity with
    * id tie-break stays deterministic across engines even when two raw
    * cosines differ in the last ulp. */
  def bruteForceTopK(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // the heap ranks long-keyed ids: fail loudly on non-integral ids
    // (the knnGraph ADVICE class) instead of silently ranking nothing
    val idType = corpus.schema(idCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"bruteForceTopK: id column '$idCol' must be an integral type " +
        s"that widens losslessly to long, got ${idType.simpleString}; " +
        "assign surrogate long ids first")
    // zero-norm / null-element vectors are excluded on BOTH sides
    // (cosine undefined; the heap's long quantization would otherwise
    // launder cast(NaN as long) = 0 into a fabricated cos mid-ranking
    // — same rule as knnGraph)
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"))
      .where(col("qn") > 0.0)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"))
      .where(col("cn") > 0.0)
    c.crossJoin(broadcast(p))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("ordq", floor(col("cos") * 1e6 + 0.5).cast("long"))
      .groupBy("query_id")
      .agg(graft.functions.BoundedTopK
        .topK(col("ordq"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).as("rnk"),
        col("t.id").as("neighbor_id"),
        // ord/1e6 divides back to the bit-identical 6-dp-rounded double
        (col("t.ord").cast("double") / 1e6).as("cos"))
  }

  /** Multi-band SRP-LSH bucket table: `bands` independent bucket ids per
    * vector, each from `planesPerBand` sign bits. Two vectors at cosine c
    * share >= 1 band-bucket with probability 1-(1-p^r)^B, p = 1-acos(c)/pi
    * — bands trade compute for recall, the classic LSH amplification.
    *
    * The sign matrix is a deterministic hash family (parity of the md5
    * of "seed:plane_i" — no RNG state, reproducible across runs and
    * engines), materialized ONCE per partition as a primitive array and
    * applied in a flat mapPartitions pass: one scan, bands*planes fused
    * dot products per row, no md5 in the per-row hot path. Output:
    * (id, band, bucket) — n*bands rows, ready for a hash-partitioned
    * self-join on (band, bucket). */
  def srpBandBuckets(
      df: DataFrame, idCol: String, vecCol: String,
      planesPerBand: Int, bands: Int, seed: Int = 7919): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val nPlanes = planesPerBand * bands
    val r = planesPerBand
    // id passes through as an opaque Row field — its ORIGINAL type is
    // preserved (a cast to long would null out string ids and silently
    // return zero pairs downstream). Null embeddings are dropped here
    // rather than NPE-ing the task: a row with no vector has no bucket.
    val in = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<float>").as("vec"))
      .where(col("vec").isNotNull)
    val outSchema = StructType(Seq(
      in.schema.fields(0),
      StructField("band", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false)))
    in.mapPartitions { it =>
      // per-(partition, dim) sign matrix; md5 runs nPlanes*dim times per
      // partition, never per row
      val md = java.security.MessageDigest.getInstance("MD5")
      def signOf(plane: Int, i: Int): Double = {
        val hex = md.digest(s"$seed:${plane}_$i".getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString.take(15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      }
      val cache = scala.collection.mutable.Map.empty[Int, Array[Array[Double]]]
      def signsFor(dim: Int): Array[Array[Double]] =
        cache.getOrElseUpdate(dim,
          Array.tabulate(nPlanes)(p => Array.tabulate(dim)(i => signOf(p, i))))
      it.flatMap { row =>
        val id = row.get(0)
        val v = row.getSeq[Float](1).toArray
        val s = signsFor(v.length)
        (0 until bands).iterator.map { b =>
          var bucket = 0L
          var p = 0
          while (p < r) {
            val plane = s(b * r + p)
            var dot = 0.0
            var i = 0
            while (i < v.length) { dot += v(i) * plane(i); i += 1 }
            if (dot >= 0) bucket |= (1L << p)
            p += 1
          }
          Row(id, b, bucket)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** ANN top-k via banded SRP-LSH: candidate pairs are (probe, corpus)
    * rows sharing at least one band-bucket from [[srpBandBuckets]] —
    * the amplified collision probability 1-(1-p^r)^B (p = 1-theta/pi,
    * r = planesPerBand, B = bands) gives high recall on near vectors
    * while a single r-bit bucket keeps candidates scarce. Pairs are
    * deduped across bands BEFORE the exact cosine is paid; only
    * candidates are scored, never the full cross product. `bands` up =
    * recall up; `planesPerBand` up = fewer/cleaner candidates. */
  def lshTopK(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planesPerBand: Int = 8, bands: Int = 8, seed: Int = 7919): DataFrame = {
    val pb = srpBandBuckets(probes, idCol, vecCol, planesPerBand, bands, seed)
      .withColumnRenamed("id", "query_id")
    val cb = srpBandBuckets(corpus, idCol, vecCol, planesPerBand, bands, seed)
      .withColumnRenamed("id", "neighbor_id")
    // probe bucket table is small by construction -> broadcast; a pair
    // colliding in several bands is scored once
    val pairs = cb.join(broadcast(pb), Seq("band", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qv = probes.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = pairs.join(broadcast(qv), "query_id").join(cv, "neighbor_id")
      .withColumn("cos", round(cosineSimilarity(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** Exact directed k-nearest-neighbor graph over the corpus: for every
    * vector, its top-k cosine neighbors — the substrate of diversity
    * sampling, semantic-dedup clustering, and UMAP/HDBSCAN-style
    * pipelines. O(n²) pairwise by construction: correct as the
    * small/medium-corpus tool and as the ORACLE for the approximate
    * path; at 100 TB build the graph from [[lshTopK]]'s banded
    * candidates instead (same output shape, bounded recall loss).
    * Ranks on 6-dp-rounded cosine with id tie-break (engine-exact). */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    // BLOCKED exact kNN (round-11): the corpus rides one broadcast and
    // every task scans a bounded slice of probe INDICES against it with
    // a single live k-selection at a time — per-task memory is
    // broadcast + O(k), structurally. The previous two formulations
    // both carried a same-commit stress-variance tail at 10× scale:
    // the window one shuffled and SORTED the full n² scored stream
    // (16.1× vs 3.7× of linear, round 9), and the crossJoin +
    // BoundedTopK hash-agg one kept n concurrent heap buffers per task
    // inside the partial aggregation map (13.7× vs 4.0×, the round-10
    // driver trend trip). Here there is NO shuffle, NO join and NO
    // aggregation map in the plan at all — the irreducible n²·d
    // scoring (exact kNN over unstructured embeddings has no
    // sub-quadratic exact path) streams through mapPartitions over a
    // pre-split Range, so nothing is left to spill or rebuild.
    //
    // Semantics are unchanged and engine-exact: score = round(
    // dot(qv,cv)/(|qv|·|cv|), 6) with Spark's HALF_UP decimal-string
    // rounding (replicated via java BigDecimal.valueOf — what Round
    // does), ranked by (cos desc, id asc); zero-norm / null-element
    // vectors are excluded on BOTH sides (cosine is undefined for
    // them). O(n²) pairwise by construction: the documented
    // small/medium-corpus ORACLE tool — at 100 TB build the graph from
    // [[lshTopK]]'s banded candidates instead (same output shape,
    // bounded recall loss).
    val spark = corpus.sparkSession
    import spark.implicits._
    val idType = corpus.schema(idCol).dataType
    val integral = idType match {
      case org.apache.spark.sql.types.ByteType |
          org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    // fail LOUDLY on non-integral ids: the long-keyed ranking would
    // otherwise silently drop every row whose id casts to null (a
    // string-id corpus would "have no neighbors" instead of erroring)
    require(integral, s"knnGraph: id column '$idCol' must be an " +
      s"integral type that widens losslessly to long (byte/short/int/" +
      s"long), got ${idType.simpleString}; assign surrogate long ids " +
      "first (e.g. zipWithIndex / monotonically_increasing_id) and " +
      "join the originals back on them")
    // one bounded gather: this operator broadcasts the corpus either
    // way (that IS its memory contract), so collecting it to build the
    // broadcast is the same footprint with none of the join machinery.
    // Scale guard (fail loudly, never funnel): refuse a corpus past
    // the broadcast contract instead of an opaque driver OOM — the
    // count costs one cheap pre-pass and points at the ANN ladder.
    val n0 = corpus.where(col(vecCol).isNotNull).count()
    require(n0 <= MaxExactCorpus,
      s"knnGraph: $n0 vectors exceeds the exact-kNN broadcast bound " +
        s"($MaxExactCorpus); this is the O(n^2) small/medium-corpus " +
        "ORACLE tool - at corpus scale build the graph from lshTopK's " +
        "banded candidates (same output shape, bounded recall loss)")
    // gather PRE-PACKED primitive arrays: the (Long, Array[Double])
    // encoder decodes UnsafeArrayData straight to double[], so the
    // driver-side footprint at the MaxExactCorpus bound stays at the
    // ~n·d·8B the broadcast contract advertises — a Row collect of
    // Seq[Any] boxes every element into java.lang.Double (several GiB
    // at 2M × 64-dim), which the scale guard never accounted for.
    // Null ELEMENTS are filtered on EXECUTORS (cosine undefined; the
    // primitive decode of a null element would throw).
    val gathered = corpus
      .select(col(idCol).cast("long").as("_1"),
        col(vecCol).cast("array<double>").as("_2"))
      .where(col("_2").isNotNull && !exists(col("_2"), _.isNull))
      .as[(Long, Array[Double])]
      .collect()
    val clean = gathered.iterator.flatMap { case (id, arr) =>
      var ss = 0.0
      var i = 0
      while (i < arr.length) { ss += arr(i) * arr(i); i += 1 }
      val norm = math.sqrt(ss) // = l2Norm: sqrt of Σ d·d
      if (norm > 0.0) Some((id, arr, norm)) else None
    }.toArray.sortBy(_._1)
    val n = clean.length
    val bcIds = spark.sparkContext.broadcast(clean.map(_._1))
    val bcVecs = spark.sparkContext.broadcast(clean.map(_._2))
    val bcNorms = spark.sparkContext.broadcast(clean.map(_._3))
    // pre-split Range: parallelism without a repartition exchange
    val parts = math.max(1,
      math.min(spark.sparkContext.defaultParallelism, n))
    spark.range(0, n.toLong, 1, parts).as[Long].mapPartitions { it =>
      val ids = bcIds.value
      val vecs = bcVecs.value
      val norms = bcNorms.value
      val nn = ids.length
      // Spark round(x, 6) semantics exactly: decimal-STRING HALF_UP
      // (BigDecimal.valueOf), then the 1e6 integer recovery
      def quantize(cos: Double): Long = {
        val r = java.math.BigDecimal.valueOf(cos)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        math.floor(r * 1e6 + 0.5).toLong
      }
      it.flatMap { qi0 =>
        val qi = qi0.toInt
        val qv = vecs(qi)
        val qn = norms(qi)
        val qid = ids(qi)
        val selOrd = new Array[Long](k)
        val selId = new Array[Long](k)
        var m = 0
        var ci = 0
        while (ci < nn) {
          // skip the probe row itself AND any row sharing its id — a
          // corpus with duplicate ids must not emit the duplicate as
          // its own top neighbor (cos=1.0); bruteForceTopK filters on
          // id equality and this path must agree
          if (ci != qi && ids(ci) != qid) {
            val cv = vecs(ci)
            val len = math.min(qv.length, cv.length)
            var dot = 0.0
            var j = 0
            while (j < len) { dot += qv(j) * cv(j); j += 1 }
            val cos = dot / (qn * norms(ci))
            val t = cos * 1e6
            // cheap prune once full: quantize() differs from
            // floor(t + 0.5) by at most ~1 (half-a-decimal-ulp + float
            // error), so t more than 2 below the current worst ord can
            // neither beat it nor tie it — skip the BigDecimal
            if (m < k || t >= selOrd(m - 1).toDouble - 2.0) {
              val o = quantize(cos)
              val cid = ids(ci)
              if (m < k || o > selOrd(m - 1) ||
                  (o == selOrd(m - 1) && cid < selId(m - 1))) {
                var p = (if (m < k) m else k - 1) - 1
                var hole = if (m < k) m else k - 1
                while (p >= 0 && (selOrd(p) < o ||
                    (selOrd(p) == o && selId(p) > cid))) {
                  selOrd(hole) = selOrd(p); selId(hole) = selId(p)
                  hole = p; p -= 1
                }
                selOrd(hole) = o; selId(hole) = cid
                if (m < k) m += 1
              }
            }
          }
          ci += 1
        }
        (0 until m).iterator.map { r =>
          // ord/1e6 divides back to the bit-identical 6-dp-rounded
          // double (both are the nearest double to the same decimal)
          (qid, r + 1, selId(r), selOrd(r).toDouble / 1e6)
        }
      }
    }.toDF("query_id", "rnk", "neighbor_id", "cos")
  }

  /** Mutual (reciprocal) k-NN pairs: (i, j) with i < j where each is in
    * the other's top-k — the high-precision edge set semantic-dedup and
    * diversity clustering actually act on, since one-directional kNN
    * edges in dense regions are mostly hub noise. Output carries both
    * directed ranks. One self-equi-join of the bounded kNN edge table
    * (n*k rows) on the reversed pair — hash join, no new scan of the
    * vectors. */
  /** 1-NN label-agreement screen: for every labeled vector, does its
    * nearest neighbor (cosine, self excluded) carry the same label?
    * Per-label agreement rates are the standard cheap label-noise /
    * class-overlap detector a curation pipeline runs over annotated
    * embeddings — a label whose vectors' neighbors mostly disagree is
    * either noisy or not separable. Exact counts from [[knnGraph]]'s
    * k = 1 edges; one hash join against the label table; rate is one
    * rounded double division. Returns (label, n, n_agree,
    * agree_rate 6dp) ordered by label. */
  def oneNnLabelAgreement(corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String): DataFrame = {
    val labeled = corpus
      .where(col(vecCol).isNotNull && col(labelCol).isNotNull)
    val knn = knnGraph(labeled, idCol, vecCol, k = 1)
    val lab = labeled.select(col(idCol).as("query_id"),
      col(labelCol).cast("int").as("label"))
    val nlab = labeled.select(col(idCol).as("neighbor_id"),
      col(labelCol).cast("int").as("n_label"))
    knn.join(lab, "query_id").join(nlab, "neighbor_id")
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        count(when(col("label") === col("n_label"), 1)).as("n_agree"))
      .select(col("label"), col("n"), col("n_agree"),
        round(col("n_agree").cast("double") / col("n"), 6)
          .as("agree_rate"))
      .orderBy("label")
  }

  def mutualKnnPairs(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val knn = knnGraph(corpus, idCol, vecCol, k)
      // two references below — without the pin the O(n²) scoring plan
      // would execute twice
      .localCheckpoint(false)
    val fwd = knn.select(col("query_id").as("i"),
      col("neighbor_id").as("j"), col("rnk").as("rank_ij"),
      col("cos"))
    val rev = knn.select(col("query_id").as("j"),
      col("neighbor_id").as("i"), col("rnk").as("rank_ji"))
    fwd.join(rev, Seq("i", "j"))
      .where(col("i") < col("j"))
      .select(col("i"), col("j"), col("rank_ij"), col("rank_ji"), col("cos"))
  }

  /** Label-relevance retrieval eval over an embedding index: for each
    * probe, rank the corpus by exact cosine ([[bruteForceTopK]]'s
    * rounded-cos + id tie-break, deterministic across engines), score
    * the top-k with rel = "neighbor shares the probe's label", and emit
    * the standard eval triple per probe — precision@k, hit@k, NDCG@k.
    *
    * The IDCG denominator (best possible DCG given the probe's total
    * relevant-neighbor count) comes from a k+1-row broadcast lookup
    * computed once on the driver — no interpreted higher-order
    * aggregate in the per-row path. DCG sums at most k doubles per
    * probe; the final 6-dp round absorbs last-ulp engine skew in
    * log2. */
  def ndcgLabelRetrieval(
      probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = probes.sparkSession
    import spark.implicits._
    val top = bruteForceTopK(probes, corpus, idCol, vecCol, k)
    val ql = probes.select(col(idCol).as("query_id"),
      col(labelCol).as("__qlab"))
    val nl = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__nlab"))
    val rel = top
      .join(broadcast(ql), "query_id")
      .join(nl, "neighbor_id")
      .withColumn("__rel",
        when(col("__qlab") === col("__nlab"), 1.0).otherwise(0.0))
    val dcg = rel.groupBy("query_id")
      .agg(
        sum(col("__rel") / log2(col("rnk") + 1)).as("__dcg"),
        sum(col("__rel")).as("__hits"))
    // total relevant per probe = corpus rows sharing the label, minus
    // self; capped at k for the ideal ranking
    val labCounts = corpus.groupBy(col(labelCol).as("__qlab"))
      .agg(count(lit(1)).as("__labn"))
    val idcgLookup = broadcast((0 to k).map { m =>
      (m.toLong, (1 to m).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum)
    }.toDF("__m", "__idcg"))
    ql.join(broadcast(labCounts), Seq("__qlab"), "left")
      .withColumn("__m", least(lit(k.toLong),
        greatest(coalesce(col("__labn"), lit(1L)) - 1L, lit(0L))))
      .join(idcgLookup, "__m")
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        col("__m").as("n_rel_capped"),
        round(coalesce(col("__hits"), lit(0.0)) / k, 6).as("precision_at_k"),
        (coalesce(col("__hits"), lit(0.0)) > 0.0).cast("int").as("hit_at_k"),
        round(when(col("__idcg") > 0.0,
            coalesce(col("__dcg"), lit(0.0)) / col("__idcg"))
          .otherwise(0.0), 6).as("ndcg_at_k"))
  }

  /** Top-k by SQ8-QUANTIZED inner product — ranking on the int8 codes
    * an SQ8 index would actually store (symmetric scale amax/127, the
    * [[EmbeddingStats.int8QuantizationError]] scheme), so recall
    * against the exact ranking measures what the compressed index
    * loses. The quantized dot Σ q_a·q_b is EXACT INTEGER arithmetic
    * (≤ 127²·dim per pair — nowhere near a long), descaled by the two
    * scalar factors and 6 dp-rounded, so the ranking is engine-
    * reproducible with no float-sum order sensitivity at all.
    *
    * Distributed shape: the probe code table broadcasts (probes are
    * few); the corpus side melts to (id, pos, code) rows and the dot
    * is a map-side-combined groupBy over (probe, candidate) — matrix
    * multiply as aggregation, no window; the per-probe ranking rides
    * the mergeable [[graft.functions.BoundedTopK]] heap on the
    * 10⁻⁶-quantized score. Returns (query_id, rnk, neighbor_id,
    * score_q — the quantized-score long, an exact gate surface). */
  def sq8TopK(probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    def codes(df: DataFrame, outId: String, outScale: String,
        outQ: String): DataFrame = {
      val v = col(vecCol).cast("array<double>")
      df.where(v.isNotNull)
        .select(col(idCol).as(outId), v.as("v"),
          (greatest(array_max(v), -array_min(v)) / 127.0).as(outScale))
        .where(col(outScale) > 0.0)
        .select(col(outId), col(outScale),
          posexplode(col("v")).as(Seq("pos", "val")))
        .select(col(outId), col(outScale), col("pos"),
          floor(col("val") / col(outScale) + 0.5).cast("long")
            .as(outQ))
    }
    val pc = codes(probes, "query_id", "sq", "qp")
    val cc = codes(corpus, "neighbor_id", "sn", "qc")
    cc.join(broadcast(pc), "pos")
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "sq", "neighbor_id", "sn")
      .agg(sum(col("qp") * col("qc")).as("dotq"))
      .select(col("query_id"), col("neighbor_id"),
        floor(round(col("dotq").cast("double") * col("sq") * col("sn"),
          6) * 1e6 + 0.5).cast("long").as("score_q"))
      .groupBy("query_id")
      .agg(graft.functions.BoundedTopK
        .topK(col("score_q"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("t.id").as("neighbor_id"), col("t.ord").as("score_q"))
  }

  /** Hard-negative mining for contrastive/retrieval training: for each
    * probe, the top-k most-cosine-similar corpus vectors whose LABEL
    * differs — the near-boundary negatives that carry the training
    * signal random negatives don't (the standard dense-retrieval
    * mining step, e.g. Karpukhin et al., EMNLP 2020 §4.2's hardest-
    * negatives variant). Same plan shape as [[bruteForceTopK]]: probes
    * broadcast into one corpus scan, the label filter applied BEFORE
    * ranking so excluded positives never enter the window, ranks on
    * 6-dp-rounded cosine with id tie-break. Swap the scan for the IVF/
    * PQ candidate path past brute-force scale; this exact form is the
    * oracle those share. Returns (query_id, rnk, neg_id, neg_label,
    * cos) with rnk <= k per probe. */
  def hardNegativeTopK(probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("query_id"),
      col(labelCol).as("qlab"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"))
    val c = corpus.where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("neg_id"), col(labelCol).as("neg_label"),
        col(vecCol).as("cv"), l2Norm(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(p))
      .where(col("neg_label") =!= col("qlab"))
      .withColumn("cos", round(
        dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neg_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neg_id"),
        col("neg_label"), col("cos"))
  }
}
