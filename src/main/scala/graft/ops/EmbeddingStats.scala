package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.StatFunctions

/** Embedding-column hygiene stats — the checks an ANN/semantic-dedup
  * pipeline runs before trusting cosine similarity: zero vectors
  * (cosine undefined → silently NaN), norm spread (unnormalized
  * corpora make inner-product ≠ cosine), and dimension consistency
  * (a ragged column breaks every kernel downstream).
  *
  * Two passes: a tiny groupBy over the distinct vector lengths (the
  * modal dimension), then one fused aggregate. Norms come from the codegen'd
  * [[graft.functions.ArrayDot]] self-product (`Σ xᵢ²` left-to-right in
  * double, then sqrt) and are rounded to 6 decimals PER ROW before
  * aggregating, so min/max are order-independent bit-stable across
  * engines; avg adds one more rounding at 8. */
object EmbeddingStats {

  /** One-row result: (n, n_null, n_zero, n_dims, n_ragged,
    * min_norm, avg_norm, max_norm). `n_dims` is the modal (most
    * common, ties → smallest) element count; `n_ragged` counts rows
    * whose length differs from it. */
  def normStats(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val norm = round(StatFunctions.l2Norm(v), 6).as("norm")
    val base = df.select(norm, size(v).as("dims"), v.isNull.as("isnull"))
    // modal dimension: tiny value-count over distinct lengths
    val dimCounts = base.where(!col("isnull"))
      .groupBy("dims").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("dims"))
      .limit(1)
    val modal = dimCounts.collect().headOption.map(_.getInt(0))
    base.agg(
      count(lit(1)).as("n"),
      count(when(col("isnull"), 1)).as("n_null"),
      count(when(!col("isnull") && col("norm") === 0.0, 1)).as("n_zero"),
      lit(modal.getOrElse(0)).as("n_dims"),
      count(when(!col("isnull") &&
        col("dims") =!= lit(modal.getOrElse(-1)), 1)).as("n_ragged"),
      min(col("norm")).as("min_norm"),
      round(avg(col("norm")), 8).as("avg_norm"),
      max(col("norm")).as("max_norm"))
  }

  /** Per-vector symmetric int8 quantization error — the fidelity audit
    * run before shipping an embedding corpus to a quantized ANN index
    * (the scalar-quantization scheme of Faiss' SQ8 / the int8 path
    * every serving stack offers): scale = amax/127 per vector,
    * code = floor(v/scale + 0.5) in [-127, 127], error = v - code·scale.
    *
    * Exactness discipline: elements are widened float→double (exact),
    * amax comes from codegen'd `array_max`/`array_min` (no lambda HOF),
    * and the per-element squared errors are floor(e²·10¹⁵ + 0.5)
    * -quantized to longs before summing, so the per-vector SSE is
    * order-invariant and bit-reproducible cross-engine (the
    * [[Clustering]] quantized-sum pattern; at |e| ≤ amax/254 the long
    * sum is nowhere near overflow for any real dimension count).
    * One explode + one map-side-combined groupBy on the vector id —
    * embarrassingly parallel at any corpus size.
    *
    * Returns (idCol, n_dims, amax, sse, max_abs_err, rel_err):
    * amax/max_abs_err/rel_err rounded to 6 dp, sse an exact multiple
    * of 10⁻¹⁵. Zero vectors (amax = 0) are excluded — int8 encodes
    * them losslessly and their relative error is undefined. */
  def int8QuantizationError(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val amax = greatest(array_max(v), -array_min(v))
    val base = df
      .where(v.isNotNull)
      .select(col(idCol).as("id"), v.as("v"), amax.as("amax"),
        round(StatFunctions.l2Norm(v), 9).as("norm"))
      .where(col("amax") > 0.0)
    val scale = col("amax") / lit(127.0)
    val err = col("val") - floor(col("val") / scale + lit(0.5)) * scale
    base
      .select(col("id"), col("amax"), col("norm"),
        explode(col("v")).as("val"))
      .select(col("id"), col("amax"), col("norm"),
        floor(err * err * lit(1e15) + lit(0.5)).cast("long").as("se_q"),
        floor(abs(err) * lit(1e9) + lit(0.5)).cast("long").as("ae_q"))
      .groupBy("id", "amax", "norm")
      .agg(count(lit(1)).as("n_dims"),
        sum(col("se_q")).as("sse_q"),
        max(col("ae_q")).as("maxe_q"))
      .select(col("id").as(idCol),
        col("n_dims"),
        round(col("amax"), 6).as("amax"),
        (col("sse_q").cast("double") / lit(1e15)).as("sse"),
        (col("maxe_q").cast("double") / lit(1e9)).as("max_abs_err"),
        round(sqrt(col("sse_q").cast("double") / lit(1e15)) / col("norm"),
          6).as("rel_err"))
  }

  /** Matryoshka-style truncation fidelity per label group: how much of
    * each vector's energy the first d/2 and d/4 coordinates retain
    * (Kusupati et al., "Matryoshka Representation Learning", NeurIPS
    * 2022 — truncating a nested embedding trades recall for index
    * size). For a truncation-vs-full cosine this IS the number:
    * cos(v, v[1..k] zero-padded) = ‖v[1..k]‖ / ‖v‖.
    *
    * Per-vector ratios are 6 dp-rounded (exact multiples of 10⁻⁶),
    * then group means ride exact integer sums of those units — no
    * order-dependent double accumulation anywhere. One map-only
    * projection (slice + the codegen'd [[graft.functions.ArrayDot]]
    * self-products) + one tiny groupBy on the label. Zero vectors are
    * excluded (ratio undefined). Returns
    * (labelCol, n, avg_keep_half, avg_keep_quarter, min_keep_half). */
  def truncationFidelity(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val full = StatFunctions.l2Norm(v)
    def keep(frac: Int): org.apache.spark.sql.Column = round(
      StatFunctions.l2Norm(
        slice(v, lit(1), (size(v) / frac).cast("int"))) / full,
      6)
    df.where(v.isNotNull && full > 0.0)
      .select(col(labelCol).as("label"),
        floor(keep(2) * lit(1e6) + lit(0.5)).cast("long").as("kh_q"),
        floor(keep(4) * lit(1e6) + lit(0.5)).cast("long").as("kq_q"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(col("kh_q")).as("sh"),
        sum(col("kq_q")).as("sq"),
        min(col("kh_q")).as("mh"))
      .select(col("label").as(labelCol), col("n"),
        round(col("sh").cast("double") / col("n") / lit(1e6), 8)
          .as("avg_keep_half"),
        round(col("sq").cast("double") / col("n") / lit(1e6), 8)
          .as("avg_keep_quarter"),
        (col("mh").cast("double") / lit(1e6)).as("min_keep_half"))
  }

  /** Per-dimension Fisher class-separation ratio — which embedding
    * coordinates actually separate the labels (the per-feature form of
    * Fisher's linear discriminant, 1936): for dimension d,
    * between-class variance Σ_c n_c(μ_cd − μ_d)²/n over within-class
    * variance Σ_c Σ_i(x − μ_cd)²/n. The diagnostic a curation pipeline
    * runs before trusting a labeled embedding space for hard-negative
    * mining or class-balanced sampling — a space whose top dimensions
    * carry all the separation is one PCA away from a cheaper index.
    *
    * Exactness discipline ([[int8QuantizationError]]'s): elements widen
    * float→double (exact), then quantize to longs (value ×10⁹,
    * square ×10¹²) BEFORE any aggregation, so every sum is exact
    * integer arithmetic — order-invariant, bit-reproducible
    * cross-engine; doubles only in the final per-dimension ratios.
    * One posexplode + two map-side-combined groupBys (label×dim, then
    * dim) — embarrassingly parallel, no shuffle wider than
    * labels × dims cells.
    *
    * Returns (pos, n, between_var, within_var, fisher_ratio 6dp)
    * ordered by pos; zero within-variance yields a null ratio. */
  def fisherSeparation(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val base = df
      .where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).as("lab"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .select(col("lab"), col("pos"),
        floor(col("v") * lit(1e9) + lit(0.5)).cast("long").as("qv"),
        floor(col("v") * col("v") * lit(1e12) + lit(0.5)).cast("long")
          .as("qv2"))
    val cells = base.groupBy("lab", "pos")
      .agg(count(lit(1)).as("nc"), sum(col("qv")).as("s1"),
        sum(col("qv2")).as("s2"))
    val nD = col("nc").cast("double")
    cells.groupBy("pos")
      .agg(sum(col("nc")).as("n"),
        sum(col("s1")).as("s1t"),
        // within-class SS: Σ_c (S2_c/1e12 − (S1_c/1e9)²/n_c)
        sum(col("s2").cast("double") / lit(1e12)
          - (col("s1").cast("double") / lit(1e9))
            * (col("s1").cast("double") / lit(1e9)) / nD).as("wss"),
        // Σ_c n_c μ_cd² for the between term
        sum((col("s1").cast("double") / lit(1e9))
          * (col("s1").cast("double") / lit(1e9)) / nD).as("smu2"))
      .select(col("pos"), col("n"),
        round((col("smu2")
          - (col("s1t").cast("double") / lit(1e9))
            * (col("s1t").cast("double") / lit(1e9))
            / col("n").cast("double")) / col("n").cast("double"), 6)
          .as("between_var"),
        round(col("wss") / col("n").cast("double"), 6).as("within_var"),
        when(col("wss") > 0.0,
          round((col("smu2")
            - (col("s1t").cast("double") / lit(1e9))
              * (col("s1t").cast("double") / lit(1e9))
              / col("n").cast("double")) / col("wss"), 6))
          .as("fisher_ratio"))
      .orderBy("pos")
  }

  /** Two-NN intrinsic-dimension estimate (Facco, d'Errico, Rodriguez &
    * Laio, Scientific Reports 2017): with μ_i = d2_i/d1_i the ratio of
    * each point's second- to first-neighbor distance, the MLE of the
    * manifold's intrinsic dimension is n / Σ ln μ_i — the curse-of-
    * dimensionality gauge run before choosing an ANN index (IVF cell
    * counts, PQ sub-dims and LSH band widths all degrade as intrinsic
    * dimension approaches ambient).
    *
    * Exact-oracle tool of the q165 family: O(n²) pairwise by
    * construction (neighbor distances rank on per-element-quantized
    * squared distances — exact longs, so the d1/d2 selection is
    * bit-deterministic cross-engine); at corpus scale take d1/d2 from
    * the ANN ladder instead. ZERO-DISTANCE PAIRS are discarded, so a
    * duplicated point's d1/d2 come from its nearest DISTINCT
    * neighbors (the usual discard-zero convention; on duplicate-heavy
    * corpora this biases mu toward 1 and INFLATES id_hat — run exact
    * dedup first, which the pipeline's q21 family exists for).
    * Returns one row (n_used, id_hat 4dp, ambient_dims). */
  def intrinsicDimension(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    // BLOCKED two-NN scan (round 11, the knnGraph pattern): corpus in
    // one broadcast, probe indices pre-split at the Range leaf, one
    // live (d1, d2) selection per probe streamed through mapPartitions
    // — the previous crossJoin + row_number window shuffled and SORTED
    // the full n²-row quantized-distance stream, the exact q165
    // round-9 spill-variance class. Per-pair arithmetic replicates
    // [[graft.functions.QuantizedSqDist]] term-for-term (Σ over the
    // shorter prefix of floor((x−y)²·10¹² + ½) as exact longs, loud
    // addExact overflow), so the d1/d2 selection stays
    // bit-deterministic cross-engine and the DuckDB oracle unchanged.
    val spark = df.sparkSession
    import spark.implicits._
    // scale guard (fail loudly, never funnel): same broadcast bound as
    // the knnGraph family this tool belongs to
    val n0 = df.where(col(vecCol).isNotNull).count()
    require(n0 <= graft.ops.Similarity.MaxExactCorpus,
      s"intrinsicDimension: $n0 vectors exceeds the exact two-NN " +
        s"broadcast bound (${graft.ops.Similarity.MaxExactCorpus}); " +
        "take d1/d2 from the ANN ladder at corpus scale")
    // ambient dims: min length over ALL non-null vectors (null
    // ELEMENTS still count here, as size() did) — one executor-side
    // aggregate, so null-element rows never reach the driver
    val ndRow = df.where(col(vecCol).isNotNull)
      .agg(min(size(col(vecCol)))).head()
    val nd = if (ndRow.isNullAt(0)) 0 else ndRow.getInt(0)
    // a vector with a null element nulls qd against EVERY partner in
    // the expression form -> it contributed nothing as probe or
    // candidate; dropping it up front (on EXECUTORS) is the same
    // semantics. Pre-packed primitive gather as in knnGraph: the
    // (Long, Array[Double]) encoder decodes straight to double[],
    // skipping the boxed Seq[Any] intermediate that blew past the
    // broadcast contract's advertised footprint at the corpus bound.
    val clean = df
      .select(col(idCol).cast("long").as("_1"),
        col(vecCol).cast("array<double>").as("_2"))
      .where(col("_2").isNotNull && !exists(col("_2"), _.isNull))
      .as[(Long, Array[Double])]
      .collect()
      .sortBy(_._1)
    val n = clean.length
    val bcIds = spark.sparkContext.broadcast(clean.map(_._1))
    val bcVecs = spark.sparkContext.broadcast(clean.map(_._2))
    val parts = math.max(1,
      math.min(spark.sparkContext.defaultParallelism, n))
    val lnmu = spark.range(0, n.toLong, 1, parts).as[Long]
      .mapPartitions { it =>
        val ids = bcIds.value
        val vecs = bcVecs.value
        val nn = ids.length
        it.flatMap { qi0 =>
          val qi = qi0.toInt
          val qv = vecs(qi)
          // two smallest (qd, cid) with qd > 0, lexicographic — the
          // row_number(orderBy qd, cid) <= 2 selection exactly
          var d1 = Long.MaxValue; var c1 = Long.MaxValue
          var d2 = Long.MaxValue; var c2 = Long.MaxValue
          var m = 0
          var ci = 0
          while (ci < nn) {
            if (ci != qi) {
              val cv = vecs(ci)
              val len = math.min(qv.length, cv.length)
              var acc = 0L
              var j = 0
              while (j < len) {
                val d = qv(j) - cv(j)
                val t = d * d * 1e12 + 0.5
                if (t >= 9.223372036854776e18)
                  throw graft.functions.QuantizedSqDist.overflow(d)
                acc = Math.addExact(acc, math.floor(t).toLong)
                j += 1
              }
              if (acc > 0L) {
                val cid = ids(ci)
                if (m == 0 || acc < d1 || (acc == d1 && cid < c1)) {
                  if (m > 0) { d2 = d1; c2 = c1 }
                  d1 = acc; c1 = cid
                  if (m < 2) m += 1
                } else if (m < 2 || acc < d2 || (acc == d2 && cid < c2)) {
                  d2 = acc; c2 = cid
                  if (m < 2) m += 1
                }
              }
            }
            ci += 1
          }
          if (m == 2)
            Iterator.single(math.log(d2.toDouble / d1.toDouble) / 2.0)
          else Iterator.empty
        }
      }.toDF("lnmu")
    lnmu.agg(count(lit(1)).as("n_used"), sum(col("lnmu")).as("slog"))
      .select(col("n_used"),
        when(col("slog") > 0.0,
          round(col("n_used").cast("double") / col("slog"), 4))
          .as("id_hat"),
        lit(nd).cast("int").as("ambient_dims"))
  }
}
