package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StatFunctions._

/** Sampling / extreme-observation operators (reference: head/tail/random
  * samples `dataframe_wrappers.py:476-482`, `model/sample.py:26-71`;
  * extreme observations `report/presentation/frequency_table_utils.py:82-117`;
  * memory estimate `dataframe_wrappers.py:503-513`). */
object Sampling {

  /** First/last n rows by `orderCol` with a deterministic tie-break on
    * `tieCols` — the reference's extreme-observation tables
    * (TakeOrderedAndProject both ways, no full sort). */
  def extremeObs(df: DataFrame, orderCol: String, n: Int,
      tieCols: Seq[String]): DataFrame = {
    val asc = df.orderBy((col(orderCol).asc +: tieCols.map(col(_).asc)): _*)
      .limit(n).withColumn("extreme", lit("min"))
    val desc = df.orderBy((col(orderCol).desc +: tieCols.map(col(_).asc)): _*)
      .limit(n).withColumn("extreme", lit("max"))
    asc.unionAll(desc)
  }

  /** Deterministic hash sample: keeps rows whose 60-bit key hash lands in
    * [0, pct) of 100 buckets. Unlike df.sample's seeded PRNG this is
    * engine-portable, stable under repartitioning, and consistent across
    * runs — the right sampling primitive for reproducible pipelines. */
  /** The shared percent-bucket: one hash family for every sampler, so a
    * stratum sampled at p keeps exactly the rows the plain sampler at p
    * keeps (OpsSpec pins that contract). */
  private def hashBucket(keyCol: String) =
    pmod(hash64(col(keyCol).cast("string"), 0), lit(100))

  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.where(hashBucket(keyCol) < pct)

  /** Deterministic per-EPOCH global shuffle + shard assignment — the
    * training-loader step between curation and consumption: every row
    * gets a (shard, pos) so that reading shards in pos order is a
    * reproducible uniform permutation that CHANGES each epoch (epoch
    * seeds the hash) but never depends on partitioning, cluster size,
    * or a PRNG stream. shard = hash64(id, epoch) mod nShards (map-only
    * and balanced); pos = rank of the hash within the shard — one hash
    * shuffle on the shard key + a per-shard sort, exactly the work of
    * writing the shard files themselves, and every shard sorts in
    * parallel (no global order). */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(col("__h"), col(idCol))
    df.withColumn("__h", hash64(col(idCol).cast("string"), epoch))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /** Greedy per-group token-budget trim — EXECUTES a mix plan: within
    * each group take rows in (orderCol desc, tieCol) priority order
    * until the cumulative `tokensCol` passes `budget` (the last row
    * that fits inclusively is kept). One per-key window — the same
    * single hash shuffle as any keyed cumulative — so groups trim in
    * parallel and no group's size affects another's cost. Emits the
    * kept rows with their running `cum_tokens`. */
  def budgetTrim(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, tokensCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(col(orderCol).desc, col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .where(col("cum_tokens") <= budget)
  }

  /** DSIR importance weights (Xie et al., NeurIPS 2023 "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more likely its hashed-n-gram features are
    * under a TARGET corpus (the rows matching `targetFilter` — the
    * high-quality exemplar set) than under the RAW corpus (the rest),
    * the log-ratio the paper then resamples by. Features are the
    * paper's: unigrams + bigrams hashed into `buckets` counts (the
    * md5 bucket convention of [[graft.ops.FeatureEng
    * .hashingTrickFeatures]], so the oracle rebuilds bit-identical
    * buckets); both bucket distributions are add-one smoothed over the
    * `buckets` universe, so a feature unseen in either corpus
    * contributes a finite log-ratio. Returns one row per document
    * with >= 1 token: (idCol, is_target, n_feats, log_weight) with
    * log_weight = sum over feature occurrences of
    * ln pT(b) - ln pR(b), 6 dp.
    *
    * Scale design (100 TB): the two bucket tables are <= `buckets`
    * rows REGARDLESS of corpus size (that is the point of the hashing
    * trick) and join back by broadcast; per-document features collapse
    * to (id, bucket, n) map-side before that join, so the whole scorer
    * is one explode + one keyed combine + two broadcast lookups —
    * no corpus-sized shuffle beyond the per-document combine. */
  def dsirLogWeights(df: DataFrame, idCol: String, textCol: String,
      targetFilter: Column, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    def bucketOf(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 12), 16, 10)
        .cast("long") % lit(buckets.toLong)
    def feats(d: DataFrame): DataFrame = {
      val grams = d.select(col(idCol).as("id"), explode(concat(
          graft.functions.WordNgramsExpr
            .ngrams(col(textCol), 1, distinct = false),
          graft.functions.WordNgramsExpr
            .ngrams(col(textCol), 2, distinct = false))).as("__g"))
      grams.select(col("id"), bucketOf(col("__g")).as("b"))
        .groupBy("id", "b").agg(count(lit(1)).as("n"))
    }
    val all = df.withColumn("is_target",
      coalesce(targetFilter, lit(false)))
    val byDoc = feats(all).localCheckpoint(false)
    val isTarget = all.select(col(idCol).as("id"), col("is_target"))
    val withFlag = byDoc.join(isTarget, "id")
    val cT = withFlag.where(col("is_target"))
      .groupBy("b").agg(sum(col("n")).as("ct"))
    val cR = withFlag.where(!col("is_target"))
      .groupBy("b").agg(sum(col("n")).as("cr"))
    val totals = withFlag.groupBy()
      .agg(sum(when(col("is_target"), col("n")).otherwise(lit(0L)))
          .as("tt"),
        sum(when(col("is_target"), lit(0L)).otherwise(col("n"))).as("tr"))
    val logRatio =
      log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
          (col("tt") + lit(buckets.toLong))) -
      log((coalesce(col("cr"), lit(0L)) + lit(1L)).cast("double") /
          (col("tr") + lit(buckets.toLong)))
    withFlag
      .join(broadcast(cT), Seq("b"), "left")
      .join(broadcast(cR), Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .groupBy("id", "is_target")
      .agg(sum(col("n")).as("n_feats"),
        round(sum(col("n") * logRatio), 6).as("log_weight"))
      .select(col("id").as(idCol), col("is_target"),
        col("n_feats"), col("log_weight"))
  }

  /** Quality-threshold filtering sweep — the calibration table a
    * pipeline reads BEFORE committing to a per-source quality cutoff
    * (the FineWeb/RefinedWeb-style filtering ablation: "at cutoff τ,
    * how many documents and tokens survive per source?"): for every
    * group and every candidate threshold, the kept-document count,
    * kept-token count, and kept-token fraction of the group.
    *
    * One aggregation pass: the thresholds are a bounded config list,
    * so each becomes two conditional sums inside a single groupBy —
    * the corpus is scanned ONCE however many thresholds are swept —
    * and the per-threshold rows explode out of the already-aggregated
    * (|groups| rows) table, never out of the corpus. */
  def qualityThresholdSweep(df: DataFrame, groupCol: String,
      scoreCol: Column, tokensCol: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    require(thresholds.size <= 64, "thresholds is a bounded config list")
    val base = df.select(col(groupCol).as("g"), scoreCol.as("sc"),
      tokensCol.cast("long").as("tk"))
    val condAggs = thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
      sum(when(col("sc") >= t, lit(1L)).otherwise(lit(0L))).as(s"__d$i"),
      sum(when(col("sc") >= t, col("tk")).otherwise(lit(0L))).as(s"__t$i"))
    }
    val wide = base.groupBy("g").agg(
      count(lit(1)).as("n_docs"),
      (sum(col("tk")).as("n_tokens") +: condAggs): _*)
    wide.select(col("g"), col("n_docs"), col("n_tokens"),
        explode(array(thresholds.zipWithIndex.map { case (t, i) =>
          struct(lit(t).as("threshold"),
            col(s"__d$i").as("n_docs_kept"),
            col(s"__t$i").as("tokens_kept"))
        }: _*)).as("x"))
      .select(col("g").as(groupCol), col("x.threshold").as("threshold"),
        col("n_docs"), col("n_tokens"),
        col("x.n_docs_kept").as("n_docs_kept"),
        col("x.tokens_kept").as("tokens_kept"),
        round(col("x.tokens_kept").cast("double") /
          greatest(col("n_tokens"), lit(1L)), 6).as("token_frac"))
  }

  /** Deterministic train/val/test assignment — the split EVERY
    * training pipeline needs to be reproducible, portable, and stable
    * under repartitioning (a seeded randomSplit is none of those: it
    * reshuffles membership whenever partitioning changes). Same
    * md5-derived percent-bucket as [[hashSample]], so split membership
    * is a pure function of the key: adding rows later never moves an
    * existing row between splits (the property that keeps eval sets
    * uncontaminated across dataset versions). Map-only — adds a
    * `split` column, no shuffle. */
  def splitAssign(
      df: DataFrame, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100 " +
        s"(got $trainPct/$valPct)")
    val b = hashBucket(keyCol)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** [[hashSample]] additionally capped at an absolute row count. The cap
    * is taken in deterministic hash order of `tieKey` (pseudorandom, so
    * the capped set is still a uniform sample), which hard-bounds
    * downstream quadratic work at ANY input scale: a percent alone does
    * not — 1% of 10^9 rows is 10^7 rows and 5*10^13 Kendall pairs, while
    * min(1%, 10^4 rows) is at most 5*10^7 pairs. Executes as
    * TakeOrderedAndProject (per-partition top-cap, merge of <= cap rows
    * per partition — no full sort, no single-reducer window). `tieKey`
    * should be unique per row so the order is total and the cut
    * deterministic. */
  def hashSampleCapped(df: DataFrame, keyCol: String, pct: Int, cap: Int,
      tieKey: org.apache.spark.sql.Column): DataFrame =
    hashSample(df, keyCol, pct)
      .orderBy(hash64(tieKey.cast("string"), 1))
      .limit(cap)

  /** Deterministic per-stratum hash sampling — the training-mix builder:
    * each stratum (source, language, quality bucket) keeps its own
    * percentage of rows, reproducible across runs and engines (same
    * md5-derived hash family as [[hashSample]], so the SAME rows
    * survive wherever the pipeline reruns). Strata absent from `rates`
    * keep `defaultPct`. Map-only — the rate lookup is a constant CASE
    * expression, no shuffle, no per-stratum pass: one filter scans the
    * corpus once at any scale. */
  def stratifiedHashSample(df: DataFrame, keyCol: String,
      stratumCol: String, rates: Map[String, Int],
      defaultPct: Int): DataFrame = {
    val pctCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.where(hashBucket(keyCol) < pctCol)
  }

  /** Neyman-allocation stratified sampling (Neyman 1934 — the optimal
    * allocation survey statisticians reach for before any fixed-rate
    * stratified draw): a total budget of `totalN` rows is split across
    * strata proportionally to N_h·σ_h, so high-variance strata get
    * more of the budget than proportional allocation would give and
    * near-constant strata almost none — the minimum-variance unbiased
    * split for estimating the overall mean of `valueCol`.
    *
    * `valueCol` must be integral: per-stratum moments accumulate as
    * exact decimal(38,0) sums (the Mann-Whitney discipline — n·Σx²
    * stays exact past 10^12 rows), and the variance/σ/weight chain is
    * then a fixed sequence of double ops identical in any engine. The
    * draw itself ranks rows within each stratum by md5(id) (the shared
    * deterministic hash family) and keeps the first alloc_h — so the
    * sample is reproducible across runs, engines, and partitionings.
    * alloc_h = floor(totalN·w_h/Σw + 0.5) capped at N_h; zero-variance
    * strata get 0 (they contribute nothing to estimator variance; add
    * a floor outside if coverage of every stratum is required).
    *
    * Scale design (100 TB): one map-side-combined moment aggregation
    * (strata-bounded), a broadcast 1-row total, and ONE per-stratum
    * rank window for the draw. Returns per stratum:
    * (stratum, n_rows, sigma, alloc, n_sampled, id_sum) — id_sum is the
    * exact-BIGINT membership certificate of the drawn sample. */
  def neymanAllocation(df: DataFrame, stratumCol: String, idCol: String,
      valueCol: String, totalN: Long): DataFrame = {
    require(totalN >= 1, s"totalN must be >= 1: $totalN")
    val base = df.where(col(valueCol).isNotNull)
      .select(col(stratumCol).as("g"), col(idCol).cast("long").as("id"),
        col(valueCol).cast("long").as("x"))
    val st = base.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("s"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("ss"))
    val variance = when(col("n") > 1,
      (col("n").cast("decimal(38,0)") * col("ss") - col("s") * col("s"))
        .cast("double") / (col("n").cast("double") * (col("n") - 1)))
      .otherwise(lit(0.0))
    val weighted = st.select(col("g"), col("n"),
      sqrt(variance).as("sigma"))
      .select(col("g"), col("n"), col("sigma"),
        (col("n").cast("double") * col("sigma")).as("w"))
    val tot = weighted.agg(sum(col("w")).as("wtot"))
    val alloc = weighted.crossJoin(broadcast(tot))
      .select(col("g"), col("n"), col("sigma"),
        when(col("wtot") > 0.0,
          least(floor(lit(totalN.toDouble) * col("w") / col("wtot")
            + 0.5).cast("long"), col("n")))
          .otherwise(0L).as("alloc"))
    val ranked = base.withColumn("__rnk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("g")
        .orderBy(md5(col("id").cast("string")), col("id"))))
    val drawn = ranked.join(alloc.select("g", "alloc"), Seq("g"))
      .where(col("__rnk") <= col("alloc"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_sampled"), sum(col("id")).as("id_sum"))
    alloc.join(drawn, Seq("g"), "left")
      .select(col("g").as(stratumCol), col("n").as("n_rows"),
        round(col("sigma"), 6).as("sigma"), col("alloc"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"))
  }

  /** Class-balanced downsampling: every class keeps exactly
    * min-class-count rows (the classic majority-downsample for a
    * skewed training label), chosen deterministically by the shared
    * md5 hash family — so the balanced subset is reproducible across
    * runs, engines, and repartitionings, and stable under dataset
    * growth ORDER (a row's within-class hash rank only moves if new
    * rows hash below it). `keyCol` must be unique per row so the
    * rank order is total and the cut deterministic.
    *
    * Scale design (100 TB): class counts are ONE map-side-combined
    * groupBy (class-cardinality rows, broadcast back); the per-class
    * rank is a window partitioned by class — work per partition
    * bounded by the largest class. For a pathological single-majority
    * class, pre-filter with [[hashSample]] at ~(minCount/majority)
    * before ranking; the hash family is shared, so the composition
    * keeps exactly the same rows. */
  def balancedSample(df: DataFrame, classCol: String,
      keyCol: String): DataFrame = {
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__min_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol))
      .orderBy(hash64(col(keyCol).cast("string"), 0), col(keyCol))
    df.withColumn("__rnk", row_number().over(w))
      .crossJoin(broadcast(minN))
      .where(col("__rnk") <= col("__min_n"))
      .drop("__rnk", "__min_n")
  }

  /** Corpus-composition statistics for training-data mixing: per-group
    * (source / domain / language) document counts, token totals, shares,
    * and the resampling weight that would equalize every group's token
    * contribution (the "uniform mix" target; cap at 1.0 for
    * downsample-only pipelines, or feed into
    * [[stratifiedHashSample]]'s per-stratum rates). `tokens` is any
    * per-row token-count expression (e.g.
    * [[TextAnalysis.nTokensWhitespace]]).
    *
    * Scale design (100 TB): ONE map-side-combined groupBy over the
    * corpus; the per-group table is domain-cardinality-sized, so the
    * totals join back as a single-row broadcast — no second scan, no
    * unpartitioned window. */
  def mixStats(df: DataFrame, groupCol: String,
      tokens: org.apache.spark.sql.Column): DataFrame = {
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("n_tokens"))
    val tot = per.agg(
      sum("n_docs").cast("double").as("__t_docs"),
      sum("n_tokens").cast("double").as("__t_tokens"),
      count(lit(1)).cast("double").as("__n_groups"))
    per.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        round(col("n_docs") / col("__t_docs"), 6).as("doc_share"),
        round(col("n_tokens") / col("__t_tokens"), 6).as("token_share"),
        when(col("n_tokens") > 0,
          round((col("__t_tokens") / col("__n_groups")) / col("n_tokens"), 6))
          .as("uniform_weight"))
  }

  /** Per-group cap: keep at most `n` rows per group, the best first by
    * `rankCol` (descending) with a deterministic ascending tie-break on
    * `tieCol` — the RefinedWeb-style per-domain cap (Penedo et al. 2023,
    * arXiv:2306.01116 §3.2 dedup + url-level limits) that stops any one
    * domain/source from dominating a training mix no matter how much of
    * the crawl it is.
    *
    * Scale design: one shuffle on the group key, then a per-group
    * window — work per partition is bounded by group size, and with
    * domain-sized groups AQE's skew split handles a pathological
    * mega-domain. No global sort, no driver state. */
  def capPerGroup(df: DataFrame, groupCol: String,
      rankCol: org.apache.spark.sql.Column, tieCol: String,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(rankCol.desc, col(tieCol).asc)
    df.withColumn("__rnk", row_number().over(w))
      .where(col("__rnk") <= n)
      .drop("__rnk")
  }

  /** Deterministic WEIGHTED Bernoulli sample: keep a row iff its key's
    * uniform hash u in [0,1) is below the row's own acceptance weight —
    * quality-weighted subsampling (DoReMi-style mix reweighting, keep
    * good docs at higher rate) that stays reproducible across runs,
    * repartitioning, and engines (same md5 hash family as
    * [[hashSample]], seed 2). Map-only; `weight` should be in [0,1]
    * (values >= 1 always keep, <= 0 always drop). u is quantized to
    * 1e-9 resolution: weights below 1e-9 behave as ~1e-9, the
    * documented floor of the hash family. */
  def weightedHashSample(
      df: DataFrame, keyCol: String,
      weight: org.apache.spark.sql.Column): DataFrame = {
    val u = pmod(
      graft.functions.StatFunctions.hash64(col(keyCol).cast("string"), 2),
      lit(1000000000L)).cast("double") / 1e9
    df.where(u < weight)
  }

  /** Top-p (nucleus) selection per group, in EXACT integer arithmetic:
    * order each group's rows by integer `scoreCol` descending (ties by
    * `tieCol`), and keep the smallest prefix covering at least
    * num/den of the group's total score mass — the training-mix
    * selection that keeps "the best half of each source's bytes"
    * without a single float (den * cumBefore < num * total, all
    * bigint, so the boundary row is engine-independent). One hash
    * shuffle on the group; windows are group-partitioned. */
  def topMassPerGroup(
      df: DataFrame, groupCol: String, scoreCol: String, tieCol: String,
      num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0, s"bad mass fraction $num/$den")
    val clash = df.columns.toSet.intersect(Set("__cb", "__tot"))
    require(clash.isEmpty,
      s"input already has reserved columns $clash; rename them first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val cumBefore = coalesce(
      sum(col(scoreCol)).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L))
    val total = sum(col(scoreCol)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol)))
    df.withColumn("__cb", cumBefore).withColumn("__tot", total)
      .where(col("__cb") * den < col("__tot") * num)
      .drop("__cb", "__tot")
  }

  /** Distributed byte-size estimate: fixed widths for fixed-size types +
    * octet_length for strings/binary (replaces the reference's
    * cube-root-sample -> toPandas memory probe with one aggregate). */
  def memoryEstimate(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val perRow = df.schema.fields.map { f =>
      f.dataType match {
        case StringType | BinaryType =>
          coalesce(octet_length(col(f.name)).cast("long"), lit(0L))
        case ByteType | BooleanType                  => lit(1L)
        case ShortType                               => lit(2L)
        case IntegerType | FloatType | DateType      => lit(4L)
        case _                                       => lit(8L)
      }
    }.reduce(_ + _)
    df.agg(sum(perRow).as("est_bytes"), count(lit(1)).as("n_rows"))
  }

  /** Temperature-weighted source mixing: sampling probability per
    * source ∝ n_tokens^alpha — alpha = 1 is proportional (big sources
    * dominate), alpha = 0 uniform, the 0.2–0.7 band is the standard
    * up-weighting of small high-quality sources when composing a
    * training mix. One groupBy(source) over codegen'd token counts
    * plus a single-row total — the weight table is source-sized,
    * never corpus-sized. Returns (groupCol, n_docs, n_tokens,
    * weight), weight 6dp-rounded, ordered by group. */
  def sourceMixWeights(
      df: DataFrame, groupCol: String, textCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0, "alpha must be >= 0")
    val toks = size(graft.ops.TextAnalysis.words(col(textCol)))
      .cast("long")
    val agg = df
      .where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(toks).as("n_tokens"))
      .withColumn("__w", pow(col("n_tokens").cast("double"), lit(alpha)))
    val tot = agg.agg(sum(col("__w")).as("__tw"))
    agg.crossJoin(tot)
      .select(col("grp").as(groupCol), col("n_docs"), col("n_tokens"),
        round(col("__w") / col("__tw"), 6).as("weight"))
      .orderBy(groupCol)
  }

  /** Water-filling token-budget allocation across groups: given
    * per-row token counts and a global budget B = ⌊budgetFrac · Σt⌋,
    * find the unique cap c with Σ min(t_g, c) = B and report each
    * group's allocation — the planning step behind corpus mixing when
    * a head-heavy source distribution must shrink to a budget without
    * starving the tail (small sources keep everything, the cap bites
    * only the giants).
    *
    * The capped set is a suffix of the tokens-ascending order, so one
    * bounded-table window pass decides it with EXACT integer
    * arithmetic: group g (rank rn, prefix-below pb) is capped iff
    * t_g·(S−rn+1) > B−pb — no float in the decision; only the final
    * cap value is one double division. Per-group totals are one
    * shuffle; everything after runs on the one-row-per-group table
    * (the bounded-window contract). Returns (group, n_tokens, capped,
    * alloc 6dp) ordered by group. */
  def waterfillAllocation(df: DataFrame, groupCol: String,
      tokens: org.apache.spark.sql.Column,
      budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0.0 && budgetFrac <= 1.0,
      "budgetFrac must be in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("t"), col("grp"))
    val per = df.groupBy(col(groupCol).as("grp"))
      .agg(sum(tokens.cast("long")).as("t"))
    val tot = per.agg(sum(col("t")).as("tot"), count(lit(1)).as("ns"))
    val rows = per.crossJoin(broadcast(tot))
      .withColumn("rn", row_number().over(w))
      .withColumn("pb", coalesce(sum(col("t")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
      .withColumn("b",
        floor(col("tot").cast("double") * lit(budgetFrac)).cast("long"))
      .withColumn("capped",
        col("t") * (col("ns") - col("rn") + 1) > col("b") - col("pb"))
    val capRow = rows.where(col("capped")).orderBy("rn").limit(1)
      .select(((col("b") - col("pb")).cast("double") /
        (col("ns") - col("rn") + 1)).as("cap"))
    rows.join(capRow, lit(true), "left")
      .select(col("grp").as(groupCol), col("t").as("n_tokens"),
        col("capped"),
        round(when(col("capped"), col("cap"))
          .otherwise(col("t").cast("double")), 6).as("alloc"))
      .orderBy(groupCol)
  }

  /** EXACT stratified k-fold assignment: within every class, rows are
    * ranked by the deterministic shuffle key (md5 of the id, ties by
    * id) and dealt round-robin into `k` folds — so per-class fold
    * sizes differ by at most one, which a thresholded hash split
    * ([[splitAssign]]) cannot guarantee.
    *
    * The within-class rank uses the repo's two-phase distributed prefix
    * sum (same shape as [[Ranking.avgRanks]], here at ROW granularity):
    * range-partition by (class, md5, id), collect per-(partition,
    * class) row counts (bounded by partitions × classes), prefix-sum on
    * the driver, broadcast, then a narrow pass deals the folds — no
    * per-class window, no single-reducer sort. The md5-hex order is
    * plain ASCII byte order, identical in any engine. */
  def stratifiedFolds(df: DataFrame, idCol: String, classCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val p = spark.sessionState.conf.numShufflePartitions
    val rows = df.select(
        col(classCol).cast("string").as("cls"),
        md5(col(idCol).cast("string").cast("binary")).as("hk"),
        col(idCol).cast("long").as("id"))
      .repartitionByRange(p, col("cls"), col("hk"), col("id"))
      .sortWithinPartitions("cls", "hk", "id")
      .as[(String, String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subtotals: Array[(Int, String, Long)] = rows.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { case (c, _, _) =>
        counts.update(c, counts.getOrElse(c, 0L) + 1L) }
      counts.iterator.map { case (c, n) => (pid, c, n) }
    }.collect()
    val offsets: Map[(Int, String), Long] = subtotals
      .groupBy(_._2)
      .flatMap { case (c, arr) =>
        var cum = 0L
        arr.sortBy(_._1).map { case (pid, _, n) =>
          val e = ((pid, c), cum); cum += n; e
        }
      }
    val bc = spark.sparkContext.broadcast(offsets)
    val kk = k.toLong
    rows.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var curCls: String = null
        var pos = 0L
        it.map { case (c, _, id) =>
          if (c != curCls) {
            curCls = c
            pos = bc.value.getOrElse((pid, c), 0L)
          }
          val fold = pos % kk
          pos += 1
          (id, c, fold)
        }
      }
      .toDF(idCol, classCol, "fold")
  }

  /** Exact PER-GROUP `ntile(k)` — the grouped generalization of
    * [[EquiDepth.equiDepthHistogram]]'s distributed rank recipe, for
    * the "split every source/language into equal-frequency score
    * buckets" step (CCNet's head/middle/tail perplexity split, Wenzek
    * et al., LREC 2020 §4.3, cuts each language's corpus into thirds
    * exactly like this).
    *
    * `ntile(k) OVER (PARTITION BY group ORDER BY v, tieBreak)` would
    * sort each ENTIRE group in one reducer task — a 10 TB source on a
    * 100 TB corpus cannot afford that. Instead the global position is
    * assembled from bounded pieces: [[Ranking.avgRanksFromCounts]]'s
    * two-phase keyed prefix sum yields, per (group, distinct value),
    * the count of strictly-smaller rows IN THAT GROUP; a window
    * partitioned by (group, value) — state bounded by one value's
    * multiplicity — disambiguates ties via `tieBreak`; ntile's exact
    * integer formula (first n%k bins get one extra row) then assigns
    * buckets with per-group row counts joined in as columns, never
    * driver literals. One value-count shuffle, one range-partitioned
    * prefix pass, one per-(group, value) window, one hash join back.
    *
    * Nulls and NaNs in `vCol` are dropped (SQL ntile would rank them;
    * callers bucketing scores never want that). `tieBreak` must make
    * (groupCol, vCol, tieBreak) a total order for determinism. Returns
    * the input rows (minus dropped ones) plus an INT `bucket` column
    * in 1..min(k, group size). */
  def groupNtile(df: DataFrame, groupCol: String, vCol: String, k: Int,
      tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(tieBreak.nonEmpty, "tieBreak columns required for determinism")
    val clash = df.columns.filter(_.startsWith("__"))
    require(clash.isEmpty,
      s"input has reserved __-prefixed columns: ${clash.toSeq}")
    val rows = df
      .withColumn("__g", col(groupCol).cast("string"))
      .withColumn("__v", col(vCol).cast("double"))
      .where(col("__v").isNotNull && !col("__v").isNaN)
    val counts = rows
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    // smaller(g, v) = #rows of group g with value < v, recovered from
    // the tie-averaged rank exactly as EquiDepth does (exact integers
    // for group sizes < 2^52)
    val smaller = Ranking
      .avgRanksFromCounts(counts, "__g", "__v")
      .join(counts, Seq("__g", "__v"))
      .select(col("__g"), col("__v"),
        (col("avgrank") - (col("cnt") + 1.0) / 2.0).cast("long")
          .as("__smaller"))
    val nPer = counts.groupBy("__g").agg(sum(col("cnt")).as("__n"))
    val wv = Window.partitionBy(col("__g"), col("__v"))
      .orderBy(tieBreak.map(c => col(c).asc): _*)
    // ntile's exact integer assignment with PER-GROUP n: bigint `div`
    // arithmetic (Column./ is double division — a second rounding layer)
    val binExpr = s"""CASE WHEN __n div ${k}L = 0L THEN __pos + 1L
      WHEN __pos < (__n % ${k}L) * (__n div ${k}L + 1L)
        THEN __pos div (__n div ${k}L + 1L) + 1L
      ELSE __n % ${k}L
        + (__pos - (__n % ${k}L) * (__n div ${k}L + 1L)) div (__n div ${k}L)
        + 1L END"""
    rows
      .join(smaller, Seq("__g", "__v"))
      .join(nPer, Seq("__g"))
      .withColumn("__pos",
        (col("__smaller") + row_number().over(wv) - 1).cast("long"))
      .withColumn("bucket", expr(binExpr).cast("int"))
      .drop("__g", "__v", "__smaller", "__n", "__pos")
  }

  /** Deterministic weighted-interleave schedule — the data-loader
    * order a multi-source training mix actually consumes: document k
    * of source s (1-based arrival rank within source, ascending id)
    * is served at virtual time k / w_s, and the global schedule is the
    * ascending sort of those keys (source name, then id, break ties).
    * This is the low-discrepancy stride schedule (each source's share
    * of any schedule prefix tracks its weight within one document —
    * the Beatty/Bresenham interleave), the deterministic counterpart
    * of sampling sources by weight.
    *
    * Scale design: per-source ranks come from [[Ranking
    * .avgRanksFromCounts]]'s keyed two-phase prefix sum (ids are
    * unique, so the tie-averaged rank IS the 1-based rank — exact
    * integers as doubles) — never a whole-source window sort; keys are
    * one map stage; the schedule prefix is a bounded TakeOrdered
    * (`steps` rows), and only that bounded result gets the row_number
    * window that stamps the step index.
    *
    * Returns the first `steps` rows: (step, source, idCol, rk, key)
    * with key rounded to 6 dp. */
  def mixInterleave(df: DataFrame, idCol: String, sourceCol: String,
      weights: Seq[(String, Double)], steps: Int): DataFrame = {
    require(weights.nonEmpty, "mixInterleave needs >= 1 weighted source")
    require(weights.forall(_._2 > 0), s"weights must be > 0: $weights")
    require(steps >= 1, s"steps must be >= 1, got $steps")
    import org.apache.spark.sql.expressions.Window
    val srcs = weights.map(_._1)
    val d = df
      .select(col(sourceCol).cast("string").as("source"),
        col(idCol).cast("long").as("__id"))
      .where(col("source").isin(srcs: _*))
    val counts = d.select(col("source"),
      col("__id").cast("double").as("__v"), lit(1L).as("cnt"))
    val ranks = Ranking.avgRanksFromCounts(counts, "source", "__v")
      .select(col("source"), col("__v").cast("long").as("__id"),
        col("avgrank").cast("long").as("rk"))
    val w = weights.tail.foldLeft(
      when(col("source") === weights.head._1, weights.head._2)) {
      case (acc, (s, wt)) => acc.when(col("source") === s, wt)
    }
    val keyed = ranks.withColumn("key", col("rk") / w)
    val stepW = Window.orderBy(col("key"), col("source"), col("__id"))
    keyed
      .orderBy(col("key"), col("source"), col("__id")).limit(steps)
      // window over the already-bounded `steps`-row prefix only
      .withColumn("step", row_number().over(stepW).cast("long"))
      .select(col("step"), col("source"), col("__id").as(idCol),
        col("rk"), round(col("key"), 6).as("key"))
  }

  /** Token-balanced shard assignment by boustrophedon ("snake") rank
    * dealing: rank every document by (weight, id), walk shards
    * 0,1,…,S−1,S−1,…,1,0,0,1,… and deal ranks in order — consecutive
    * near-equal-weight documents land on different shards and each
    * 2S-block contributes exactly one pair of adjacent ranks per
    * shard, so shard token totals differ by at most a few documents'
    * spread (the deterministic, shuffle-light cousin of LPT bin
    * packing that sequence-length-balanced training shards use).
    *
    * The global rank position is assembled from bounded pieces exactly
    * like [[groupNtile]] — a distributed prefix sum over the weight
    * value counts plus a per-value id window — never
    * `row_number() OVER (ORDER BY …)` on the full corpus. Returns the
    * per-shard ledger (shard, n_docs, tokens). */
  def balancedShards(df: DataFrame, idCol: String, weightCol: Column,
      shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(idCol).cast("long").as("__id"),
        weightCol.cast("long").as("__tk"))
      .where(col("__tk").isNotNull)
      .withColumn("__v", col("__tk").cast("double"))
    val counts = rows.groupBy(col("__v")).agg(count(lit(1)).as("cnt"))
      .select(lit("_").as("__k"), col("__v"), col("cnt"))
      .localCheckpoint(false)
    val smaller = Ranking.avgRanksFromCounts(counts, "__k", "__v")
      .join(counts, Seq("__k", "__v"))
      .select(col("__v"),
        (col("avgrank") - (col("cnt") + 1.0) / 2.0).cast("long")
          .as("__smaller"))
    val wv = Window.partitionBy(col("__v")).orderBy(col("__id"))
    val cycle = 2L * shards
    rows
      .join(smaller, Seq("__v"))
      .withColumn("__pos",
        (col("__smaller") + row_number().over(wv) - 1).cast("long"))
      .withColumn("__r", pmod(col("__pos"), lit(cycle)))
      .withColumn("shard",
        when(col("__r") < shards, col("__r"))
          .otherwise(lit(cycle - 1) - col("__r")).cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("__tk")).as("tokens"))
  }

  /** End-to-end curation funnel audit: per source, document and token
    * mass surviving each stage of the standard filter chain —
    * raw → quality threshold → prefix-fingerprint dedup (keep the
    * first quality-passing doc per fingerprint) → per-source cap
    * (first `capPerSource` survivors by id). The table every curation
    * run reads before committing: which stage costs which source how
    * much. Stages deliberately COMPOSE the gate-checked primitives
    * (q29 quality, q268's fingerprint, q64's cap) so the funnel's
    * semantics are the pipeline's, not a parallel reimplementation.
    *
    * One corpus scan + two windows: fingerprint groups (state bounded
    * by a fingerprint's multiplicity) and the q260-style per-source
    * cumulative count (one per-key window — the budget-trim shape).
    * Wordless documents get a unique sentinel fingerprint so they
    * never glue into one bogus dedup group. Returns per source:
    * (n_raw, t_raw, n_quality, t_quality, n_dedup, t_dedup, n_cap,
    * t_cap). */
  def curationFunnel(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, qualityThreshold: Double, prefixWords: Int,
      capPerSource: Int): DataFrame = {
    require(prefixWords >= 1 && capPerSource >= 1,
      s"prefixWords/capPerSource must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val ws = TextAnalysis.words(col(textCol))
    val base = df.select(
      col(idCol).cast("long").as("id"),
      col(sourceCol).cast("string").as("source"),
      TextAnalysis.qualityScore(col(textCol)).as("q"),
      size(ws).cast("long").as("tk"),
      when(size(ws) > 0, array_join(slice(ws, 1, prefixWords), " "))
        .otherwise(concat(lit("__empty__"),
          col(idCol).cast("string"))).as("fp"))
    val wFp = Window.partitionBy("fp")
    val wSrc = Window.partitionBy("source").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def tok(flag: Column) = sum(when(flag, col("tk")).otherwise(0L))
    def cnt(flag: Column) = sum(when(flag, 1L).otherwise(0L))
    base
      .withColumn("pass_q", col("q") >= qualityThreshold)
      .withColumn("pass_d", col("pass_q") &&
        col("id") === min(when(col("pass_q"), col("id"))).over(wFp))
      .withColumn("pass_c", col("pass_d") &&
        sum(when(col("pass_d"), 1L).otherwise(0L)).over(wSrc)
          <= capPerSource)
      .groupBy("source")
      .agg(count(lit(1)).as("n_raw"), sum(col("tk")).as("t_raw"),
        cnt(col("pass_q")).as("n_quality"), tok(col("pass_q")).as("t_quality"),
        cnt(col("pass_d")).as("n_dedup"), tok(col("pass_d")).as("t_dedup"),
        cnt(col("pass_c")).as("n_cap"), tok(col("pass_c")).as("t_cap"))
  }
  /** Temperature-scaled source mixing (the multilingual-LM sampling
    * rule of mC4/mT5, Xue et al. NAACL 2021 sec 3.2: sample source s
    * with probability proportional to its mass^(1/T)): weights
    * proportional to sqrt(token mass) — T = 2, the common flattening
    * that up-samples small sources without letting any source's share
    * collapse to its raw proportion. sqrt is IEEE-correctly-rounded in
    * every engine (unlike pow), so the per-source weight is
    * deterministic; the 20-source weight normalization is the only
    * double sum and the output rounds to 6 dp. planned_docs derives
    * from the ROUNDED weight (floor(w6 * budget + 1e-9)) so both
    * engines floor the same quantity. Returns per source:
    * (source, n_docs, tokens, raw_share 6dp, weight 6dp,
    * planned_docs). */
  def temperatureMix(df: DataFrame, sourceCol: String, textCol: String,
      budgetDocs: Long): DataFrame = {
    require(budgetDocs >= 1, s"budgetDocs must be >= 1: $budgetDocs")
    val per = df.where(col(textCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.nTokensWhitespace(col(textCol)).cast("long"))
          .as("tokens"))
      .localCheckpoint(false) // totals + the weighted scan share it
    val totals = per.agg(sum(col("tokens")).as("tot"),
      sum(sqrt(col("tokens").cast("double"))).as("sq_tot"))
    per.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") / col("tot"), 6)
          .as("raw_share"),
        round(sqrt(col("tokens").cast("double")) / col("sq_tot"), 6)
          .as("weight"))
      .withColumn("planned_docs",
        floor(col("weight") * lit(budgetDocs.toDouble) + lit(1e-9))
          .cast("long"))
      .orderBy("source")
  }
  /** Sequence-packing padding waste at a fixed context length — the
    * "how much compute do we burn on pad tokens" accounting of naive
    * one-doc-per-sequence batching (the number global packing / q183
    * exists to beat): per source, exact token mass, sequence count at
    * ceil(tokens/seqLen) per doc, padded mass, waste and efficiency.
    * All-integer except the final 6-dp ratio; one map-side-combined
    * aggregate. */
  def paddingWaste(df: DataFrame, sourceCol: String, textCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1: $seqLen")
    val n = TextAnalysis.nTokensWhitespace(col(textCol)).cast("long")
    df.where(col(textCol).isNotNull)
      .select(col(sourceCol).as("source"), n.as("n"))
      // Column./ is DOUBLE division — ceil-divide with the integer
      // `div` operator so every mass stays an exact long
      .withColumn("n_seq", expr(s"(n + ${seqLen - 1}) div $seqLen"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("tokens"),
        sum(col("n_seq")).as("n_seqs"),
        sum(col("n_seq") * seqLen).as("padded_tokens"))
      .select(col("source"), col("n_docs"), col("tokens"), col("n_seqs"),
        col("padded_tokens"),
        (col("padded_tokens") - col("tokens")).as("pad_waste"),
        when(col("padded_tokens") > 0,
          round(col("tokens").cast("double") / col("padded_tokens"), 6))
          .otherwise(lit(1.0)).as("efficiency"))
      .orderBy("source")
  }
}
