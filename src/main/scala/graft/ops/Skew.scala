package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-skew mitigation by salting.
  *
  * A hash-partitioned join or aggregation sends every row of a hot key
  * to ONE task; at 100 TB one key holding 1% of the data stalls the
  * stage on a single straggler (AQE's skew-join split helps sort-merge
  * joins, but not aggregations, and only after the skewed shuffle files
  * exist). Salting re-keys the hot side by (key, salt) so a hot key
  * spreads over `salts` tasks:
  *
  *   - join: the big side gets a DETERMINISTIC salt from a hash of the
  *     whole row (no rand() — retries and replays must route a row the
  *     same way); the small side is replicated once per salt value.
  *     Output == the unsalted join, bit for bit.
  *   - aggregation: classic two-phase — partial aggregate on
  *     (key, salt), final aggregate on key. The partial shuffle carries
  *     at most `salts` rows per key.
  */
object Skew {

  /** A temp-column name guaranteed absent from every given column set. */
  private def freshName(base: String, taken: Seq[String]): String = {
    var n = base
    while (taken.contains(n)) n = "_" + n
    n
  }

  /** Deterministic per-row salt in [0, salts): hash of the row's
    * hash-supported columns. Spark's `hash` rejects MapType ANYWHERE in
    * a column's type, so any column transitively containing a map is
    * rewritten to a canonical form first — sorted entries with key and
    * value rendered as strings, recursing through struct and array
    * nesting — so equal maps salt identically regardless of entry
    * order and `hash` never sees a MapType. */
  private def rowSalt(df: DataFrame, salts: Int): Column = {
    import org.apache.spark.sql.types._
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType => containsMap(a.elementType)
      case _ => false
    }
    def canon(c: Column, dt: DataType): Column = dt match {
      case MapType(kt, vt, _) =>
        // canonicalize each entry FIRST (values may nest further maps,
        // and struct ordering over a map-bearing value is unsupported),
        // then sort on the resulting string pairs
        sort_array(transform(map_entries(c), e => struct(
          canon(e.getField("key"), kt).cast("string").as("key"),
          canon(e.getField("value"), vt).cast("string").as("value"))))
          .cast("string")
      case s: StructType if containsMap(s) =>
        struct(s.fields.toSeq.map(f =>
          canon(c.getField(f.name), f.dataType).as(f.name)): _*)
      case ArrayType(et, _) if containsMap(et) =>
        transform(c, x => canon(x, et))
      case _ => c
    }
    val parts = df.schema.fields.toSeq.map { f =>
      val c = col("`" + f.name.replace("`", "``") + "`")
      if (containsMap(f.dataType)) canon(c, f.dataType) else c
    }
    pmod(hash(parts: _*), lit(salts))
  }

  /** Inner equi-join with the big side salted and the small side
    * replicated `salts` times. Same rows as `big.join(small, key)`.
    * Caveat: rows identical in EVERY column hash to one salt — exact
    * duplicates of a hot key still co-locate; dedup or pre-aggregate
    * them first (a deterministic function of row content cannot split
    * identical rows, and rand() would break task retries). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltCol = freshName("__salt", big.columns.toSeq ++ small.columns)
    val b = big.withColumn(saltCol, rowSalt(big, salts))
    val s = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, saltCol)).drop(saltCol)
  }

  /** Skew-safe count per key: two-phase groupBy via a deterministic
    * row-hash salt. Same result as `df.groupBy(key).count()`. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltCol = freshName("__salt", df.columns.toSeq)
    val partialCol = freshName("__partial", df.columns.toSeq)
    df.withColumn(saltCol, rowSalt(df, salts))
      .groupBy(col(s"`$key`"), col(s"`$saltCol`"))
      .agg(count(lit(1)).as(partialCol))
      .groupBy(col(s"`$key`"))
      .agg(sum(col(s"`$partialCol`")).as("count"))
  }

  /** The DIAGNOSIS that decides whether salting is worth it: key-share
    * concentration of a prospective join/groupBy key. One
    * map-side-combined groupBy collapses to per-key counts; everything
    * else is a one-row rollup plus a bounded top-K
    * (TakeOrderedAndProject):
    *
    *   - top1_share / topk_share — the straggler bound: a task gets at
    *     least top1_share of the shuffle if this key is hash-routed;
    *   - hhi — Herfindahl index Σ shareᵢ² (1/n_keys = uniform, → 1 =
    *     one key owns everything), the scalar skew alarm;
    *   - avg_per_key — the fan-in a mean task sees.
    *
    * Counts stay exact longs; squared counts go through double at the
    * first multiply (c² overflows long past c ≈ 3e9). */
  def keySkewStats(
      df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    // materialized once: the rollup (incl. the eager empty guard) and
    // the top-K both read it without recomputing the input scan
    val counts = df.groupBy(col(keyCol).as("k2"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val roll = counts.agg(
      sum(col("c")).as("n"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("cmax"),
      sum(col("c").cast("double") * col("c")).as("sumsq"))
    // an empty input would emit a row of nulls — a monitoring job
    // comparing hhi > threshold would silently never alarm
    require(!roll.head().isNullAt(0), "input is empty — no keys to profile")
    val top = counts
      .orderBy(col("c").desc, col("k2"))
      .limit(topK)
      .agg(sum(col("c")).as("topk"))
    roll.crossJoin(top).select(
      col("n").as("n_rows"), col("n_keys"),
      round(col("cmax") / col("n").cast("double"), 8).as("top1_share"),
      round(col("topk") / col("n").cast("double"), 8).as("topk_share"),
      round(col("sumsq") / (col("n").cast("double") * col("n")), 8)
        .as("hhi"),
      round(col("n") / col("n_keys").cast("double"), 8).as("avg_per_key"))
  }

  /** Gini coefficient of a non-negative value column — the Lorenz-curve
    * concentration summary that complements [[keySkewStats]]' HHI
    * (HHI asks "how concentrated are the KEYS", Gini asks "how unequal
    * are the VALUES" — revenue, document lengths, per-domain token
    * mass). Uses the sorted-multiset identity
    *
    *   G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n
    *
    * where Σᵢ i·x₍ᵢ₎ over a tied block is order-invariant, so
    * tie-averaged ranks give the exact sum: Σ_v v·cnt·avgrank(v).
    * Ranks come from [[Ranking.avgRanksFromCounts]]' range-partitioned
    * prefix-sum pass — NO global window, no full sort on one reducer;
    * everything after the per-value count table is vocabulary-sized.
    * Returns one row (n, gini); gini is null on an empty input and
    * meaningful only for non-negative values (not enforced). */
  def gini(df: DataFrame, vCol: String): DataFrame = {
    val counts = df
      .select(lit("_").as("__k"), col(vCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && !col("__v").isNaN)
      .groupBy("__k", "__v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val ranks = graft.ops.Ranking.avgRanksFromCounts(counts, "__k", "__v")
    counts.join(ranks, Seq("__k", "__v"))
      .agg(
        coalesce(sum(col("cnt")), lit(0L)).as("n"),
        sum(col("__v") * col("cnt")).as("sx"),
        sum(col("__v") * col("cnt") * col("avgrank")).as("s1"))
      .select(col("n"),
        when(col("n") > 0 && col("sx") =!= 0.0,
          round(lit(2.0) * col("s1") / (col("n") * col("sx")) -
            (col("n") + lit(1.0)) / col("n"), 6)).as("gini"))
  }

  /** Theil T inequality index with its exact between/within-group
    * decomposition (Theil 1967 — the property Gini lacks:
    * T = T_between + Σ_g s_g·T_g ADDITIVELY, so "how much of the
    * token-mass inequality is across sources vs inside them" is a
    * well-posed number). Over positive integer masses x with global
    * mean μ and group means μ_g:
    *
    *   T_g       = (1/n_g) Σ_{i∈g} (x_i/μ_g) ln(x_i/μ_g)
    *   share s_g = n_g μ_g / (N μ)  (the group's mass share, exact)
    *   between_g = s_g ln(μ_g/μ)
    *
    * All counts and mass sums are exact BIGINTs; the only float sums
    * ride per-DISTINCT-VALUE counts (the entropy-family discipline —
    * bounded terms, 6 dp absorbs last-ulp association differences).
    * Returns one row per group:
    * (group, n, mean, theil_within, share, within_term, between_term)
    * — Σ(within_term) + Σ(between_term) is the corpus Theil T. */
  def theilDecomposition(df: DataFrame, groupCol: String,
      vCol: String): DataFrame = {
    val x = col(vCol).cast("long")
    val base = df.where(x.isNotNull && x > 0)
      .select(col(groupCol).as("g"), x.as("x"))
    val vc = base.groupBy("g", "x").agg(count(lit(1)).as("c"))
    val gs = vc.groupBy("g").agg(sum(col("c")).as("n"),
      sum(col("c") * col("x")).as("sx"))
    val tot = gs.agg(sum(col("n")).as("nn"), sum(col("sx")).as("ssx"))
    val withMu = vc.join(gs, Seq("g"))
      .select(col("g"), col("c"), col("x"),
        (col("sx").cast("double") / col("n")).as("mu_g"))
    val tg = withMu
      .select(col("g"),
        (col("c") * (col("x") / col("mu_g"))
          * log(col("x") / col("mu_g"))).as("term"))
      .groupBy("g").agg(sum(col("term")).as("tsum"))
    gs.join(tg, Seq("g")).crossJoin(broadcast(tot))
      .select(col("g").as(groupCol), col("n"),
        round(col("sx").cast("double") / col("n"), 6).as("mean"),
        round(col("tsum") / col("n"), 6).as("theil_within"),
        round(col("sx").cast("double") / col("ssx"), 6).as("share"),
        round((col("sx").cast("double") / col("ssx"))
          * (col("tsum") / col("n")), 6).as("within_term"),
        round((col("sx").cast("double") / col("ssx"))
          * log((col("sx").cast("double") / col("n"))
            / (col("ssx").cast("double") / col("nn"))), 6)
          .as("between_term"))
  }
}
