package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order (Markov) state-transition matrix over per-key event
  * timelines — "after a click, what happens next?" — the behavioral
  * profile a clickstream/session pipeline derives before any modeling.
  *
  * One window pass per key (`lead` over PARTITION BY key ORDER BY
  * ts, tieBreak — scale-safe: partitions are per-key, never global),
  * then a groupBy on the (from, to) pair. Row-normalized transition
  * probabilities come from a second window over the COUNTS table,
  * whose size is bounded by the state-vocabulary squared, not the
  * data. The last event of each key emits no transition. */
object Transitions {

  /** Returns (from_state, to_state, cnt, p): transition counts and
    * row-normalized probabilities (Σ p over to_state = 1 for each
    * from_state), rounded to 8 decimals. Ties in `tsCol` are broken by
    * `tieBreak` so the sequence — and therefore the matrix — is
    * deterministic. A null STATE is kept as its own level in both
    * directions (matching nullPatterns/chiSquareHomogeneity); only
    * genuine end-of-sequence rows emit no transition — the lead rides
    * in a struct so "no next row" (null struct) is distinguishable
    * from "next state is null" (non-null struct, null field). */
  def matrix(
      df: DataFrame, keyCol: String, tsCol: String, stateCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy((col(tsCol) +: tieBreak.map(col)): _*)
    val pairs = df
      .select(col(stateCol).as("from_state"),
        lead(struct(col(stateCol).as("st")), 1).over(w).as("nxt"))
      .where(col("nxt").isNotNull)
      .select(col("from_state"), col("nxt.st").as("to_state"))
    val counts = pairs.groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("cnt"))
    val rowTotal = Window.partitionBy("from_state")
    counts.select(
      col("from_state"), col("to_state"), col("cnt"),
      round(col("cnt") / sum(col("cnt")).over(rowTotal), 8).as("p"))
  }

  /** Stationary distribution of the first-order chain — "where does
    * the user population settle": quantized power iteration over the
    * [[matrix]] contingency, driver-side on the ≤ states² collected
    * cells (the phik/PCA-power contract — the distributed part is the
    * pair-count shuffle; the iteration is constant-size). P_ij =
    * cnt/rowTotal is ONE double division (engine-identical); π₀ is
    * uniform; each step is π'_j = Σ_i π_i·P_ij with LEFT-ASSOCIATIVE
    * accumulation over states in sorted order, re-quantized to 10⁻⁹
    * between steps so last-ulp drift cannot compound — an oracle can
    * unroll the identical iteration. States without outgoing
    * transitions self-loop (mass conserved). Returns (state, pi)
    * ordered by state.
    *
    * `maxStates` bounds the driver-side fold (the `requireBoundedGrid`
    * posture of the survival ops): the iteration builds an s×s double
    * matrix on the driver, so a high-cardinality `stateCol` (a raw id
    * column passed by mistake) must fail loudly BEFORE the collect —
    * the distinct-state count is one cheap job over the already-
    * aggregated (and checkpointed, hence not recomputed) cells table. */
  def stationary(
      df: DataFrame, keyCol: String, tsCol: String, stateCol: String,
      tieBreak: Seq[String] = Nil, steps: Int = 3,
      maxStates: Int = 10000): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val spark = df.sparkSession
    val cellsDf = matrix(df, keyCol, tsCol, stateCol, tieBreak)
      .select(col("from_state").cast("string"),
        col("to_state").cast("string"), col("cnt"))
      .localCheckpoint(false)
    val nStates = cellsDf
      .select(explode(array(col("from_state"), col("to_state"))).as("s"))
      .distinct().count()
    require(nStates <= maxStates,
      s"stationary: $nStates distinct states exceed maxStates=$maxStates " +
        "— the power iteration builds an s×s driver-side matrix; " +
        "coarsen the state column or raise maxStates")
    val cells = cellsDf
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    val s = states.length
    require(s >= 1, "no transitions")
    val idx = states.zipWithIndex.toMap
    val totals = new Array[Double](s)
    cells.foreach { case (f, _, c) => totals(idx(f)) += c }
    val p = Array.ofDim[Double](s, s)
    cells.foreach { case (f, t, c) =>
      p(idx(f))(idx(t)) = c.toDouble / totals(idx(f)) }
    for (i <- 0 until s if totals(i) == 0.0) p(i)(i) = 1.0 // absorbing
    var v = Array.fill(s)(1.0 / s)
    for (_ <- 1 to steps) {
      val u = Array.tabulate(s)(j =>
        (0 until s).map(i => v(i) * p(i)(j)).reduceLeft(_ + _))
      v = u.map(x => math.floor(x * 1e9 + 0.5) / 1e9)
    }
    import spark.implicits._
    states.zip(v).toSeq.toDF("state", "pi").orderBy("state")
  }

  /** Skip-gram transition counts: (from, to) pairs at every gap
    * 1..maxGap down each key's ordered timeline — the loosened
    * first-order matrix ("what happens within the next g events, and
    * how far ahead"), the substrate of co-occurrence statistics and
    * funnel-leak analysis where immediate-next is too strict.
    *
    * ONE window pass emits all maxGap leads per row (same per-key
    * sort reused for every gap — not maxGap passes), then one
    * groupBy over (from, to, gap). Null states are levels via the
    * struct-lead trick; rows past the end of a timeline emit nothing.
    * Output is bounded by states² · maxGap. Returns (from_state,
    * to_state, gap, cnt), exact integers. */
  def skipGram(
      df: DataFrame, keyCol: String, tsCol: String, stateCol: String,
      maxGap: Int, tieBreak: Seq[String] = Nil): DataFrame = {
    require(maxGap >= 1, "maxGap must be >= 1")
    val w = Window.partitionBy(keyCol)
      .orderBy((col(tsCol) +: tieBreak.map(col)): _*)
    val leads = (1 to maxGap).map { g =>
      lead(struct(col(stateCol).as("st")), g).over(w).as(s"__n$g") }
    val pairs = df
      .select(col(stateCol).as("from_state") +: leads: _*)
      .select(col("from_state"), explode(array((1 to maxGap).map { g =>
        struct(lit(g).as("gap"), col(s"__n$g").as("nxt")) }: _*)).as("e"))
      .where(col("e.nxt").isNotNull)
      .select(col("from_state"), col("e.nxt.st").as("to_state"),
        col("e.gap").as("gap"))
    pairs.groupBy("from_state", "to_state", "gap")
      .agg(count(lit(1)).as("cnt"))
  }
}
