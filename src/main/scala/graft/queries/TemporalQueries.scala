package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{AsofJoin, RangeJoin, Sessionize}
import graft.queries.QueryCatalog.eventsUs

/** Temporal operators over the `events` stream table: sessionization,
  * as-of join, bin-bucketed range join. The reference has no temporal
  * surface — these are pipeline-extension operators (SURVEY §2 ext).
  *
  * Every events load goes through [[QueryCatalog.eventsUs]], which
  * normalizes `ts` to an integer epoch-MICROSECONDS long regardless of
  * the parquet physical type (nanos-long legacy read or TIMESTAMP /
  * TIMESTAMP_NTZ) — the same integer DuckDB's epoch_us(ts) yields — so
  * boundary predicates agree exactly on both sides of every oracle.
  */
object TemporalQueries {

  private val HourUs = 3600L * 1000 * 1000

  /** Gap-based sessions: 8h inactivity splits a user's timeline. */
  val qSessionize = Q(
    "q65_sessionize",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          col("ts").as("tus"))
      Sessionize
        .sessionStats(ev, "user_id", "tus", 8 * HourUs, "value",
          tieBreak = Seq("event_id"))
        .orderBy("user_id", "session_id")
    },
    Some("""WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events),
      d AS (SELECT user_id, event_id, tus, value,
        CASE WHEN lag(tus) OVER w IS NULL
               OR tus - lag(tus) OVER w > 28800000000
             THEN 1 ELSE 0 END AS is_new
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      g AS (SELECT user_id, tus, value,
        CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM d)
      SELECT user_id, session_id, count(*) AS n_events,
        min(tus) AS t_start, max(tus) AS t_end,
        max(tus) - min(tus) AS duration,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM g GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  /** As-of join: each click matched to the user's latest prior-or-equal
    * purchase (union + carry-forward window — one shuffle, no join). */
  val qAsofJoin = Q(
    "q66_asof_join",
    (s, dir) => {
      val ev = eventsUs(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          col("ts").as("tus"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      AsofJoin
        .asof(clicks, purchases, "user_id", "p_user", "tus", "p_ts",
          rightCols = Seq("p_event_id", "p_ts", "p_value"),
          rightTieBreak = Some("p_event_id"))
        .select(col("event_id"), col("user_id"), col("tus"),
          col("p_event_id"), col("p_value"),
          (col("tus") - col("p_ts")).as("lag_us"))
        .orderBy("event_id")
    },
    Some("""WITH c AS (
        SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        WHERE event_type = 'click'),
      p AS (SELECT user_id, epoch_us(ts) AS pus, event_id AS p_event_id,
          value AS p_value FROM events WHERE event_type = 'purchase'),
      m AS (SELECT c.event_id, p.p_event_id, p.p_value,
          c.tus - p.pus AS lag_us,
          row_number() OVER (PARTITION BY c.event_id
            ORDER BY p.pus DESC, p.p_event_id DESC) AS rn
        FROM c JOIN p ON c.user_id = p.user_id AND p.pus <= c.tus)
      SELECT c.event_id, c.user_id, c.tus, m.p_event_id, m.p_value, m.lag_us
      FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        ON c.event_id = m.event_id
      ORDER BY c.event_id"""))

  /** FORWARD as-of join with tolerance: each click matched to the
    * user's next purchase within 48 h — the conversion-latency readout,
    * and the oracle row that puts [[AsofJoin.asof]]'s `forward` and
    * `tolerance` parameters (backward/unbounded is q66) on the
    * correctness gate. Same union + carry-forward plan, time-reversed. */
  val qAsofForward = Q(
    "q181_asof_forward",
    (s, dir) => {
      val ev = eventsUs(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          col("ts").as("tus"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      AsofJoin
        .asof(clicks, purchases, "user_id", "p_user", "tus", "p_ts",
          rightCols = Seq("p_event_id", "p_ts", "p_value"),
          rightTieBreak = Some("p_event_id"),
          tolerance = Some(172800000000L), forward = true)
        .select(col("event_id"), col("user_id"), col("tus"),
          col("p_event_id"), col("p_value"),
          (col("p_ts") - col("tus")).as("lead_us"))
        .orderBy("event_id")
    },
    Some("""WITH c AS (
        SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        WHERE event_type = 'click'),
      p AS (SELECT user_id, epoch_us(ts) AS pus, event_id AS p_event_id,
          value AS p_value FROM events WHERE event_type = 'purchase'),
      m AS (SELECT c.event_id, p.p_event_id, p.p_value,
          p.pus - c.tus AS lead_us,
          row_number() OVER (PARTITION BY c.event_id
            ORDER BY p.pus ASC, p.p_event_id ASC) AS rn
        FROM c JOIN p ON c.user_id = p.user_id AND p.pus >= c.tus
          AND p.pus - c.tus <= 172800000000)
      SELECT c.event_id, c.user_id, c.tus, m.p_event_id, m.p_value,
        m.lead_us
      FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        ON c.event_id = m.event_id
      ORDER BY c.event_id"""))

  /** Range join: events falling in the 2h window after each error event
    * (global intervals, no equi key — the bin-bucketed plan). */
  val qRangeJoin = Q(
    "q67_range_join",
    (s, dir) => {
      val ev = eventsUs(s, dir)
      val pts = ev.where(col("event_type") =!= "error")
        .select(col("ts").as("pt_ts"), col("value"))
      val ivs = ev.where(col("event_type") === "error")
        .select(col("event_id").as("iv_id"),
          col("ts").as("lo"),
          (col("ts") + lit(2 * HourUs)).as("hi"))
      RangeJoin.pointInInterval(pts, "pt_ts", ivs, "lo", "hi", 2 * HourUs)
        .groupBy("iv_id")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double")
            .as("sum_value"))
        .orderBy("iv_id")
    },
    Some("""WITH p AS (
        SELECT epoch_us(ts) AS tus, value FROM events
        WHERE event_type <> 'error'),
      i AS (SELECT event_id AS iv_id, epoch_us(ts) AS lo,
          epoch_us(ts) + 7200000000 AS hi FROM events
        WHERE event_type = 'error')
      SELECT i.iv_id, count(*) AS n_events,
        CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM i JOIN p ON p.tus >= i.lo AND p.tus <= i.hi
      GROUP BY i.iv_id ORDER BY i.iv_id"""))

  /** The SAME interval aggregation as q67 through [[graft.ops.RangeAgg
    * .intervalCountSum]] — distributed prefix sums, F(hi) − F(lo−1)
    * per interval, ZERO candidate-pair materialization (round-13
    * answer to q67's three-round stress saga: the bin-equi-join is
    * the right general-purpose PAIRS operator, but when the need is
    * an associative aggregate the sweep does the same work in one
    * bucket-hashed window pass, shrinking the CPU-saturating window
    * the stress flags kept catching). Shares q67's oracle — both
    * plans must produce identical rows. */
  val qRangeAggSweep = Q(
    "q367_range_agg_sweep",
    (s, dir) => {
      val ev = eventsUs(s, dir)
      val pts = ev.where(col("event_type") =!= "error")
        .select(col("ts").as("pt_ts"), col("value"))
      val ivs = ev.where(col("event_type") === "error")
        .select(col("event_id").as("iv_id"),
          col("ts").as("lo"),
          (col("ts") + lit(2 * HourUs)).as("hi"))
      graft.ops.RangeAgg.intervalCountSum(pts, "pt_ts", "value",
          ivs, "iv_id", "lo", "hi", 2 * HourUs)
        .select(col("iv_id"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy("iv_id")
    },
    Some("""WITH p AS (
        SELECT epoch_us(ts) AS tus, value FROM events
        WHERE event_type <> 'error'),
      i AS (SELECT event_id AS iv_id, epoch_us(ts) AS lo,
          epoch_us(ts) + 7200000000 AS hi FROM events
        WHERE event_type = 'error')
      SELECT i.iv_id, count(*) AS n_events,
        CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM i JOIN p ON p.tus >= i.lo AND p.tus <= i.hi
      GROUP BY i.iv_id ORDER BY i.iv_id"""))

  /** Funnel: first signup -> first click at-or-after it -> first purchase
    * at-or-after that, per user (chained running-min windows, one
    * shuffle). */
  val qFunnel = Q(
    "q68_funnel",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_type"),
          col("ts").as("tus"))
      graft.ops.Funnel
        .funnel(ev, "user_id", "tus", "event_type",
          steps = Seq("signup", "click", "purchase"))
        .orderBy("user_id")
    },
    Some("""WITH s1 AS (
        SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
        JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t1
        GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
        JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t2
        GROUP BY e.user_id)
      SELECT u.user_id, s1.t1, s2.t2, s3.t3,
        CAST(CASE WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END
           + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
           + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
          AS level
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN s1 USING (user_id)
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
      ORDER BY u.user_id"""))

  /** Trailing 1h per-user activity (RANGE-frame window, one shuffle). */
  val qRolling = Q(
    "q72_rolling_window",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          col("ts").as("tus"))
      graft.ops.Rolling
        .trailingStats(ev, "user_id", "tus", HourUs, "value")
        .select("event_id", "user_id", "tus", "n_trail", "sum_trail")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, tus,
        count(*) OVER w AS n_trail,
        CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
          AS sum_trail
      FROM (SELECT event_id, user_id, epoch_us(ts) AS tus, value
            FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY tus
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** First-order event-type transition matrix
    * ([[graft.ops.Transitions.matrix]]) over per-user timelines:
    * lead() under PARTITION BY user (never a global window), counts
    * row-normalized over the vocab-bounded pair table. Microsecond
    * domain + event_id tie-break per the header note. */
  val qTransitions = Q(
    "q89_transition_matrix",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts").as("tus"))
      graft.ops.Transitions
        .matrix(ev, "user_id", "tus", "event_type",
          tieBreak = Seq("event_id"))
        .orderBy("from_state", "to_state")
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus,
          event_id FROM events),
      p AS (SELECT event_type AS from_state,
          lead(event_type) OVER w AS to_state,
          lead(1) OVER w AS has_next
        FROM e WINDOW w AS (PARTITION BY user_id
          ORDER BY tus, event_id)),
      c AS (SELECT from_state, to_state, count(*) AS cnt FROM p
        WHERE has_next IS NOT NULL GROUP BY 1, 2)
      SELECT from_state, to_state, cnt,
        round(cnt / CAST(sum(cnt) OVER (PARTITION BY from_state)
          AS DOUBLE), 8) AS p
      FROM c ORDER BY from_state, to_state"""))

  /** Last-touch attribution ([[graft.ops.Funnel
    * .lastTouchAttribution]]): which event type immediately precedes a
    * purchase, per user history. Ordering ties break on event_id in
    * BOTH engines (ts is ns in Spark, µs in DuckDB — same order, but
    * only the id tiebreak makes equal-instant histories agree). */
  val qAttribution = Q(
    "q117_last_touch",
    (s, dir) =>
      graft.ops.Funnel.lastTouchAttribution(
          eventsUs(s, dir), "user_id", "ts", "event_id",
          "event_type", conversion = "purchase")
        .orderBy("touch"),
    Some("""WITH l AS (SELECT user_id, event_type,
          lag(event_type) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events)
      SELECT coalesce(prev, '(none)') AS touch, count(*) AS conversions
      FROM l WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY touch"""))

  /** Weekly cohort retention ([[graft.ops.Retention
    * .cohortRetention]]): users bucketed by first-activity week,
    * counted per week offset. Periods index by exact integer division
    * of the µs epoch (`div` / `//`) — no float boundary drift. */
  val qRetention = Q(
    "q119_cohort_retention",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("ts").as("tus"))
      graft.ops.Retention
        .cohortRetention(ev, "user_id", "tus", 604800000000L)
        .orderBy("cohort_period", "period_offset")
    },
    Some("""WITH uw AS (SELECT DISTINCT user_id AS u,
          epoch_us(ts) // 604800000000 AS wk FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      c AS (SELECT u, min(wk) AS cohort FROM uw GROUP BY u)
      SELECT cohort AS cohort_period, wk - cohort AS period_offset,
        count(*) AS n_users
      FROM uw JOIN c USING (u)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Hourly arrival-count autocorrelation ([[graft.ops.Timeseries
    * .countAcf]]): seasonality check at lags 1/3/6/12/24 over the
    * zero-filled hourly series — exact integer sufficient statistics,
    * one fixed IEEE Pearson fold. */
  val qCountAcf = Q(
    "q126_count_acf",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("ts").as("tus"))
      graft.ops.Timeseries.countAcf(
        ev, "tus", 3600000000L, Seq(1, 3, 6, 12, 24))
    },
    Some("""WITH b AS (SELECT epoch_us(ts) // 3600000000 AS t,
          count(*) AS c FROM events WHERE ts IS NOT NULL GROUP BY 1),
      mm AS (SELECT min(t) AS lo, max(t) AS hi FROM b),
      ax AS (SELECT unnest(generate_series(lo, hi)) AS t FROM mm),
      d AS (SELECT ax.t, coalesce(b.c, 0) AS c
            FROM ax LEFT JOIN b ON b.t = ax.t),
      ls AS (SELECT unnest([1, 3, 6, 12, 24]) AS lag),
      p AS (SELECT ls.lag, a.c AS x, b2.c AS y
            FROM ls CROSS JOIN d a
            JOIN d b2 ON b2.t = a.t + ls.lag),
      agg AS (SELECT lag, count(*) AS k, sum(x) AS sx, sum(y) AS sy,
              sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
            FROM p GROUP BY lag)
      SELECT CAST(lag AS BIGINT) AS lag, k AS n_pairs,
        CASE WHEN (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
          AND (CAST(k AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        THEN round((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / sqrt((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(k AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        END AS acf
      FROM agg ORDER BY lag"""))

  /** Kaplan-Meier user-lifetime curve ([[graft.ops.Retention
    * .kaplanMeier]]): per-user lifetime = last − first activity in
    * whole days; churn observed when the user's last event precedes
    * the stream's end by > 1 day, censored otherwise. Both engines
    * accumulate the survival product as exp(Σ ln) in duration order,
    * so the float sequence is identical; d = n_risk short-circuits to
    * exact 0. */
  val qKaplanMeier = Q(
    "q131_km_retention",
    (s, dir) => {
      val dayUs = 86400000000L
      val ev = eventsUs(s, dir)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id").as("u"), col("ts").as("tus"))
      val per = ev.groupBy("u")
        .agg(min(col("tus")).as("f"), max(col("tus")).as("l"))
      val glob = ev.agg(max(col("tus")).as("gm"))
      val rows = per.crossJoin(glob).select(
        expr(s"(l - f) div $dayUs").as("dur"),
        (col("l") < col("gm") - lit(dayUs)).as("obs"))
      graft.ops.Retention.kaplanMeier(rows, "dur", "obs")
    },
    Some("""WITH ev AS (SELECT user_id AS u, epoch_us(ts) AS tus
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      per AS (SELECT u, min(tus) AS f, max(tus) AS l
              FROM ev GROUP BY u),
      g AS (SELECT max(tus) AS gm FROM ev),
      rows_ AS (SELECT (l - f) // 86400000000 AS dur,
                  l < gm - 86400000000 AS obs FROM per, g),
      c AS (SELECT dur, count(*) AS cnt,
              count(CASE WHEN obs THEN 1 END) AS d
            FROM rows_ GROUP BY dur),
      tt AS (SELECT sum(cnt) AS total FROM c),
      r AS (SELECT dur, cnt, d,
              CAST(total - coalesce(sum(cnt) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS n_risk
            FROM c, tt),
      e AS (SELECT dur, n_risk, CAST(d AS BIGINT) AS d FROM r
            WHERE d > 0),
      sv AS (SELECT dur, n_risk, d,
              sum(CASE WHEN d < n_risk THEN ln(1.0
                - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) END)
                OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum
            FROM e)
      SELECT dur AS t, n_risk, d,
        CASE WHEN d = n_risk THEN 0.0 ELSE round(exp(cum), 6) END
          AS surv
      FROM sv ORDER BY t"""))

  /** Lead-lag cross-correlation ([[graft.ops.Timeseries
    * .crossCountCorr]]): hourly error arrivals vs purchase arrivals at
    * ±hour offsets — "does one stream lead the other". Integer counts
    * and decimal cross-moments as in q126. */
  val qXcorr = Q(
    "q134_xcorr",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("ts").as("tus"), col("event_type"))
      graft.ops.Timeseries.crossCountCorr(
        ev, "tus", 3600000000L,
        col("event_type") === "error", col("event_type") === "purchase",
        Seq(-12, -6, -3, -1, 0, 1, 3, 6, 12))
    },
    Some("""WITH b AS (SELECT epoch_us(ts) // 3600000000 AS t,
          count(CASE WHEN event_type = 'error' THEN 1 END) AS ca,
          count(CASE WHEN event_type = 'purchase' THEN 1 END) AS cb
        FROM events WHERE ts IS NOT NULL
          AND event_type IN ('error', 'purchase') GROUP BY 1),
      mm AS (SELECT min(t) AS lo, max(t) AS hi FROM b),
      ax AS (SELECT unnest(generate_series(lo, hi)) AS t FROM mm),
      d AS (SELECT ax.t, coalesce(b.ca, 0) AS ca, coalesce(b.cb, 0) AS cb
            FROM ax LEFT JOIN b ON b.t = ax.t),
      ls AS (SELECT unnest([-12, -6, -3, -1, 0, 1, 3, 6, 12]) AS lag),
      p AS (SELECT ls.lag, a.ca AS x, b2.cb AS y
            FROM ls CROSS JOIN d a
            JOIN d b2 ON b2.t = a.t + ls.lag),
      agg AS (SELECT lag, count(*) AS k, sum(x) AS sx, sum(y) AS sy,
              sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
            FROM p GROUP BY lag)
      SELECT CAST(lag AS BIGINT) AS lag, k AS n_pairs,
        CASE WHEN (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
          AND (CAST(k AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        THEN round((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / sqrt((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(k AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        END AS xcorr
      FROM agg ORDER BY lag"""))

  /** Top within-session event paths ([[graft.ops.Sessionize
    * .topPaths]]): most frequent 3-step consecutive event-type runs
    * inside 8h-gap sessions, deterministic (count desc, path) edge. */
  val qTopPaths = Q(
    "q135_top_paths",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("tus"))
      graft.ops.Sessionize.topPaths(
        ev, "user_id", "tus", "event_type", 8 * HourUs, 3, 25,
        tieBreak = Seq("event_id"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
          event_type FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IS NOT NULL),
      d AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
               OR tus - lag(tus) OVER w > 28800000000
             THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id
              ORDER BY tus, event_id)),
      g AS (SELECT user_id, tus, event_id, event_type,
              sum(is_new) OVER (PARTITION BY user_id
                ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sid
            FROM d),
      p AS (SELECT event_type || ' > ' || lead(event_type, 1) OVER w2
              || ' > ' || lead(event_type, 2) OVER w2 AS path
            FROM g WINDOW w2 AS (PARTITION BY user_id, sid
              ORDER BY tus, event_id))
      SELECT path, count(*) AS n FROM p WHERE path IS NOT NULL
      GROUP BY path ORDER BY n DESC, path LIMIT 25"""))

  /** Inter-arrival burstiness ([[graft.ops.Timeseries
    * .interarrivalStats]]): per-user consecutive gaps, one fused
    * corpus aggregate — decimal-exact mean/CV, interpolated
    * percentiles. */
  val qInterarrival = Q(
    "q138_interarrival",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_id"),
          col("ts").as("tus"))
      graft.ops.Timeseries.interarrivalStats(
        ev, "user_id", "tus", tieBreak = Seq("event_id"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      g0 AS (SELECT tus - lag(tus) OVER (PARTITION BY user_id
               ORDER BY tus, event_id) AS g FROM e),
      l AS (SELECT g FROM g0 WHERE g IS NOT NULL),
      s AS (SELECT count(*) AS n,
              sum(CAST(g AS DECIMAL(38,0))) AS sg,
              sum(CAST(g AS DECIMAL(38,0)) * g) AS sg2,
              quantile_cont(g, 0.5) AS p50,
              quantile_cont(g, 0.9) AS p90
            FROM l),
      d AS (SELECT CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
              CAST(sg AS DOUBLE) AS sgd, CAST(sg2 AS DOUBLE) AS sg2d,
              p50, p90 FROM s)
      SELECT n AS n_gaps, round(sgd / nd, 6) AS mean_gap,
        round(p50, 6) AS p50_gap, round(p90, 6) AS p90_gap,
        CASE WHEN n > 1 AND sgd / nd > 0.0
          THEN round(sqrt((sg2d - sgd * sgd / nd) / (nd - 1.0))
            / (sgd / nd), 6) END AS cv
      FROM d"""))

  /** Per-user TWAP ([[graft.ops.Timeseries.twap]]): time-weighted
    * value average with the weighted sum in decimal — exact at any
    * partition order. */
  val qTwap = Q(
    "q147_twap",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          col("ts").as("tus"))
      graft.ops.Timeseries.twap(
          ev, "user_id", "tus", "value", tieBreak = Seq("event_id"))
        .orderBy("user_id")
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
          value FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND value IS NOT NULL),
      l AS (SELECT user_id, tus, value,
              lead(tus) OVER (PARTITION BY user_id
                ORDER BY tus, event_id) AS nxt FROM e),
      g AS (SELECT user_id, count(*) AS n_obs,
              max(tus) - min(tus) AS span,
              sum(CAST(value AS DECIMAL(18,6)) * (nxt - tus)) AS ws
            FROM l GROUP BY user_id)
      SELECT user_id, n_obs, CAST(span AS BIGINT) AS span,
        CASE WHEN span > 0 THEN round(
          CAST(ws AS DOUBLE) / CAST(span AS DOUBLE), 6) END AS twap
      FROM g ORDER BY user_id"""))

  /** Linear multi-touch attribution ([[graft.ops.Funnel
    * .linearAttribution]]): purchase credit split equally across the
    * journey's touches — the counterweight to q117's last-touch. */
  val qLinearAttribution = Q(
    "q148_linear_attribution",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("tus"))
      graft.ops.Funnel.linearAttribution(
        ev, "user_id", "tus", "event_id", "event_type", "purchase")
    },
    Some("""WITH e AS (SELECT user_id AS k, event_id,
          epoch_us(ts) AS tus, event_type AS t FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IS NOT NULL),
      j AS (SELECT k, t, coalesce(
              sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END)
                OVER (PARTITION BY k ORDER BY tus, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS jid FROM e),
      tch AS (SELECT k, jid, t AS touch FROM j WHERE t <> 'purchase'),
      cv AS (SELECT k, jid FROM j WHERE t = 'purchase'),
      pt AS (SELECT tch.k, tch.jid, touch, count(*) AS ct
             FROM tch JOIN cv ON tch.k = cv.k AND tch.jid = cv.jid
             GROUP BY 1, 2, 3),
      cr AS (SELECT touch, sum(CAST(ct AS DOUBLE) / n) AS credit
             FROM (SELECT *, sum(ct) OVER (PARTITION BY k, jid) AS n
                   FROM pt)
             GROUP BY touch),
      emp AS (SELECT '(none)' AS touch, CAST(count(*) AS DOUBLE)
                AS credit
              FROM cv WHERE NOT EXISTS (SELECT 1 FROM tch
                WHERE tch.k = cv.k AND tch.jid = cv.jid))
      SELECT touch, round(credit, 6) AS credit
      FROM (SELECT * FROM cr
            UNION ALL SELECT * FROM emp WHERE credit > 0)
      ORDER BY touch"""))

  /** Time-decay multi-touch attribution ([[graft.ops.Funnel
    * .timeDecayAttribution]]): per-touch credit weighted by
    * 2^(−Δt / 7 days) to the conversion — recency-weighted journeys,
    * the middle ground between q117 last-touch and q148 linear. */
  val qTimeDecayAttribution = Q(
    "q178_time_decay_attribution",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("tus"))
      graft.ops.Funnel.timeDecayAttribution(
        ev, "user_id", "tus", "event_id", "event_type", "purchase",
        halfLifeUs = 604800000000L)
    },
    Some("""WITH e AS (SELECT user_id AS k, event_id,
          epoch_us(ts) AS tus, event_type AS t FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IS NOT NULL),
      j AS (SELECT k, t, tus, coalesce(
              sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END)
                OVER (PARTITION BY k ORDER BY tus, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS jid FROM e),
      tch AS (SELECT k, jid, t AS touch, tus AS tu FROM j
              WHERE t <> 'purchase'),
      cv AS (SELECT k, jid, tus AS tc FROM j WHERE t = 'purchase'),
      pw AS (SELECT tch.k, tch.jid, touch,
              pow(0.5, CAST(tc - tu AS DOUBLE)
                / (604800000000.0)::DOUBLE) AS w
             FROM tch JOIN cv ON tch.k = cv.k AND tch.jid = cv.jid),
      cr AS (SELECT touch, sum(w / sw) AS credit
             FROM (SELECT *, sum(w) OVER (PARTITION BY k, jid) AS sw
                   FROM pw)
             GROUP BY touch),
      emp AS (SELECT '(none)' AS touch, CAST(count(*) AS DOUBLE)
                AS credit
              FROM cv WHERE NOT EXISTS (SELECT 1 FROM tch
                WHERE tch.k = cv.k AND tch.jid = cv.jid))
      SELECT touch, round(credit, 6) AS credit
      FROM (SELECT * FROM cr
            UNION ALL SELECT * FROM emp WHERE credit > 0)
      ORDER BY touch"""))

  /** CUSUM changepoint ([[graft.ops.Timeseries.countChangepoint]]):
    * where the hourly arrival level shifts — identical cumulative
    * float sequence in both engines, so the argmax needs no
    * tolerance. */
  val qChangepoint = Q(
    "q149_changepoint",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("ts").as("tus"))
      graft.ops.Timeseries.countChangepoint(ev, "tus", 3600000000L)
    },
    Some("""WITH b AS (SELECT epoch_us(ts) // 3600000000 AS t,
          count(*) AS c FROM events WHERE ts IS NOT NULL GROUP BY 1),
      mm AS (SELECT min(t) AS lo, max(t) AS hi, sum(c) AS total FROM b),
      ax AS (SELECT unnest(generate_series(lo, hi)) AS t FROM mm),
      d AS (SELECT ax.t, coalesce(b.c, 0) AS c
            FROM ax LEFT JOIN b ON b.t = ax.t),
      m AS (SELECT CAST(total AS DOUBLE) / (hi - lo + 1) AS mean,
              hi - lo + 1 AS np FROM mm),
      sc AS (SELECT t, sum(CAST(c AS DOUBLE) - mean)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS s
             FROM d, m)
      SELECT t AS t_star, round(abs(s), 6) AS cusum_abs,
        round(mean, 6) AS mean, CAST(np AS BIGINT) AS n_periods
      FROM sc, m ORDER BY abs(s) DESC, t LIMIT 1"""))

  /** Mann-Kendall trend + Sen's slope ([[Timeseries.mannKendall]]) per
    * event type over its daily arrival counts — the nonparametric
    * drift test on a monitoring rollup. S and the tie terms are
    * integer-exact; z and the sen median are fixed IEEE folds over
    * exact sums, so 6-dp rounds are engine-stable. */
  val qMannKendall = Q(
    "q155_mann_kendall",
    (s, dir) => {
      val daily = eventsUs(s, dir)
        .where(col("ts").isNotNull)
        .select(col("event_type"),
          expr("ts div 86400000000").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
      graft.ops.Timeseries
        .mannKendall(daily, "event_type", "day", "cnt")
        .orderBy("event_type")
    },
    Some("""WITH d AS (SELECT event_type AS k,
          CAST(epoch_us(ts) // 86400000000 AS DOUBLE) AS t,
          CAST(count(*) AS DOUBLE) AS v
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      p AS (SELECT a.k, a.v AS va, b.v AS vb, a.t AS ta, b.t AS tb
            FROM d a JOIN d b ON a.k = b.k AND a.t < b.t),
      pa AS (SELECT k, CAST(sum(sign(vb - va)) AS BIGINT) AS s,
               round(quantile_cont((vb - va) / (tb - ta), 0.5), 6)
                 AS sen_slope
             FROM p GROUP BY k),
      tt AS (SELECT k, v, count(*) AS tj FROM d GROUP BY 1, 2),
      tk AS (SELECT k, CAST(sum(tj) AS BIGINT) AS n,
               CAST(sum(tj*(tj-1)*(2*tj+5)) AS BIGINT) AS tie_term
             FROM tt GROUP BY k),
      j AS (SELECT tk.k, n, coalesce(s, 0) AS s,
              CAST(n*(n-1)*(2*n+5) - tie_term AS DOUBLE) / 18.0 AS vs,
              sen_slope
            FROM tk LEFT JOIN pa USING (k))
      SELECT k AS event_type, n, s, round(vs, 6) AS var_s,
        CASE WHEN vs > 0.0 THEN round(CASE
          WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(vs)
          WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(vs)
          ELSE 0.0 END, 6) END AS z,
        sen_slope
      FROM j ORDER BY event_type"""))

  /** EWMA control chart ([[Timeseries.ewmaChart]]) over daily arrival
    * counts per event type: trailing-7-day forecast, deviation, and
    * Poisson-scale spike flag. The K weights interpolate from the SAME
    * Scala doubles into the SQL (no engine pow in either plan), each
    * weighted term quantizes to 9 dp and sums in DECIMAL — the
    * accumulation is order-exact on both sides. */
  val qEwmaChart = Q(
    "q159_ewma_chart",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("event_type"), col("ts").as("tus"))
      graft.ops.Timeseries.ewmaChart(
        ev, "event_type", "tus", 86400000000L,
        alpha = 0.3, window = 7, threshold = 3.0)
    },
    Some {
      val weights = (1 to 7).map(l =>
        0.3 * math.pow(0.7, (l - 1).toDouble))
      val wCase = weights.zipWithIndex.map { case (w, i) =>
        s"WHEN ${i + 1} THEN ($w)::DOUBLE" }.mkString(" ")
      s"""WITH b AS (SELECT event_type AS k,
            epoch_us(ts) // 86400000000 AS t, count(*) AS c
          FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        mm AS (SELECT min(t) AS lo, max(t) AS hi FROM b),
        ax AS (SELECT unnest(generate_series(lo, hi)) AS t FROM mm),
        ks AS (SELECT DISTINCT k FROM b),
        dense AS (SELECT ks.k, ax.t, coalesce(b.c, 0) AS c
          FROM ks CROSS JOIN ax
          LEFT JOIN b ON b.k = ks.k AND b.t = ax.t),
        lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
        contrib AS (SELECT d.k, d.t + lag AS t,
            CASE lag $wCase END AS w, d.c AS cj
          FROM dense d CROSS JOIN lags),
        agg AS (SELECT k, t,
            sum(CAST(round(w * cj, 9) AS DECIMAL(38,9))) AS num,
            sum(CAST(round(w, 9) AS DECIMAL(38,9))) AS den
          FROM contrib WHERE t <= (SELECT hi FROM mm) GROUP BY 1, 2),
        j AS (SELECT dense.k, dense.t, dense.c,
            CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS raw,
            den IS NOT NULL AND den > 0 AS hist
          FROM dense LEFT JOIN agg ON agg.k = dense.k AND agg.t = dense.t)
        SELECT k AS event_type, t, c AS cnt,
          CASE WHEN hist THEN round(raw, 6) END AS ewma,
          CASE WHEN hist THEN round(c - raw, 6) END AS dev,
          CASE WHEN hist
            THEN abs(c - raw) > (3.0)::DOUBLE * sqrt(raw) END AS is_spike
        FROM j ORDER BY event_type, t"""
    })

  /** SCD2 history build ([[graft.ops.Delta.scd2]]): each user's
    * event-type timeline compacted into effective-dated state runs —
    * (state, effective_from, effective_to] ranges with the open run's
    * effective_to null. The oracle mirrors the struct-lag change flag
    * with an explicit first-row case so a null state is a level, not
    * an end-of-sequence marker. */
  val qScd2 = Q(
    "q162_scd2_history",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("tus"))
      graft.ops.Delta.scd2(ev, "user_id", "tus", "event_type",
          tieBreak = Seq("event_id"))
        .orderBy("user_id", "effective_from")
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
          event_type FROM events),
      m AS (SELECT user_id, tus, event_id, event_type,
          CASE WHEN row_number() OVER w = 1 THEN 1
               WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
                 THEN 0
               ELSE 1 END AS chg
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      r AS (SELECT user_id, tus, event_type,
          sum(chg) OVER (PARTITION BY user_id ORDER BY tus, event_id
            ROWS UNBOUNDED PRECEDING) AS run
        FROM m),
      g AS (SELECT user_id, run, event_type AS state,
          min(tus) AS effective_from, count(*) AS n_events
        FROM r GROUP BY 1, 2, 3)
      SELECT user_id, state, effective_from,
        lead(effective_from) OVER
          (PARTITION BY user_id ORDER BY run) AS effective_to,
        n_events
      FROM g ORDER BY user_id, effective_from"""))

  /** Weekly seasonal profile ([[Timeseries.seasonalProfile]]): event
    * arrivals per (iso-dow, hour) bucket with share/lift/Poisson-z and
    * spike flags — all 168 buckets densified, bucket coordinates pure
    * integer arithmetic on epoch-us so both engines agree exactly. */
  val qSeasonal = Q(
    "q164_seasonal_profile",
    (s, dir) => graft.ops.Timeseries.seasonalProfile(
        eventsUs(s, dir).select(col("ts").as("tus")),
        "tus")
      .orderBy("isodow", "hour"),
    Some("""WITH e AS (SELECT epoch_us(ts) AS tus FROM events
          WHERE ts IS NOT NULL),
      c AS (SELECT CAST((tus // 86400000000 + 3) % 7 + 1 AS INT)
              AS isodow,
            CAST((tus % 86400000000) // 3600000000 AS INT) AS hour,
            count(*) AS n
          FROM e GROUP BY 1, 2),
      ax AS (SELECT CAST(i // 24 + 1 AS INT) AS isodow,
               CAST(i % 24 AS INT) AS hour FROM range(168) t(i)),
      t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c),
      d AS (SELECT ax.isodow, ax.hour, coalesce(c.n, 0) AS n, tot
            FROM ax LEFT JOIN c ON c.isodow = ax.isodow
              AND c.hour = ax.hour CROSS JOIN t),
      z AS (SELECT isodow, hour, n,
          round(CAST(n AS DOUBLE) / tot, 6) AS share,
          round(CAST(n AS DOUBLE) * 168.0 / tot, 6) AS lift,
          CASE WHEN tot / 168.0 > 0 THEN
            round((CAST(n AS DOUBLE) - tot / 168.0)
              / sqrt(tot / 168.0), 6) END AS z
        FROM d)
      SELECT isodow, hour, n, share, lift, z,
        coalesce(z > 3.0, false) AS spike
      FROM z ORDER BY isodow, hour"""))

  /** Nelson-Aalen cumulative hazard ([[graft.ops.Retention
    * .nelsonAalen]]) over the same per-user (tenure-days, churned)
    * rows as q131's KM curve: H(t) = Σ d/n_risk in duration order —
    * the churn-intensity readout; one groupBy(duration) shuffle,
    * prefix sums on the bounded grid. */
  val qNelsonAalen = Q(
    "q168_nelson_aalen",
    (s, dir) => {
      val dayUs = 86400000000L
      val ev = eventsUs(s, dir)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id").as("u"), col("ts").as("tus"))
      val per = ev.groupBy("u")
        .agg(min(col("tus")).as("f"), max(col("tus")).as("l"))
      val glob = ev.agg(max(col("tus")).as("gm"))
      val rows = per.crossJoin(glob).select(
        expr(s"(l - f) div $dayUs").as("dur"),
        (col("l") < col("gm") - lit(dayUs)).as("obs"))
      graft.ops.Retention.nelsonAalen(rows, "dur", "obs")
    },
    Some("""WITH ev AS (SELECT user_id AS u, epoch_us(ts) AS tus
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      per AS (SELECT u, min(tus) AS f, max(tus) AS l
              FROM ev GROUP BY u),
      g AS (SELECT max(tus) AS gm FROM ev),
      rows_ AS (SELECT (l - f) // 86400000000 AS dur,
                  l < gm - 86400000000 AS obs FROM per, g),
      c AS (SELECT dur, count(*) AS cnt,
              count(CASE WHEN obs THEN 1 END) AS d
            FROM rows_ GROUP BY dur),
      tt AS (SELECT sum(cnt) AS total FROM c),
      r AS (SELECT dur, cnt, d,
              CAST(total - coalesce(sum(cnt) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS n_risk
            FROM c, tt),
      e AS (SELECT dur, n_risk, CAST(d AS BIGINT) AS d FROM r
            WHERE d > 0),
      sv AS (SELECT dur, n_risk, d,
              sum(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum
            FROM e)
      SELECT dur AS t, n_risk, d, round(cum, 6) AS cumhaz
      FROM sv ORDER BY t"""))

  /** Point-in-time SCD2 lookup ([[graft.ops.Delta.stateAsOf]]): every
    * user's active event-type run as of 2024-01-16T00:00:00Z —
    * reconstructing past state from the compacted history rather than
    * replaying the raw timeline. */
  val qStateAsOf = Q(
    "q169_state_asof",
    (s, dir) => {
      val at = 1705363200000000L // 2024-01-16T00:00:00Z epoch-us
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("tus"))
      graft.ops.Delta.stateAsOf(ev, "user_id", "tus", "event_type",
          tieBreak = Seq("event_id"), at = at)
        .orderBy("user_id")
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
          event_type FROM events),
      m AS (SELECT user_id, tus, event_id, event_type,
          CASE WHEN row_number() OVER w = 1 THEN 1
               WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
                 THEN 0
               ELSE 1 END AS chg
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      r AS (SELECT user_id, tus, event_type,
          sum(chg) OVER (PARTITION BY user_id ORDER BY tus, event_id
            ROWS UNBOUNDED PRECEDING) AS run
        FROM m),
      g AS (SELECT user_id, run, event_type AS state,
          min(tus) AS effective_from, count(*) AS n_events
        FROM r GROUP BY 1, 2, 3),
      h AS (SELECT user_id, state, effective_from,
          lead(effective_from) OVER
            (PARTITION BY user_id ORDER BY run) AS effective_to,
          n_events
        FROM g)
      SELECT user_id, state, effective_from, n_events
      FROM h
      WHERE effective_from <= 1705363200000000
        AND (effective_to IS NULL OR effective_to > 1705363200000000)
      ORDER BY user_id"""))

  /** Behavioral-diversity histogram ([[graft.ops.Diversity
    * .keyEntropyHistogram]]): per-user Shannon entropy of the
    * event-type mix, bucketed into 0.25-nat bins — "how many users do
    * one thing vs sample everything". Exact integer bucket counts;
    * the entropy expression is IEEE-identical on both engines. */
  val qUserEntropy = Q(
    "q171_user_entropy",
    (s, dir) => graft.ops.Diversity.keyEntropyHistogram(
      QueryCatalog.table(s, dir, "events"), "user_id", "event_type"),
    Some("""WITH e AS (SELECT user_id, event_type FROM events
          WHERE user_id IS NOT NULL),
      c AS (SELECT user_id, event_type, count(*) AS c
            FROM e GROUP BY 1, 2),
      p AS (SELECT user_id, sum(c) AS n,
          sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
        FROM c GROUP BY user_id),
      h AS (SELECT CAST(least(greatest(floor((ln(CAST(n AS DOUBLE))
          - clnc / CAST(n AS DOUBLE)) / (0.25)::DOUBLE),
          (0)::DOUBLE), (11)::DOUBLE) AS INT) AS bin
        FROM p)
      SELECT bin, bin * (0.25)::DOUBLE AS lo,
        (bin + 1) * (0.25)::DOUBLE AS hi, count(*) AS n_keys
      FROM h GROUP BY bin ORDER BY bin"""))

  /** Skip-gram transitions ([[graft.ops.Transitions.skipGram]]):
    * (from, to) event-type pairs at gaps 1-3 down each user's
    * timeline — one window pass emits all three leads, counts exact. */
  val qSkipGram = Q(
    "q172_skipgram",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts").as("tus"))
      graft.ops.Transitions
        .skipGram(ev, "user_id", "tus", "event_type", maxGap = 3,
          tieBreak = Seq("event_id"))
        .orderBy("from_state", "to_state", "gap")
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus,
          event_id FROM events),
      p AS (
        SELECT event_type AS from_state,
          lead(event_type, 1) OVER w1 AS to_state, 1 AS gap,
          lead(1, 1) OVER w1 AS hn
        FROM e WINDOW w1 AS (PARTITION BY user_id ORDER BY tus, event_id)
        UNION ALL
        SELECT event_type, lead(event_type, 2) OVER w2, 2,
          lead(1, 2) OVER w2
        FROM e WINDOW w2 AS (PARTITION BY user_id ORDER BY tus, event_id)
        UNION ALL
        SELECT event_type, lead(event_type, 3) OVER w3, 3,
          lead(1, 3) OVER w3
        FROM e WINDOW w3 AS (PARTITION BY user_id ORDER BY tus, event_id)),
      c AS (SELECT from_state, to_state, gap, count(*) AS cnt FROM p
        WHERE hn IS NOT NULL GROUP BY 1, 2, 3)
      SELECT from_state, to_state, CAST(gap AS INT) AS gap, cnt
      FROM c ORDER BY from_state, to_state, gap"""))

  /** STREAMING sessionization on the correctness gate: drives a bounded
    * slice of `events` (user_id < 30) through a real Structured
    * Streaming query — MemoryStream source → `session_window` streaming
    * aggregation with a watermark → Append-mode memory sink — and
    * returns the FINAL emitted session table, which the oracle
    * recomputes as a batch gap-sessionization in DuckDB. This puts
    * streaming *answers* (not just throughput) on the same three-way
    * row/schema/hash gate as the batch operators.
    *
    * Protocol: all real rows arrive in one batch (so in-file disorder
    * cannot be dropped as late — the watermark only advances between
    * batches), then two far-future sentinel batches on a sentinel key
    * (user_id = -1) push the watermark past every real session's end so
    * Append mode emits them all; the sentinel's own sessions are
    * filtered out of the result. Boundary semantics are session_window's
    * (split at gap >= 8h — strictly-before extends), which the oracle's
    * `>=` lag predicate mirrors exactly in the shared epoch-micros
    * integer domain. */
  val qStreamingSessionize = Q(
    "q182_streaming_sessionize",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      // bounded slice: 30 of the generator's users (~2k rows at sf0.01)
      val slice = eventsUs(s, dir)
        .where(col("user_id") < 30)
        .select(col("user_id"), col("ts"), col("value"))
        .as[(Long, Long, Double)].collect()
      val maxTs = slice.iterator.map(_._2).max
      val mem = MemoryStream[(Long, Long, Double)]
      val src = mem.toDF.toDF("user_id", "tus", "value")
        .select(col("user_id"),
          timestamp_micros(col("tus")).as("ts"),
          col("value").cast(DecimalType(18, 6)).as("v"))
      val sessions = graft.streaming.StreamingSessionize
        .sessionStats(src, "user_id", "ts", "8 hours", "v")
      val sink = "graft_ssess_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-ssess-gate").toString
      val query = sessions.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(slice.toIndexedSeq)
        query.processAllAvailable()
        // two sentinel batches: watermark updates at END of a batch, so
        // emission of sessions closed by sentinel #1's watermark happens
        // while processing sentinel #2
        mem.addData((-1L, maxTs + 40L * 24 * HourUs, 0.0))
        query.processAllAvailable()
        mem.addData((-1L, maxTs + 80L * 24 * HourUs, 0.0))
        query.processAllAvailable()
      } finally query.stop()
      StreamGate.finish(s, sink, ckpt, s.table(sink)
        .where(col("user_id") >= 0)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("session_start_us"),
          unix_micros(col("session_end")).as("session_end_us"),
          col("n_events"),
          col("sum_value").cast("double").as("sum_value")))
        .orderBy("user_id", "session_start_us")
    },
    Some("""WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, value FROM events
        WHERE user_id < 30),
      d AS (SELECT user_id, tus, value,
        CASE WHEN lag(tus) OVER w IS NULL
               OR tus - lag(tus) OVER w >= 28800000000
             THEN 1 ELSE 0 END AS is_new
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
      g AS (SELECT user_id, tus, value,
        sum(is_new) OVER (PARTITION BY user_id ORDER BY tus
          ROWS UNBOUNDED PRECEDING) AS sid
        FROM d)
      SELECT user_id,
        min(tus) AS session_start_us,
        max(tus) + 28800000000 AS session_end_us,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM g GROUP BY user_id, sid
      ORDER BY user_id, session_start_us"""))

  /** STREAMING Misra-Gries heavy hitters on the correctness gate, in
    * the summary's EXACT regime: a bounded `events` slice's event_type
    * stream flows through the real `flatMapGroupsWithState` operator
    * (s06's) in three micro-batches; with far fewer distinct keys than
    * `capacity`, no decrement ever fires, so every MG counter equals
    * the exact count and the final snapshot is hash-checkable against a
    * plain DuckDB GROUP BY. Update-mode snapshots re-emit a bucket's
    * table each batch, and counters are monotone in the exact regime,
    * so max(est) per key is the final count; buckets are collapsed
    * because the bucket id (a Spark xxhash64 partition) is
    * engine-specific while each key lives in exactly one bucket. */
  val qStreamingHeavyHitters = Q(
    "q186_streaming_heavy_hitters",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val keys = QueryCatalog.table(s, dir, "events")
        .where(col("user_id") < 50 && col("event_type").isNotNull)
        .select(col("event_type")).as[String].collect()
      val mem = MemoryStream[String]
      val hh = graft.streaming.StreamingHeavyHitters.heavyHitters(
        mem.toDF.toDF("k"), "k", capacity = 64, buckets = 8)
      val sink = "graft_shh_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-shh-gate").toString
      val query = hh.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .start()
      try {
        val chunk = math.max(1, (keys.length + 2) / 3)
        keys.grouped(chunk).foreach { batch =>
          mem.addData(batch.toIndexedSeq)
          query.processAllAvailable()
        }
      } finally query.stop()
      StreamGate.finish(s, sink, ckpt, s.table(sink))
        .groupBy(col("key"))
        .agg(max(col("est")).as("cnt"))
        .orderBy("key")
    },
    Some("""SELECT event_type AS key, count(*) AS cnt
      FROM events
      WHERE user_id < 50 AND event_type IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** Daily active/new/returning decomposition
    * ([[graft.ops.Retention.dailyActivity]]): per UTC day, total
    * events, distinct active users, first-ever-seen users, and the
    * returning remainder — the DAU rollup a product dashboard leads
    * with. Exact integer day bucketing; three hash shuffles, no
    * windows. */
  val qDailyActivity = Q(
    "q187_daily_activity",
    (s, dir) =>
      graft.ops.Retention.dailyActivity(
          eventsUs(s, dir), "user_id", "ts", 86400000000L)
        .orderBy("day"),
    Some("""WITH e AS (SELECT user_id,
          epoch_us(ts) // 86400000000 AS day
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY 1),
      d AS (SELECT day, user_id, count(*) AS n_ev FROM e GROUP BY 1, 2)
      SELECT day,
        CAST(sum(n_ev) AS BIGINT) AS n_events,
        count(*) AS active_users,
        CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
          AS new_users,
        count(*) - CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
          AS BIGINT) AS returning_users
      FROM d JOIN f USING (user_id)
      GROUP BY day ORDER BY day"""))

  /** M4 per-hour downsampling of the event value series
    * ([[graft.ops.Timeseries.m4Downsample]]): first/last/min/max value
    * per hour bucket — the pixel-exact line-chart reduction (Jugel et
    * al. VLDB'14). All four outputs are selections, never arithmetic,
    * so the hash comparison is bit-exact with no rounding. */
  val qM4Downsample = Q(
    "q193_m4_downsample",
    (s, dir) =>
      graft.ops.Timeseries.m4Downsample(
          eventsUs(s, dir), "ts", "value", "event_id", HourUs)
        .orderBy("bucket"),
    Some("""WITH e AS (SELECT epoch_us(ts) // 3600000000 AS bucket,
          value, epoch_us(ts) AS tus, event_id
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      f AS (SELECT bucket, value,
          row_number() OVER (PARTITION BY bucket
            ORDER BY tus, event_id) AS rn_a,
          row_number() OVER (PARTITION BY bucket
            ORDER BY tus DESC, event_id DESC) AS rn_d
        FROM e)
      SELECT bucket, count(*) AS n,
        min(value) AS v_min, max(value) AS v_max,
        max(CASE WHEN rn_a = 1 THEN value END) AS v_first,
        max(CASE WHEN rn_d = 1 THEN value END) AS v_last
      FROM f GROUP BY bucket ORDER BY bucket"""))

  /** STREAMING running totals on the correctness gate — Spark 4's
    * `transformWithState` (arbitrary-state v2, RocksDB state store)
    * driving per-key live counters over three micro-batches
    * ([[graft.streaming.StreamingRunningTotals]]). Values are
    * pre-quantized with floor(v·1e6 + 0.5) so the processor's
    * sequential double accumulation is integer-exact and
    * order-independent; the final snapshot per key (max_by on the
    * monotone count) must equal a plain GROUP BY over the same slice,
    * de-quantized at 6 dp. */
  val qStreamingRunningTotals = Q(
    "q199_streaming_running_totals",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val rows = QueryCatalog.table(s, dir, "events")
        .where(col("user_id") < 40 && col("event_type").isNotNull &&
          col("value").isNotNull)
        .select(col("event_type"),
          floor(col("value") * 1e6 + 0.5).cast("double"))
        .as[(String, Double)].collect()
      val prev = s.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val mem = MemoryStream[(String, Double)]
        val out = graft.streaming.StreamingRunningTotals.runningTotals(
          mem.toDF.toDF("k", "v"), "k", "v")
        val sink = "graft_srt_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-srt-gate").toString
        val query = out.writeStream.format("memory").queryName(sink)
          .option("checkpointLocation", ckpt)
          .outputMode("update").start()
        try {
          val chunk = math.max(1, (rows.length + 2) / 3)
          rows.grouped(chunk).foreach { batch =>
            mem.addData(batch.toIndexedSeq)
            query.processAllAvailable()
          }
        } finally query.stop()
        StreamGate.finish(s, sink, ckpt, s.table(sink))
          .groupBy(col("key"))
          .agg(max(col("n")).as("n_events"),
            round(expr("max_by(sum, n)") / 1e6, 6).as("sum_value"))
          .orderBy("key")
      } finally prev match {
        case Some(v) => s.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => s.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    },
    Some("""SELECT event_type AS key,
        count(*) AS n_events,
        round(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) / 1e6, 6)
          AS sum_value
      FROM events
      WHERE user_id < 40 AND event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** STREAMING stream–static enrichment on the correctness gate
    * ([[graft.streaming.StreamingEnrich.enrichedWindowStats]]): a
    * bounded events slice flows through a real MemoryStream, is
    * inner-joined per micro-batch to the STATIC customer dimension
    * (broadcast, stateless — the enrichment join holds no state, only
    * the windowed aggregation does), and aggregates per (UTC day,
    * market segment). The q182 watermark-flush protocol applies: all
    * real rows in one batch, then two far-future sentinel batches
    * advance the watermark so Append mode emits every window. The
    * sentinel key (-1) has no dimension row, so the join drops it
    * before the aggregation — but the watermark operator sits
    * UPSTREAM of the join, so the sentinel still advances event time:
    * the protocol works precisely because watermark tracking is
    * per-source, not per-surviving-row. Oracle = the same join + day
    * bucketing in DuckDB batch SQL. */
  val qStreamingEnrich = Q(
    "q209_streaming_enrich",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val slice = eventsUs(s, dir)
        .where(col("user_id") < 30)
        .select(col("user_id"), col("ts"), col("value"))
        .as[(Long, Long, Double)].collect()
      val maxTs = slice.iterator.map(_._2).max
      val mem = MemoryStream[(Long, Long, Double)]
      val src = mem.toDF.toDF("user_id", "tus", "value")
        .select(col("user_id"),
          timestamp_micros(col("tus")).as("ts"), col("value"))
      val dim = QueryCatalog.table(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val enriched = graft.streaming.StreamingEnrich.enrichedWindowStats(
        src, dim, "user_id", "ts", "value", "c_mktsegment",
        windowDuration = "1 day", watermark = "0 seconds")
      val sink = "graft_senr_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-senr-gate").toString
      val query = enriched.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(slice.toIndexedSeq)
        query.processAllAvailable()
        mem.addData((-1L, maxTs + 40L * 24 * HourUs, 0.0))
        query.processAllAvailable()
        mem.addData((-1L, maxTs + 80L * 24 * HourUs, 0.0))
        query.processAllAvailable()
      } finally query.stop()
      StreamGate.finish(s, sink, ckpt, s.table(sink)
        .select(unix_micros(col("window.start")).as("day_start_us"),
          col("attr").as("segment"),
          col("n_events"),
          col("sum_value").cast("double").as("sum_value")))
        .orderBy("day_start_us", "segment")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, value
        FROM events WHERE user_id < 30),
      j AS (SELECT (e.tus // 86400000000) * 86400000000 AS day_start_us,
          c.c_mktsegment AS segment, e.value
        FROM e JOIN customer c ON c.c_custkey = e.user_id)
      SELECT day_start_us, segment, count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM j GROUP BY 1, 2 ORDER BY day_start_us, segment"""))

  /** STREAMING TTL-dedup on the correctness gate
    * ([[graft.streaming.StreamingDedup.dedupByFingerprintEventTime]]):
    * the documents corpus flows through the real
    * flatMapGroupsWithState first-seen dedup in three event-time-
    * ordered micro-batches (synthetic event time = doc_id seconds, TTL
    * far beyond the stream so no state expires), and the emitted
    * first-seen set must equal the batch DISTINCT of the same portable
    * md5 fingerprint (q31's) in DuckDB. Emission is immediate in
    * flatMapGroupsWithState Append mode, so no watermark-flush
    * sentinels are needed; cross-batch suppression is exactly the
    * state the oracle's DISTINCT checks. Payloads are not emitted —
    * when duplicate fingerprints share a batch the surviving payload
    * depends on shuffle order, so the DETERMINISTIC surface is the key
    * set, and that is what the gate pins. */
  val qStreamingDedup = Q(
    "q214_streaming_dedup",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docs = QueryCatalog.table(s, dir, "documents")
        .where(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      val mem = MemoryStream[(Long, String)]
      // synthetic event time must start ABOVE epoch 0: the initial
      // watermark is 0 and the stateful operator's late filter drops a
      // row AT the watermark, which would silently eat doc_id = 0
      val src = mem.toDF.toDF("doc_id", "text")
        .select(col("text"),
          timestamp_micros((col("doc_id") + 1) * 1000000L).as("ts"))
      val deduped = graft.streaming.StreamingDedup
        .dedupByFingerprintEventTime(
          src, "text", "ts", ttlMs = Long.MaxValue / 4)
      val sink = "graft_sdd_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sdd-gate").toString
      val query = deduped.toDF.writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        val third = (docs.length + 2) / 3
        docs.grouped(math.max(1, third)).foreach { chunk =>
          mem.addData(chunk.toIndexedSeq)
          query.processAllAvailable()
        }
      } finally query.stop()
      StreamGate.finish(s, sink, ckpt, s.table(sink))
        .select(col("fingerprint")).distinct()
        .orderBy("fingerprint")
    },
    Some("""SELECT DISTINCT
        ('0x'||substr(md5('0:'||trim(regexp_replace(lower(text),
          '\s+', ' ', 'g'))),1,15))::BIGINT AS fingerprint
      FROM documents WHERE text IS NOT NULL
      ORDER BY fingerprint"""))

  /** The NAIVE point-in-interval join, healed by the optimizer
    * ([[graft.plans.RangeJoinBinRule]]): the query declares the plain
    * `t BETWEEN lo AND hi` inner join — the shape Spark would plan as
    * BroadcastNestedLoopJoin — and the injected rule rewrites it into
    * the binned equi-join (bin = the 2 h interval length), which the
    * oracle checks for exact row parity against DuckDB's own range
    * join. q67 runs the same class of join through the MANUAL
    * [[graft.ops.RangeJoin]] operator; this row proves a user needs
    * neither to know nor to call it. The bin-size conf stays set for
    * the session — every other join in the catalog either carries an
    * equality key or pre-binned state, so the rule stands down
    * everywhere else by construction (RangeJoinBinRuleSpec pins
    * that). */
  val qRangeJoinRule = Q(
    "q215_range_join_rule",
    (s, dir) => {
      graft.plans.RangeJoinBinRule.register(s)
      s.conf.set(graft.plans.RangeJoinBinRule.BinSizeKey,
        (2 * HourUs).toString)
      val ev = eventsUs(s, dir)
      val pts = ev.where(col("event_type") === "click")
        .select(col("ts").as("t"), col("value"))
      val ivs = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("iv_id"),
          (col("ts") - lit(HourUs)).as("lo"),
          (col("ts") + lit(HourUs)).as("hi"))
      pts.join(ivs, col("t") >= col("lo") && col("t") <= col("hi"))
        .groupBy("iv_id")
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double")
            .as("sum_value"))
        .orderBy("iv_id")
    },
    Some("""WITH p AS (SELECT epoch_us(ts) AS t, value FROM events
        WHERE event_type = 'click'),
      i AS (SELECT event_id AS iv_id,
          epoch_us(ts) - 3600000000 AS lo,
          epoch_us(ts) + 3600000000 AS hi FROM events
        WHERE event_type = 'purchase')
      SELECT i.iv_id, count(*) AS n_clicks,
        CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM i JOIN p ON p.t >= i.lo AND p.t <= i.hi
      GROUP BY i.iv_id ORDER BY i.iv_id"""))

  /** Cohort lifetime-value curves ([[graft.ops.Retention.cohortLtv]]):
    * weekly cohorts by first activity of ANY type, revenue from
    * purchase events only, decimal-exact cumulative per-user LTV over
    * the cohort's bounded age grid. */
  val qCohortLtv = Q(
    "q217_cohort_ltv",
    (s, dir) => graft.ops.Retention.cohortLtv(
      eventsUs(s, dir), "user_id", "ts", "value",
      col("event_type") === "purchase", period = 7 * 24 * HourUs),
    Some("""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS tus,
          value, event_type FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      p AS (SELECT u, tus // 604800000000 AS per, value, event_type
        FROM e),
      c AS (SELECT u, min(per) AS cohort FROM p GROUP BY u),
      s AS (SELECT cohort, count(DISTINCT u) AS n_users FROM c
        GROUP BY 1),
      cells AS (SELECT c.cohort, p.per - c.cohort AS age,
          sum(CAST(p.value AS DECIMAL(18,6))) AS rev
        FROM p JOIN c USING (u)
        WHERE p.event_type = 'purchase' GROUP BY 1, 2),
      w AS (SELECT cohort, age, rev,
          sum(rev) OVER (PARTITION BY cohort ORDER BY age
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM cells)
      SELECT w.cohort AS cohort_period,
        CAST(w.age AS BIGINT) AS period_offset, s.n_users,
        CAST(rev AS DOUBLE) AS rev, CAST(cum AS DOUBLE) AS cum_rev,
        round(CAST(cum AS DOUBLE) / s.n_users, 6) AS ltv_per_user
      FROM w JOIN s USING (cohort)
      ORDER BY cohort_period, period_offset"""))

  /** Rolling 7-day distinct actives (WAU by day,
    * [[graft.ops.Timeseries.rollingDistinct]]): the exact
    * distinct-over-sliding-window Spark's frames cannot express,
    * via the bounded calendar fanout + per-period distinct count. */
  val qRollingDistinct = Q(
    "q220_rolling_wau",
    (s, dir) => graft.ops.Timeseries.rollingDistinct(
      eventsUs(s, dir), "user_id", "ts",
      periodUs = 24 * HourUs, span = 7),
    Some("""WITH a AS (SELECT DISTINCT user_id AS k,
          epoch_us(ts) // 86400000000 AS p
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      f AS (SELECT k, unnest(range(p, p + 7)) AS period FROM a),
      o AS (SELECT DISTINCT p AS period FROM a)
      SELECT f.period, count(DISTINCT f.k) AS n_active
      FROM f JOIN o USING (period)
      GROUP BY 1 ORDER BY 1"""))

  /** Log-rank test ([[graft.ops.Retention.logRank]]): tenure-days
    * survival comparison between even and odd user cohorts, death =
    * the user ever erroring, over the bounded duration grid with
    * quantized hypergeometric E/V terms. */
  val qLogRank = Q(
    "q223_logrank",
    (s, dir) => {
      val subj = eventsUs(s, dir)
        .where(col("user_id").isNotNull)
        .groupBy("user_id")
        .agg(
          ((max(col("ts")) - min(col("ts"))).cast("long") /
            lit(24 * HourUs)).cast("long").as("dur"),
          (count(when(col("event_type") === "error", 1)) > 0)
            .as("observed"))
      graft.ops.Retention.logRank(subj, "dur", "observed",
        col("user_id") % 2 === 0)
    },
    Some("""WITH subj AS (SELECT user_id,
          CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 86400000000
            AS BIGINT) AS dur,
          count(*) FILTER (event_type = 'error') > 0 AS observed,
          user_id % 2 = 0 AS grp_a
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      c AS (SELECT dur AS t, count(*) AS cnt,
          count(*) FILTER (grp_a) AS cnt_a,
          count(*) FILTER (observed) AS d,
          count(*) FILTER (observed AND grp_a) AS d_a
        FROM subj GROUP BY 1),
      w AS (SELECT *,
          (SELECT sum(cnt) FROM c) - coalesce(sum(cnt) OVER
            (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
             1 PRECEDING), 0) AS n_risk,
          (SELECT sum(cnt_a) FROM c) - coalesce(sum(cnt_a) OVER
            (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
             1 PRECEDING), 0) AS n_risk_a
        FROM c),
      terms AS (SELECT d_a,
          CAST(floor(CAST(d AS DOUBLE) * CAST(n_risk_a AS DOUBLE)
            / CAST(n_risk AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS e_q,
          CAST(floor(CASE WHEN n_risk > 1 THEN
              CAST(d AS DOUBLE) *
              (CAST(n_risk_a AS DOUBLE) / CAST(n_risk AS DOUBLE)) *
              ((CAST(n_risk AS DOUBLE) - CAST(n_risk_a AS DOUBLE))
                / CAST(n_risk AS DOUBLE)) *
              ((CAST(n_risk AS DOUBLE) - CAST(d AS DOUBLE))
                / (CAST(n_risk AS DOUBLE) - 1.0))
            ELSE 0.0 END * 1e9 + 0.5) AS BIGINT) AS v_q
        FROM w WHERE d > 0),
      s AS (SELECT count(*) AS n_times,
          CAST(sum(d_a) AS BIGINT) AS d_a,
          CAST(sum(e_q) AS BIGINT) AS e_qs,
          CAST(sum(v_q) AS BIGINT) AS v_qs
        FROM terms)
      SELECT n_times, d_a,
        round(CAST(e_qs AS DOUBLE) / 1e9, 6) AS e_a,
        round(CAST(v_qs AS DOUBLE) / 1e9, 6) AS var_sum,
        round(((CAST(d_a AS DOUBLE) - CAST(e_qs AS DOUBLE) / 1e9) *
          (CAST(d_a AS DOUBLE) - CAST(e_qs AS DOUBLE) / 1e9)) /
          (CAST(v_qs AS DOUBLE) / 1e9), 6) AS chi2
      FROM s"""))

  /** Window-function breadth over properly PARTITIONED frames: per
    * user ordered by (ts, event_id) — lag gap, lead type, ntile
    * quartile, running decimal max, and a RANGE-frame trailing-hour
    * count, all in one WindowExec pass per spec. Every window
    * partitions on user_id (bounded per-user history — the only
    * window contract this repo allows); the deterministic (ts,
    * event_id) order makes lag/lead/ntile engine-exact. */
  val qWindowSuite = Q(
    "q228_window_suite",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = eventsUs(s, dir)
        .where(col("user_id") < 40 && col("event_type").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
      val wo = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val wRange = Window.partitionBy("user_id").orderBy(col("ts"))
        .rangeBetween(-HourUs, 0)
      ev.select(col("user_id"), col("event_id"),
          (col("ts") - lag(col("ts"), 1).over(wo)).as("gap_us"),
          lead(col("event_type"), 1).over(wo).as("next_type"),
          ntile(4).over(wo).as("quartile"),
          max(col("value").cast(DecimalType(18, 6))).over(
            wo.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("running_max"),
          count(lit(1)).over(wRange).as("n_last_hour"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
        epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
        lead(event_type, 1) OVER w AS next_type,
        CAST(ntile(4) OVER w AS INT) AS quartile,
        CAST(max(CAST(value AS DECIMAL(18,6))) OVER
          (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_max,
        count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
          AS n_last_hour
      FROM events
      WHERE user_id < 40 AND event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      ORDER BY user_id, event_id"""))

  /** Cox proportional hazards on the exact gate
    * ([[graft.ops.Retention.coxPh]]): two Newton steps attributing
    * churn hazard (death = user ever erroring) to activity volume
    * (x = n_events/100) over the bounded duration grid, every
    * exp-weighted term quantized so the DuckDB unroll of the same two
    * iterations lands on the identical coefficient. */
  val qCoxPh = Q(
    "q231_cox_ph",
    (s, dir) => {
      val subj = eventsUs(s, dir)
        .where(col("user_id").isNotNull)
        .groupBy("user_id")
        .agg(
          ((max(col("ts")) - min(col("ts"))).cast("long") /
            lit(24 * HourUs)).cast("long").as("dur"),
          (count(when(col("event_type") === "error", 1)) > 0)
            .as("observed"),
          (count(lit(1)).cast("double") / lit(100.0)).as("xv"))
      graft.ops.Retention.coxPh(subj, "dur", "observed", "xv",
        steps = 2)
    },
    Some {
      def step(k: Int, prev: String): String =
        s"""gr$k AS (SELECT t,
            CAST(sum(CAST(floor(exp(b.beta * x) * 1e9 + 0.5)
              AS BIGINT)) AS BIGINT) AS sw,
            CAST(sum(CAST(floor(x * exp(b.beta * x) * 1e9 + 0.5)
              AS BIGINT)) AS BIGINT) AS sxw,
            CAST(sum(CAST(floor(x * x * exp(b.beta * x) * 1e9 + 0.5)
              AS BIGINT)) AS BIGINT) AS sxxw,
            CAST(sum(e) AS BIGINT) AS d,
            CAST(sum(e * CAST(floor(x * 1e9 + 0.5) AS BIGINT))
              AS BIGINT) AS sxd_q
          FROM subj, $prev b GROUP BY t),
        cum$k AS (SELECT *,
            CAST(sum(sw) OVER (ORDER BY t DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s0q,
            CAST(sum(sxw) OVER (ORDER BY t DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s1q,
            CAST(sum(sxxw) OVER (ORDER BY t DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s2q
          FROM gr$k),
        st$k AS (SELECT
            CAST(sum(CAST(floor((CAST(sxd_q AS DOUBLE) / 1e9
              - CAST(d AS DOUBLE) * ((CAST(s1q AS DOUBLE) / 1e9)
                / (CAST(s0q AS DOUBLE) / 1e9))) * 1e9 + 0.5)
              AS BIGINT)) AS BIGINT) AS gq,
            CAST(sum(CAST(floor((CAST(d AS DOUBLE)
              * ((CAST(s2q AS DOUBLE) / 1e9)
                  / (CAST(s0q AS DOUBLE) / 1e9)
                - ((CAST(s1q AS DOUBLE) / 1e9)
                    / (CAST(s0q AS DOUBLE) / 1e9))
                  * ((CAST(s1q AS DOUBLE) / 1e9)
                    / (CAST(s0q AS DOUBLE) / 1e9)))) * 1e9 + 0.5)
              AS BIGINT)) AS BIGINT) AS hq
          FROM cum$k WHERE d > 0),
        bt$k AS (SELECT floor((b.beta
            + (CAST(s.gq AS DOUBLE) / 1e9)
              / (CAST(s.hq AS DOUBLE) / 1e9)) * 1e9 + 0.5) / 1e9
            AS beta
          FROM st$k s, $prev b)"""
      val steps = Seq(step(1, "bt0"), step(2, "bt1"))
        .mkString(",\n        ")
      s"""WITH subj AS (SELECT
            CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
              // 86400000000 AS BIGINT) AS t,
            CASE WHEN count(*) FILTER (event_type = 'error') > 0
              THEN 1 ELSE 0 END AS e,
            CAST(count(*) AS DOUBLE) / 100.0 AS x
          FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        tot AS (SELECT count(*) AS n_subjects,
            CAST(sum(e) AS BIGINT) AS n_deaths FROM subj),
        bt0 AS (SELECT 0.0 AS beta),
        $steps
        SELECT tot.n_subjects, tot.n_deaths, b.beta,
          floor(exp(b.beta) * 1e6 + 0.5) / 1e6 AS hazard_ratio
        FROM tot, bt2 b"""
    })

  /** Per-user daily resample + forward-fill
    * ([[graft.ops.Timeseries.resampleFfill]]): pandas
    * `resample('D').ffill()` semantics over a bounded slice — gaps in
    * each user's daily value series carry the last observation. */
  val qResampleFfill = Q(
    "q232_resample_ffill",
    (s, dir) => graft.ops.Timeseries.resampleFfill(
      eventsUs(s, dir).where(col("user_id") < 25),
      "user_id", "ts", "value", periodUs = 24 * HourUs),
    Some("""WITH b AS (SELECT user_id AS k,
          epoch_us(ts) // 86400000000 AS p,
          epoch_us(ts) AS tus, CAST(value AS DOUBLE) AS v
        FROM events
        WHERE user_id IS NOT NULL AND user_id < 25
          AND ts IS NOT NULL AND value IS NOT NULL),
      obs AS (SELECT k, p, v FROM (
          SELECT k, p, v, row_number() OVER (PARTITION BY k, p
            ORDER BY tus DESC, v DESC) AS rn FROM b)
        WHERE rn = 1),
      span AS (SELECT k, min(p) AS p0, max(p) AS p1 FROM b GROUP BY k),
      grid AS (SELECT k, unnest(range(p0, p1 + 1)) AS p FROM span)
      SELECT g.k AS user_id, g.p AS period,
        last_value(obs.v IGNORE NULLS) OVER (PARTITION BY g.k
          ORDER BY g.p ROWS UNBOUNDED PRECEDING) AS value
      FROM grid g LEFT JOIN obs ON obs.k = g.k AND obs.p = g.p
      ORDER BY user_id, period"""))

  /** Per-user daily resample + linear interpolation
    * ([[graft.ops.Timeseries.resampleInterpolate]]): pandas
    * `resample('D').interpolate()` semantics — interior gaps take the
    * straight line between the surrounding observations. Same slice,
    * grid, and latest-wins collapse as q232; the oracle mirrors the
    * fixed interpolation parenthesization and 6dp rounding. */
  val qResampleInterpolate = Q(
    "q233_resample_interpolate",
    (s, dir) => graft.ops.Timeseries.resampleInterpolate(
      eventsUs(s, dir).where(col("user_id") < 25),
      "user_id", "ts", "value", periodUs = 24 * HourUs),
    Some("""WITH b AS (SELECT user_id AS k,
          epoch_us(ts) // 86400000000 AS p,
          epoch_us(ts) AS tus, CAST(value AS DOUBLE) AS v
        FROM events
        WHERE user_id IS NOT NULL AND user_id < 25
          AND ts IS NOT NULL AND value IS NOT NULL),
      obs AS (SELECT k, p, v FROM (
          SELECT k, p, v, row_number() OVER (PARTITION BY k, p
            ORDER BY tus DESC, v DESC) AS rn FROM b)
        WHERE rn = 1),
      span AS (SELECT k, min(p) AS p0, max(p) AS p1 FROM b GROUP BY k),
      grid AS (SELECT k, unnest(range(p0, p1 + 1)) AS p FROM span),
      j AS (SELECT g.k, g.p, obs.v,
          last_value(obs.v IGNORE NULLS) OVER wp AS v_prev,
          last_value(CASE WHEN obs.v IS NOT NULL THEN g.p END
            IGNORE NULLS) OVER wp AS p_prev,
          first_value(obs.v IGNORE NULLS) OVER wn AS v_next,
          first_value(CASE WHEN obs.v IS NOT NULL THEN g.p END
            IGNORE NULLS) OVER wn AS p_next
        FROM grid g LEFT JOIN obs ON obs.k = g.k AND obs.p = g.p
        WINDOW wp AS (PARTITION BY g.k ORDER BY g.p
            ROWS UNBOUNDED PRECEDING),
          wn AS (PARTITION BY g.k ORDER BY g.p
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT k AS user_id, p AS period,
        CASE WHEN v IS NOT NULL THEN v
          ELSE round(v_prev + (v_next - v_prev) *
            (CAST(p - p_prev AS DOUBLE) /
             CAST(p_next - p_prev AS DOUBLE)), 6) END AS value
      FROM j ORDER BY user_id, period"""))

  /** Per-user interval-union activity time
    * ([[graft.ops.Sessionize.intervalUnionLength]]): each event covers
    * [ts, ts+120 s); overlapping coverage counts ONCE (the measure of
    * the union — gaps-and-islands with key-partitioned windows, exact
    * integer micros). sum_len − union_len is the overlap a naive
    * per-event sum would double-count. */
  val qIntervalUnion = Q(
    "q237_interval_union",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("user_id"), col("ts").as("s_us"),
          (col("ts") + lit(120000000L)).as("e_us"))
      graft.ops.Sessionize.intervalUnionLength(
        ev, "user_id", "s_us", "e_us")
    },
    Some("""WITH b AS (SELECT user_id AS k, epoch_us(ts) AS s,
          epoch_us(ts) + 120000000 AS e
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      i AS (SELECT k, s, e,
          max(e) OVER (PARTITION BY k ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mep
        FROM b),
      j AS (SELECT k, s, e,
          sum(CASE WHEN mep IS NULL OR s > mep THEN 1 ELSE 0 END)
            OVER (PARTITION BY k ORDER BY s, e
              ROWS UNBOUNDED PRECEDING) AS island
        FROM i),
      g AS (SELECT k, island, min(s) AS is_s, max(e) AS is_e,
          count(*) AS cnt, sum(e - s) AS len_sum
        FROM j GROUP BY 1, 2)
      SELECT k AS user_id, CAST(sum(cnt) AS BIGINT) AS n_intervals,
        count(*) AS n_islands,
        CAST(sum(is_e - is_s) AS BIGINT) AS union_len,
        CAST(sum(len_sum) AS BIGINT) AS sum_len
      FROM g GROUP BY 1 ORDER BY user_id"""))

  /** Spark's NATIVE `session_window` aggregate in BATCH mode — the
    * built-in Catalyst session operator (one SessionWindow node, no
    * window functions) computing the same gap-sessionization q65
    * hand-rolls with lag/sum windows and q182 runs streaming. Sessions
    * split at gap >= 30 min (strictly-before extends); window end =
    * last event + gap; value sums ride DECIMAL. The oracle is the
    * gaps-and-islands rewrite in the shared epoch-micros domain. */
  val qBatchSessionWindow = Q(
    "q235_batch_session_window",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .where(col("user_id") < 100 && col("ts").isNotNull)
        .select(col("user_id"), timestamp_micros(col("ts")).as("t"),
          col("value"))
      ev.groupBy(col("user_id"),
          session_window(col("t"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(coalesce(col("value"), lit(0.0)).cast(DecimalType(18, 6)))
            .cast("double").as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "start_us")
    },
    Some("""WITH b AS (SELECT user_id AS u, epoch_us(ts) AS t, value
        FROM events
        WHERE user_id IS NOT NULL AND user_id < 100 AND ts IS NOT NULL),
      i AS (SELECT u, t, value,
          CASE WHEN lag(t) OVER w IS NULL
                 OR t - lag(t) OVER w >= 1800000000
               THEN 1 ELSE 0 END AS brk
        FROM b WINDOW w AS (PARTITION BY u ORDER BY t)),
      j AS (SELECT u, t, value,
          sum(brk) OVER (PARTITION BY u ORDER BY t
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM i)
      SELECT u AS user_id, min(t) AS start_us,
        max(t) + 1800000000 AS end_us, count(*) AS n_events,
        CAST(sum(CAST(coalesce(value, 0.0) AS DECIMAL(18,6)))
          AS DOUBLE) AS sum_value
      FROM j GROUP BY u, sid ORDER BY user_id, start_us"""))

  /** One LEFT OUTER stream-stream interval-join drive per (session,
    * events source), memoized: the q238/q252 pair used to run two
    * near-identical ~9 s MemoryStream drives over the same events
    * slice; the LEFT OUTER output strictly contains the inner-join
    * output (matched rows are exactly the rows with a non-null
    * marker), so ONE drive of the outer operator feeds both gate
    * rows — q252 asserts the full null-padded protocol, q238 the
    * eager-match subset. The inner operator
    * [[graft.streaming.StreamingIntervalJoin.intervalJoin]] keeps its
    * own coverage in StreamingIntervalJoinSpec and the s05 bench
    * drive. Cache contract matches the shingle/IVF caches: amortizes
    * within a Bench pass, cleared between passes. */
  private val intervalDriveCache =
    new graft.ops.SessionCache[(Int, String), org.apache.spark.sql.DataFrame](2)

  /** Kept for targeted test use; Bench now clears the whole registry
    * via [[graft.ops.SessionCache.clearAll]]. */
  private[graft] def clearIntervalDriveCache(): Unit =
    intervalDriveCache.clear()

  private def intervalLeftOuterDrive(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    intervalDriveCache.getOrElseUpdate((System.identityHashCode(s), dir)) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val ev = eventsUs(s, dir).where(col("user_id") < 20 &&
        col("ts").isNotNull && col("event_id").isNotNull)
      val left = ev.where(col("event_type") =!= "signup")
        .select(col("user_id"), col("ts"), col("event_id"))
        .as[(Long, Long, Long)].collect()
      val right = ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id"))
        .as[(Long, Long, Long)].collect()
      val maxTs = (left.iterator ++ right.iterator).map(_._2).max
      val lmem = MemoryStream[(Long, Long, Long)]
      val rmem = MemoryStream[(Long, Long, Long)]
      val lsrc = lmem.toDF.toDF("user_id", "tus", "event_id")
        .select(col("user_id"), timestamp_micros(col("tus")).as("ts"),
          col("event_id"))
      val rsrc = rmem.toDF.toDF("r_user", "r_tus", "r_event_id")
        .select(col("r_user"), timestamp_micros(col("r_tus")).as("r_ts"),
          col("r_event_id"))
      val joined = graft.streaming.StreamingIntervalJoin.intervalJoinLeftOuter(
        lsrc, rsrc, "user_id", "r_user", "ts", "r_ts",
        spanSeconds = 7L * 86400L, watermarkDelay = "0 seconds")
      val sink = "graft_sijd_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sijd-gate").toString
      val query = joined.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        lmem.addData(left.toIndexedSeq)
        rmem.addData(right.toIndexedSeq)
        query.processAllAvailable()
        // sentinel pair 40 days past the data: watermark passes every
        // real left row's eviction bound, so the null-padded outer
        // rows flush (the sentinels themselves stay in state and are
        // filtered below)
        lmem.addData((-1L, maxTs + 40L * 24 * HourUs, -1L))
        rmem.addData((-1L, maxTs + 40L * 24 * HourUs, -1L))
        query.processAllAvailable()
      } finally query.stop()
      StreamGate.finish(s, sink, ckpt, s.table(sink)
        .where(col("user_id") >= 0)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("e_ts_us"),
          col("r_event_id").as("marker_event_id"),
          unix_micros(col("r_ts")).as("m_ts_us")))
    }

  /** STREAM-STREAM interval join on the correctness gate — the last
    * streaming join shape whose ANSWERS weren't hash-checked (s05
    * benches it; q209 gates the stream-STATIC case): a bounded events
    * slice joins its own signup markers within a trailing 7-day span
    * through the real two-watermark stream-stream join operator.
    * Asserted as the matched subset of the shared
    * [[intervalLeftOuterDrive]] (the outer operator emits matches
    * eagerly, identically to the inner join; one drive serves q238 +
    * q252), against an oracle that recomputes the plain interval
    * join. */
  val qStreamingIntervalJoin = Q(
    "q238_streaming_interval_join",
    (s, dir) => intervalLeftOuterDrive(s, dir)
      .where(col("marker_event_id").isNotNull)
      .orderBy("user_id", "event_id", "marker_event_id"),
    Some("""SELECT e.user_id, e.event_id, epoch_us(e.ts) AS e_ts_us,
        m.event_id AS marker_event_id, epoch_us(m.ts) AS m_ts_us
      FROM events e JOIN events m
        ON e.user_id = m.user_id
        AND m.event_type = 'signup'
        AND epoch_us(e.ts) >= epoch_us(m.ts)
        AND epoch_us(e.ts) <= epoch_us(m.ts) + 604800000000
      WHERE e.user_id < 20 AND e.event_type != 'signup'
        AND e.ts IS NOT NULL AND e.event_id IS NOT NULL
        AND m.ts IS NOT NULL AND m.event_id IS NOT NULL
      ORDER BY 1, 2, 4"""))

  /** LEFT OUTER stream-stream interval join on the gate — the one
    * streaming join shape q238 (inner) does not cover: unmatched left
    * rows emit with null right columns only when the WATERMARK proves
    * no future match can arrive (that is when the engine evicts them
    * from join state), so the sentinel batch that advances both
    * watermarks 40 days past the data is what flushes them. The oracle
    * is the plain LEFT JOIN — proving the watermark-delayed outer
    * protocol loses nothing and invents nothing. Runs the shared
    * [[intervalLeftOuterDrive]] (one drive serves q238 + q252). */
  val qStreamingIntervalLeftOuter = Q(
    "q252_streaming_interval_left_outer",
    (s, dir) => intervalLeftOuterDrive(s, dir)
      .orderBy("user_id", "event_id", "marker_event_id"),
    Some("""SELECT e.user_id, e.event_id, epoch_us(e.ts) AS e_ts_us,
        m.event_id AS marker_event_id, epoch_us(m.ts) AS m_ts_us
      FROM events e LEFT JOIN events m
        ON e.user_id = m.user_id
        AND m.event_type = 'signup'
        AND epoch_us(e.ts) >= epoch_us(m.ts)
        AND epoch_us(e.ts) <= epoch_us(m.ts) + 604800000000
        AND m.ts IS NOT NULL AND m.event_id IS NOT NULL
      WHERE e.user_id < 20 AND e.event_type != 'signup'
        AND e.ts IS NOT NULL AND e.event_id IS NOT NULL
      ORDER BY 1, 2, 4"""))

  /** CDC apply / SCD1 MERGE ([[graft.ops.Delta.cdcUpsert]]): a
    * pre-1997 per-customer snapshot (latest order's totalprice) gets
    * the 1997+ changelog applied — latest change wins, status 'F'
    * means delete, untouched keys pass through. The MERGE INTO shape
    * on the value gate, as one mergeable max-of-struct aggregate +
    * one full outer join. */
  val qCdcUpsert = Q(
    "q241_cdc_upsert",
    (s, dir) => {
      val cut = 852076800000000L // 1997-01-01 UTC, epoch micros
      val ord = QueryCatalog.table(s, dir, "orders")
        .select(col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val base = ord.where(col("od_us") < cut)
        .groupBy("o_custkey")
        .agg(max(struct(col("od_us"), col("o_orderkey"),
          col("o_totalprice"))).as("m"))
        .select(col("o_custkey"), col("m.o_totalprice").as("o_totalprice"))
      val changes = ord.where(col("od_us") >= cut)
        .withColumn("op",
          when(col("o_orderstatus") === "F", lit("D")).otherwise(lit("U")))
        .select(col("o_custkey"), col("od_us"), col("o_orderkey"),
          col("op"), col("o_totalprice"))
      graft.ops.Delta.cdcUpsert(base, changes, "o_custkey",
          Seq("od_us", "o_orderkey"), "op", Seq("o_totalprice"))
        .orderBy("o_custkey")
    },
    Some("""WITH o AS (SELECT o_custkey AS k, epoch_us(o_orderdate) AS od,
          o_orderkey AS ok, o_orderstatus AS st, o_totalprice AS v
        FROM orders),
      base AS (SELECT k, v FROM (
          SELECT k, v, row_number() OVER (PARTITION BY k
            ORDER BY od DESC, ok DESC) AS rn
          FROM o WHERE od < 852076800000000) WHERE rn = 1),
      latest AS (SELECT k,
          CASE WHEN st = 'F' THEN 'D' ELSE 'U' END AS op, v FROM (
          SELECT k, st, v, row_number() OVER (PARTITION BY k
            ORDER BY od DESC, ok DESC) AS rn
          FROM o WHERE od >= 852076800000000) WHERE rn = 1),
      m AS (SELECT coalesce(b.k, l.k) AS o_custkey, l.op,
          CASE WHEN l.k IS NOT NULL THEN l.v ELSE b.v END AS o_totalprice
        FROM base b FULL OUTER JOIN latest l ON b.k = l.k)
      SELECT o_custkey, o_totalprice FROM m
      WHERE op IS NULL OR op != 'D' ORDER BY o_custkey"""))

  /** STREAMING tumbling-window aggregation on the gate — the one
    * windowed-aggregation mode q182 (session_window) and q199
    * (transformWithState) didn't cover: a bounded events slice flows
    * through `window(ts, 1 day)` + watermark in Append mode; the q182
    * sentinel protocol flushes every real window, and the oracle is
    * the plain batch day-bucket GROUP BY. Counts and DECIMAL sums are
    * order-exact, so the emitted finals hash-match. */
  val qStreamingTumbling = Q(
    "q242_streaming_tumbling",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val slice = eventsUs(s, dir)
        .where(col("user_id") < 40 && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("value"))
        .as[(Long, Long, Option[Double])].collect()
      val maxTs = slice.iterator.map(_._2).max
      val mem = MemoryStream[(Long, Long, Option[Double])]
      val src = mem.toDF.toDF("user_id", "tus", "value")
        .select(col("user_id"), timestamp_micros(col("tus")).as("ts"),
          col("value"))
        .withWatermark("ts", "0 seconds")
      val agg = src
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("n_events"),
          count(col("value")).as("n_valued"),
          approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          sum(coalesce(col("value"), lit(0.0)).cast(DecimalType(18, 6)))
            .as("sum_v"))
      val sink = "graft_stw_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-stw-gate").toString
      val query = agg.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(slice.toIndexedSeq)
        query.processAllAvailable()
        mem.addData((-1L, maxTs + 40L * 24 * HourUs, None))
        query.processAllAvailable()
        mem.addData((-1L, maxTs + 80L * 24 * HourUs, None))
        query.processAllAvailable()
      } finally query.stop()
      // approx_users is a streaming-side HLL (not oracle-portable) —
      // assert it's sane here, emit only the exact columns to the gate
      val out = StreamGate.finish(s, sink, ckpt, s.table(sink)
        .where(unix_micros(col("w.start")) <= maxTs)
        .select(unix_micros(col("w.start")).as("day_start_us"),
          col("n_events"), col("n_valued"),
          col("sum_v").cast("double").as("sum_v"),
          col("approx_users")))
      require(out.where(col("approx_users") <= 0 ||
        col("approx_users") > 40).isEmpty,
        "streaming HLL user estimate out of range")
      out.drop("approx_users").orderBy("day_start_us")
    },
    Some("""SELECT
        (epoch_us(ts) // 86400000000) * 86400000000 AS day_start_us,
        count(*) AS n_events, count(value) AS n_valued,
        CAST(sum(CAST(coalesce(value, 0.0) AS DECIMAL(18,6)))
          AS DOUBLE) AS sum_v
      FROM events
      WHERE user_id IS NOT NULL AND user_id < 40 AND ts IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** Online drift monitoring on the gate ([[graft.streaming
    * .StreamingDrift.psiVsBaseline]]): per-day PSI of a streamed event
    * slice against a baseline histogram profiled OFFLINE from a
    * disjoint user slice — the serve-time "did today's traffic drift
    * from training?" monitor, last streaming operator family without
    * an answer gate. The baseline (8 bin edges + Laplace-smoothed
    * shares) rides the plan as literals, so each day is one
    * fixed-arity conditional-count aggregate; the PSI fold is a
    * stateless projection. Driven as a REAL two-batch Append run
    * (split at a day boundary so the 0-second watermark cannot
    * late-drop the second batch), flushed by the q242 sentinel
    * protocol; the oracle replays baseline profiling, binning,
    * smoothing, and the left-to-right PSI fold in one batch query. */
  val qStreamingDrift = Q(
    "q287_streaming_drift",
    (s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val DayUs = 24L * HourUs
      val k = 8
      val ev = eventsUs(s, dir)
        .where(col("value").isNotNull && !isnan(col("value")) &&
          col("ts").isNotNull)
        .select(col("user_id"), col("ts").as("tus"),
          col("value").cast("double").as("v"))
      val base = ev.where(col("user_id") % 4 === 0)
      val mm = base.agg(min(col("v")), max(col("v"))).head()
      val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
      val binned = base.select(greatest(lit(0), least(
          graft.functions.StatFunctions.histogramBin(col("v"), mn, mx, k),
          lit(k - 1))).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val baseline = graft.streaming.StreamingDrift.Baseline.fromCounts(
        mn, mx, (0 until k).map(i => binned.getOrElse(i, 0L)))
      val slice = ev.where(col("user_id") % 4 =!= 0)
        .select(col("tus"), col("v")).as[(Long, Double)].collect()
      require(slice.nonEmpty, "empty stream slice")
      val maxTs = slice.iterator.map(_._1).max
      val minTs = slice.iterator.map(_._1).min
      val splitDay = ((minTs + maxTs) / 2 / DayUs) * DayUs
      val mem = MemoryStream[(Long, Double)]
      val src = mem.toDF.toDF("tus", "value")
        .select(timestamp_micros(col("tus")).as("ts"), col("value"))
      val agg = graft.streaming.StreamingDrift.psiVsBaseline(
        src, "ts", "value", baseline, "1 day", "0 seconds")
      val sink = "graft_sdrift_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-sdrift-gate").toString
      val query = agg.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(slice.filter(_._1 < splitDay).toIndexedSeq)
        query.processAllAvailable()
        mem.addData(slice.filter(_._1 >= splitDay).toIndexedSeq)
        query.processAllAvailable()
        // one sentinel: advancing the watermark past maxTs + 1 day
        // closes every REAL window; the sentinel's own window is
        // filtered out below, so it never needs to flush
        mem.addData((maxTs + 40L * DayUs, 0.0))
        query.processAllAvailable()
      } finally query.stop()
      StreamGate.finish(s, sink, ckpt, s.table(sink)
          .where(unix_micros(col("w.start")) <= maxTs)
          .select(unix_micros(col("w.start")).as("day_start_us"),
            col("psi"), col("n")))
        .orderBy("day_start_us")
    },
    Some {
      val k = 8
      val terms = (0 until k).map { i =>
        val p = s"((c$i + 0.5) / (n + ${0.5 * k}))"
        val qq = s"((b$i + 0.5) / (nb + ${0.5 * k}))"
        s"($p - $qq) * ln($p / $qq)"
      }.mkString("\n          + ")
      def condCounts(pfx: String) = (0 until k).map(i =>
        s"sum(CASE WHEN bin = $i THEN 1 ELSE 0 END) AS $pfx$i")
        .mkString(", ")
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS tus,
            CAST(value AS DOUBLE) AS v
          FROM events
          WHERE value IS NOT NULL AND NOT isnan(value)
            AND ts IS NOT NULL),
        st AS (SELECT min(v) AS mn, max(v) AS mx FROM ev
               WHERE user_id % 4 = 0),
        bb AS (SELECT GREATEST(LEAST(floor((v - st.mn)
              / ((st.mx - st.mn) / $k)), ${k - 1}), 0) AS bin
            FROM ev, st WHERE user_id % 4 = 0),
        bc AS (SELECT count(*) AS nb, ${condCounts("b")} FROM bb),
        sv AS (SELECT (tus // 86400000000) * 86400000000
              AS day_start_us,
            GREATEST(LEAST(floor((v - st.mn)
              / ((st.mx - st.mn) / $k)), ${k - 1}), 0) AS bin
          FROM ev, st WHERE user_id % 4 <> 0),
        dc AS (SELECT day_start_us, count(*) AS n, ${condCounts("c")}
            FROM sv GROUP BY 1)
      SELECT day_start_us,
        round($terms, 8) AS psi,
        CAST(n AS BIGINT) AS n
      FROM dc, bc ORDER BY day_start_us"""
    })

  /** Rolling 10-row median per user ([[graft.ops.Rolling
    * .rollingMedian]]): the robust centerline q72's sum-family can't
    * give — one WindowExec with a bounded ROWS frame, sort_array +
    * middle pick, event_id tie-break so frame CONTENTS are
    * engine-reproducible. The oracle replays the same sorted-frame
    * indexing (list window agg + the identical (a+b)/2 even-count
    * form — NOT DuckDB's quantile interpolation, whose a+(b-a)·0.5
    * rounds differently), so the doubles agree bit-for-bit unrounded. */
  val qRollingMedian = Q(
    "q288_rolling_median",
    (s, dir) => {
      val ev = eventsUs(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          col("ts").as("tus"))
      graft.ops.Rolling
        .rollingMedian(ev, "user_id", "tus", "event_id", "value",
          frameRows = 10)
        .select("event_id", "user_id", "tus", "n_frame", "median")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, tus,
        CAST(len(arr) AS BIGINT) AS n_frame,
        CASE WHEN len(arr) = 0 THEN NULL
          WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
          ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2.0
        END AS median
      FROM (SELECT event_id, user_id, tus,
          list_sort(list_filter(list(value) OVER w,
            x -> x IS NOT NULL)) AS arr
        FROM (SELECT event_id, user_id, epoch_us(ts) AS tus,
              CAST(value AS DOUBLE) AS value FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
      ORDER BY event_id"""))

  /** The as-of join through the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsOfJoinExec]] — logical node + planner Strategy +
    * SparkPlan with declared distribution/ordering requirements): the
    * identical click→preceding-purchase join as q66, so the two
    * formulations (union+window vs whole-operator merge) share one
    * oracle and must agree bit-for-bit. AsOfJoinPlanSpec pins the
    * physical plan (AsOfJoinExec node, both sides hash-partitioned on
    * their keys, no BNLJ/window). */
  val qAsofExec = Q(
    "q243_asof_exec",
    (s, dir) => {
      val ev = eventsUs(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts").as("tus"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      graft.plans.AsOfJoinPhysical.asofBackward(
          clicks, purchases, "user_id", "p_user", "tus", "p_ts",
          rightTie = "p_event_id")
        .select(col("event_id"), col("user_id"), col("tus"),
          col("p_event_id"), col("p_value"),
          (col("tus") - col("p_ts")).as("lag_us"))
        .orderBy("event_id")
    },
    Some("""WITH c AS (
        SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        WHERE event_type = 'click'),
      p AS (SELECT user_id, epoch_us(ts) AS pus, event_id AS p_event_id,
          value AS p_value FROM events WHERE event_type = 'purchase'),
      m AS (SELECT c.event_id, p.p_event_id, p.p_value,
          c.tus - p.pus AS lag_us,
          row_number() OVER (PARTITION BY c.event_id
            ORDER BY p.pus DESC, p.p_event_id DESC) AS rn
        FROM c JOIN p ON c.user_id = p.user_id AND p.pus <= c.tus)
      SELECT c.event_id, c.user_id, c.tus, m.p_event_id, m.p_value, m.lag_us
      FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        ON m.event_id = c.event_id
      ORDER BY c.event_id"""))

  /** Markov stationary distribution of the event-type chain
    * ([[graft.ops.Transitions.stationary]]): where the user population
    * settles under q89's transition matrix — 3 quantized power steps
    * whose float sequence the oracle unrolls verbatim (the q240
    * spectral-iteration contract over a row-stochastic matrix). */
  val qMarkovStationary: Q = {
    val states = Seq("click", "error", "purchase", "signup", "view")
    val s = states.length
    // absorbing states mirror the engine: a state with NO outgoing
    // transitions has a NULL row-total denominator here, which the
    // outer coalesce replaces with the identity row (self-loop, mass
    // conserved) exactly as Transitions.stationary does — so the gate
    // does not depend on every hardcoded state having outgoing
    // transitions in the fixture
    def pij(i: Int, j: Int) =
      s"""coalesce((coalesce((SELECT CAST(cnt AS DOUBLE) FROM c
           WHERE from_state = '${states(i)}' AND to_state = '${states(j)}'),
           0.0) /
          (SELECT CAST(sum(cnt) AS DOUBLE) FROM c
           WHERE from_state = '${states(i)}')),
          ${if (i == j) "1.0" else "0.0"})"""
    val steps = 3
    val mSel = (for (i <- 0 until s; j <- 0 until s)
      yield s"${pij(i, j)} AS p_${i}_$j").mkString(", ")
    val stepCtes = (1 to steps).map { k =>
      val u = (0 until s).map { j =>
        (0 until s).map(i => s"(v${k - 1}_$i * p_${i}_$j)")
          .reduceLeft((a, b) => s"($a + $b)") + s" AS u${k}_$j"
      }.mkString(", ")
      s"""u$k AS (SELECT *, $u FROM v${k - 1}),
        v$k AS (SELECT *, ${(0 until s).map(j =>
          s"floor(u${k}_$j * 1e9 + 0.5) / 1e9 AS v${k}_$j")
          .mkString(", ")} FROM u$k)"""
    }.mkString(",\n")
    Q(
      "q244_markov_stationary",
      (s2, dir) => {
        val ev = eventsUs(s2, dir)
          .select(col("user_id"), col("event_type"), col("event_id"),
            col("ts").as("tus"))
        graft.ops.Transitions.stationary(
          ev, "user_id", "tus", "event_type",
          tieBreak = Seq("event_id"), steps = steps)
      },
      Some(s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus,
            event_id FROM events),
        pr AS (SELECT event_type AS from_state,
            lead(event_type) OVER w AS to_state,
            lead(1) OVER w AS has_next
          FROM e WINDOW w AS (PARTITION BY user_id
            ORDER BY tus, event_id)),
        c AS (SELECT from_state, to_state, count(*) AS cnt FROM pr
          WHERE has_next IS NOT NULL GROUP BY 1, 2),
        m AS (SELECT $mSel),
        v0 AS (SELECT *, ${(0 until s).map(i =>
          s"1.0 / $s AS v0_$i").mkString(", ")} FROM m),
        $stepCtes
        ${states.zipWithIndex.map { case (st, i) =>
          s"SELECT '$st' AS state, v${steps}_$i AS pi FROM v$steps"
        }.mkString("\nUNION ALL\n")}
        ORDER BY state"""))
  }

  /** q181's forward-with-tolerance as-of THROUGH the custom physical
    * operator ([[graft.plans.AsOfJoinPhysical.asofForward]] — the same
    * AsOfJoinExec on negated times, no second exec implementation):
    * identical semantics, shared oracle, so the operator's forward
    * mapping is hash-checked too. */
  val qAsofExecForward = Q(
    "q246_asof_exec_forward",
    (s, dir) => {
      val ev = eventsUs(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts").as("tus"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      graft.plans.AsOfJoinPhysical.asofForward(
          clicks, purchases, "user_id", "p_user", "tus", "p_ts",
          rightTie = "p_event_id", toleranceWidened = Some(172800000000L))
        .select(col("event_id"), col("user_id"), col("tus"),
          col("p_event_id"), col("p_value"),
          (col("p_ts") - col("tus")).as("lead_us"))
        .orderBy("event_id")
    },
    Some("""WITH c AS (
        SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        WHERE event_type = 'click'),
      p AS (SELECT user_id, epoch_us(ts) AS pus, event_id AS p_event_id,
          value AS p_value FROM events WHERE event_type = 'purchase'),
      m AS (SELECT c.event_id, p.p_event_id, p.p_value,
          p.pus - c.tus AS lead_us,
          row_number() OVER (PARTITION BY c.event_id
            ORDER BY p.pus ASC, p.p_event_id ASC) AS rn
        FROM c JOIN p ON c.user_id = p.user_id AND p.pus >= c.tus
          AND p.pus - c.tus <= 172800000000)
      SELECT c.event_id, c.user_id, c.tus, m.p_event_id, m.p_value,
        m.lead_us
      FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        ON c.event_id = m.event_id
      ORDER BY c.event_id"""))

  /** The exec's TYPE-WIDENING path on the gate: a TIMESTAMP-typed as-of
    * (o_orderdate is timestamp[us] in the fixture) through
    * [[graft.plans.AsOfJoinPhysical.asofBackward]] — each urgent order
    * matched to the customer's latest prior-or-same-day LOW-priority
    * order. The time column widens to epoch micros inside the builder
    * (cast-insertion, v2), so this row proves the widened ordering is
    * exactly DuckDB's native timestamp ordering. */
  val qAsofTimestampExec = Q(
    "q249_asof_timestamp_exec",
    (s, dir) => {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val l = orders.where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val r = orders.where(col("o_orderpriority") === "5-LOW")
        .select(col("o_custkey").as("r_custkey"),
          col("o_orderdate").as("r_date"),
          col("o_orderkey").as("r_orderkey"),
          col("o_totalprice").as("r_totalprice"))
      // the parquet type is TIMESTAMP_NTZ; the session pins UTC, so the
      // cast preserves wall-clock micros (same integers as epoch_us)
      def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
      graft.plans.AsOfJoinPhysical.asofBackward(
          l, r, "o_custkey", "r_custkey", "o_orderdate", "r_date",
          rightTie = "r_orderkey")
        .select(col("o_orderkey"), col("o_custkey"),
          us(col("o_orderdate")).as("o_date_us"),
          col("r_orderkey"), col("r_totalprice"),
          (us(col("o_orderdate")) - us(col("r_date"))).as("gap_us"))
        .orderBy("o_orderkey")
    },
    Some("""WITH l AS (SELECT o_orderkey, o_custkey, o_orderdate
          FROM orders WHERE o_orderpriority = '1-URGENT'),
        r AS (SELECT o_custkey AS r_custkey, o_orderdate AS r_date,
            o_orderkey AS r_orderkey, o_totalprice AS r_totalprice
          FROM orders WHERE o_orderpriority = '5-LOW'),
        m AS (SELECT l.o_orderkey, r.r_orderkey, r.r_totalprice,
            epoch_us(l.o_orderdate) - epoch_us(r.r_date) AS gap_us,
            row_number() OVER (PARTITION BY l.o_orderkey
              ORDER BY r.r_date DESC, r.r_orderkey DESC) AS rn
          FROM l JOIN r ON l.o_custkey = r.r_custkey
            AND r.r_date <= l.o_orderdate)
      SELECT l.o_orderkey, l.o_custkey, epoch_us(l.o_orderdate) AS o_date_us,
        m.r_orderkey, m.r_totalprice, m.gap_us
      FROM l LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        ON m.o_orderkey = l.o_orderkey
      ORDER BY l.o_orderkey"""))

  val all: Seq[Q] = Seq(qSessionize, qAsofJoin, qAsofForward,
    qRangeJoin, qRangeAggSweep, qFunnel,
    qRolling, qTransitions, qAttribution, qRetention, qCountAcf,
    qKaplanMeier, qXcorr, qTopPaths, qInterarrival, qTwap,
    qLinearAttribution, qChangepoint, qMannKendall, qEwmaChart,
    qScd2, qSeasonal, qNelsonAalen, qStateAsOf, qUserEntropy,
    qSkipGram, qTimeDecayAttribution, qStreamingSessionize,
    qStreamingHeavyHitters, qDailyActivity, qM4Downsample,
    qStreamingRunningTotals, qStreamingEnrich, qStreamingDedup,
    qRangeJoinRule, qCohortLtv, qRollingDistinct, qLogRank,
    qWindowSuite, qCoxPh, qResampleFfill, qResampleInterpolate,
    qIntervalUnion, qBatchSessionWindow, qStreamingIntervalJoin,
    qCdcUpsert, qStreamingTumbling, qAsofExec, qMarkovStationary,
    qAsofExecForward, qAsofTimestampExec, qStreamingIntervalLeftOuter,
    qStreamingDrift, qRollingMedian)
}
