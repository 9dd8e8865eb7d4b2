package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Association, Drift, FeatureEng, Hypothesis, JoinHealth, Outliers, Skew, Validate}
import graft.queries.QueryCatalog.table

/** Data-quality / monitoring operators: Tukey outlier screening,
  * categorical association (MI + Theil's U), Jensen-Shannon drift, and
  * declarative validation rules. All single-scan fused aggregates or
  * tiny re-aggs over a contingency pass — the alert-grade rollups a
  * production data pipeline runs continuously. */
object QualityQueries {

  /** Tukey-fence outlier counts over the events stream
    * ([[graft.ops.Outliers.tukeyScreen]]): `value` is heavy-tailed
    * (real above-fence mass), `user_id` is uniform (zero — the
    * contrast case). Fences derive from 6dp-rounded exact quartiles so
    * both engines compare against bit-identical cutoffs. */
  val qOutliers = Q(
    "q85_outlier_screen",
    (s, dir) => Outliers.tukeyScreen(
      table(s, dir, "events"), Seq("user_id", "value")),
    Some("""WITH
      f1 AS (SELECT q1, q3, q1 - 1.5*(q3 - q1) AS lo, q3 + 1.5*(q3 - q1) AS hi
        FROM (SELECT round(quantile_cont(user_id, 0.25), 6) AS q1,
                     round(quantile_cont(user_id, 0.75), 6) AS q3
              FROM events)),
      f2 AS (SELECT q1, q3, q1 - 1.5*(q3 - q1) AS lo, q3 + 1.5*(q3 - q1) AS hi
        FROM (SELECT round(quantile_cont(value, 0.25), 6) AS q1,
                     round(quantile_cont(value, 0.75), 6) AS q3
              FROM events))
      SELECT 'user_id' AS col_name, q1, q3, lo, hi,
        count(CASE WHEN v < lo THEN 1 END) AS n_below,
        count(CASE WHEN v > hi THEN 1 END) AS n_above,
        count(v) AS n
      FROM (SELECT CAST(user_id AS DOUBLE) AS v FROM events), f1
      GROUP BY q1, q3, lo, hi
      UNION ALL
      SELECT 'value', q1, q3, lo, hi,
        count(CASE WHEN v < lo THEN 1 END),
        count(CASE WHEN v > hi THEN 1 END), count(v)
      FROM (SELECT CAST(value AS DOUBLE) AS v FROM events), f2
      GROUP BY q1, q3, lo, hi
      ORDER BY col_name"""))

  /** Mutual information + Theil's U between returnflag and linestatus
    * ([[graft.ops.Association.categoricalAssociation]]): one
    * contingency pass, entropies from its marginals,
    * MI = H(X)+H(Y)−H(X,Y), U = MI/H. The pair is genuinely dependent
    * (returned lines ship earlier), so MI lands well off zero. */
  val qAssociation = Q(
    "q86_categorical_mi",
    (s, dir) => Association.categoricalAssociation(
      table(s, dir, "lineitem"), "l_returnflag", "l_linestatus"),
    Some("""WITH j AS (SELECT l_returnflag AS x, l_linestatus AS y,
            count(*) AS c FROM lineitem GROUP BY 1, 2),
      nn AS (SELECT sum(c) AS n FROM j),
      exy AS (SELECT sum(c * (ln(n) - ln(c))) / n AS hxy
        FROM j, nn GROUP BY n),
      ex AS (SELECT sum(cx * (ln(n) - ln(cx))) / n AS hx
        FROM (SELECT sum(c) AS cx FROM j GROUP BY x), nn GROUP BY n),
      ey AS (SELECT sum(cy * (ln(n) - ln(cy))) / n AS hy
        FROM (SELECT sum(c) AS cy FROM j GROUP BY y), nn GROUP BY n)
      SELECT round(hx + hy - hxy, 8) AS mi,
        round(CASE WHEN hx <> 0 THEN (hx + hy - hxy) / hx END, 8)
          AS u_x_given_y,
        round(CASE WHEN hy <> 0 THEN (hx + hy - hxy) / hy END, 8)
          AS u_y_given_x,
        CAST(n AS BIGINT) AS n
      FROM exy, ex, ey, nn"""))

  /** Jensen-Shannon drift ([[graft.ops.Drift.jsd]]) between the even-
    * and odd-orderkey halves over l_extendedprice, 16 fixed-width
    * bins — the bounded symmetric member of the drift family
    * (q83 KS / q84 PSI / q87 JSD). */
  val qJsdDrift = Q(
    "q87_jsd_drift",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      Drift.jsd(
        li.where(col("l_orderkey") % 2 === 0),
        li.where(col("l_orderkey") % 2 === 1),
        "l_extendedprice", bins = 16)
    },
    Some("""WITH u AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
          l_orderkey % 2 AS s FROM lineitem WHERE l_extendedprice IS NOT NULL),
      st AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
      bb AS (SELECT CAST(least(floor((v - mn) / ((mx - mn) / 16)), 15)
          AS INT) AS bin, s FROM u, st),
      m AS (SELECT bin,
          count(CASE WHEN s = 0 THEN 1 END) AS c1,
          count(CASE WHEN s = 1 THEN 1 END) AS c2
        FROM bb GROUP BY bin),
      t AS (SELECT CAST(sum(c1) AS DOUBLE) AS n1,
          CAST(sum(c2) AS DOUBLE) AS n2 FROM m)
      SELECT round(sum(
          (CASE WHEN c1 > 0 THEN (c1/n1) * ln((c1/n1) /
             ((c1/n1 + c2/n2) / 2)) / 2 ELSE 0 END) +
          (CASE WHEN c2 > 0 THEN (c2/n2) * ln((c2/n2) /
             ((c1/n1 + c2/n2) / 2)) / 2 ELSE 0 END)), 8) AS jsd,
        CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
      FROM m CROSS JOIN t GROUP BY n1, n2"""))

  /** Declarative expectation checks ([[graft.ops.Validate.check]]):
    * six rules over lineitem in ONE fused aggregate — range, ordering,
    * non-null, and cross-column predicates, null-predicate = violation
    * (SQL constraint semantics). */
  val qValidate = Q(
    "q88_validation_rules",
    (s, dir) => Validate.check(
      table(s, dir, "lineitem"),
      Seq(
        Validate.Rule("discount_le_5pct", col("l_discount") <= 0.05),
        Validate.Rule("linenumber_1_to_7",
          col("l_linenumber").between(1, 7)),
        Validate.Rule("price_positive", col("l_extendedprice") > 0),
        Validate.Rule("quantity_1_to_50",
          col("l_quantity").between(1, 50)),
        Validate.Rule("returnflag_known",
          col("l_returnflag").isin("A", "N", "R")),
        Validate.Rule("tax_lt_discount",
          col("l_tax") < col("l_discount")))),
    Some("""WITH a AS (SELECT count(*) AS n,
        count(CASE WHEN NOT coalesce(l_discount <= 0.05, false)
          THEN 1 END) AS v1,
        count(CASE WHEN NOT coalesce(l_linenumber BETWEEN 1 AND 7, false)
          THEN 1 END) AS v2,
        count(CASE WHEN NOT coalesce(l_extendedprice > 0, false)
          THEN 1 END) AS v3,
        count(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, false)
          THEN 1 END) AS v4,
        count(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), false)
          THEN 1 END) AS v5,
        count(CASE WHEN NOT coalesce(l_tax < l_discount, false)
          THEN 1 END) AS v6
      FROM lineitem)
      SELECT rule, n_violations, n AS n_rows,
        round((n - n_violations) / CAST(n AS DOUBLE), 8) AS pass_rate
      FROM (
        SELECT 'discount_le_5pct' AS rule, v1 AS n_violations, n FROM a
        UNION ALL SELECT 'linenumber_1_to_7', v2, n FROM a
        UNION ALL SELECT 'price_positive', v3, n FROM a
        UNION ALL SELECT 'quantity_1_to_50', v4, n FROM a
        UNION ALL SELECT 'returnflag_known', v5, n FROM a
        UNION ALL SELECT 'tax_lt_discount', v6, n FROM a)
      ORDER BY rule"""))

  /** Two-sample chi-square homogeneity
    * ([[graft.ops.Drift.chiSquareHomogeneity]]) on event_type between
    * even/odd user cohorts — the categorical member of the drift
    * family (q83 KS / q84 PSI / q87 JSD are numeric-only). */
  val qChi2Drift = Q(
    "q90_chi2_homogeneity",
    (s, dir) => {
      val ev = table(s, dir, "events")
      graft.ops.Drift.chiSquareHomogeneity(
        ev.where(col("user_id") % 2 === 0),
        ev.where(col("user_id") % 2 === 1),
        "event_type")
    },
    Some("""WITH u AS (SELECT event_type AS v, user_id % 2 AS s FROM events),
      m AS (SELECT v,
          count(CASE WHEN s = 0 THEN 1 END) AS c1,
          count(CASE WHEN s = 1 THEN 1 END) AS c2
        FROM u GROUP BY v),
      t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
          CAST(sum(c2) AS BIGINT) AS n2 FROM m)
      SELECT round(sum(
          (c1 - CAST(n1 AS DOUBLE) * (c1 + c2) / (n1 + n2))
            * (c1 - CAST(n1 AS DOUBLE) * (c1 + c2) / (n1 + n2))
            / (CAST(n1 AS DOUBLE) * (c1 + c2) / (n1 + n2)) +
          (c2 - CAST(n2 AS DOUBLE) * (c1 + c2) / (n1 + n2))
            * (c2 - CAST(n2 AS DOUBLE) * (c1 + c2) / (n1 + n2))
            / (CAST(n2 AS DOUBLE) * (c1 + c2) / (n1 + n2))), 8) AS chi2,
        count(*) - 1 AS dof, n1, n2
      FROM m CROSS JOIN t GROUP BY n1, n2"""))

  /** Joint missingness patterns ([[graft.ops.Completeness
    * .nullPatterns]]): which column COMBINATIONS go missing together.
    * The testdata has no natural nulls, so they are planted
    * deterministically via nullif (q37's device) — the pattern-table
    * machinery is what is under test. */
  val qNullPatterns = Q(
    "q91_null_patterns",
    (s, dir) => {
      val li = table(s, dir, "lineitem").select(
        nullif(col("l_discount"), lit(0.0)).as("da"),
        nullif(col("l_tax"), lit(0.0)).as("ta"),
        nullif(col("l_returnflag"), lit("N")).as("rf"))
      graft.ops.Completeness.nullPatterns(li, Seq("da", "ta", "rf"))
    },
    Some("""WITH f AS (SELECT
        nullif(l_discount, 0.0) IS NULL AS da_missing,
        nullif(l_tax, 0.0) IS NULL AS ta_missing,
        nullif(l_returnflag, 'N') IS NULL AS rf_missing FROM lineitem),
      g AS (SELECT da_missing, ta_missing, rf_missing, count(*) AS cnt
        FROM f GROUP BY 1, 2, 3),
      t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g)
      SELECT da_missing, ta_missing, rf_missing, cnt,
        round(cnt / CAST(n AS DOUBLE), 8) AS pct
      FROM g, t
      ORDER BY cnt DESC, da_missing, ta_missing, rf_missing"""))

  /** Functional-dependency checks ([[graft.ops.Dependency
    * .fdViolations]]): user_id→event_type (massively violated — users
    * mix event types) vs doc_id→lang (holds — doc_id is a key). */
  val qFdCheck = Q(
    "q92_fd_check",
    (s, dir) => {
      def tagged(t: String, lhs: String, rhs: String) =
        graft.ops.Dependency
          .fdViolations(table(s, dir, t), Seq(lhs), rhs)
          .withColumn("fd", lit(s"$lhs->$rhs"))
      tagged("events", "user_id", "event_type")
        .unionByName(tagged("documents", "doc_id", "lang"))
        .select("fd", "n_groups", "n_violating", "p_violating",
          "max_distinct", "n_rows")
        .orderBy("fd")
    },
    Some("""WITH g1 AS (SELECT user_id, count(DISTINCT event_type) AS nd,
          count(*) AS sz FROM events GROUP BY user_id),
      g2 AS (SELECT doc_id, count(DISTINCT lang) AS nd, count(*) AS sz
        FROM documents GROUP BY doc_id)
      SELECT 'user_id->event_type' AS fd, count(*) AS n_groups,
        count(CASE WHEN nd > 1 THEN 1 END) AS n_violating,
        round(count(CASE WHEN nd > 1 THEN 1 END) /
          CAST(count(*) AS DOUBLE), 8) AS p_violating,
        max(nd) AS max_distinct, CAST(sum(sz) AS BIGINT) AS n_rows
      FROM g1
      UNION ALL
      SELECT 'doc_id->lang', count(*),
        count(CASE WHEN nd > 1 THEN 1 END),
        round(count(CASE WHEN nd > 1 THEN 1 END) /
          CAST(count(*) AS DOUBLE), 8),
        max(nd), CAST(sum(sz) AS BIGINT)
      FROM g2
      ORDER BY fd"""))

  /** Exact 1-Wasserstein drift ([[graft.ops.Drift.wasserstein]])
    * between the even/odd-orderkey halves over l_quantity (50 distinct
    * values → 50 summands, so the order-varying final sum is far
    * inside the 6dp rounding). The oracle replays the CDF-gap integral
    * with window cumsum + lead. */
  val qWassersteinDrift = Q(
    "q93_wasserstein_drift",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      Drift.wasserstein(
        li.where(col("l_orderkey") % 2 === 0),
        li.where(col("l_orderkey") % 2 === 1),
        "l_quantity")
    },
    Some("""WITH u AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
          l_orderkey % 2 AS s FROM lineitem WHERE l_quantity IS NOT NULL),
      vc AS (SELECT v,
          count(CASE WHEN s = 0 THEN 1 END) AS c1,
          count(CASE WHEN s = 1 THEN 1 END) AS c2
        FROM u GROUP BY v),
      t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
          CAST(sum(c2) AS BIGINT) AS n2,
          min(v) AS mn, max(v) AS mx FROM vc),
      c AS (SELECT v,
          sum(c1) OVER (ORDER BY v) AS cum1,
          sum(c2) OVER (ORDER BY v) AS cum2,
          lead(v) OVER (ORDER BY v) AS nxt FROM vc),
      w AS (SELECT sum(abs(CAST(cum1 AS DOUBLE) / n1 -
            CAST(cum2 AS DOUBLE) / n2) * (nxt - v)) AS w1
        FROM c, t WHERE nxt IS NOT NULL GROUP BY n1, n2)
      SELECT round(w1, 6) AS w1,
        round(CASE WHEN mx > mn THEN w1 / (mx - mn) ELSE 0 END, 8)
          AS w1_norm,
        n1, n2
      FROM w, t"""))

  /** Referential-integrity screen ([[graft.ops.JoinHealth
    * .orphanStats]]): events.user_id against customer.c_custkey — a
    * deliberately imperfect FK (the id spaces only partially overlap),
    * so both orphan directions are exercised with nonzero counts. */
  val qOrphans = Q(
    "q94_fk_orphans",
    (s, dir) => JoinHealth.orphanStats(
      table(s, dir, "events"), "user_id",
      table(s, dir, "customer"), "c_custkey"),
    Some("""WITH ck AS (SELECT user_id AS k FROM events),
      pk AS (SELECT c_custkey AS k FROM customer),
      a AS (SELECT count(*) AS n_child FROM ck),
      b AS (SELECT count(*) AS n_child_orphan FROM ck
        WHERE NOT EXISTS (SELECT 1 FROM pk WHERE pk.k = ck.k)),
      c AS (SELECT count(*) AS n_parent FROM pk),
      d AS (SELECT count(*) AS n_parent_childless FROM pk
        WHERE NOT EXISTS (SELECT 1 FROM ck WHERE ck.k = pk.k))
      SELECT n_child, n_child_orphan,
        round(CASE WHEN n_child > 0
          THEN n_child_orphan / CAST(n_child AS DOUBLE) END, 8)
          AS p_child_orphan,
        n_parent, n_parent_childless
      FROM a, b, c, d"""))

  /** Join fan-out distribution ([[graft.ops.JoinHealth.fanout]]):
    * orders→lineitem — the "will this join explode" shape check
    * (childless parents count as fan-out 0). */
  val qFanout = Q(
    "q95_join_fanout",
    (s, dir) => JoinHealth.fanout(
      table(s, dir, "orders"), "o_orderkey",
      table(s, dir, "lineitem"), "l_orderkey"),
    Some("""WITH pk AS (SELECT DISTINCT o_orderkey AS k FROM orders),
      ck AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem
        GROUP BY 1),
      f AS (SELECT coalesce(c, 0) AS c FROM pk LEFT JOIN ck USING (k))
      SELECT count(*) AS n_parent,
        count(CASE WHEN c = 0 THEN 1 END) AS n_childless,
        min(c) AS min_fanout,
        quantile_cont(c, 0.5) AS p50_fanout,
        round(avg(c), 8) AS avg_fanout,
        max(c) AS max_fanout
      FROM f"""))

  /** Embedding hygiene ([[graft.ops.EmbeddingStats.normStats]]):
    * nulls, zero vectors, ragged dimensions, norm spread over the
    * embeddings table. Norms round to 6dp per row in BOTH engines so
    * min/max are bit-stable regardless of each engine's sum order. */
  val qEmbedNorms = Q(
    "q96_embedding_norms",
    (s, dir) => graft.ops.EmbeddingStats.normStats(
      table(s, dir, "embeddings"), "embedding"),
    Some("""WITH b AS (SELECT embedding IS NULL AS is_null,
        round(sqrt(list_sum(list_transform(embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm,
        len(embedding) AS dims
      FROM embeddings),
      md AS (SELECT dims FROM b WHERE NOT is_null
        GROUP BY dims ORDER BY count(*) DESC, dims LIMIT 1)
      SELECT count(*) AS n,
        count(CASE WHEN is_null THEN 1 END) AS n_null,
        count(CASE WHEN NOT is_null AND norm = 0.0 THEN 1 END) AS n_zero,
        CAST((SELECT dims FROM md) AS INT) AS n_dims,
        count(CASE WHEN NOT is_null
          AND dims <> (SELECT dims FROM md) THEN 1 END) AS n_ragged,
        min(norm) AS min_norm,
        round(avg(norm), 8) AS avg_norm,
        max(norm) AS max_norm
      FROM b"""))

  /** Join-key skew diagnosis ([[graft.ops.Skew.keySkewStats]]) on
    * events.user_id — the concentration report (top-1/top-10 share,
    * Herfindahl index) that decides whether q44's salting is needed
    * BEFORE the shuffle stalls. */
  val qKeySkew = Q(
    "q97_key_skew",
    (s, dir) => graft.ops.Skew.keySkewStats(
      table(s, dir, "events"), "user_id", topK = 10),
    Some("""WITH c AS (SELECT user_id AS k2, count(*) AS c FROM events
        GROUP BY 1),
      t AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS n_keys,
          CAST(max(c) AS BIGINT) AS cmax,
          sum(CAST(c AS DOUBLE) * c) AS sumsq FROM c),
      tk AS (SELECT CAST(sum(c) AS BIGINT) AS topk
        FROM (SELECT c FROM c ORDER BY c DESC, k2 LIMIT 10))
      SELECT n AS n_rows, n_keys,
        round(cmax / CAST(n AS DOUBLE), 8) AS top1_share,
        round(topk / CAST(n AS DOUBLE), 8) AS topk_share,
        round(sumsq / (CAST(n AS DOUBLE) * n), 8) AS hhi,
        round(n / CAST(n_keys AS DOUBLE), 8) AS avg_per_key
      FROM t, tk"""))

  /** Percentile-rank encoding table ([[graft.ops.Ranking
    * .pctRankTable]]): pandas rank(pct=True) per distinct l_quantity —
    * tie-averaged prefix-sum ranks over range partitions, never a
    * global sort. The oracle replays avgrank = cum − (cnt−1)/2. */
  val qPctRank = Q(
    "q98_pct_rank",
    (s, dir) => graft.ops.Ranking
      .pctRankTable(table(s, dir, "lineitem"), "l_quantity")
      .orderBy("l_quantity"),
    Some("""WITH vc AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
          count(*) AS cnt FROM lineitem WHERE l_quantity IS NOT NULL
        GROUP BY 1),
      r AS (SELECT v,
          sum(cnt) OVER (ORDER BY v) - (cnt - 1) / 2.0 AS avgrank
        FROM vc),
      t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc)
      SELECT v AS l_quantity, round(avgrank / n, 8) AS pct_rank
      FROM r, t ORDER BY l_quantity"""))

  /** Bloom-accelerated exact decontamination
    * ([[graft.ops.BloomPrune.antiJoin]]): remove documents whose
    * doc_id appears in a deny slice (every 7th doc). The result is
    * bit-identical to a plain anti join — the Bloom filter only
    * decides which rows pay for exact verification — so the oracle is
    * the plain NOT EXISTS. */
  val qBloomPrune = Q(
    "q99_bloom_decontaminate",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val deny = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("deny_id"))
      graft.ops.BloomPrune
        .antiJoin(docs.select("doc_id", "source"), "doc_id",
          deny, "deny_id")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("kept_id_sum"))
    },
    Some("""SELECT count(*) AS n_kept,
        CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
      FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM documents x
        WHERE x.doc_id % 7 = 0 AND x.doc_id = d.doc_id)"""))

  /** Whole-table PSI drift report ([[graft.ops.Drift.psiSweep]]):
    * four lineitem measures in one melted pass per side (2 scans total
    * vs 2·N for per-column psi calls). Per column the score equals
    * q84's operator exactly; the oracle replays each column's CTE
    * chain and unions them. */
  val qPsiSweep = Q(
    "q100_psi_sweep",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      Drift.psiSweep(
        li.where(col("l_orderkey") % 2 === 0),
        li.where(col("l_orderkey") % 2 === 1),
        Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"),
        bins = 10)
    },
    Some {
      val cs = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      def block(c: String, i: Int) =
        s"""u$i AS (SELECT CAST($c AS DOUBLE) AS v, l_orderkey % 2 AS s
            FROM lineitem WHERE $c IS NOT NULL),
          st$i AS (SELECT min(v) AS mn, max(v) AS mx FROM u$i),
          bb$i AS (SELECT CAST(least(floor((v - mn) / ((mx - mn) / 10)), 9)
              AS INT) AS bin, s FROM u$i, st$i),
          m$i AS (SELECT bin,
              count(CASE WHEN s = 0 THEN 1 END) AS c1,
              count(CASE WHEN s = 1 THEN 1 END) AS c2
            FROM bb$i GROUP BY bin),
          t$i AS (SELECT CAST(sum(c1) AS DOUBLE) AS n1,
              CAST(sum(c2) AS DOUBLE) AS n2 FROM m$i)"""
      def sel(c: String, i: Int) =
        s"""SELECT '$c' AS col_name,
            round(sum(((c1 + 0.5) / (n1 + 5.0) - (c2 + 0.5) / (n2 + 5.0))
              * ln(((c1 + 0.5) / (n1 + 5.0)) /
                   ((c2 + 0.5) / (n2 + 5.0)))), 8) AS psi,
            CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
          FROM m$i CROSS JOIN t$i GROUP BY n1, n2"""
      "WITH " + cs.zipWithIndex.map { case (c, i) => block(c, i) }
        .mkString(", ") + " " +
        cs.zipWithIndex.map { case (c, i) => sel(c, i) }
          .mkString(" UNION ALL ") +
        " ORDER BY col_name"
    })

  /** Association rules ([[graft.ops.Itemsets.pairRules]]) over user ×
    * event_type baskets — support/confidence/lift from exact presence
    * counts; the self-join cost is per-basket vocabulary, never the
    * corpus. */
  val qPairRules = Q(
    "q103_association_rules",
    (s, dir) => graft.ops.Itemsets.pairRules(
      table(s, dir, "events"), "user_id", "event_type",
      minSupportCount = 10),
    Some("""WITH b AS (SELECT DISTINCT user_id AS bk, event_type AS it
          FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      n AS (SELECT count(DISTINCT bk) AS nb FROM b),
      ic AS (SELECT it, count(*) AS c FROM b GROUP BY it),
      pc AS (SELECT a.it AS i1, b2.it AS i2, count(*) AS c12
        FROM b a JOIN b b2 ON a.bk = b2.bk AND a.it < b2.it
        GROUP BY 1, 2 HAVING count(*) >= 10),
      d AS (SELECT i1 AS antecedent, i2 AS consequent, c12 FROM pc
        UNION ALL SELECT i2, i1, c12 FROM pc)
      SELECT antecedent, consequent, c12 AS support_cnt,
        round(c12 / CAST(nb AS DOUBLE), 8) AS support,
        round(c12 / CAST(ca.c AS DOUBLE), 8) AS confidence,
        round((c12 * CAST(nb AS DOUBLE)) /
          (ca.c * CAST(cc.c AS DOUBLE)), 8) AS lift
      FROM d CROSS JOIN n
      JOIN ic ca ON ca.it = antecedent
      JOIN ic cc ON cc.it = consequent
      ORDER BY antecedent, consequent"""))

  /** Deterministic train/val/test split ([[graft.ops.Sampling
    * .splitAssign]]): per-(lang, split) counts over documents keyed by
    * doc_id — membership is a pure function of the key (stable across
    * dataset versions), oracle replays the md5 percent-bucket. */
  val qSplitAssign = Q(
    "q104_split_assign",
    (s, dir) => graft.ops.Sampling
      .splitAssign(table(s, dir, "documents"), "doc_id", 80, 10)
      .groupBy("lang", "split").agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "split"),
    Some("""WITH b AS (SELECT lang,
        ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15))
          ::BIGINT % 100 AS bk
      FROM documents)
      SELECT lang,
        CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
          ELSE 'test' END AS split,
        count(*) AS cnt
      FROM b GROUP BY 1, 2 ORDER BY lang, split"""))

  /** Q–Q comparison table ([[graft.ops.Drift.qqTable]]): exact
    * quantiles of both slices side by side per percentile — the
    * drift-visualization artifact (one fused percentile buffer per
    * slice, stack-melted). */
  val qQqTable = Q(
    "q105_qq_table",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      Drift.qqTable(
        li.where(col("l_orderkey") % 2 === 0),
        li.where(col("l_orderkey") % 2 === 1),
        "l_extendedprice")
    },
    Some("""WITH a AS (SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE),
          [0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]) AS qs
        FROM lineitem WHERE l_orderkey % 2 = 0),
      b AS (SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE),
          [0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]) AS qs2
        FROM lineitem WHERE l_orderkey % 2 = 1),
      z AS (SELECT CAST(unnest([0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9,
          0.95, 0.99]) AS DOUBLE) AS p,
        unnest(qs) AS q1r, unnest(qs2) AS q2r FROM a, b),
      r AS (SELECT p, round(q1r, 6) AS q1, round(q2r, 6) AS q2 FROM z)
      SELECT p, q1, q2, round(q2 - q1, 6) AS gap FROM r ORDER BY p"""))

  /** Winsorized robust moments ([[graft.ops.Outliers
    * .winsorizedStats]]): p01/p99-clamped mean and std via exact
    * cents-quantized sums — bit-stable across engines by construction
    * (no float aggregation order anywhere). */
  val qWinsorized = Q(
    "q113_winsorized_stats",
    (s, dir) =>
      Outliers.winsorizedStats(
        table(s, dir, "lineitem"), "l_extendedprice", 0.01, 0.99),
    Some("""WITH q AS (SELECT
          round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.01), 6) AS blo,
          round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 6) AS bhi
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
      c AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x,
              least(greatest(CAST(l_extendedprice AS DOUBLE), blo), bhi) AS cv,
              blo, bhi
            FROM lineitem, q
            WHERE l_extendedprice IS NOT NULL
              AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
      a AS (SELECT count(*) AS n,
              CAST(sum(CASE WHEN x < blo THEN 1 ELSE 0 END) AS BIGINT)
                AS n_clamped_lo,
              CAST(sum(CASE WHEN x > bhi THEN 1 ELSE 0 END) AS BIGINT)
                AS n_clamped_hi,
              sum(CAST(round(cv * 100) AS BIGINT)) AS sc,
              sum(CAST(round(cv * 100) AS HUGEINT)
                * CAST(round(cv * 100) AS HUGEINT)) AS sc2,
              any_value(blo) AS blo, any_value(bhi) AS bhi
            FROM c)
      SELECT n, blo AS lo_bound, bhi AS hi_bound, n_clamped_lo,
        n_clamped_hi,
        round(CAST(sc AS DOUBLE) / n / 100.0, 6) AS w_mean,
        round(sqrt((CAST(sc2 AS DOUBLE)
            - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n)
          / (n - 1.0)) / 100.0, 6) AS w_std
      FROM a"""))

  /** Gini concentration of order value ([[graft.ops.Skew.gini]]):
    * exact Σ i·x₍ᵢ₎ via tie-averaged prefix-sum ranks on the Spark
    * side (no global window); the oracle uses the plain sorted
    * row_number form, which is tie-order-invariant. */
  val qGini = Q(
    "q114_value_gini",
    (s, dir) =>
      graft.ops.Skew.gini(table(s, dir, "orders"), "o_totalprice"),
    Some("""WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
        WHERE o_totalprice IS NOT NULL
          AND NOT isnan(CAST(o_totalprice AS DOUBLE))),
      r AS (SELECT x, row_number() OVER (ORDER BY x) AS i FROM v),
      a AS (SELECT count(*) AS n, sum(x) AS sx, sum(i * x) AS s1 FROM r)
      SELECT n, round(2.0 * s1 / (n * sx) - (n + 1.0) / n, 6) AS gini
      FROM a"""))

  /** Weight-of-Evidence / Information-Value bin scoring
    * ([[graft.ops.FeatureEng.woeTable]]): event value vs the purchase
    * target over 8 fixed-width bins, Laplace-smoothed — exact counts,
    * per-row ln. */
  val qWoe = Q(
    "q115_woe_iv",
    (s, dir) =>
      graft.ops.FeatureEng.woeTable(
        table(s, dir, "events"), "value",
        col("event_type") === "purchase", bins = 8),
    Some("""WITH u AS (SELECT CAST(value AS DOUBLE) AS v,
          (event_type = 'purchase') AS t FROM events
        WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
          AND event_type IS NOT NULL),
      st AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
      b AS (SELECT CAST(least(floor((v - mn) / ((mx - mn) / 8)), 7)
              AS INT) AS bin, t FROM u, st),
      m0 AS (SELECT bin, count(CASE WHEN t THEN 1 END) AS n_pos,
              count(CASE WHEN NOT t THEN 1 END) AS n_neg
            FROM b GROUP BY bin),
      ax AS (SELECT unnest(generate_series(0, 7)) AS bin),
      m AS (SELECT ax.bin, coalesce(m0.n_pos, 0) AS n_pos,
              coalesce(m0.n_neg, 0) AS n_neg
            FROM ax LEFT JOIN m0 ON m0.bin = ax.bin),
      tt AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM m)
      SELECT bin, n_pos, n_neg,
        round(ln(((n_pos + 0.5) / (tp + 4.0))
          / ((n_neg + 0.5) / (tn + 4.0))), 6) AS woe,
        round((((n_pos + 0.5) / (tp + 4.0)) - ((n_neg + 0.5) / (tn + 4.0)))
          * ln(((n_pos + 0.5) / (tp + 4.0))
            / ((n_neg + 0.5) / (tn + 4.0))), 6) AS iv_term
      FROM m CROSS JOIN tt ORDER BY bin"""))

  /** Smoothed target encoding ([[graft.ops.FeatureEng.targetEncode]]):
    * order priority vs the F-status target, shrunk toward the global
    * prior with m = 10 pseudo-counts. */
  val qTargetEnc = Q(
    "q116_target_encoding",
    (s, dir) =>
      graft.ops.FeatureEng.targetEncode(
          table(s, dir, "orders"), "o_orderpriority",
          col("o_orderstatus") === "F", m = 10.0)
        .orderBy("o_orderpriority"),
    Some("""WITH c AS (SELECT o_orderpriority AS p, count(*) AS n,
          count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_pos
        FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1),
      t AS (SELECT sum(n) AS tot, sum(n_pos) AS totpos FROM c)
      SELECT p AS o_orderpriority, n, n_pos,
        round((n_pos + 10.0 * (totpos / CAST(tot AS DOUBLE)))
          / (n + 10.0), 6) AS enc
      FROM c CROSS JOIN t ORDER BY o_orderpriority"""))

  /** Modified-z-score anomaly screen ([[graft.ops.Outliers
    * .robustZScreen]]): median/MAD-based outlier counting with the
    * 3.5 cutoff — fences from 6dp-rounded exact medians, so both
    * engines compare bit-identical cutoffs. */
  val qRobustZ = Q(
    "q118_robust_z",
    (s, dir) => Outliers.robustZScreen(
      table(s, dir, "events"), "value", cutoff = 3.5),
    Some("""WITH m AS (SELECT
          round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS med
        FROM events WHERE value IS NOT NULL
          AND NOT isnan(CAST(value AS DOUBLE))),
      m2 AS (SELECT
          round(quantile_cont(abs(CAST(value AS DOUBLE) - med), 0.5), 6)
            AS mad
        FROM events, m WHERE value IS NOT NULL
          AND NOT isnan(CAST(value AS DOUBLE))),
      a AS (SELECT count(*) AS n,
          count(CASE WHEN abs(0.6745::DOUBLE
            * (CAST(value AS DOUBLE) - med) / mad) > 3.5::DOUBLE
            THEN 1 END) AS na
        FROM events, m, m2
        WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)))
      SELECT n, med AS median, mad,
        CASE WHEN mad <> 0 THEN na END AS n_anomalies,
        CASE WHEN mad <> 0 THEN round(CAST(na AS DOUBLE) / n, 8) END
          AS anomaly_rate
      FROM a, m, m2"""))

  /** Exact weighted quantiles ([[graft.ops.Ranking
    * .weightedQuantiles]]): price percentiles weighted by quantity —
    * integer cumulative weights via the distributed prefix-sum rank
    * pass, no global window. */
  val qWeightedQuantiles = Q(
    "q120_weighted_quantiles",
    (s, dir) =>
      graft.ops.Ranking.weightedQuantiles(
        table(s, dir, "lineitem"), "l_extendedprice", "l_quantity",
        Seq(0.1, 0.25, 0.5, 0.75, 0.9)),
    Some("""WITH base AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
          CAST(l_quantity AS BIGINT) AS w FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
          AND l_quantity IS NOT NULL AND CAST(l_quantity AS BIGINT) > 0),
      c AS (SELECT v, sum(w) AS w FROM base GROUP BY v),
      r AS (SELECT v, w, coalesce(sum(w) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + w
              AS cumhi
            FROM c),
      t AS (SELECT sum(w) AS tw FROM c),
      qs AS (SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS DOUBLE)
               AS q)
      SELECT q, min(v) AS value FROM r, t, qs WHERE cumhi >= q * tw
      GROUP BY q ORDER BY q"""))

  /** Per-segment PSI screen ([[graft.ops.Drift.segmentPsi]]): each
    * event type's value distribution vs its complement, one binned
    * pass — "which cohort is the drift coming from". All counts cast
    * to DOUBLE before the smoothing arithmetic on the oracle side
    * (DuckDB decimal literals would otherwise keep the math in
    * DECIMAL). */
  val qSegmentPsi = Q(
    "q125_segment_psi",
    (s, dir) => Drift.segmentPsi(
        table(s, dir, "events"), "event_type", "value", bins = 10)
      .orderBy("event_type"),
    Some("""WITH u AS (SELECT event_type AS s, CAST(value AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL
            AND NOT isnan(CAST(value AS DOUBLE))
            AND event_type IS NOT NULL),
      st AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
      b AS (SELECT s, CAST(least(floor((v - mn) / ((mx - mn) / 10)), 9)
              AS INT) AS bin FROM u, st),
      m AS (SELECT s, bin, count(*) AS c FROM b GROUP BY 1, 2),
      bt AS (SELECT bin, sum(c) AS ct FROM m GROUP BY 1),
      stt AS (SELECT s, sum(c) AS ns FROM m GROUP BY 1),
      g AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM m),
      grid AS (SELECT stt.s, stt.ns,
          CAST(stt.ns AS DOUBLE) AS nsd, CAST(bt.ct AS DOUBLE) AS ct,
          CAST(coalesce(m.c, 0) AS DOUBLE) AS c
        FROM stt CROSS JOIN bt
        LEFT JOIN m ON m.s = stt.s AND m.bin = bt.bin)
      SELECT s AS event_type, CAST(any_value(ns) AS BIGINT) AS n_seg,
        round(sum(
          ((c + 0.5) / (nsd + 5.0) - (ct - c + 0.5) / (n - nsd + 5.0))
          * ln(((c + 0.5) / (nsd + 5.0))
            / ((ct - c + 0.5) / (n - nsd + 5.0)))), 8) AS psi
      FROM grid CROSS JOIN g GROUP BY s ORDER BY event_type"""))

  /** Mann-Whitney U drift significance ([[graft.ops.Hypothesis
    * .mannWhitneyU]]): are purchase values stochastically larger than
    * the rest? Rank sums ride the distributed prefix-sum ranking; the
    * oracle rebuilds the identical avgrank/decimal accumulation with a
    * window over the per-value count table. */
  val qMannWhitney = Q(
    "q130_mann_whitney",
    (s, dir) => Hypothesis.mannWhitneyU(
      table(s, dir, "events"), "value", col("event_type") === "purchase"),
    Some("""WITH u AS (SELECT CAST(value AS DOUBLE) AS v,
          event_type = 'purchase' AS a FROM events
        WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
          AND event_type IS NOT NULL),
      c AS (SELECT v, count(*) AS cnt,
              count(CASE WHEN a THEN 1 END) AS ca
            FROM u GROUP BY v),
      r AS (SELECT cnt, ca,
              sum(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0
                AS avgrank
            FROM c),
      s AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
              CAST(sum(cnt) AS BIGINT) AS n,
              sum(CAST(avgrank * 2 * ca AS DECIMAL(38,0))) AS r2,
              sum(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt) AS tt
            FROM r),
      t AS (SELECT n1, n - n1 AS n2,
              CAST(n1 AS DOUBLE) AS n1d, CAST(n - n1 AS DOUBLE) AS n2d,
              CAST(n AS DOUBLE) AS nd, CAST(tt AS DOUBLE) AS ttd,
              CAST(r2 AS DOUBLE) / 2.0
                - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0
                AS u1
            FROM s),
      g AS (SELECT *, n1d * n2d / 12.0
              * ((nd + 1.0) - ttd / (nd * (nd - 1.0))) AS sig2
            FROM t)
      SELECT n1, n2, u1,
        CASE WHEN n1 > 0 AND n2 > 0 AND sig2 > 0.0
          THEN round((u1 - n1d * n2d / 2.0) / sqrt(sig2), 6) END AS z
      FROM g"""))

  /** Welch's t segment comparison ([[graft.ops.Hypothesis.welchT]]):
    * returned lineitems vs the rest on extended price. Both engines
    * accumulate cents in DECIMAL(38,0) — the summation-order-proof
    * exact layer — and derive t / Welch–Satterthwaite df through the
    * same double expression. */
  val qWelchT = Q(
    "q133_welch_ttest",
    (s, dir) => Hypothesis.welchT(
      table(s, dir, "lineitem"), "l_extendedprice",
      col("l_returnflag") === "R"),
    Some("""WITH u AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
          l_returnflag = 'R' AS a FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
          AND l_returnflag IS NOT NULL),
      q AS (SELECT CAST(round(v * 100) AS DECIMAL(38,0)) AS c, a FROM u),
      s AS (SELECT count(CASE WHEN a THEN 1 END) AS n1,
              count(CASE WHEN NOT a THEN 1 END) AS n2,
              sum(CASE WHEN a THEN c END) AS s1,
              sum(CASE WHEN NOT a THEN c END) AS s2,
              sum(CASE WHEN a THEN c * c END) AS q1,
              sum(CASE WHEN NOT a THEN c * c END) AS q2
            FROM q),
      d AS (SELECT n1, n2,
              CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
              CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
              CAST(q1 AS DOUBLE) AS q1d, CAST(q2 AS DOUBLE) AS q2d
            FROM s),
      m AS (SELECT *,
              s1d / n1d / 100.0 AS m1, s2d / n2d / 100.0 AS m2,
              (q1d - s1d * s1d / n1d) / (n1d - 1.0) / 10000.0 AS v1,
              (q2d - s2d * s2d / n2d) / (n2d - 1.0) / 10000.0 AS v2
            FROM d),
      g AS (SELECT *, v1 / n1d + v2 / n2d AS se2 FROM m)
      SELECT n1, n2, round(m1, 6) AS mean1, round(m2, 6) AS mean2,
        CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 0.0
          THEN round((m1 - m2) / sqrt(se2), 6) END AS t,
        CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 0.0
          THEN round(se2 * se2
            / ((v1 / n1d) * (v1 / n1d) / (n1d - 1.0)
              + (v2 / n2d) * (v2 / n2d) / (n2d - 1.0)), 4) END AS df
      FROM g"""))

  /** Calibration table ([[graft.ops.FeatureEng.calibrationTable]]):
    * equal-width value bins vs observed purchase rate, all bins
    * emitted — pure counts, engine-exact. */
  val qCalibration = Q(
    "q136_calibration",
    (s, dir) => graft.ops.FeatureEng.calibrationTable(
      table(s, dir, "events"), "value", col("event_type") === "purchase",
      bins = 10),
    Some("""WITH u AS (SELECT CAST(value AS DOUBLE) AS v,
          event_type = 'purchase' AS t FROM events
        WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
          AND event_type IS NOT NULL),
      st AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
      b AS (SELECT CAST(least(floor((v - mn) / ((mx - mn) / 10)), 9)
              AS INT) AS bin, t FROM u, st),
      m0 AS (SELECT bin, count(*) AS n,
              count(CASE WHEN t THEN 1 END) AS n_pos
            FROM b GROUP BY bin),
      ax AS (SELECT unnest(generate_series(0, 9)) AS bin),
      m AS (SELECT ax.bin, coalesce(m0.n, 0) AS n,
              coalesce(m0.n_pos, 0) AS n_pos
            FROM ax LEFT JOIN m0 ON m0.bin = ax.bin)
      SELECT bin, n, n_pos,
        CASE WHEN n > 0 THEN round(CAST(n_pos AS DOUBLE) / n, 6) END
          AS pos_rate
      FROM m ORDER BY bin"""))

  /** Cumulative gains / lift ([[graft.ops.FeatureEng.liftTable]]):
    * descending value deciles vs purchase rate. Cut points are exact
    * percentiles 6dp-rounded on BOTH sides, and the probe
    * probabilities are embedded from the same Scala doubles the Spark
    * side computes with (the 1.0 − i/10 ulp trap). */
  val qLift = Q(
    "q137_lift",
    (s, dir) => graft.ops.FeatureEng.liftTable(
      table(s, dir, "events"), "value", col("event_type") === "purchase",
      k = 10),
    Some {
      val probs = (1 until 10).map(i => 1.0 - i.toDouble / 10)
      val cases = (1 to 9)
        .map(i => s"WHEN v > cs[$i] THEN $i").mkString(" ")
      s"""WITH u AS (SELECT CAST(value AS DOUBLE) AS v,
          event_type = 'purchase' AS t FROM events
        WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
          AND event_type IS NOT NULL),
      cuts AS (SELECT [round(x, 6) for x in
          quantile_cont(v, [${probs.mkString(", ")}])] AS cs FROM u),
      b AS (SELECT CASE $cases ELSE 10 END AS bucket, t FROM u, cuts),
      m0 AS (SELECT bucket, count(*) AS n,
              count(CASE WHEN t THEN 1 END) AS n_pos
            FROM b GROUP BY bucket),
      ax AS (SELECT unnest(generate_series(1, 10)) AS bucket),
      m AS (SELECT ax.bucket, coalesce(m0.n, 0) AS n,
              coalesce(m0.n_pos, 0) AS n_pos
            FROM ax LEFT JOIN m0 ON m0.bucket = ax.bucket),
      c AS (SELECT bucket, n, n_pos,
              CAST(sum(n) OVER (ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
              CAST(sum(n_pos) OVER (ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
            FROM m),
      tt AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
              CAST(sum(n_pos) AS BIGINT) AS tp FROM m)
      SELECT bucket, n, n_pos, cum_n, cum_pos,
        CASE WHEN cum_n > 0
          THEN round(CAST(cum_pos AS DOUBLE) / cum_n, 6) END AS cum_rate,
        CASE WHEN cum_n > 0 AND tp > 0
          THEN round((CAST(cum_pos AS DOUBLE) / cum_n)
            / (CAST(tp AS DOUBLE) / tn), 6) END AS lift
      FROM c, tt ORDER BY bucket"""
    })

  /** Exact AUC ([[graft.ops.Hypothesis.auc]]) via the rank-sum
    * identity — no threshold sweep, ties at ½ through averaged
    * ranks. */
  val qAuc = Q(
    "q141_auc",
    (s, dir) => Hypothesis.auc(
      table(s, dir, "events"), "value", col("event_type") === "purchase"),
    Some("""WITH u AS (SELECT CAST(value AS DOUBLE) AS v,
          event_type = 'purchase' AS a FROM events
        WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
          AND event_type IS NOT NULL),
      c AS (SELECT v, count(*) AS cnt,
              count(CASE WHEN a THEN 1 END) AS ca
            FROM u GROUP BY v),
      r AS (SELECT cnt, ca,
              sum(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0
                AS avgrank
            FROM c),
      s AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
              CAST(sum(cnt) AS BIGINT) AS n,
              sum(CAST(avgrank * 2 * ca AS DECIMAL(38,0))) AS r2
            FROM r),
      t AS (SELECT n1, n - n1 AS n2,
              CAST(n1 AS DOUBLE) AS n1d, CAST(n - n1 AS DOUBLE) AS n2d,
              CAST(r2 AS DOUBLE) / 2.0
                - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0
                AS u1
            FROM s)
      SELECT n1 AS n_pos, n2 AS n_neg,
        CASE WHEN n1 > 0 AND n2 > 0
          THEN round(u1 / (n1d * n2d), 6) END AS auc
      FROM t"""))

  /** Kruskal-Wallis H ([[graft.ops.Hypothesis.kruskalWallis]]) across
    * all event types — the k-sample rank test with decimal-exact
    * per-group rank sums. */
  val qKruskal = Q(
    "q142_kruskal",
    (s, dir) => Hypothesis.kruskalWallis(
      table(s, dir, "events"), "value", "event_type"),
    Some("""WITH u AS (SELECT CAST(value AS DOUBLE) AS v,
          event_type AS g FROM events
        WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
          AND event_type IS NOT NULL),
      cg AS (SELECT v, g, count(*) AS c FROM u GROUP BY v, g),
      cv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cnt FROM cg GROUP BY v),
      r AS (SELECT v, cnt,
              sum(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0
                AS avgrank
            FROM cv),
      pg AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng,
              sum(CAST(avgrank * 2 * c AS DECIMAL(38,0))) AS rg2
            FROM cg JOIN r USING (v) GROUP BY g),
      tt AS (SELECT sum(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt)
               AS tt FROM cv),
      s AS (SELECT CAST(count(*) AS BIGINT) AS k,
              CAST(sum(ng) AS BIGINT) AS n,
              sum((CAST(rg2 AS DOUBLE) / 2.0)
                * (CAST(rg2 AS DOUBLE) / 2.0) / ng) AS s
            FROM pg),
      d AS (SELECT k, n, s, CAST(n AS DOUBLE) AS nd,
              CAST(tt AS DOUBLE) AS ttd FROM s, tt)
      SELECT k AS n_groups, n,
        CASE WHEN k > 1 AND (1.0 - ttd / (nd * nd * nd - nd)) > 0.0
          THEN round((12.0 / (nd * (nd + 1.0)) * s - 3.0 * (nd + 1.0))
            / (1.0 - ttd / (nd * nd * nd - nd)), 6) END AS h
      FROM d"""))

  /** One-way ANOVA F + η² ([[graft.ops.Hypothesis.anovaF]]) on
    * cents-exact price sums across return flags. */
  val qAnova = Q(
    "q143_anova",
    (s, dir) => Hypothesis.anovaF(
      table(s, dir, "lineitem"), "l_extendedprice", "l_returnflag"),
    Some("""WITH u AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
          l_returnflag AS g FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
          AND l_returnflag IS NOT NULL),
      q AS (SELECT CAST(round(v * 100) AS DECIMAL(38,0)) AS c, g FROM u),
      pg AS (SELECT g, count(*) AS ng, sum(c) AS sg, sum(c * c) AS qg
            FROM q GROUP BY g),
      s AS (SELECT CAST(count(*) AS BIGINT) AS k,
              CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS st, sum(qg) AS qt,
              sum(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng) AS sb
            FROM pg),
      d AS (SELECT k, n, sb, CAST(k AS DOUBLE) AS kd,
              CAST(n AS DOUBLE) AS nd, CAST(st AS DOUBLE) AS std,
              CAST(qt AS DOUBLE) AS qtd FROM s),
      e AS (SELECT *, (sb - std * std / nd) / 10000.0 AS ssb,
              (qtd - std * std / nd) / 10000.0 AS sst FROM d)
      SELECT k AS n_groups, n,
        CASE WHEN k > 1 AND n > k AND (sst - ssb) > 0.0
          THEN round((ssb / (kd - 1.0)) / ((sst - ssb) / (nd - kd)), 6)
          END AS f,
        CASE WHEN k > 1 AND n > k AND (sst - ssb) > 0.0 AND sst > 0.0
          THEN round(ssb / sst, 6) END AS eta2
      FROM e"""))

  /** Two-proportion z-test ([[graft.ops.Hypothesis.propZTest]]):
    * error rate between even/odd user cohorts — pure counts, pooled
    * variance. */
  val qPropZ = Q(
    "q144_prop_ztest",
    (s, dir) => Hypothesis.propZTest(
      table(s, dir, "events"),
      col("event_type") === "error", col("user_id") % 2 === 0),
    Some("""WITH u AS (SELECT event_type = 'error' AS y,
          user_id % 2 = 0 AS a FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
      s AS (SELECT count(CASE WHEN a THEN 1 END) AS n1,
              count(CASE WHEN NOT a THEN 1 END) AS n2,
              count(CASE WHEN a AND y THEN 1 END) AS s1,
              count(CASE WHEN NOT a AND y THEN 1 END) AS s2
            FROM u),
      d AS (SELECT n1, n2,
              CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
              CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d
            FROM s),
      e AS (SELECT *, s1d / n1d AS p1, s2d / n2d AS p2,
              (s1d + s2d) / (n1d + n2d) AS p FROM d),
      f AS (SELECT *, p * (1.0 - p) * (1.0 / n1d + 1.0 / n2d) AS se2
            FROM e)
      SELECT n1, n2,
        CASE WHEN n1 > 0 THEN round(p1, 6) END AS p1,
        CASE WHEN n2 > 0 THEN round(p2, 6) END AS p2,
        CASE WHEN n1 > 0 AND n2 > 0 AND se2 > 0.0
          THEN round((p1 - p2) / sqrt(se2), 6) END AS z
      FROM f"""))

  /** Exact-sum OLS ([[graft.ops.Hypothesis.olsFit]]): price ~
    * quantity with every moment in decimal(38,0) from quantized
    * integers — bit-reproducible normal equations (the slope is the
    * effective unit price). */
  val qOls = Q(
    "q145_ols",
    (s, dir) => Hypothesis.olsFit(
      table(s, dir, "lineitem"), "l_quantity", "l_extendedprice"),
    Some("""WITH u AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
          CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
        WHERE l_quantity IS NOT NULL
          AND NOT isnan(CAST(l_quantity AS DOUBLE))
          AND l_extendedprice IS NOT NULL
          AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
      q AS (SELECT CAST(round(x * 100) AS DECIMAL(38,0)) AS x,
              CAST(round(y * 100) AS DECIMAL(38,0)) AS y FROM u),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
              sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
              sum(y * y) AS syy FROM q),
      d AS (SELECT n, CAST(n AS DOUBLE) AS nd,
              CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
              CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
              CAST(syy AS DOUBLE) AS syyd FROM s),
      e AS (SELECT *, nd * sxyd - sxd * syd AS num,
              nd * sxxd - sxd * sxd AS vx,
              nd * syyd - syd * syd AS vy FROM d)
      SELECT n,
        CASE WHEN vx > 0 THEN round(num / vx * 1.0, 6) END AS slope,
        CASE WHEN vx > 0 THEN round((syd / 100.0
          - num / vx * 1.0 * (sxd / 100.0)) / nd, 6) END AS intercept,
        CASE WHEN vx > 0 AND vy > 0
          THEN round(num * num / (vx * vy), 6) END AS r2
      FROM e"""))

  /** Binned numeric MI ([[graft.ops.Association.binnedMutualInfo]]):
    * quantity × price on the 10×10 equal-width grid — the
    * nonlinear-dependence screen Pearson misses. */
  val qNumericMi = Q(
    "q150_numeric_mi",
    (s, dir) => Association.binnedMutualInfo(
      table(s, dir, "lineitem"), "l_quantity", "l_extendedprice"),
    Some("""WITH u AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
          CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
        WHERE l_quantity IS NOT NULL
          AND NOT isnan(CAST(l_quantity AS DOUBLE))
          AND l_extendedprice IS NOT NULL
          AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
      st AS (SELECT min(x) AS mnx, max(x) AS mxx,
              min(y) AS mny, max(y) AS mxy FROM u),
      bb AS (SELECT
          CAST(least(floor((x - mnx) / ((mxx - mnx) / 10)), 9) AS INT)
            AS b_x,
          CAST(least(floor((y - mny) / ((mxy - mny) / 10)), 9) AS INT)
            AS b_y
        FROM u, st),
      j AS (SELECT b_x, b_y, count(*) AS c FROM bb GROUP BY 1, 2),
      nn AS (SELECT sum(c) AS n FROM j),
      exy AS (SELECT sum(c * (ln(n) - ln(c))) / n AS hxy
        FROM j, nn GROUP BY n),
      ex AS (SELECT sum(cx * (ln(n) - ln(cx))) / n AS hx
        FROM (SELECT sum(c) AS cx FROM j GROUP BY b_x), nn GROUP BY n),
      ey AS (SELECT sum(cy * (ln(n) - ln(cy))) / n AS hy
        FROM (SELECT sum(c) AS cy FROM j GROUP BY b_y), nn GROUP BY n)
      SELECT round(hx + hy - hxy, 8) AS mi,
        round(CASE WHEN hx <> 0 THEN (hx + hy - hxy) / hx END, 8)
          AS u_x_given_y,
        round(CASE WHEN hy <> 0 THEN (hx + hy - hxy) / hy END, 8)
          AS u_y_given_x,
        CAST(n AS BIGINT) AS n
      FROM exy, ex, ey, nn"""))

  /** Dataset snapshot diff ([[graft.ops.Delta.snapshotDiff]]): v1 =
    * documents minus every 7th id, v2 = documents minus every 5th id
    * with text revised on %11 ids and n_chars bumped on %13 ids —
    * added/removed/changed/unchanged classification summarized per
    * (status, changed-column set). Pure null-safe equality on one full
    * outer join; all counts exact. */
  val qSnapshotDiff = Q(
    "q154_snapshot_diff",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val v1 = docs.where(col("doc_id") % 7 =!= 0)
      val v2 = docs.where(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
        .withColumn("n_chars", when(col("doc_id") % 13 === 0,
          col("n_chars") + 1).otherwise(col("n_chars")))
      graft.ops.Delta.snapshotDiff(v1, v2, Seq("doc_id"))
        .groupBy("status", "changed_cols")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_key"),
          max("doc_id").as("max_key"))
        .orderBy("status", "changed_cols")
    },
    Some("""WITH v1 AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
      v2 AS (SELECT doc_id,
          CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]'
               ELSE text END AS text,
          lang, source,
          CASE WHEN doc_id % 13 = 0 THEN n_chars + 1
               ELSE n_chars END AS n_chars
        FROM documents WHERE doc_id % 5 <> 0),
      j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
          v1.doc_id IS NOT NULL AS in_old,
          v2.doc_id IS NOT NULL AS in_new,
          v1.text IS NOT DISTINCT FROM v2.text AS eq_text,
          v1.lang IS NOT DISTINCT FROM v2.lang AS eq_lang,
          v1.source IS NOT DISTINCT FROM v2.source AS eq_source,
          v1.n_chars IS NOT DISTINCT FROM v2.n_chars AS eq_nchars
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id),
      d AS (SELECT doc_id,
          CASE WHEN NOT in_old THEN 'added'
               WHEN NOT in_new THEN 'removed'
               WHEN eq_text AND eq_lang AND eq_source AND eq_nchars
                 THEN 'unchanged' ELSE 'changed' END AS status,
          CASE WHEN in_old AND in_new AND
                 NOT (eq_text AND eq_lang AND eq_source AND eq_nchars)
            THEN concat_ws(',',
              CASE WHEN NOT eq_text THEN 'text' END,
              CASE WHEN NOT eq_lang THEN 'lang' END,
              CASE WHEN NOT eq_source THEN 'source' END,
              CASE WHEN NOT eq_nchars THEN 'n_chars' END)
            ELSE '' END AS changed_cols
        FROM j)
      SELECT status, changed_cols, count(*) AS n,
        min(doc_id) AS min_key, max(doc_id) AS max_key
      FROM d GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** CUPED variance-reduced A/B readout ([[Hypothesis.cuped]]): users
    * split by id parity, per-user spend summed over a pre period
    * (before Jan 16) and an experiment period (after), the experiment
    * metric adjusted by the pooled pre-period covariate. Unit metrics
    * are exact cent sums; every moment is a decimal(38,0) integer, so
    * θ and both diffs are engine-exact doubles. */
  val qCuped = Q(
    "q163_cuped",
    (s, dir) => {
      val cut = 1705363200000000L // 2024-01-16T00:00:00Z in epoch-us
      val cents = round(col("value") * 100, 0).cast("long")
      val units = QueryCatalog.eventsUs(s, dir)
        .select(col("user_id"), col("value"),
          col("ts").as("tus"))
        .groupBy("user_id")
        .agg(
          (coalesce(sum(when(col("tus") < cut, cents)), lit(0L))
            .cast("double") / 100.0).as("pre"),
          (coalesce(sum(when(col("tus") >= cut, cents)), lit(0L))
            .cast("double") / 100.0).as("post"))
      Hypothesis.cuped(units, "pre", "post",
        groupA = pmod(col("user_id"), lit(2)) === 0)
    },
    Some("""WITH e AS (SELECT user_id, value, epoch_us(ts) AS tus
          FROM events),
      u AS (SELECT user_id % 2 = 0 AS a,
          CAST(coalesce(sum(CASE WHEN tus < 1705363200000000 THEN
            CAST(round(value * 100) AS BIGINT) END), 0) AS DOUBLE)
            / 100.0 AS pre,
          CAST(coalesce(sum(CASE WHEN tus >= 1705363200000000 THEN
            CAST(round(value * 100) AS BIGINT) END), 0) AS DOUBLE)
            / 100.0 AS post
        FROM e GROUP BY user_id),
      q AS (SELECT a, CAST(round(pre * 100) AS DECIMAL(38,0)) AS x,
              CAST(round(post * 100) AS DECIMAL(38,0)) AS y FROM u),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
          sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
          sum(x * x) AS sxx, sum(y * y) AS syy,
          CAST(count(CASE WHEN a THEN 1 END) AS BIGINT) AS n1,
          CAST(count(CASE WHEN NOT a THEN 1 END) AS BIGINT) AS n2,
          sum(CASE WHEN a THEN x END) AS sx1,
          sum(CASE WHEN NOT a THEN x END) AS sx2,
          sum(CASE WHEN a THEN y END) AS sy1,
          sum(CASE WHEN NOT a THEN y END) AS sy2
        FROM q),
      d AS (SELECT n1, n2, CAST(n AS DOUBLE) AS nd,
          CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
          CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
          CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
          CAST(syy AS DOUBLE) AS syyd,
          CAST(sx1 AS DOUBLE) AS sx1d, CAST(sx2 AS DOUBLE) AS sx2d,
          CAST(sy1 AS DOUBLE) AS sy1d, CAST(sy2 AS DOUBLE) AS sy2d
        FROM s),
      f AS (SELECT *, nd * sxyd - sxd * syd AS cxy,
          nd * sxxd - sxd * sxd AS vx, nd * syyd - syd * syd AS vy,
          n1 > 0 AND n2 > 0 AS nz
        FROM d)
      SELECT n1, n2,
        CASE WHEN nz AND vx > 0 THEN round(cxy / vx, 6) END AS theta,
        CASE WHEN nz AND vx > 0 THEN
          round((sy1d / n1d - sy2d / n2d) / 100.0, 6) END AS diff_raw,
        CASE WHEN nz AND vx > 0 THEN
          round((sy1d / n1d - sy2d / n2d) / 100.0 - cxy / vx *
            ((sx1d / n1d - sx2d / n2d) / 100.0), 6) END AS diff_cuped,
        CASE WHEN nz AND vx > 0 AND vy > 0 THEN
          round(cxy * cxy / (vx * vy), 6) END AS var_reduction
      FROM f"""))

  /** Per-segment OLS trend ([[Hypothesis.olsTrendBy]]): each event
    * type's daily spend-per-event drift over the month — grouped
    * exact-integer-sum normal equations, one shuffle. */
  val qOlsTrend = Q(
    "q166_ols_trend_by",
    (s, dir) => Hypothesis.olsTrendBy(
        QueryCatalog.eventsUs(s, dir)
          .select(col("event_type"),
            expr("ts div 86400000000").as("day"),
            col("value")),
        "event_type", "day", "value", xScale = 0, yScale = 2)
      .orderBy("event_type"),
    Some("""WITH u AS (SELECT event_type,
          CAST(epoch_us(ts) // 86400000000 AS DOUBLE) AS x,
          CAST(value AS DOUBLE) AS y
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND NOT isnan(CAST(value AS DOUBLE))),
      q AS (SELECT event_type, CAST(round(x) AS DECIMAL(38,0)) AS x,
              CAST(round(y * 100) AS DECIMAL(38,0)) AS y FROM u),
      s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
          sum(x * x) AS sxx, sum(y * y) AS syy
        FROM q GROUP BY event_type),
      d AS (SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
          CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
          CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
          CAST(syy AS DOUBLE) AS syyd FROM s),
      f AS (SELECT *, nd * sxyd - sxd * syd AS num,
          nd * sxxd - sxd * sxd AS vx, nd * syyd - syd * syd AS vy
        FROM d)
      SELECT event_type, n,
        CASE WHEN vx > 0 THEN
          round(num / vx * (0.01)::DOUBLE, 6) END AS slope,
        CASE WHEN vx > 0 THEN round((syd / 100.0
          - num / vx * (0.01)::DOUBLE * (sxd / 1.0)) / nd, 6)
          END AS intercept,
        CASE WHEN vx > 0 AND vy > 0
          THEN round(num * num / (vx * vy), 6) END AS r2
      FROM f ORDER BY event_type"""))

  /** Two-sample effect sizes ([[Hypothesis.effectSizes]]): purchase
    * events vs the rest on value — Cliff's delta through the exact
    * doubled-rank-sum integers (q130's machinery) and Cohen's d
    * through cents-quantized decimal moment sums (q133's), both read
    * off ONE per-value counts shuffle. */
  val qEffectSizes = Q(
    "q167_effect_sizes",
    (s, dir) => Hypothesis.effectSizes(
      table(s, dir, "events"), "value", col("event_type") === "purchase"),
    Some("""WITH u AS (SELECT CAST(value AS DOUBLE) AS v,
          event_type = 'purchase' AS a FROM events
        WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
          AND event_type IS NOT NULL),
      c AS (SELECT v, count(*) AS cnt,
              count(CASE WHEN a THEN 1 END) AS ca
            FROM u GROUP BY v),
      r AS (SELECT v, cnt, ca,
              sum(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0
                AS avgrank
            FROM c),
      q AS (SELECT CAST(round(v * 100) AS DECIMAL(38,0)) AS x,
              cnt, ca, avgrank FROM r),
      s AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
              CAST(sum(cnt) AS BIGINT) AS n,
              sum(CAST(avgrank * 2 * ca AS DECIMAL(38,0))) AS r2,
              sum(x * ca) AS sxa, sum(x * x * ca) AS qqa,
              sum(x * cnt) AS sx, sum(x * x * cnt) AS qq
            FROM q),
      t AS (SELECT n1, n - n1 AS n2, CAST(n1 AS DOUBLE) AS n1d,
              CAST(n - n1 AS DOUBLE) AS n2d, CAST(n AS DOUBLE) AS nd,
              CAST(r2 AS DOUBLE) / 2.0 - CAST(n1 AS DOUBLE)
                * (CAST(n1 AS DOUBLE) + 1.0) / 2.0 AS u1,
              CAST(sxa AS DOUBLE) AS sxad, CAST(qqa AS DOUBLE) AS qqad,
              CAST(sx AS DOUBLE) - CAST(sxa AS DOUBLE) AS sxbd,
              CAST(qq AS DOUBLE) - CAST(qqa AS DOUBLE) AS qqbd
            FROM s),
      g AS (SELECT *, (qqad - sxad * sxad / n1d)
              + (qqbd - sxbd * sxbd / n2d) AS ss FROM t)
      SELECT n1, n2,
        CASE WHEN n1 > 0 AND n2 > 0
          THEN round(2.0 * u1 / (n1d * n2d) - 1.0, 6) END
          AS cliffs_delta,
        CASE WHEN n1 > 0 AND n2 > 0 AND nd > 2.0 AND ss > 0.0
          THEN round((sxad / n1d - sxbd / n2d)
            / sqrt(ss / (nd - 2.0)), 6) END AS cohens_d
      FROM g"""))

  /** Day-over-day PSI drift series ([[Drift.sequentialPsi]]): each
    * day's value distribution scored against the previous day — the
    * monitoring chart behind a drift alarm; q84 is one point of this
    * series, q125 its cross-sectional cut. */
  val qSequentialPsi = Q(
    "q180_psi_series",
    (s, dir) => Drift.sequentialPsi(
      QueryCatalog.eventsUs(s, dir)
        .select(expr("ts div 86400000000").as("day"), col("value")),
      "day", "value", bins = 10),
    Some("""WITH u AS (SELECT epoch_us(ts) // 86400000000 AS p,
          CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL
          AND NOT isnan(CAST(value AS DOUBLE)) AND ts IS NOT NULL),
      st AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
      bb AS (SELECT p, CAST(least(floor((v - mn) / ((mx - mn) / 10)), 9)
          AS INT) AS bin FROM u, st),
      c AS (SELECT p, bin, count(*) AS c FROM bb GROUP BY 1, 2),
      ax AS (SELECT CAST(i AS INT) AS bin FROM range(10) t(i)),
      pd AS (SELECT DISTINCT p FROM c),
      nn AS (SELECT p, CAST(sum(c) AS DOUBLE) AS n FROM c GROUP BY p),
      g AS (SELECT pd.p, ax.bin, coalesce(c.c, 0) AS c, nn.n
        FROM pd CROSS JOIN ax
        LEFT JOIN c ON c.p = pd.p AND c.bin = ax.bin
        JOIN nn ON nn.p = pd.p),
      sc AS (SELECT p, bin, n, (c + 0.5) / (n + 5.0) AS pr,
          lag((c + 0.5) / (n + 5.0)) OVER w AS pp,
          lag(p) OVER w AS prev
        FROM g WINDOW w AS (PARTITION BY bin ORDER BY p))
      SELECT p AS period, prev AS prev_period,
        CAST(max(n) AS BIGINT) AS n,
        round(sum((pr - pp) * ln(pr / pp)), 8) AS psi
      FROM sc WHERE pp IS NOT NULL
      GROUP BY 1, 2 ORDER BY period"""))

  /** Two-feature ridge regression ([[graft.ops.Hypothesis.ridgeFit2]]):
    * closed-form (X'X + λ·diag(0,1,1))β = X'y over exact decimal
    * Gram sums, solved by Cramer's rule in one agreed double
    * parenthesization — so the oracle reproduces the determinants
    * bit-for-bit. Predicts price from (quantity, discount), λ = 1. */
  val qRidge = Q(
    "q196_ridge_regression",
    (s, dir) => graft.ops.Hypothesis.ridgeFit2(
      table(s, dir, "lineitem"), "l_quantity", "l_discount",
      "l_extendedprice"),
    Some("""WITH u AS (SELECT CAST(l_quantity AS DOUBLE) AS x1,
          CAST(l_discount AS DOUBLE) AS x2,
          CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
        WHERE l_quantity IS NOT NULL
          AND NOT isnan(CAST(l_quantity AS DOUBLE))
          AND l_discount IS NOT NULL
          AND NOT isnan(CAST(l_discount AS DOUBLE))
          AND l_extendedprice IS NOT NULL
          AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
      q AS (SELECT CAST(round(x1 * 100) AS DECIMAL(38,0)) AS x1,
          CAST(round(x2 * 100) AS DECIMAL(38,0)) AS x2,
          CAST(round(y * 100) AS DECIMAL(38,0)) AS y FROM u),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
          sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
          sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
          sum(x2 * x2) AS s22, sum(x1 * y) AS s1y,
          sum(x2 * y) AS s2y FROM q),
      d AS (SELECT n, CAST(n AS DOUBLE) AS nd,
          CAST(s1 AS DOUBLE) / 100.0 AS t1,
          CAST(s2 AS DOUBLE) / 100.0 AS t2,
          CAST(sy AS DOUBLE) / 100.0 AS ty,
          CAST(s11 AS DOUBLE) / 10000.0 AS t11,
          CAST(s12 AS DOUBLE) / 10000.0 AS t12,
          CAST(s22 AS DOUBLE) / 10000.0 AS t22,
          CAST(s1y AS DOUBLE) / 10000.0 AS t1y,
          CAST(s2y AS DOUBLE) / 10000.0 AS t2y FROM s),
      e AS (SELECT *, t11 + 1.0 AS a11, t22 + 1.0 AS a22 FROM d),
      f AS (SELECT *, a11 * a22 - t12 * t12 AS m00,
          t1 * a22 - t12 * t2 AS m01,
          t1 * t12 - a11 * t2 AS m02 FROM e),
      g AS (SELECT *,
          nd * m00 - t1 * m01 + t2 * m02 AS det,
          ty * m00 - t1 * (t1y * a22 - t12 * t2y)
            + t2 * (t1y * t12 - a11 * t2y) AS det0,
          nd * (t1y * a22 - t12 * t2y) - ty * m01
            + t2 * (t1 * t2y - t1y * t2) AS det1,
          nd * (a11 * t2y - t1y * t12) - t1 * (t1 * t2y - t1y * t2)
            + ty * m02 AS det2 FROM f)
      SELECT n,
        CASE WHEN abs(det) > 0 THEN round(det0 / det, 6) END AS intercept,
        CASE WHEN abs(det) > 0 THEN round(det1 / det, 6) END AS b1,
        CASE WHEN abs(det) > 0 THEN round(det2 / det, 6) END AS b2
      FROM g"""))

  /** Exact join-size estimation from degree tables
    * ([[graft.ops.JoinHealth.joinSizeEstimate]]): the CBO statistic
    * |orders ⋈ lineitem| = Σ_k d_o(k)·d_l(k) plus the single-key skew
    * share, computed from two degree aggregations without
    * materializing the join — cost follows key cardinality, not join
    * output. The pre-flight check before a 100 TB shuffle. */
  val qJoinSize = Q(
    "q210_join_size_estimate",
    (s, dir) => JoinHealth.joinSizeEstimate(
      table(s, dir, "orders"), "o_orderkey",
      table(s, dir, "lineitem"), "l_orderkey"),
    Some("""WITH da AS (SELECT o_orderkey AS k, count(*) AS da
        FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1),
      db AS (SELECT l_orderkey AS k, count(*) AS db
        FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
      p AS (SELECT da.da * db.db AS prod FROM da JOIN db USING (k))
      SELECT CAST(sum(prod) AS BIGINT) AS join_rows,
        count(*) AS n_matched_keys,
        CAST(max(prod) AS BIGINT) AS max_key_rows,
        round(CAST(max(prod) AS DOUBLE) / CAST(sum(prod) AS DOUBLE), 6)
          AS skew_frac
      FROM p"""))

  /** Benford first-digit TEST
    * ([[graft.ops.Hypothesis.benfordFirstDigit]]) over order totals:
    * where q81 profiles the observed digit distribution, this row
    * carries the hypothesis test — expected log10(1+1/d) shares as
    * driver-constant literals and the per-digit χ² contributions —
    * with exact string-of-cents digit extraction (no libm log10 at
    * powers of ten). */
  val qBenford = Q(
    "q216_benford_digits",
    (s, dir) => graft.ops.Hypothesis.benfordFirstDigit(
      table(s, dir, "orders"), "o_totalprice"),
    Some {
      val cases = (1 to 9).map(d =>
        s"WHEN digit = $d THEN ${math.log10(1.0 + 1.0 / d)}")
        .mkString(" ")
      s"""WITH c AS (SELECT CAST(substr(CAST(CAST(floor(
            CAST(o_totalprice AS DOUBLE) * 100 + 0.5) AS BIGINT)
            AS VARCHAR), 1, 1) AS INT) AS digit, count(*) AS n
          FROM orders
          WHERE o_totalprice IS NOT NULL
            AND CAST(o_totalprice AS DOUBLE) > 0.0
          GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        b AS (SELECT digit, n,
            CAST(CASE $cases ELSE 0.0 END AS DOUBLE) AS bexp
          FROM c)
        SELECT digit, n,
          round(CAST(n AS DOUBLE) / total, 6) AS share,
          round(bexp, 6) AS benford,
          round(((CAST(n AS DOUBLE) - total * bexp) *
            (CAST(n AS DOUBLE) - total * bexp)) / (total * bexp), 6)
            AS chi2_term
        FROM b, t ORDER BY digit"""
    })

  /** Iterative logistic-regression training on the exact gate
    * ([[graft.ops.Hypothesis.logisticGd2]]): three full-batch GD steps
    * predicting purchase from (value/100, isodow/7), every gradient
    * sum 10⁻⁹-quantized and β re-quantized per step so the DuckDB
    * unroll of the same three iterations lands on identical
    * coefficients despite last-ulp libm drift. */
  val qLogisticGd = Q(
    "q221_logistic_gd",
    (s, dir) => graft.ops.Hypothesis.logisticGd2(
      QueryCatalog.eventsUs(s, dir)
        .where(col("value").isNotNull && col("ts").isNotNull),
      col("value").cast("double") / lit(100.0),
      (expr("weekday(timestamp_micros(ts))") + 1).cast("double")
        / lit(7.0),
      when(col("event_type") === "purchase", 1.0).otherwise(0.0),
      lr = 0.5, steps = 3),
    Some {
      def step(k: Int, prev: String): String = {
        val pp = s"1.0 / (1.0 + exp(-(b.b0 + b.b1v * x1 + b.b2v * x2)))"
        s"""s$k AS (SELECT count(*) AS n,
            sum(CAST(floor((y - $pp) * 1e9 + 0.5) AS BIGINT)) AS g0,
            sum(CAST(floor((y - $pp) * x1 * 1e9 + 0.5) AS BIGINT))
              AS g1,
            sum(CAST(floor((y - $pp) * x2 * 1e9 + 0.5) AS BIGINT))
              AS g2
          FROM d, $prev b),
        b$k AS (SELECT
            floor((b.b0 + 0.5 * (CAST(s.g0 AS DOUBLE) / 1e9) / s.n)
              * 1e9 + 0.5) / 1e9 AS b0,
            floor((b.b1v + 0.5 * (CAST(s.g1 AS DOUBLE) / 1e9) / s.n)
              * 1e9 + 0.5) / 1e9 AS b1v,
            floor((b.b2v + 0.5 * (CAST(s.g2 AS DOUBLE) / 1e9) / s.n)
              * 1e9 + 0.5) / 1e9 AS b2v
          FROM s$k s, $prev b)"""
      }
      val steps = Seq(step(1, "b0s"), step(2, "b1"), step(3, "b2"))
        .mkString(",\n        ")
      val pf = "1.0 / (1.0 + exp(-(b.b0 + b.b1v * x1 + b.b2v * x2)))"
      s"""WITH d AS (SELECT CAST(value AS DOUBLE) / 100.0 AS x1,
            CAST(isodow(ts) AS DOUBLE) / 7.0 AS x2,
            CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
          FROM events
          WHERE value IS NOT NULL AND ts IS NOT NULL),
        b0s AS (SELECT 0.0 AS b0, 0.0 AS b1v, 0.0 AS b2v),
        $steps,
        lss AS (SELECT count(*) AS n,
            sum(CAST(floor((-(y * ln($pf) + (1.0 - y) * ln(1.0 - $pf)))
              * 1e9 + 0.5) AS BIGINT)) AS ls
          FROM d, b3 b)
        SELECT CAST(l.n AS BIGINT) AS n, b.b0,
          b.b1v AS b1, b.b2v AS b2,
          floor(((CAST(l.ls AS DOUBLE) / 1e9) / l.n) * 1e6 + 0.5) / 1e6
            AS log_loss
        FROM lss l, b3 b"""
    })

  /** Levene / Brown-Forsythe variance-homogeneity test
    * ([[graft.ops.Hypothesis.leveneBrownForsythe]]): ANOVA on absolute
    * deviations from group medians — the robust gatekeeper for the
    * pooled-variance tests (q143/q142 run on the same grouping). */
  val qLevene = Q(
    "q224_levene",
    (s, dir) => graft.ops.Hypothesis.leveneBrownForsythe(
      table(s, dir, "lineitem"), "l_extendedprice", "l_returnflag"),
    Some("""WITH u AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
          l_returnflag AS g FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
          AND l_returnflag IS NOT NULL),
      m AS (SELECT g, quantile_cont(v, 0.5) AS med FROM u GROUP BY g),
      zt AS (SELECT abs(u.v - m.med) AS v, u.g
        FROM u JOIN m ON m.g = u.g),
      q AS (SELECT CAST(round(v * 100) AS DECIMAL(38,0)) AS c, g
        FROM zt),
      pg AS (SELECT g, count(*) AS ng, sum(c) AS sg, sum(c * c) AS qg
            FROM q GROUP BY g),
      s AS (SELECT CAST(count(*) AS BIGINT) AS k,
              CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS st, sum(qg) AS qt,
              sum(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng) AS sb
            FROM pg),
      d AS (SELECT k, n, sb, CAST(k AS DOUBLE) AS kd,
              CAST(n AS DOUBLE) AS nd, CAST(st AS DOUBLE) AS std,
              CAST(qt AS DOUBLE) AS qtd FROM s),
      e AS (SELECT *, (sb - std * std / nd) / 10000.0 AS ssb,
              (qtd - std * std / nd) / 10000.0 AS sst FROM d)
      SELECT k AS n_groups, n,
        CASE WHEN k > 1 AND n > k AND (sst - ssb) > 0.0
          THEN round((ssb / (kd - 1.0)) / ((sst - ssb) / (nd - kd)), 6)
          END AS f,
        CASE WHEN k > 1 AND n > k AND (sst - ssb) > 0.0 AND sst > 0.0
          THEN round(ssb / sst, 6) END AS eta2
      FROM e"""))

  /** Exact decision-stump training
    * ([[graft.ops.FeatureEng.decisionStump]]): the best histogram
    * Gini split of purchase-vs-value over a 64-bucket grid — integer
    * split statistics from one pass, grid arithmetic after, the CART/
    * boosted-tree unit step on the exact gate. */
  val qDecisionStump = Q(
    "q229_decision_stump",
    (s, dir) => graft.ops.FeatureEng.decisionStump(
      QueryCatalog.eventsUs(s, dir),
      "value", when(col("event_type") === "purchase", 1).otherwise(0),
      bins = 64),
    Some("""WITH i AS (SELECT CAST(value AS DOUBLE) AS x,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
        WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
      bo AS (SELECT min(x) AS mn, max(x) AS mx FROM i),
      c AS (SELECT CAST(least(floor((x - bo.mn) /
            ((bo.mx - bo.mn) / 64.0)), 63.0) AS BIGINT) AS bk,
          bo.mn AS mn, bo.mx AS mx, y
        FROM i, bo),
      g AS (SELECT bk, mn, mx, count(*) AS nb,
          CAST(sum(y) AS BIGINT) AS pb
        FROM c GROUP BY 1, 2, 3),
      cum AS (SELECT *, CAST(sum(nb) OVER (ORDER BY bk
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
          CAST(sum(pb) OVER (ORDER BY bk
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl
        FROM g),
      t AS (SELECT CAST(sum(nb) AS BIGINT) AS n,
          CAST(sum(pb) AS BIGINT) AS p FROM g),
      e AS (SELECT bk, mn, mx, nl, pl, n, p,
          1.0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n)
            - (1.0 - CAST(p AS DOUBLE) / n)
              * (1.0 - CAST(p AS DOUBLE) / n) AS gp,
          (1.0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n)
            - (1.0 - CAST(p AS DOUBLE) / n)
              * (1.0 - CAST(p AS DOUBLE) / n))
          - (CAST(nl AS DOUBLE) / n) *
            (1.0 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
              - (1.0 - CAST(pl AS DOUBLE) / nl)
                * (1.0 - CAST(pl AS DOUBLE) / nl))
          - (CAST(n - nl AS DOUBLE) / n) *
            (1.0 - (CAST(p - pl AS DOUBLE) / (n - nl))
                * (CAST(p - pl AS DOUBLE) / (n - nl))
              - (1.0 - CAST(p - pl AS DOUBLE) / (n - nl))
                * (1.0 - CAST(p - pl AS DOUBLE) / (n - nl))) AS gain
        FROM cum, t
        WHERE bk < 63 AND nl > 0 AND (n - nl) > 0),
      r AS (SELECT CAST(bk AS INT) AS split_bucket,
          round(mn + CAST(bk + 1 AS DOUBLE) * ((mx - mn) / 64.0), 6)
            AS threshold,
          nl AS n_left, pl AS pos_left,
          n - nl AS n_right, p - pl AS pos_right,
          round(gp, 6) AS gini_parent,
          CAST(floor(gain * 1e6 + 0.5) AS BIGINT) AS gain_q
        FROM e)
      SELECT split_bucket, threshold, n_left, pos_left, n_right,
        pos_right, gini_parent, CAST(gain_q AS DOUBLE) / 1e6 AS gain
      FROM r ORDER BY gain_q DESC, split_bucket LIMIT 1"""))

  /** Top-20 multivariate Mahalanobis outliers
    * ([[graft.ops.Outliers.mahalanobisTopK]]) over
    * (l_quantity, l_extendedprice): correlation-aware joint-distance
    * screening with exact decimal Gram statistics and a BoundedTopK
    * ranking — no window over the fact table. */
  val qMahalanobis = Q(
    "q230_mahalanobis",
    (s, dir) => graft.ops.Outliers.mahalanobisTopK(
      table(s, dir, "lineitem")
        .withColumn("rid",
          col("l_orderkey") * 10 + col("l_linenumber")),
      "rid", "l_quantity", "l_extendedprice", k = 20),
    Some("""WITH i AS (SELECT l_orderkey * 10 + l_linenumber AS rid,
          CAST(l_quantity AS DOUBLE) AS x1,
          CAST(l_extendedprice AS DOUBLE) AS x2
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          AND NOT isnan(CAST(l_quantity AS DOUBLE))
          AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
      g AS (SELECT count(*) AS n,
          sum(CAST(round(x1 * 100) AS DECIMAL(38,0))) AS s1,
          sum(CAST(round(x2 * 100) AS DECIMAL(38,0))) AS s2,
          sum(CAST(round(x1 * 100) AS DECIMAL(38,0))
            * CAST(round(x1 * 100) AS DECIMAL(38,0))) AS q11,
          sum(CAST(round(x1 * 100) AS DECIMAL(38,0))
            * CAST(round(x2 * 100) AS DECIMAL(38,0))) AS q12,
          sum(CAST(round(x2 * 100) AS DECIMAL(38,0))
            * CAST(round(x2 * 100) AS DECIMAL(38,0))) AS q22
        FROM i),
      st AS (SELECT CAST(n AS DOUBLE) AS nd,
          CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
          CAST(q11 AS DOUBLE) AS q11d, CAST(q12 AS DOUBLE) AS q12d,
          CAST(q22 AS DOUBLE) AS q22d FROM g),
      p AS (SELECT s1d / nd / 100.0 AS m1, s2d / nd / 100.0 AS m2,
          (q11d - s1d * s1d / nd) / (nd - 1.0) / 10000.0 AS c11,
          (q12d - s1d * s2d / nd) / (nd - 1.0) / 10000.0 AS c12,
          (q22d - s2d * s2d / nd) / (nd - 1.0) / 10000.0 AS c22
        FROM st),
      d AS (SELECT rid, CAST(floor(round(
          ((x1 - m1) * (c22 * (x1 - m1) - c12 * (x2 - m2)) +
           (x2 - m2) * (c11 * (x2 - m2) - c12 * (x1 - m1)))
          / (c11 * c22 - c12 * c12), 6) * 1e6 + 0.5) AS BIGINT) AS d2q
        FROM i, p)
      SELECT CAST(rnk AS INT) AS rnk, rid,
        CAST(d2q AS DOUBLE) / 1e6 AS d2
      FROM (SELECT rid, d2q, row_number() OVER
          (ORDER BY d2q DESC, rid) AS rnk FROM d)
      WHERE rnk <= 20 ORDER BY rnk"""))

  /** The PORTABLE stages of phi-k ([[graft.ops.PhiKOp.phikStages]] →
    * `graft.functions.PhiK.chi2Stages`) on the value gate, for three
    * categorical pairs: the distributed contingency table's observed
    * chi-square, the (r−1)(k−1) sample-noise pedestal, and the clamped
    * BVN-inversion target. Everything BEFORE the bivariate-normal
    * inversion is now hash-checked against an independent engine; only
    * the inversion (which no second engine computes) remains covered
    * by PhiKSpec's identity tests. Reference: correlations.py:416-521.
    * Sum order over the r×k grid differs between engines → chi2/target
    * round at 6 (cells themselves are identical doubles). */
  val qPhikStages = Q(
    "q234_phik_stages",
    (s, dir) => {
      val pairs = Seq(
        ("lineitem", "l_returnflag", "l_linestatus"),
        ("orders", "o_orderstatus", "o_orderpriority"),
        ("documents", "lang", "source"))
      def rnd6(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      import s.implicits._
      pairs.map { case (t, a, b) =>
        val (n, r, k, chi2, pedestal, target) =
          graft.ops.PhiKOp.phikStages(table(s, dir, t), a, b)
        (s"$t.$a|$b", n, r, k, rnd6(chi2), pedestal, rnd6(target))
      }.toDF("pair", "n", "r_bins", "k_bins", "chi2_r", "pedestal",
        "target_r").orderBy("pair")
    },
    Some {
      def block(t: String, a: String, b: String) =
        s"""SELECT '$t.$a|$b' AS pair, nn.n AS n,
          (SELECT count(*) FROM rt_$t) AS r_bins,
          (SELECT count(*) FROM ct_$t) AS k_bins,
          round((SELECT sum(pow(coalesce(cc.cnt, 0)
                - rt.ra * ct.cb / nn2.n, 2) / (rt.ra * ct.cb / nn2.n))
             FROM rt_$t rt CROSS JOIN ct_$t ct CROSS JOIN nn_$t nn2
             LEFT JOIN c_$t cc ON cc.a = rt.a AND cc.b = ct.b), 6)
            AS chi2_r,
          CAST(((SELECT count(*) FROM rt_$t) - 1)
            * ((SELECT count(*) FROM ct_$t) - 1) AS DOUBLE) AS pedestal,
          round(greatest(0.0,
            (SELECT sum(pow(coalesce(cc.cnt, 0)
                - rt.ra * ct.cb / nn2.n, 2) / (rt.ra * ct.cb / nn2.n))
             FROM rt_$t rt CROSS JOIN ct_$t ct CROSS JOIN nn_$t nn2
             LEFT JOIN c_$t cc ON cc.a = rt.a AND cc.b = ct.b)
            - CAST(((SELECT count(*) FROM rt_$t) - 1)
              * ((SELECT count(*) FROM ct_$t) - 1) AS DOUBLE)), 6)
            AS target_r
        FROM nn_$t nn"""
      def ctes(t: String, a: String, b: String) =
        s"""c_$t AS (SELECT CAST($a AS VARCHAR) AS a,
            CAST($b AS VARCHAR) AS b, count(*) AS cnt
          FROM $t WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1, 2),
        rt_$t AS (SELECT a, CAST(sum(cnt) AS DOUBLE) AS ra
          FROM c_$t GROUP BY 1),
        ct_$t AS (SELECT b, CAST(sum(cnt) AS DOUBLE) AS cb
          FROM c_$t GROUP BY 1),
        nn_$t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c_$t)"""
      val ps = Seq(
        ("lineitem", "l_returnflag", "l_linestatus"),
        ("orders", "o_orderstatus", "o_orderpriority"),
        ("documents", "lang", "source"))
      s"""WITH ${ps.map(p => ctes(p._1, p._2, p._3)).mkString(",\n")}
        ${ps.map(p => block(p._1, p._2, p._3)).mkString("\nUNION ALL\n")}
        ORDER BY pair"""
    })

  /** Cohen's κ between two document-quality raters
    * ([[graft.ops.Hypothesis.cohenKappa]]): the English-stopword-
    * fraction gate vs the token-length gate — the agreement-beyond-
    * chance check run before trusting either as a corpus filter. Both
    * raters and the whole κ chain (integer cells, decimal(38,0) pe
    * cross-product, three double divisions) replay in the oracle. */
  val qCohenKappa = Q(
    "q297_cohen_kappa",
    (s, dir) => {
      import graft.ops.TextAnalysis
      val d = table(s, dir, "documents")
      val nTok = size(TextAnalysis.words(col("text")))
      Hypothesis.cohenKappa(d,
        when(TextAnalysis.stopwordFraction(col("text"), "en") >= 0.25,
          "pass").otherwise("fail"),
        when(nTok.between(30, 2000), "pass").otherwise("fail"))
    },
    Some {
      val sw = graft.ops.TextAnalysis.stopwords("en")
        .map(w => s"'$w'").mkString(", ")
      val words =
        """list_filter(string_split_regex(lower(text), '\s+'),
           x -> length(x) > 0)"""
      val stopFrac =
        s"""round(CAST(len(list_filter($words, w -> list_contains([$sw], w)))
           AS DOUBLE) / greatest(len($words), 1), 6)"""
      s"""WITH lab AS (SELECT
          CASE WHEN $stopFrac >= 0.25 THEN 'pass' ELSE 'fail' END AS a,
          CASE WHEN len($words) BETWEEN 30 AND 2000
            THEN 'pass' ELSE 'fail' END AS b
        FROM documents),
      cells AS (SELECT a, b, count(*) AS c FROM lab GROUP BY 1, 2),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
          CAST(coalesce(sum(CASE WHEN a = b THEN c END), 0) AS BIGINT)
            AS n_agree
        FROM cells),
      ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM cells GROUP BY 1),
      mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cells GROUP BY 1),
      pes AS (SELECT coalesce(sum(CAST(ca AS DECIMAL(38,0)) * cb),
          0) AS pesum
        FROM ma JOIN mb ON ma.a = mb.b),
      raw AS (SELECT n, n_agree,
          CAST(n_agree AS DOUBLE) / n AS rpo,
          CAST(pesum AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS rpe
        FROM tot CROSS JOIN pes)
      SELECT n, n_agree, round(rpo, 6) AS po, round(rpe, 6) AS pe,
        CASE WHEN rpe < 1.0
          THEN round((rpo - rpe) / (1.0 - rpe), 6) END AS kappa
      FROM raw"""
    })

  /** Hill right-tail index ([[graft.ops.Outliers.hillTailIndex]],
    * Hill 1975): heavy-tail diagnostic over extended prices — the
    * "does the mean even exist" check mean-based monitors need. Top
    * order statistics via TakeOrdered; strict-tail count deterministic
    * under threshold ties; oracle replays the whole ladder. */
  val qHillTail = Q(
    "q309_hill_tail",
    (s, dir) => Outliers.hillTailIndex(
      table(s, dir, "lineitem"), "l_extendedprice", k = 64),
    Some("""WITH pos AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
          FROM lineitem
          WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
      top AS (SELECT x FROM pos ORDER BY x DESC LIMIT 65),
      thr AS (SELECT min(x) AS xk1 FROM top),
      nn AS (SELECT count(*) AS n FROM pos),
      agg AS (SELECT count(*) AS k_eff, sum(ln(x / xk1)) AS s,
          min(xk1) AS x_k1
        FROM top CROSS JOIN thr WHERE x > xk1)
      SELECT nn.n, agg.k_eff, round(agg.x_k1, 6) AS x_k1,
        round(agg.s / agg.k_eff, 6) AS hill_inv,
        round(agg.k_eff / agg.s, 6) AS alpha
      FROM agg CROSS JOIN nn"""))

  /** Theil T inequality decomposition
    * ([[graft.ops.Skew.theilDecomposition]]): per-source within/between
    * split of token-mass inequality — the additive property Gini (q97)
    * lacks. Float terms ride per-distinct-value counts; everything
    * else is exact sums. */
  val qTheil = Q(
    "q310_theil_decomposition",
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("source"),
          size(graft.ops.TextAnalysis.words(col("text"))).as("x"))
      Skew.theilDecomposition(d, "source", "x").orderBy("source")
    },
    Some {
      val words =
        """list_filter(string_split_regex(lower(text), '\s+'),
           x -> length(x) > 0)"""
      s"""WITH base AS (SELECT source AS g, len($words) AS x
            FROM documents WHERE text IS NOT NULL AND len($words) > 0),
        vc AS (SELECT g, x, count(*) AS c FROM base GROUP BY 1, 2),
        gs AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
            CAST(sum(c * x) AS BIGINT) AS sx FROM vc GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
            CAST(sum(sx) AS BIGINT) AS ssx FROM gs),
        tg AS (SELECT vc.g,
            sum(vc.c * (vc.x / (CAST(gs.sx AS DOUBLE) / gs.n))
              * ln(vc.x / (CAST(gs.sx AS DOUBLE) / gs.n))) AS tsum
          FROM vc JOIN gs ON gs.g = vc.g GROUP BY 1)
        SELECT gs.g AS source, gs.n,
          round(CAST(gs.sx AS DOUBLE) / gs.n, 6) AS mean,
          round(tg.tsum / gs.n, 6) AS theil_within,
          round(CAST(gs.sx AS DOUBLE) / tot.ssx, 6) AS share,
          round((CAST(gs.sx AS DOUBLE) / tot.ssx) * (tg.tsum / gs.n), 6)
            AS within_term,
          round((CAST(gs.sx AS DOUBLE) / tot.ssx)
            * ln((CAST(gs.sx AS DOUBLE) / gs.n)
              / (CAST(tot.ssx AS DOUBLE) / tot.nn)), 6) AS between_term
        FROM gs JOIN tg ON tg.g = gs.g CROSS JOIN tot
        ORDER BY source"""
    })

  /** Jackknife source influence
    * ([[graft.ops.Hypothesis.jackknifeGroupInfluence]]): delete-one-
    * source effect on the corpus mean tokens/doc — the attribution a
    * mix re-weighting starts from. Exact integer sums, three double
    * divisions, fully replayed. */
  val qJackknife = Q(
    "q305_jackknife_influence",
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("source"),
          size(graft.ops.TextAnalysis.words(col("text"))).as("x"))
      Hypothesis.jackknifeGroupInfluence(d, "source", "x")
        .orderBy("source")
    },
    Some {
      val words =
        """list_filter(string_split_regex(lower(text), '\s+'),
           x -> length(x) > 0)"""
      s"""WITH d AS (SELECT source AS g, len($words) AS x
            FROM documents WHERE text IS NOT NULL),
        per AS (SELECT g, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
          FROM d GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
            CAST(sum(s) AS BIGINT) AS ss FROM per)
        SELECT g AS source, n,
          round(CAST(s AS DOUBLE) / n, 6) AS group_mean,
          CASE WHEN nn > n THEN round(CAST(ss - s AS DOUBLE) / (nn - n), 6)
            END AS loo_mean,
          CASE WHEN nn > n THEN round(CAST(ss - s AS DOUBLE) / (nn - n)
            - CAST(ss AS DOUBLE) / nn, 6) END AS influence
        FROM per CROSS JOIN tot ORDER BY source"""
    })

  /** Split-conformal prediction calibration
    * ([[graft.ops.FeatureEng.splitConformal]], Lei et al. JASA 2018):
    * hash-split train/cal/test, per-source mean model, conformal
    * quantile as an exact order statistic, achieved test coverage per
    * source. The oracle replays the split, the model, the k-th-smallest
    * residual (row_number = k on the same total order), and the
    * coverage rollup. */
  val qSplitConformal = Q(
    "q304_split_conformal",
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(graft.ops.TextAnalysis.words(col("text"))).as("y"))
      FeatureEng.splitConformal(d, "doc_id", "source", "y",
          alpha = 0.1, trainPct = 60, calPct = 20)
        .orderBy("source")
    },
    Some {
      val words =
        """list_filter(string_split_regex(lower(text), '\s+'),
           x -> length(x) > 0)"""
      s"""WITH d AS (SELECT source AS g, len($words) AS y,
            ('0x'||substr(md5('0:'||doc_id::VARCHAR),1,15))::BIGINT % 100
              AS b
          FROM documents WHERE text IS NOT NULL),
        sp AS (SELECT g, y, CASE WHEN b < 60 THEN 'train'
            WHEN b < 80 THEN 'cal' ELSE 'test' END AS split FROM d),
        model AS (SELECT g, CAST(sum(y) AS DOUBLE) / count(*) AS yhat
          FROM sp WHERE split = 'train' GROUP BY 1),
        resid AS (SELECT sp.g, sp.split,
            abs(CAST(y AS DOUBLE) - yhat) AS r
          FROM sp JOIN model USING (g) WHERE split != 'train'),
        cal AS (SELECT r FROM resid WHERE split = 'cal'),
        kk AS (SELECT least(CAST(ceil(0.9 * (count(*) + 1)) AS BIGINT),
            count(*)) AS k, count(*) AS n_cal FROM cal),
        ranked AS (SELECT r, row_number() OVER (ORDER BY r) AS rn
          FROM cal),
        qh AS (SELECT r AS q_hat, kk.n_cal FROM ranked, kk
          WHERE rn = greatest(kk.k, 1))
        SELECT g AS source, count(*) AS n_test,
          CAST(sum(CASE WHEN r <= q_hat THEN 1 ELSE 0 END) AS BIGINT)
            AS n_covered,
          round(CAST(sum(CASE WHEN r <= q_hat THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*), 6) AS coverage,
          round(q_hat, 6) AS q_hat, n_cal
        FROM resid CROSS JOIN qh WHERE split = 'test'
        GROUP BY g, q_hat, n_cal ORDER BY source"""
    })

  /** Per-source Poisson bootstrap CI for mean tokens/doc
    * ([[graft.ops.Hypothesis.poissonBootstrapMeanCI]], Chamandy et al.
    * 2012): 64 deterministic md5-seeded Poisson(1) reweightings, every
    * replicate mean one exact-BIGINT division, CI = order statistics
    * of the 64 means. The oracle replays every replicate from the SAME
    * Double CDF thresholds this build interpolates from
    * [[graft.ops.Hypothesis.poissonCdf1]]. */
  val qBootstrapCI = Q(
    "q296_bootstrap_ci",
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(graft.ops.TextAnalysis.words(col("text"))).as("x"))
      Hypothesis.poissonBootstrapMeanCI(d, "source", "doc_id", "x",
          b = 64, alpha = 0.05)
        .orderBy("source")
    },
    Some {
      val cdf = Hypothesis.poissonCdf1
        .map(c => s"(u >= CAST('$c' AS DOUBLE))::BIGINT")
        .mkString(" + ")
      s"""WITH d AS (SELECT source, doc_id,
            len(list_filter(string_split_regex(lower(text), '\\s+'),
              x -> length(x) > 0)) AS x
          FROM documents),
        rep AS (SELECT source, doc_id, x, r,
            ('0x'||substr(md5(r::VARCHAR || ':' || doc_id::VARCHAR),1,15))
              ::BIGINT / 1152921504606846976.0 AS u
          FROM d, range(0, 64) t(r)),
        wtd AS (SELECT source, r, $cdf AS w, x FROM rep),
        parts AS (SELECT source, r,
            CAST(sum(w * x) AS BIGINT) AS sx, CAST(sum(w) AS BIGINT) AS sw
          FROM wtd GROUP BY 1, 2 HAVING sum(w) > 0),
        ms AS (SELECT source, r, CAST(sx AS DOUBLE) / sw AS m FROM parts),
        ci AS (SELECT source, list_sort(list(m)) AS arr,
            count(*) AS b_eff
          FROM ms GROUP BY 1),
        pick AS (SELECT source, b_eff,
            arr[CAST(floor(0.025 * (b_eff - 1)) AS INT) + 1] AS lo,
            arr[CAST(ceil(0.975 * (b_eff - 1)) AS INT) + 1] AS hi
          FROM ci),
        overall AS (SELECT source, count(*) AS n,
            CAST(sum(x) AS DOUBLE) / count(*) AS mean
          FROM d GROUP BY 1)
        SELECT o.source, o.n, round(o.mean, 6) AS mean, p.b_eff,
          round(p.lo, 6) AS ci_lo, round(p.hi, 6) AS ci_hi
        FROM overall o JOIN pick p USING (source)
        ORDER BY source"""
    })

  val all: Seq[Q] = Seq(qPhikStages, qBootstrapCI, qCohenKappa,
    qSplitConformal, qJackknife, qHillTail, qTheil,
    qRidge, qCuped, qOlsTrend, qEffectSizes, qSequentialPsi,
    qJoinSize, qBenford, qLogisticGd, qLevene, qDecisionStump,
    qMahalanobis,
    qOutliers, qAssociation, qJsdDrift, qValidate,
    qChi2Drift, qNullPatterns, qFdCheck, qWassersteinDrift, qOrphans,
    qFanout, qEmbedNorms, qKeySkew, qPctRank, qBloomPrune, qPsiSweep,
    qPairRules, qSplitAssign, qQqTable, qWinsorized, qGini, qWoe,
    qTargetEnc, qRobustZ, qWeightedQuantiles, qSegmentPsi,
    qMannWhitney, qWelchT, qCalibration, qLift, qAuc, qKruskal, qAnova,
    qPropZ, qOls, qNumericMi, qSnapshotDiff)
}
