package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.QueryCatalog.table

/** Multi-table relational surface: the join/rollup shapes the reference
  * (a single-table profiler) never needed but any engine claiming its
  * query capabilities at 100 TB must plan well — star-schema join
  * pipelines and grouping-set aggregations.
  */
object RelationalQueries {

  /** Star join: revenue per nation through lineitem ⨝ orders ⨝ customer
    * ⨝ nation. Plan intent at scale: the fact-fact join
    * (lineitem⨝orders) shuffles on the order key; customer joins on the
    * shuffled stream; nation (25 rows) broadcasts — all of which
    * Catalyst/AQE picks from sizes without hints, which is the point:
    * declare the join graph, let the optimizer place exchanges. The
    * per-row revenue product is IEEE-deterministic; the sum rides
    * DECIMAL so aggregation order can't drift the hash. */
  val qJoinRevenue = Q(
    "q73_join_revenue",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("rev"))
      val ord = table(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = table(s, dir, "customer").select("c_custkey", "c_nationkey")
      val nat = table(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, count(*) AS n_items,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
          AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  /** Rollup (grouping sets) over the corpus: doc counts and exact char
    * sums at (source, lang), (source), and () granularities in ONE
    * pass — Spark expands the grouping sets into a single partial-agg
    * shuffle, not one job per level. grouping() flags disambiguate
    * rollup-total rows from genuine null keys; sort order pins NULLS
    * FIRST on both engines (DuckDB defaults NULLS LAST). */
  val qRollup = Q(
    "q74_rollup_stats",
    (s, dir) => {
      table(s, dir, "documents")
        .rollup("source", "lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          grouping(col("source")).cast("long").as("g_source"),
          grouping(col("lang")).cast("long").as("g_lang"))
        .orderBy(asc_nulls_first("source"), asc_nulls_first("lang"))
    },
    Some("""SELECT source, lang, count(*) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS chars,
        CAST(GROUPING(source) AS BIGINT) AS g_source,
        CAST(GROUPING(lang) AS BIGINT) AS g_lang
      FROM documents GROUP BY ROLLUP(source, lang)
      ORDER BY source NULLS FIRST, lang NULLS FIRST"""))

  /** Set operations: INTERSECT / EXCEPT (SQL set semantics — distinct),
    * which Catalyst plans as hash left-semi / left-anti joins, not
    * materialized sets: customers with both urgent and high-priority
    * orders but no low-priority ones. */
  val qSetOps = Q(
    "q77_set_ops",
    (s, dir) => {
      val ord = table(s, dir, "orders")
      def byPriority(p: String) =
        ord.where(col("o_orderpriority") === p).select("o_custkey")
      byPriority("1-URGENT")
        .intersect(byPriority("2-HIGH"))
        .except(byPriority("5-LOW"))
        .orderBy("o_custkey")
    },
    Some("""(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
      ORDER BY o_custkey"""))

  /** Pivot (long → wide crosstab) with EXPLICIT pivot values — the
    * form that stays scale-safe: `pivot(col, values)` with the value
    * list given plans one pass with no driver-side distinct-collect
    * (the values-less overload must first collect the pivot domain).
    * Counts are integers, so the wide cells are bit-stable. */
  val qPivot = Q(
    "q112_status_pivot",
    (s, dir) =>
      table(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Fixed-iteration PageRank over the customer→supplier transaction
    * graph ([[graft.ops.GraphStats.pageRank]]): nodes are customers
    * (even ids) and suppliers (odd ids), a directed edge per distinct
    * (customer, supplier) trade through orders ⨝ lineitem. All rank
    * arithmetic is INTEGER quanta (unit mass 1e12 split across nodes,
    * floor division everywhere), so 5 iterations of the iterative-join
    * plan are bit-exact against the oracle's unrolled recursive SQL —
    * no float accumulation order in play. Customers with no orders and
    * every supplier are dangling; their mass redistributes through the
    * damping term each round. */
  val qPageRank = Q(
    "q184_pagerank",
    (s, dir) => {
      val orders = table(s, dir, "orders")
      val li = table(s, dir, "lineitem")
      val edges = orders
        .join(li, orders("o_orderkey") === li("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val nodes = table(s, dir, "customer")
        .select((col("c_custkey") * 2).as("id"))
        .unionAll(table(s, dir, "supplier")
          .select((col("s_suppkey") * 2 + 1).as("id")))
      graft.ops.GraphStats.pageRank(edges, "src", "dst", nodes, "id",
          iterations = 5)
        .orderBy("id")
    },
    Some {
      val iterCtes = (1 to 5).map { i =>
        val prev = s"r${i - 1}"
        s"""d$i AS (SELECT coalesce(sum(q), 0) AS ds FROM $prev
            LEFT JOIN odeg ON odeg.src = $prev.id WHERE odeg.src IS NULL),
          c$i AS (SELECT e.dst AS id, sum(r.q // o.outdeg) AS insum
                  FROM $prev r JOIN odeg o ON o.src = r.id
                  JOIN e ON e.src = r.id GROUP BY 1),
          r$i AS (SELECT nd.id,
              (1000000000000 - (1000000000000 * 85) // 100)
                // (SELECT n FROM nn)
              + (85 * ((SELECT ds FROM d$i) // (SELECT n FROM nn)
                       + coalesce(c.insum, 0))) // 100 AS q
            FROM nd LEFT JOIN c$i c ON c.id = nd.id)"""
      }.mkString(",\n          ")
      s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
              l_suppkey * 2 + 1 AS dst
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          nd AS (SELECT c_custkey * 2 AS id FROM customer
                 UNION SELECT s_suppkey * 2 + 1 FROM supplier),
          odeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
          nn AS (SELECT count(*) AS n FROM nd),
          r0 AS (SELECT id, 1000000000000 // (SELECT n FROM nn) AS q
                 FROM nd),
          $iterCtes
        SELECT id, CAST(q AS BIGINT) AS rank_q FROM r5 ORDER BY id"""
    })

  /** Bucketed-layout co-located join on the oracle gate
    * ([[graft.sources.Bucketing]]): lineitem and orders are WRITTEN as
    * bucketed+sorted parquet tables on the order key, then joined —
    * the scan's HashPartitioning satisfies the join's distribution, so
    * the sort-merge join runs with no Exchange on either side
    * (BucketingSpec asserts the exchange-free plan; this query
    * hash-checks the ANSWER of that layout against a plain SQL join).
    * The write+read round-trip is the point: it proves the persisted
    * bucket files carry the co-location, not just the in-session
    * partitioning. */
  val qBucketedJoin = Q(
    "q188_bucketed_join",
    (s, dir) => {
      val tag = java.util.UUID.randomUUID.toString.replace("-", "")
      val base = java.nio.file.Files
        .createTempDirectory("graft-bucketed").toString
      val li = s"graft_li_$tag"; val ord = s"graft_ord_$tag"
      graft.sources.Bucketing.writeBucketed(
        table(s, dir, "lineitem").select(
          col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("rev")),
        li, s"$base/lineitem", "l_orderkey", buckets = 8)
      graft.sources.Bucketing.writeBucketed(
        table(s, dir, "orders").select(
          col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        ord, s"$base/orders", "l_orderkey", buckets = 8)
      try {
        graft.sources.Bucketing.bucketedJoin(s, li, ord, "l_orderkey")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum(col("rev")).cast("double").as("revenue"))
          .orderBy("o_orderpriority")
          .localCheckpoint(true) // materialize before the tables drop
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $li")
        s.sql(s"DROP TABLE IF EXISTS $ord")
      }
    },
    Some("""SELECT o_orderpriority, count(*) AS n_items,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
          AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q5-shaped six-table star join (local-supplier revenue):
    * revenue per ASIA nation from 1996-1997 orders where the customer's
    * and supplier's nations coincide. The deepest join pipeline in the
    * catalog — region/nation broadcast, the customer⨝orders⨝lineitem
    * spine shuffles on its keys, and the supplier join carries the
    * extra n_nationkey equality that makes the plan a genuine
    * optimizer workout (Catalyst must push both filters below the
    * joins and pick broadcast vs shuffle per side from sizes). Money
    * sums ride DECIMAL. */
  val qStarJoinDeep = Q(
    "q192_star_join_deep",
    (s, dir) => {
      val region = table(s, dir, "region")
        .where(col("r_name") === "ASIA").select("r_regionkey")
      val nation = table(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val cust = table(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = table(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("rev"))
      val supp = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      nation.join(region, col("n_regionkey") === col("r_regionkey"))
        .join(cust, col("c_nationkey") === col("n_nationkey"))
        .join(ord, col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .join(supp, col("s_suppkey") === col("l_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, count(*) AS n_items,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
          AS DOUBLE) AS revenue
      FROM region
      JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY n_name"""))

  /** File-level zone-map audit ([[graft.sources.ZoneMaps.fileZoneMap]]):
    * per physical lineitem file, the ship-date envelope (epoch micros)
    * and whether a 1998-only or pre-1996 predicate would skip the file
    * outright — the data-skipping readout a layout review runs. The
    * oracle names the single canonical file literally (the synthetic
    * tables are one file each); the Spark side genuinely groups on
    * `input_file_name()` and generalizes to many files. */
  val qZoneMap = Q(
    "q198_zone_map",
    (s, dir) => {
      val shipUs = unix_micros(col("l_shipdate").cast("timestamp"))
      graft.sources.ZoneMaps.fileZoneMap(
          table(s, dir, "lineitem").select(shipUs.as("ship_us")),
          "ship_us",
          Map(
            // [1998-01-01, 1999-01-01) and (-inf, 1996-01-01)
            "prunes_1998" -> (883612800000000L, 915148800000000L),
            "prunes_pre1996" -> (Long.MinValue, 820454400000000L)))
        .orderBy("file")
    },
    Some("""SELECT 'lineitem.parquet' AS file,
        count(*) AS n_rows,
        min(epoch_us(l_shipdate)) AS v_min,
        max(epoch_us(l_shipdate)) AS v_max,
        (max(epoch_us(l_shipdate)) < epoch_us(TIMESTAMP '1998-01-01')
         OR min(epoch_us(l_shipdate)) >= epoch_us(TIMESTAMP '1999-01-01'))
          AS prunes_1998,
        (max(epoch_us(l_shipdate)) < -9223372036854775808
         OR min(epoch_us(l_shipdate)) >= epoch_us(TIMESTAMP '1996-01-01'))
          AS prunes_pre1996
      FROM lineitem WHERE l_shipdate IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** TPC-H Q3-shaped shipping-priority query: top-10 unshipped-window
    * orders by revenue for one customer segment — filter pushdown into
    * three scans, a two-fact join spine, and a bounded TakeOrdered
    * instead of a global sort. Revenue ranks on the EXACT decimal sum
    * (order-deterministic), cast to double only for output. */
  val qTpchQ3 = Q(
    "q200_tpch_q3",
    (s, dir) => {
      val cust = table(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = table(s, dir, "orders")
        .where(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = table(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("rev"))
      cust.join(ord, col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(col("rev")).as("rev_exact"))
        .orderBy(col("rev_exact").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          col("rev_exact").cast("double").as("revenue"),
          unix_micros(col("o_orderdate").cast("timestamp"))
            .as("o_orderdate_us"),
          col("o_orderpriority"))
    },
    Some("""SELECT l_orderkey,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
          AS DOUBLE) AS revenue,
        epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
      FROM customer JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND l_shipdate > TIMESTAMP '1997-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY sum(CAST(l_extendedprice * (1 - l_discount)
        AS DECIMAL(18,4))) DESC, l_orderkey
      LIMIT 10"""))

  /** TPC-H Q18-shaped large-volume-customer query: orders whose total
    * quantity exceeds a threshold (HAVING on an exact decimal sum — a
    * semi-join-reducible aggregate), joined back to the customer, top
    * 100 by (o_totalprice desc, o_orderkey). All ranking keys exact
    * (decimal/bigint), so the cutoff is engine-deterministic. */
  val qTpchQ18 = Q(
    "q201_tpch_q18",
    (s, dir) => {
      val bigOrders = table(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
        .where(col("qty") > 300)
      val ord = table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = table(s, dir, "customer").select("c_custkey", "c_name")
      bigOrders
        .join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("c_name"), col("o_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"),
          col("qty").cast("double").as("total_qty"))
    },
    Some("""WITH big AS (SELECT l_orderkey,
          sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      SELECT c_name, o_orderkey, CAST(o_totalprice AS DOUBLE)
          AS o_totalprice,
        CAST(qty AS DOUBLE) AS total_qty
      FROM big JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100"""))

  val all: Seq[Q] = Seq(qJoinRevenue, qRollup, qSetOps, qPivot, qPageRank,
    qBucketedJoin, qStarJoinDeep, qZoneMap, qTpchQ3, qTpchQ18)
}
