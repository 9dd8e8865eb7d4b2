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

  /** Z-order (Morton) clustering audit ([[graft.ops.ZOrder]]): every
    * lineitem row's (l_extendedprice, l_quantity) pair is mapped to a
    * 20-bit z-value by bit-interleaving 10-bit scaled bucket ordinals,
    * and the z-domain's 64 contiguous ranges — the "files" a
    * z-ordered table write would produce — report count + per-dim
    * bounding boxes. Tight boxes on BOTH dims are what makes the
    * layout prunable for range predicates on EITHER column (the
    * Delta/Iceberg Z-ORDER argument; q198 audits the single-column
    * layout this one generalizes). The entire computation is
    * closed-form codegen'd arithmetic (floor/least/shift/and), so the
    * physical-layout decision sits on a value-equality oracle. */
  val qZOrderLayout = Q(
    "q202_zorder_layout",
    (s, dir) => graft.ops.ZOrder.zBucketStats(
      table(s, dir, "lineitem"), "l_extendedprice", "l_quantity",
      bits = 10, buckets = 64),
    Some("""WITH src AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x,
          CAST(l_quantity AS DOUBLE) AS y
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
      b AS (SELECT min(x) AS mnx, max(x) AS mxx,
          min(y) AS mny, max(y) AS mxy FROM src),
      s AS (SELECT x, y,
          CAST(least(floor((x - b.mnx) / ((b.mxx - b.mnx) / 1024.0)),
            1023.0) AS BIGINT) AS xb,
          CAST(least(floor((y - b.mny) / ((b.mxy - b.mny) / 1024.0)),
            1023.0) AS BIGINT) AS yb
        FROM src, b),
      z AS (SELECT x, y,
          CAST(list_sum([(((xb >> k) & 1) << (2 * k)) +
            (((yb >> k) & 1) << (2 * k + 1)) FOR k IN range(0, 10)])
            AS BIGINT) AS z
        FROM s)
      SELECT z >> 14 AS zbucket, count(*) AS n,
        min(x) AS mn_x, max(x) AS mx_x,
        min(y) AS mn_y, max(y) AS mx_y
      FROM z GROUP BY 1 ORDER BY 1"""))

  /** Data-skipping effectiveness of three physical layouts for the
    * SAME probe box ([[graft.ops.ZOrder.skipEffectiveness]]): carve
    * lineitem into 64 "files" by z-range, by x-range, and by a
    * portable md5 hash (the unclustered baseline), then count files
    * whose min/max zone maps let an x-predicate, a y-predicate, and
    * the conjunctive box skip them. Map-only file assignment + three
    * 64-group rollups — the audit itself is shuffle-light at any
    * scale. The z layout is the only one that skips on both dims. */
  val qSkipEffect = Q(
    "q208_skip_effectiveness",
    (s, dir) => graft.ops.ZOrder.skipEffectiveness(
      table(s, dir, "lineitem")
        .withColumn("rid",
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("string")),
      "rid", "l_extendedprice", "l_quantity",
      xLo = 20000.0, xHi = 30000.0, yLo = 10.0, yHi = 20.0,
      bits = 10, buckets = 64),
    Some("""WITH src AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x,
          CAST(l_quantity AS DOUBLE) AS y,
          CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) AS rid
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
      b AS (SELECT min(x) AS mnx, max(x) AS mxx,
          min(y) AS mny, max(y) AS mxy FROM src),
      s AS (SELECT x, y, rid,
          CAST(least(floor((x - b.mnx) / ((b.mxx - b.mnx) / 1024.0)),
            1023.0) AS BIGINT) AS xb,
          CAST(least(floor((y - b.mny) / ((b.mxy - b.mny) / 1024.0)),
            1023.0) AS BIGINT) AS yb,
          CAST(least(floor((x - b.mnx) / ((b.mxx - b.mnx) / 64.0)),
            63.0) AS BIGINT) AS f_x,
          ('0x' || substr(md5(rid), 1, 12))::BIGINT % 64 AS f_h
        FROM src, b),
      z AS (SELECT x, y, f_x, f_h,
          CAST(list_sum([(((xb >> k) & 1) << (2 * k)) +
            (((yb >> k) & 1) << (2 * k + 1)) FOR k IN range(0, 10)])
            AS BIGINT) >> 14 AS f_z
        FROM s),
      l AS (
        SELECT 'zorder' AS layout, f_z AS f, x, y FROM z
        UNION ALL SELECT 'xsort', f_x, x, y FROM z
        UNION ALL SELECT 'arrival', f_h, x, y FROM z),
      fb AS (SELECT layout, f, min(x) AS fmnx, max(x) AS fmxx,
          min(y) AS fmny, max(y) AS fmxy
        FROM l GROUP BY 1, 2)
      SELECT layout, count(*) AS n_files,
        count(*) FILTER (fmxx < 20000.0 OR fmnx > 30000.0)
          AS x_skip_files,
        count(*) FILTER (fmxy < 10.0 OR fmny > 20.0) AS y_skip_files,
        count(*) FILTER (fmxx < 20000.0 OR fmnx > 30000.0
          OR fmxy < 10.0 OR fmny > 20.0) AS box_skip_files
      FROM fb GROUP BY layout ORDER BY layout"""))

  /** TPC-H Q4-shaped correlated EXISTS: order-priority counts over a
    * date window where a correlated lineitem subquery references the
    * OUTER row's o_orderdate in its predicate (shipped > 60 days
    * after order). Declared through `spark.sql` so Catalyst's
    * subquery DECORRELATION runs — the rewrite into a left-semi join
    * on (key, inequality) is the planner surface this row pins;
    * hand-building the semi join would bypass it. */
  val qCorrelatedExists = Q(
    "q205_correlated_exists",
    (s, dir) => {
      val tag = java.util.UUID.randomUUID.toString.replace("-", "")
        .take(8)
      table(s, dir, "orders").createOrReplaceTempView(s"ord_$tag")
      table(s, dir, "lineitem").createOrReplaceTempView(s"li_$tag")
      s.sql(s"""SELECT o_orderpriority, count(*) AS n_orders
        FROM ord_$tag
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM li_$tag
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
        AND EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q22-shaped anti join with scalar subqueries: customers
    * whose balance exceeds the positive-balance mean AND who placed no
    * order on/after 2001-01-01, rolled up by market segment. The mean
    * comparison is exact integer cross-multiplication on cent-
    * quantized balances (bal·n > Σbal — no decimal division whose
    * result type differs across engines), and the NOT EXISTS
    * decorrelates into a left-anti hash join. */
  val qAntiJoinQ22 = Q(
    "q206_anti_join_balance",
    (s, dir) => {
      val tag = java.util.UUID.randomUUID.toString.replace("-", "")
        .take(8)
      table(s, dir, "customer").createOrReplaceTempView(s"cust_$tag")
      table(s, dir, "orders").createOrReplaceTempView(s"ord2_$tag")
      s.sql(s"""SELECT c_mktsegment, count(*) AS n_cust,
          CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
            AS DOUBLE) / 100 AS total_bal
        FROM cust_$tag c
        WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
            * (SELECT count(*) FROM cust_$tag WHERE c_acctbal > 0.0)
          > (SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
             FROM cust_$tag WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM ord2_$tag o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_cust,
        CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
          AS DOUBLE) / 100 AS total_bal
      FROM customer c
      WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
          * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
        > (SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
           FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2001-01-01')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** TPC-H Q21-shaped sole-blame scan: suppliers whose RETURNED item
    * sat in a finalized multi-supplier order where no OTHER supplier's
    * item was returned — the classic EXISTS + NOT EXISTS DOUBLE
    * correlation against the same fact table. Catalyst decorrelates
    * the pair into a left-semi and a left-anti hash join on
    * l_orderkey (q205/q206 each exercise ONE of those; this row
    * proves the combination composes in one plan). The blame
    * condition adapts Q21's receipt/commit-date lag — columns this
    * schema lacks — to returnflag with identical join structure. */
  val qBlameSupplier = Q(
    "q280_blame_supplier",
    (s, dir) => {
      val tag = java.util.UUID.randomUUID.toString.replace("-", "")
        .take(8)
      table(s, dir, "supplier").createOrReplaceTempView(s"sup_$tag")
      table(s, dir, "orders").createOrReplaceTempView(s"ord3_$tag")
      table(s, dir, "lineitem").createOrReplaceTempView(s"li3_$tag")
      s.sql(s"""SELECT s_name, count(*) AS numwait
        FROM sup_$tag, li3_$tag l1, ord3_$tag
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM li3_$tag l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM li3_$tag l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""")
    },
    Some("""SELECT s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""))

  /** TPC-H Q17-shaped small-quantity revenue: lineitems of one brand
    * whose quantity sits below 20% of that part's mean — a CORRELATED
    * SCALAR AGGREGATE in WHERE, the decorrelation showcase (Catalyst
    * rewrites it into a per-part aggregate + join; a naive engine
    * re-scans lineitem per probe row). The mean is written as
    * sum/count on exact integer quantities so both engines produce
    * the identical double before the 0.2 scale; revenue rides the
    * catalog's cent-quantized money discipline. */
  val qSmallQtyRevenue = Q(
    "q281_small_qty_revenue",
    (s, dir) => {
      val tag = java.util.UUID.randomUUID.toString.replace("-", "")
        .take(8)
      table(s, dir, "part").createOrReplaceTempView(s"part_$tag")
      table(s, dir, "lineitem").createOrReplaceTempView(s"li4_$tag")
      s.sql(s"""SELECT count(*) AS n_small,
          CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS DOUBLE) / 100 AS revenue
        FROM li4_$tag JOIN part_$tag ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT
              0.2 * (CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS DOUBLE)
                / count(*))
            FROM li4_$tag l2 WHERE l2.l_partkey = p_partkey)""")
    },
    Some("""SELECT count(*) AS n_small,
        CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
          AS DOUBLE) / 100 AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1'
        AND l_quantity < (SELECT
            0.2 * (CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS DOUBLE)
              / count(*))
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""))

  /** CUBE over (event_type, ISO weekday): all four grouping-set
    * granularities of the activity matrix in ONE partial-agg shuffle
    * (q74 pins ROLLUP's three levels; CUBE adds the cross slices).
    * Weekday is ISO (1=Mon) on both engines — Spark's weekday()+1
    * equals DuckDB's isodow() — and sums ride decimal. */
  val qCubeEvents = Q(
    "q207_cube_events",
    (s, dir) => {
      val ev = QueryCatalog.eventsUs(s, dir)
        .where(col("event_type").isNotNull)
        .select(col("event_type"),
          (expr("weekday(timestamp_micros(ts))") + 1).cast("int").as("dw"),
          col("value"))
      ev.cube("event_type", "dw")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double")
            .as("sum_value"),
          grouping(col("event_type")).cast("long").as("g_type"),
          grouping(col("dw")).cast("long").as("g_dow"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("dw"))
    },
    Some("""WITH e AS (SELECT event_type, CAST(isodow(ts) AS INT) AS dw,
          value
        FROM events WHERE event_type IS NOT NULL)
      SELECT event_type, dw, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        CAST(GROUPING(event_type) AS BIGINT) AS g_type,
        CAST(GROUPING(dw) AS BIGINT) AS g_dow
      FROM e GROUP BY CUBE(event_type, dw)
      ORDER BY event_type NULLS FIRST, dw NULLS FIRST"""))

  /** TPC-H Q1-shaped pricing summary — THE scan-heavy reference query
    * of analytic benchmarking: one pass over lineitem, grouped
    * multi-aggregate with derived expressions (disc price, charge),
    * exact decimal sums, averages derived from decimal sum/count
    * pairs so no float accumulation order leaks into the hash. */
  val qTpchQ1 = Q(
    "q225_tpch_q1",
    (s, dir) => {
      val dec = DecimalType(18, 4)
      table(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double")
            .as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec)).cast("double").as("sum_disc_price"),
          // three-factor product: the double->decimal cast rounds
          // differently across engines on boundary rows; the floor
          // quantization is arithmetic both engines share bit-for-bit
          (sum(floor(col("l_extendedprice")
              * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax")) * lit(1e4) + lit(0.5))
            .cast(DecimalType(38, 0))).cast("double") / lit(1e4))
            .as("sum_charge"),
          round(sum(col("l_quantity").cast(dec)).cast("double")
            / count(lit(1)), 6).as("avg_qty"),
          round(sum(col("l_discount").cast(dec)).cast("double")
            / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
          AS sum_base_price,
        CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
          * (1.0 + l_tax) * 1e4 + 0.5) AS DECIMAL(38,0))) AS DOUBLE)
          / 1e4 AS sum_charge,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          / count(*), 6) AS avg_qty,
        round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
          / count(*), 6) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** TPC-H Q6-shaped forecasting-revenue filter: the pure
    * predicate-pushdown showcase — a tight three-way range filter
    * straight into the parquet scan (PushedFilters carries all of it)
    * and ONE decimal aggregate, no shuffle beyond the 1-row final. */
  val qTpchQ6 = Q(
    "q226_tpch_q6",
    (s, dir) =>
      table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount") >= 0.02 && col("l_discount") <= 0.04
          && col("l_quantity") < 24)
        .agg(
          sum((col("l_extendedprice") * col("l_discount"))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"),
          count(lit(1)).as("n_rows")),
    Some("""SELECT CAST(sum(CAST(l_extendedprice * l_discount
          AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        count(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.02 AND l_discount <= 0.04
        AND l_quantity < 24"""))

  /** TPC-H Q14-shaped promo revenue share: fact⨝dim join with a
    * conditional aggregate over the joined stream — the
    * case-when-inside-sum pattern, on exact decimals with one final
    * division. */
  val qTpchQ14 = Q(
    "q227_tpch_q14",
    (s, dir) => {
      val dec = DecimalType(18, 4)
      val li = table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_partkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec).as("rev"))
      val pt = table(s, dir, "part").select(col("p_partkey"),
        col("p_type"))
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(lit(0).cast(dec))).cast("double")
            .as("promo_revenue"),
          sum(col("rev")).cast("double").as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          round(lit(100.0) * col("promo_revenue")
            / col("total_revenue"), 6).as("promo_share_pct"))
    },
    Some("""SELECT promo_revenue, total_revenue,
        round(100.0 * promo_revenue / total_revenue, 6)
          AS promo_share_pct
      FROM (SELECT
          CAST(sum(CASE WHEN p_type = 'PROMO' THEN
            CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
            AS promo_revenue,
          CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
            AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01')"""))

  /** Explicit GROUPING SETS (the general form q74's ROLLUP and q207's
    * CUBE specialize): per-status, per-priority, the full cross, and
    * the grand total in ONE aggregation pass — Spark expands the sets
    * with a single Expand node feeding one hash aggregate (one scan,
    * one shuffle), exactly the plan a 100 TB rollup wants instead of
    * four separate scans UNION ALLed. Membership flags come from
    * `grouping()` per column (both engines' GROUPING() bit semantics
    * agree); sums ride DECIMAL so aggregation order can't drift the
    * hash. */
  val qGroupingSets = Q(
    "q236_grouping_sets",
    (s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("graft_orders_gs")
      s.sql("""SELECT
          CAST(grouping(o_orderstatus) AS INT) AS g_status,
          CAST(grouping(o_orderpriority) AS INT) AS g_prio,
          coalesce(o_orderstatus, 'ALL') AS status,
          coalesce(o_orderpriority, 'ALL') AS priority,
          count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM graft_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
          (o_orderstatus, o_orderpriority), ())
        ORDER BY g_status, g_prio, status, priority""")
    },
    Some("""SELECT
        CAST(grouping(o_orderstatus) AS INT) AS g_status,
        CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        coalesce(o_orderstatus, 'ALL') AS status,
        coalesce(o_orderpriority, 'ALL') AS priority,
        count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        (o_orderstatus, o_orderpriority), ())
      ORDER BY g_status, g_prio, status, priority"""))

  /** Hilbert-curve layout audit ([[graft.ops.ZOrder.hilbertBucketStats]]
    * over the new codegen'd [[graft.functions.HilbertIndexExpr]]): the
    * same (l_extendedprice, l_quantity) grid as q202's Morton audit,
    * indexed by the Hilbert curve instead — consecutive indices are
    * always adjacent cells, so the 64 contiguous "files" have tighter
    * boxes (HilbertSpec asserts the superiority; this row puts the
    * INDEX ARITHMETIC on the value gate). The oracle unrolls the
    * 10-step rotate-and-accumulate xy→d iteration as a chain of CTEs —
    * pure integer arithmetic, bit-exact in both engines. */
  val qHilbertLayout = Q(
    "q239_hilbert_layout",
    (s, dir) => graft.ops.ZOrder.hilbertBucketStats(
      table(s, dir, "lineitem"), "l_extendedprice", "l_quantity",
      bits = 10, buckets = 64),
    Some {
      val bits = 10
      val n = 1L << bits
      val steps = (0 until bits).map { k =>
        val s = 1L << (bits - 1 - k)
        s"""h${k + 1} AS (SELECT x0, y0,
             d + ${s * s} * xor(3 * rx, ry) AS d,
             CASE WHEN ry = 1 THEN x
               WHEN rx = 1 THEN ${n - 1} - y ELSE y END AS x,
             CASE WHEN ry = 1 THEN y
               WHEN rx = 1 THEN ${n - 1} - x ELSE x END AS y
           FROM (SELECT x0, y0, d, x, y,
               CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
             FROM h$k))"""
      }.mkString(",\n")
      s"""WITH src AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x0,
            CAST(l_quantity AS DOUBLE) AS y0
          FROM lineitem
          WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        b AS (SELECT min(x0) AS mnx, max(x0) AS mxx,
            min(y0) AS mny, max(y0) AS mxy FROM src),
        h0 AS (SELECT x0, y0, CAST(0 AS BIGINT) AS d,
            CAST(least(floor((x0 - b.mnx) / ((b.mxx - b.mnx) / 1024.0)),
              1023.0) AS BIGINT) AS x,
            CAST(least(floor((y0 - b.mny) / ((b.mxy - b.mny) / 1024.0)),
              1023.0) AS BIGINT) AS y
          FROM src, b),
        $steps
        SELECT CAST(d >> 14 AS BIGINT) AS hbucket, count(*) AS n,
          min(x0) AS mn_x, max(x0) AS mx_x,
          min(y0) AS mn_y, max(y0) AS mx_y
        FROM h$bits GROUP BY 1 ORDER BY 1"""
    })

  /** TPC-H Q13-shaped order-count distribution: LEFT OUTER join with
    * a predicate ON THE JOIN CONDITION (orders below URGENT priority)
    * — the filter must not drop order-less customers, so it cannot
    * move to WHERE; Catalyst keeps it on the outer join's streamed
    * side — then a two-level aggregate: per-customer order counts
    * (count(o_custkey) so NULL padding counts 0), then the histogram
    * of those counts. Both shuffles key on different columns, so the
    * plan is the canonical re-shuffle-after-agg shape; neither engine
    * can prune the zero bucket. */
  val qOrderCountHist = Q(
    "q284_order_count_hist",
    (s, dir) => {
      val c = table(s, dir, "customer").select("c_custkey")
      val o = table(s, dir, "orders").select("o_custkey", "o_orderpriority")
      c.join(o, c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= lit("1-URGENT"), "left_outer")
        .groupBy(c("c_custkey")).agg(count(col("o_custkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_custkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q15-shaped top supplier: quarterly revenue per supplier,
    * then the supplier(s) achieving the MAX — the argmax-over-an-
    * aggregated-view shape (Q15's CREATE VIEW + scalar max). The
    * revenue view is computed ONCE and self-referenced for the max
    * (Catalyst plans an aggregate + broadcast scalar + filter, no
    * re-scan of lineitem); the max comparison happens on the EXACT
    * decimal sums — only the emitted column degrades to double — so
    * no float tie ambiguity exists, and ties would all be kept as Q15
    * specifies. */
  val qTopSupplier = Q(
    "q285_top_supplier",
    (s, dir) => {
      val rev = table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_suppkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("rev"))
        .groupBy("l_suppkey").agg(sum(col("rev")).as("total_exact"))
      val mx = rev.agg(max(col("total_exact")).as("mx"))
      rev.join(broadcast(mx), col("total_exact") === col("mx"))
        .join(table(s, dir, "supplier"),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_exact").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH rev AS (SELECT l_suppkey,
          sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS total_exact
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name,
        CAST(total_exact AS DOUBLE) AS total_revenue
      FROM rev JOIN supplier ON s_suppkey = l_suppkey
      WHERE total_exact = (SELECT max(total_exact) FROM rev)
      ORDER BY s_suppkey"""))

  /** TPC-H Q8-shaped national market share: over two years of PROMO-
    * part orders shipped to AMERICA customers, the fraction of revenue
    * supplied by NATION_3 — the conditional-sum-over-sum RATIO
    * aggregate at the end of an EIGHT-table join (lineitem–part–
    * supplier–orders–customer–nation×2–region; nation joins twice
    * under different roles, so the plan proves alias-correct dim
    * reuse). All dims broadcast except orders/customer (they scale
    * with the fact); the ratio divides the exact decimal sums only
    * after both are fixed, in double on both engines. */
  /** TPC-H Q2-shaped minimum-cost-supplier: the correlated scalar MIN
    * subquery in WHERE against a derived supplier-part cost table
    * (this corpus has no partsupp; exact cent-quantized min unit cost
    * per (part, supplier) from lineitem stands in). Catalyst
    * decorrelates the `= (SELECT min ...)` into an aggregate + join —
    * the classic pick-the-argmin-per-part shape — followed by the
    * supplier→nation→region dimension chain and Q2's
    * ORDER BY acctbal DESC ... LIMIT. Costs stay integer cents end to
    * end, so the argmin set is exact on both engines. */
  val qTpchQ2 = Q(
    "q306_tpch_q2",
    (s, dir) => {
      val tag = java.util.UUID.randomUUID.toString.replace("-", "")
        .take(8)
      Seq("lineitem", "part", "supplier", "nation", "region").foreach(t =>
        table(s, dir, t).createOrReplaceTempView(s"${t}_q2$tag"))
      s.sql(s"""WITH ps AS (SELECT l_partkey AS ps_partkey,
            l_suppkey AS ps_suppkey,
            min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS ps_cost
          FROM lineitem_q2$tag GROUP BY 1, 2)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
          ps_cost
        FROM ps
        JOIN part_q2$tag ON p_partkey = ps_partkey
        JOIN supplier_q2$tag ON s_suppkey = ps_suppkey
        JOIN nation_q2$tag ON n_nationkey = s_nationkey
        JOIN region_q2$tag ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA' AND p_size > 25
          AND ps_cost = (SELECT min(ps2.ps_cost) FROM ps ps2
                         WHERE ps2.ps_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100""")
    },
    Some("""WITH ps AS (SELECT l_partkey AS ps_partkey,
          l_suppkey AS ps_suppkey,
          min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS ps_cost
        FROM lineitem GROUP BY 1, 2)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_cost
      FROM ps
      JOIN part ON p_partkey = ps_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'ASIA' AND p_size > 25
        AND ps_cost = (SELECT min(ps2.ps_cost) FROM ps ps2
                       WHERE ps2.ps_partkey = p_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100"""))

  /** TPC-H Q4-shaped order-priority checking: EXISTS semi-join from
    * orders into lineitem (this corpus has no commit/receipt dates, so
    * "late" = any line shipped more than 60 calendar days after the
    * order date) over a half-year order window, counted by priority.
    * Catalyst rewrites the correlated EXISTS to a left-semi hash join;
    * the day arithmetic is calendar-exact on both engines
    * (date_add(CAST AS DATE, 60) == DATE + 60). */
  val qTpchQ4 = Q(
    "q314_tpch_q4",
    (s, dir) => {
      val tag = java.util.UUID.randomUUID.toString.replace("-", "")
        .take(8)
      table(s, dir, "orders").createOrReplaceTempView(s"ord_q4$tag")
      table(s, dir, "lineitem").createOrReplaceTempView(s"li_q4$tag")
      s.sql(s"""SELECT o_orderpriority, count(*) AS order_count
        FROM ord_q4$tag o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM li_q4$tag l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND CAST(l.l_shipdate AS DATE)
                          > date_add(CAST(o.o_orderdate AS DATE), 60))
        GROUP BY 1 ORDER BY 1""")
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-07-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND CAST(l.l_shipdate AS DATE)
                        > CAST(o.o_orderdate AS DATE) + 60)
      GROUP BY 1 ORDER BY 1"""))

  val qTpchQ8 = Q(
    "q289_tpch_q8",
    (s, dir) => {
      val li = table(s, dir, "lineitem").select(
        col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4)).as("vol"))
      val p = table(s, dir, "part").where(col("p_type") === "PROMO")
        .select("p_partkey")
      val sup = table(s, dir, "supplier").select(
        col("s_suppkey"), col("s_nationkey"))
      val ord = table(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val cust = table(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"))
      val custNation = table(s, dir, "nation").as("n1")
        .join(table(s, dir, "region")
          .where(col("r_name") === "AMERICA"),
          col("n1.n_regionkey") === col("r_regionkey"))
        .select(col("n1.n_nationkey").as("cn_key"))
      val supNation = table(s, dir, "nation").as("n2")
        .select(col("n2.n_nationkey").as("sn_key"),
          col("n2.n_name").as("sn_name"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
        .join(broadcast(supNation), col("s_nationkey") === col("sn_key"))
        .groupBy("o_year")
        .agg(
          sum(when(col("sn_name") === "NATION_3", col("vol"))
            .otherwise(lit(0).cast(DecimalType(18, 4)))).as("num"),
          sum(col("vol")).as("den"))
        .select(col("o_year"),
          round(col("num").cast("double") / col("den").cast("double"), 6)
            .as("mkt_share"),
          col("den").cast("double").as("volume"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN v
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
          / CAST(sum(v) AS DOUBLE), 6) AS mkt_share,
        CAST(sum(v) AS DOUBLE) AS volume
      FROM (SELECT l_partkey, l_suppkey, l_orderkey,
          CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS v
        FROM lineitem) li
      JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'AMERICA'
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      GROUP BY 1 ORDER BY 1"""))

  /** TPC-H Q7 shape (volume shipping): revenue flowing between two
    * nations in either direction, by (supp_nation, cust_nation, year).
    * Plan intent: the OR-of-two-nation-pairs predicate sits on the
    * joined 25×25 nation pair — Catalyst pushes each nation's half to
    * its broadcast side; lineitem⨝orders shuffles on the order key
    * once; volume rides DECIMAL so the rollup is order-exact. */
  val qTpchQ7 = Q(
    "q317_tpch_q7",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("volume"))
      val sup = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val ord = table(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = table(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n1 = table(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
      val n2 = table(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"),
          col("n_name").as("cust_nation"))
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
        .where((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum(col("volume")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS INT) AS l_year,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** TPC-H Q10 shape (returned-item reporting): top 20 customers by
    * revenue lost to returns in one quarter. Plan intent: the order-
    * date range prunes orders BEFORE the fact-fact join; the returnflag
    * filter prunes lineitem at the scan (PushedFilters); nation
    * broadcasts; the top-20 is a TakeOrdered on the DECIMAL revenue
    * (order-exact) with the customer key as tiebreak. */
  val qTpchQ10 = Q(
    "q318_tpch_q10",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("rev"))
      val ord = table(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val cust = table(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val nat = table(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(col("rev")).as("revenue_d"))
        .orderBy(col("revenue_d").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"),
          col("revenue_d").cast("double").as("revenue"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
    },
    Some("""SELECT c_custkey, c_name,
        CAST(revenue_d AS DOUBLE) AS revenue,
        round(c_acctbal, 2) AS c_acctbal, n_name
      FROM (SELECT c_custkey, c_name, c_acctbal, n_name,
          sum(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(18,4))) AS revenue_d
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY 1, 2, 3, 4)
      ORDER BY revenue_d DESC, c_custkey LIMIT 20"""))

  /** TPC-H Q19 shape (discounted revenue, OR-of-conjuncts): three
    * disjoint (brand, size, quantity) bands OR-ed into ONE predicate.
    * Plan intent: Catalyst keeps this a single lineitem⨝part hash join
    * with the disjunction evaluated post-join (and the common
    * l_quantity bound derivable for scan pruning) — one pass, no
    * union-of-three-scans. DECIMAL rollup, order-exact. */
  val qTpchQ19 = Q(
    "q319_tpch_q19",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("rev"))
      val p = table(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      val band = (col("p_brand") === "Brand#11" &&
          col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#22" &&
          col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 40)) ||
        (col("p_brand") === "Brand#3" &&
          col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 50))
      li.join(p, col("l_partkey") === col("p_partkey"))
        .where(band)
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 1 AND 20)
        OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
          AND l_quantity BETWEEN 10 AND 40)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
          AND l_quantity BETWEEN 20 AND 50)"""))

  /** TPC-H Q9 shape (product-type profit): profit per (nation, year)
    * through a five-table join with a LIKE filter on the part name
    * (no partsupp table in this fixture — supply cost proxied by
    * p_retailprice·quantity, same plan shape). Plan intent: the LIKE
    * prunes part before broadcast; supplier/nation broadcast;
    * lineitem⨝orders is the one fact-fact shuffle; profit rides
    * DECIMAL so the rollup is order-exact. */
  val qTpchQ9 = Q(
    "q326_tpch_q9",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      val p = table(s, dir, "part")
        .where(col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
      val sup = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = table(s, dir, "nation").select("n_nationkey", "n_name")
      val ord = table(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name").as("nation"), col("o_year"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            - col("p_retailprice") * col("l_quantity"))
            .cast(DecimalType(18, 4)).as("amount"))
        .groupBy("nation", "o_year")
        .agg(sum(col("amount")).cast("double").as("sum_profit"),
          count(lit(1)).as("n_items"))
        .orderBy("nation", "o_year")
    },
    Some("""SELECT n_name AS nation,
        CAST(year(o_orderdate) AS INT) AS o_year,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount)
          - p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          AS sum_profit,
        count(*) AS n_items
      FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[Q] = Seq(qJoinRevenue, qRollup, qSetOps, qPivot, qPageRank,
    qBucketedJoin, qStarJoinDeep, qZoneMap, qTpchQ3, qTpchQ18,
    qZOrderLayout, qCorrelatedExists, qAntiJoinQ22, qCubeEvents,
    qSkipEffect, qTpchQ1, qTpchQ6, qTpchQ14, qGroupingSets,
    qHilbertLayout, qBlameSupplier, qSmallQtyRevenue,
    qOrderCountHist, qTopSupplier, qTpchQ8, qTpchQ2, qTpchQ4,
    qTpchQ7, qTpchQ10, qTpchQ19, qTpchQ9)
}
