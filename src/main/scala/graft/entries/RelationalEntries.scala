package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, BloomFilterJoin, Dedup, Multimodal,
  RangeJoin, Relational, Similarity, TextOps}
import OracleLib._

/** SURVEY §2B host-operator workload + the TPC-H battery,
  * temporal joins and skew tools.
  *
  * Split out of the monolithic `graft.SparkEntry` (round 11): one module
  * per operator family, each holding the family's `queries` entries and
  * their DuckDB `oracleSql` twins. `SparkEntry` aggregates the modules;
  * `SparkEntrySpec` still guards queries↔oracle key parity on the
  * aggregate. Shared oracle SQL fragments live in [[OracleLib]].
  */
private[graft] object RelationalEntries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2B host-operator workload
    "q_projection" -> (Relational.projection _),
    "q_filter_between" -> (Relational.filterBetween _),
    "q_filter_like_in" -> (Relational.filterLikeIn _),
    "q_join_inner" -> (Relational.joinInner _),
    "q_join_left" -> (Relational.joinLeft _),
    "q_join_right" -> (Relational.joinRight _),
    "q_join_full" -> (Relational.joinFull _),
    "q_join_2key" -> (Relational.join2Key _),
    "q_agg_q1" -> (Relational.aggQ1 _),
    // multi-join analytics battery (3/6/4-table TPC-H-shaped plans:
    // broadcast dims, pushed date/flag filters, TakeOrdered top-k)
    "q_tpch_q3" -> (Relational.tpchQ3 _),
    "q_tpch_q5" -> (Relational.tpchQ5 _),
    "q_tpch_q10" -> (Relational.tpchQ10 _),
    "q_agg_having" -> (Relational.aggHaving _),
    "q_agg_distinct" -> (Relational.aggDistinct _),
    "q_sort_limit" -> (Relational.sortLimit _),
    "q_union" -> (Relational.unionDistinct _),
    "q_union_all" -> (Relational.unionAll _),
    "q_except_intersect" -> (Relational.exceptIntersect _),
    "q_conditional" -> (Relational.conditional _),
    "q_string_fns" -> (Relational.stringFns _),
    "q_datetime_agg" -> (Relational.datetimeAgg _),
    "q_json_extract" -> (Relational.jsonExtract _),
    "q_event_props" -> (Relational.eventProps _),
    "q_retention" -> ((s, d) => Relational.retentionCohorts(s, d)),
    "q_transitions" -> (Relational.eventTransitions _),
    "q_user_rfm" -> (Relational.userRfm _),
    // per-user z-score anomaly flags (personal baselines; exact
    // decimal sums feed the one division/sqrt — engine-identical)
    "q_user_anomalies" -> ((s, d) => Relational.userAnomalies(s, d)),
    "q_funnel" -> (Relational.funnel _),
    "q_window_topn" -> (Relational.windowTopN _),
    "q_window_offsets" -> (Relational.windowOffsets _),
    "q_rollup" -> (Relational.rollupAgg _),
    "q_cube" -> (Relational.cubeAgg _),
    "q_sql_cte" -> (Relational.sqlCte _),
    "q_sql_exists" -> (Relational.sqlExists _),
    "q_sql_grouping_sets" -> (Relational.sqlGroupingSets _),
    "q_sql_lateral" -> (Relational.sqlLateral _),
    "q_sql_rolling_window" -> (Relational.sqlRollingWindow _),
    "q_approx_distinct" -> (Relational.approxDistinct _),
    "q_approx_quantile" -> (Relational.approxQuantileContract _),
    "q_pivot" -> (Relational.pivotEvents _),
    "q_unpivot" -> (Relational.unpivotPart _),
    "q_collect_agg" -> (Relational.collectAgg _),
    "q_percentiles" -> (Relational.percentiles _),
    "q_semi_anti" -> (Relational.semiAnti _),
    // per-column table profile (DuckDB SUMMARIZE parity), schema-derived
    "q_summarize" -> (Relational.summarizeOrders _),
    "q_bloom_join" -> ((s, d) => BloomFilterJoin.urgentOrderRevenue(s, d)),
    // event_id is the unique row id: salting by it spreads even
    // fully-duplicate rows of a hot key uniformly (see Skew scaladoc)
    "q_salted_agg" -> ((s, d) =>
      graft.operators.Skew.saltedCountSum(Relational.events(s, d),
        "event_type", "value", idCol = Some("event_id"))),
    // salted fact⋈dim join, rolled up — hash-matches the PLAIN join SQL
    // (the equivalence IS the contract, like q_salted_agg). Dim side =
    // customer (the SMALL side — its ×salts replication is the price of
    // the hot-key spread; replicating a large dim would be the anti-
    // pattern the operator's scaladoc warns about)
    "q_salted_join" -> ((s, d) => {
      val ord = s.read.parquet(s"$d/orders.parquet")
      val cust = s.read.parquet(s"$d/customer.parquet")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      // o_orderkey is the fact side's primary key — the idCol contract
      graft.operators.Skew.saltedJoin(ord, cust, "o_custkey",
          idCol = Some("o_orderkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
    }),
    // hourly LOCF gap-fill resample of each user's event stream
    "q_resample_locf" -> ((s, d) => Relational.resampleLocf(s, d)),
    // temporal joins (beyond the reference): as-of enrichment and a
    // no-equality-key proximity range join, both scale-safe rewrites
    "q_asof_join" -> (AsOf.eventsAsOfLastPurchase _),
    "q_asof_exec" -> (AsOf.eventsAsOfLastPurchaseExec _),
    "q_asof_broadcast" -> (AsOf.eventsAsOfLastPurchaseBroadcast _),
    "q_asof_auto" -> (AsOf.eventsAsOfLastPurchaseAuto _),
    "q_asof_bucketed" -> (AsOf.eventsAsOfLastPurchaseBucketed _),
    "q_asof_salted" -> (AsOf.eventsAsOfLastPurchaseSalted _),
    "q_asof_tolerance" -> (AsOf.eventsAsOfRecentPurchase _),
    "q_asof_forward" -> (AsOf.eventsAsOfNextPurchase _),
    "q_range_join" -> ((s, d) => RangeJoin.errorClickProximity(s, d)),
    "q_overlap_join" -> ((s, d) => RangeJoin.shipWeekOverlaps(s, d)),
    // the SQL band join through RangeBinJoinRule: the optimizer rewrite
    // gives the SQL user the binned equi-join the Scala API builds by
    // hand. The rule is carried by the SESSION (GraftExtensions config,
    // or GraftSession.installPlanExtensions for stock sessions — the
    // Verify/Bench harness path), so this entry is a pure query.
    "q_sql_range_join" -> ((s, d) => {
      Relational.events(s, d).createOrReplaceTempView("graft_events_rbj")
      s.sql("SELECT e.event_id AS error_id, c.event_id AS click_id, " +
        "unix_micros(c.ts) - unix_micros(e.ts) AS gap_us " +
        "FROM graft_events_rbj e JOIN graft_events_rbj c " +
        "ON e.event_type = 'error' AND c.event_type = 'click' " +
        "AND c.ts BETWEEN e.ts - INTERVAL 60 SECOND " +
        "AND e.ts + INTERVAL 60 SECOND")
    }),
    // LEFT OUTER band join through RangeBinJoinRule (r16): the
    // keep-unmatched attribution shape — every error keeps a row even
    // with no click within ±2 s (click_id/gap_us NULL). Without the
    // rule's r16 LEFT OUTER extension this plans as
    // BroadcastNestedLoopJoin, the exact plan the rule exists to kill.
    // ±2 s (vs the inner form's ±60 s) so the sf0.01 oracle exercises
    // BOTH shapes: a few matched pairs, ~2k null-extended errors.
    "q_sql_range_join_left" -> ((s, d) => {
      Relational.events(s, d).createOrReplaceTempView("graft_events_rbjl")
      s.sql("SELECT e.event_id AS error_id, c.event_id AS click_id, " +
        "unix_micros(c.ts) - unix_micros(e.ts) AS gap_us " +
        "FROM (SELECT * FROM graft_events_rbjl WHERE event_type = 'error') e " +
        "LEFT JOIN (SELECT * FROM graft_events_rbjl WHERE event_type = 'click') c " +
        "ON c.ts BETWEEN e.ts - INTERVAL 2 SECOND " +
        "AND e.ts + INTERVAL 2 SECOND")
    }),
    // RIGHT OUTER band join (r16): the rule mirrors the band, swaps the
    // child roles so the generate lands on the non-preserved left, and
    // restores column order — every click keeps a row even with no
    // error within ±2 s. Same BNLJ-killing rationale as the LEFT form.
    "q_sql_range_join_right" -> ((s, d) => {
      Relational.events(s, d).createOrReplaceTempView("graft_events_rbjr")
      s.sql("SELECT e.event_id AS error_id, c.event_id AS click_id, " +
        "unix_micros(c.ts) - unix_micros(e.ts) AS gap_us " +
        "FROM (SELECT * FROM graft_events_rbjr WHERE event_type = 'error') e " +
        "RIGHT JOIN (SELECT * FROM graft_events_rbjr WHERE event_type = 'click') c " +
        "ON c.ts BETWEEN e.ts - INTERVAL 2 SECOND " +
        "AND e.ts + INTERVAL 2 SECOND")
    }),
    // FULL OUTER band join (r16): binned LEFT OUTER ∪ mirrored binned
    // LEFT ANTI null-extended — errors AND clicks both keep their
    // unmatched rows, each exactly once.
    "q_sql_range_join_full" -> ((s, d) => {
      Relational.events(s, d).createOrReplaceTempView("graft_events_rbjf")
      s.sql("SELECT e.event_id AS error_id, c.event_id AS click_id, " +
        "unix_micros(c.ts) - unix_micros(e.ts) AS gap_us " +
        "FROM (SELECT * FROM graft_events_rbjf WHERE event_type = 'error') e " +
        "FULL JOIN (SELECT * FROM graft_events_rbjf WHERE event_type = 'click') c " +
        "ON c.ts BETWEEN e.ts - INTERVAL 2 SECOND " +
        "AND e.ts + INTERVAL 2 SECOND")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_projection" ->
      ("SELECT p_partkey, upper(p_brand) AS brand_u, " +
        "p_retailprice * CAST(0.9 AS DOUBLE) AS discounted, " +
        "p_brand || '-' || p_type AS brand_type, " +
        "p_size + 100 AS size_adj FROM part"),
    "q_filter_between" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag " +
        "FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 " +
        "AND l_returnflag = 'R' AND l_shipdate IS NOT NULL"),
    "q_filter_like_in" ->
      ("SELECT p_partkey, p_name, p_brand, p_size FROM part " +
        "WHERE p_name LIKE '%gear%' " +
        "AND p_brand IN ('Brand#1', 'Brand#9', 'Brand#13') AND p_size >= 10"),
    "q_join_inner" ->
      ("SELECT c_mktsegment, count(*) AS n_orders, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment"),
    // Bloom-pruned SMJ equals the plain join (no false negatives + the
    // exact join behind the filter) — the equivalence IS the contract
    "q_bloom_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderpriority"),
    "q_join_left" ->
      ("SELECT n_nationkey, n_name, count(c_custkey) AS n_customers " +
        "FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey " +
        "GROUP BY n_nationkey, n_name"),
    "q_join_right" ->
      ("SELECT n_nationkey, n_name, count(s_suppkey) AS n_suppliers " +
        "FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey " +
        "GROUP BY n_nationkey, n_name"),
    "q_join_full" ->
      ("SELECT coalesce(nk_c, nk_s) AS nationkey, " +
        "coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp FROM " +
        "(SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1) c " +
        "FULL JOIN " +
        "(SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY 1) s " +
        "ON nk_c = nk_s"),
    "q_join_2key" ->
      ("SELECT a.custkey, a.yr, a.n_orders, b.revenue FROM " +
        "(SELECT o_custkey AS custkey, CAST(year(o_orderdate) AS INTEGER) AS yr, " +
        "count(*) AS n_orders FROM orders GROUP BY 1, 2) a JOIN " +
        "(SELECT o_custkey AS custkey, CAST(year(o_orderdate) AS INTEGER) AS yr, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
        "FROM orders GROUP BY 1, 2) b " +
        "ON a.custkey = b.custkey AND a.yr = b.yr WHERE a.n_orders >= 2"),
    "q_agg_q1" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
        "AS DOUBLE) AS sum_disc_price, " +
        "round(avg(l_quantity), 4) AS avg_qty, " +
        "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, " +
        "count(*) AS count_order, count(DISTINCT l_orderkey) AS n_orders " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    // multi-join battery: the decimal discounted-price convention of
    // q_agg_q1 keeps revenue engine-exact; ORDER BY carries a unique
    // tiebreak so LIMIT selects identically in both engines
    "q_tpch_q3" ->
      ("SELECT l_orderkey AS orderkey, " +
        "strftime(o_orderdate, '%Y-%m-%d') AS orderdate, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
        "AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1998-06-01' " +
        "AND l_shipdate > TIMESTAMP '1998-06-01' " +
        "GROUP BY l_orderkey, o_orderdate " +
        "ORDER BY revenue DESC, orderkey ASC LIMIT 10"),
    "q_tpch_q5" ->
      ("SELECT n_name AS nation, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
        "AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1997-01-01' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, nation ASC"),
    "q_tpch_q10" ->
      ("SELECT c_custkey AS custkey, c_name AS name, n_name AS nation, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
        "AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' " +
        "AND o_orderdate >= TIMESTAMP '1997-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-04-01' " +
        "GROUP BY c_custkey, c_name, n_name " +
        "ORDER BY revenue DESC, custkey ASC LIMIT 20"),
    "q_agg_having" ->
      ("SELECT CAST(FLOOR(year(l_shipdate) / 10.0) * 10 AS INTEGER) AS decade, " +
        "count(*) AS n_items, round(avg(l_extendedprice), 2) AS avg_price " +
        "FROM lineitem GROUP BY 1 HAVING count(*) > 100"),
    "q_agg_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers, " +
        "count(DISTINCT l_partkey) AS n_parts, " +
        "count(DISTINCT l_orderkey) AS n_orders FROM lineitem GROUP BY 1"),
    "q_sort_limit" ->
      ("SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15"),
    "q_union" ->
      ("SELECT c_nationkey AS nk FROM customer " +
        "UNION SELECT s_nationkey AS nk FROM supplier"),
    "q_union_all" ->
      ("SELECT nk, count(*) AS n_rows FROM " +
        "(SELECT c_nationkey AS nk FROM customer " +
        "UNION ALL SELECT s_nationkey AS nk FROM supplier) t GROUP BY nk"),
    "q_except_intersect" ->
      ("SELECT 'cust_only' AS kind, nk FROM " +
        "(SELECT c_nationkey AS nk FROM customer " +
        "EXCEPT SELECT s_nationkey AS nk FROM supplier) e " +
        "UNION ALL SELECT 'both' AS kind, nk FROM " +
        "(SELECT c_nationkey AS nk FROM customer " +
        "INTERSECT SELECT s_nationkey AS nk FROM supplier) i"),
    "q_conditional" ->
      ("SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'big' " +
        "WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket, " +
        "coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_adj, " +
        "round(o_totalprice / CAST(1000.0 AS DOUBLE), 1) AS k_price FROM orders"),
    "q_string_fns" ->
      ("SELECT c_custkey, left(c_name, 8) AS name_prefix, " +
        "CAST(length(c_mktsegment) AS INTEGER) AS seg_len, " +
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 'بناء' " +
        "WHEN c_mktsegment = 'AUTOMOBILE' THEN 'سيارات' " +
        "ELSE c_mktsegment END AS segment_ar, " +
        "CASE WHEN c_acctbal < 0 THEN 'مدين' ELSE 'دائن' END AS balance_ar " +
        "FROM customer"),
    "q_datetime_agg" ->
      ("SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, " +
        "count(*) AS n_events, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2"),
    // JSON extraction: typed path extract + group on the extracted key
    // (Spark from_json ≡ DuckDB json_extract for a flat integer field)
    "q_json_extract" ->
      ("SELECT CAST(json_extract(props, '$.k') AS INT) AS prop_k, " +
        "count(*) AS n_events, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1"),
    // retention cohorts: users by first-seen day × day offset 0..7
    "q_retention" ->
      ("WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day " +
        "FROM events), " +
        "f AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1) " +
        "SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day, " +
        "CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) " +
        "AS day_offset, count(DISTINCT a.user_id) AS n_users " +
        "FROM a JOIN f ON f.user_id = a.user_id " +
        "WHERE date_diff('day', f.cohort_day, a.day) BETWEEN 0 AND 7 " +
        "GROUP BY 1, 2"),
    // Markov transition matrix: lead() total-ordered by (ts, event_id)
    "q_transitions" ->
      ("WITH s AS (SELECT user_id, event_type, lead(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS to_type " +
        "FROM events) " +
        "SELECT from_type, to_type, n, round(CAST(n AS DOUBLE) / " +
        "CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS p " +
        "FROM (SELECT event_type AS from_type, to_type, count(*) AS n " +
        "FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2) t"),
    // per-user anomalies: mean/std from exact decimal sums, one IEEE
    // division/sqrt each, filter on the ROUNDED z in both engines
    "q_user_anomalies" ->
      ("WITH st AS (SELECT user_id, count(*) AS n, " +
        "sum(CAST(value AS DECIMAL(18,2))) AS s1, " +
        "sum(CAST(value AS DECIMAL(18,2)) * " +
        "CAST(value AS DECIMAL(18,2))) AS s2 " +
        "FROM events GROUP BY user_id HAVING count(*) >= 2), " +
        "m AS (SELECT user_id, " +
        "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean, " +
        "sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS std FROM st) " +
        "SELECT e.event_id, e.user_id, " +
        "round((e.value - m.mean) / m.std, 4) AS z " +
        "FROM events e JOIN m ON m.user_id = e.user_id " +
        "WHERE m.std > 0 " +
        "AND abs(round((e.value - m.mean) / m.std, 4)) > 3"),
    // RFM segmentation: fixed thresholds, decimal-exact monetary
    "q_user_rfm" ->
      ("WITH l AS (SELECT max(CAST(ts AS DATE)) AS corpus_last FROM events), " +
        "u AS (SELECT user_id, max(CAST(ts AS DATE)) AS user_last, " +
        "count(*) AS frequency, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary " +
        "FROM events GROUP BY 1) " +
        "SELECT user_id, CAST(date_diff('day', user_last, corpus_last) " +
        "AS BIGINT) AS recency_days, frequency, monetary, " +
        "CASE WHEN date_diff('day', user_last, corpus_last) <= 3 " +
        "AND frequency >= 20 THEN 'core' " +
        "WHEN date_diff('day', user_last, corpus_last) <= 7 THEN 'active' " +
        "WHEN date_diff('day', user_last, corpus_last) <= 14 THEN 'cooling' " +
        "ELSE 'dormant' END AS segment FROM u, l"),
    // typed props analytics over (event_type, day): both drifted event
    // columns (NTZ ts, props JSON) through one aggregate
    "q_event_props" ->
      ("SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, " +
        "count(*) AS n_events, " +
        "CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) " +
        "AS sum_k, " +
        "min(CAST(json_extract(props, '$.k') AS INT)) AS min_k, " +
        "max(CAST(json_extract(props, '$.k') AS INT)) AS max_k, " +
        "count(DISTINCT CAST(json_extract(props, '$.k') AS INT)) " +
        "AS n_distinct_k " +
        "FROM events GROUP BY 1, 2"),
    // sequential conversion funnel: min-after-previous-stage semantics
    "q_funnel" ->
      ("WITH v AS (SELECT user_id, min(ts) AS view_ts FROM events " +
        "WHERE event_type = 'view' GROUP BY user_id), " +
        "c AS (SELECT e.user_id, min(e.ts) AS click_ts FROM events e " +
        "JOIN v ON v.user_id = e.user_id " +
        "WHERE e.event_type = 'click' AND e.ts > v.view_ts " +
        "GROUP BY e.user_id), " +
        "p AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM events e " +
        "JOIN c ON c.user_id = e.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts > c.click_ts " +
        "GROUP BY e.user_id) " +
        "SELECT CAST(stage AS INTEGER) AS stage, event, " +
        "count(DISTINCT user_id) AS n_users FROM (" +
        "SELECT 1 AS stage, 'view' AS event, user_id FROM v " +
        "UNION ALL SELECT 2, 'click', user_id FROM c " +
        "UNION ALL SELECT 3, 'purchase', user_id FROM p) t " +
        "GROUP BY stage, event"),
    "q_window_topn" ->
      ("SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM " +
        "(SELECT c_mktsegment, c_custkey, c_acctbal, " +
        "CAST(row_number() OVER (PARTITION BY c_mktsegment " +
        "ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS rn " +
        "FROM customer) t WHERE rn <= 3"),
    "q_rollup" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n_items, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"),
    "q_cube" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n_items, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"),
    "q_window_offsets" ->
      ("SELECT c_mktsegment, c_custkey, c_acctbal, " +
        "lag(c_acctbal, 1) OVER w AS prev_bal, " +
        "lead(c_acctbal, 1) OVER w AS next_bal, " +
        "CAST(ntile(4) OVER w AS INTEGER) AS quartile, " +
        "round(cume_dist() OVER w, 6) AS cdist FROM customer " +
        "WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey ASC)"),
    // identical SQL text runs on both engines — the string IS the oracle
    "q_sql_cte" -> Relational.cteSql,
    "q_sql_exists" -> Relational.existsSql,
    "q_sql_grouping_sets" -> Relational.groupingSetsSql,
    // verbatim RANGE-BETWEEN-INTERVAL window frame on both engines
    "q_sql_rolling_window" -> Relational.rollingWindowSql,
    // verbatim correlated LATERAL (same text both engines)
    "q_sql_lateral" -> Relational.lateralSql,
    // approximate-distinct CONTRACT: each engine runs its OWN HLL-family
    // estimator; the compared value is the within-5% boolean, not the
    // estimate (which legitimately differs per sketch implementation)
    "q_approx_distinct" ->
      ("SELECT event_type, count(DISTINCT user_id) AS exact_users, " +
        "(abs(CAST(approx_count_distinct(user_id) AS DOUBLE) - " +
        "CAST(count(DISTINCT user_id) AS DOUBLE)) / " +
        "CAST(count(DISTINCT user_id) AS DOUBLE)) <= 0.05 AS within_tol " +
        "FROM events GROUP BY event_type"),
    "q_pivot" ->
      ("SELECT strftime(ts, '%Y-%m-%d') AS day, " +
        Seq("click", "view", "purchase", "signup", "error").map(t =>
          s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS \"$t\"")
          .mkString(", ") +
        " FROM events GROUP BY 1"),
    "q_unpivot" ->
      ("SELECT p_partkey, 'p_retailprice' AS metric, " +
        "CAST(p_retailprice AS DOUBLE) AS value FROM part " +
        "UNION ALL SELECT p_partkey, 'p_size' AS metric, " +
        "CAST(p_size AS DOUBLE) AS value FROM part"),
    "q_collect_agg" ->
      ("SELECT l_returnflag, " +
        "string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses, " +
        "count(DISTINCT l_linestatus) AS n_statuses FROM lineitem " +
        "GROUP BY l_returnflag"),
    // approximate-quantile CONTRACT: each engine's OWN sketch, compared
    // only through the within-5%-of-spread boolean
    "q_approx_quantile" ->
      ("SELECT lang, round(quantile_cont(n_chars, 0.5), 2) AS exact_p50, " +
        "(abs(CAST(approx_quantile(n_chars, 0.5) AS DOUBLE) - " +
        "quantile_cont(n_chars, 0.5)) / " +
        "CAST(max(n_chars) - min(n_chars) AS DOUBLE)) <= 0.05 " +
        "AS within_tol FROM documents GROUP BY lang"),
    "q_percentiles" ->
      ("SELECT lang, round(quantile_cont(n_chars, 0.5), 2) AS p50_chars, " +
        "round(quantile_cont(n_chars, 0.9), 2) AS p90_chars, " +
        "round(quantile_cont(n_chars, 0.99), 2) AS p99_chars " +
        "FROM documents GROUP BY lang"),
    "q_semi_anti" ->
      ("SELECT 'with_orders' AS kind, c_custkey FROM customer " +
        "WHERE c_custkey IN (SELECT o_custkey FROM orders) " +
        "UNION ALL SELECT 'no_orders' AS kind, c_custkey FROM customer " +
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"),
    // the salted two-phase aggregation must be indistinguishable from the
    // plain GROUP BY — that equivalence IS the correctness contract
    "q_salted_agg" ->
      ("SELECT event_type, count(*) AS n_rows, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY event_type"),
    // the PLAIN join — the salted rewrite must be indistinguishable
    "q_salted_join" ->
      ("SELECT c_mktsegment, count(*) AS n_rows, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS revenue FROM orders JOIN customer ON c_custkey = o_custkey " +
        "GROUP BY c_mktsegment"),
    // per-column profile of orders (SUMMARIZE parity): one UNION ALL arm
    // per column, min/max stringified the same way the operator does
    "q_summarize" -> Seq(
        ("o_orderkey", "bigint", "CAST(min(o_orderkey) AS VARCHAR)",
          "CAST(max(o_orderkey) AS VARCHAR)", "o_orderkey"),
        ("o_custkey", "bigint", "CAST(min(o_custkey) AS VARCHAR)",
          "CAST(max(o_custkey) AS VARCHAR)", "o_custkey"),
        ("o_orderstatus", "string", "min(o_orderstatus)",
          "max(o_orderstatus)", "o_orderstatus"),
        ("o_totalprice", "double", "CAST(min(o_totalprice) AS VARCHAR)",
          "CAST(max(o_totalprice) AS VARCHAR)", "o_totalprice"),
        // Spark 4 reads parquet timestamps without UTC adjustment as NTZ
        ("o_orderdate", "timestamp_ntz",
          "strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S')",
          "strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')", "o_orderdate"),
        ("o_orderpriority", "string", "min(o_orderpriority)",
          "max(o_orderpriority)", "o_orderpriority"))
      .map { case (name, tpe, minE, maxE, c) =>
        s"SELECT '$name' AS column_name, '$tpe' AS column_type, " +
          "count(*) AS n_rows, count(*) - count(" + c + ") AS n_null, " +
          s"count(DISTINCT $c) AS n_distinct, $minE AS min_value, " +
          s"$maxE AS max_value FROM orders"
      }.mkString(" UNION ALL "),
    // hourly LOCF resample: epoch-hour LONG buckets (engine-exact), the
    // same rn-desc last-observation rule, dense per-user grid, and
    // IGNORE NULLS carry-forward — carried values are exact copies of
    // parquet doubles, so no rounding is needed anywhere
    "q_resample_locf" ->
      ("WITH e AS (SELECT user_id, event_id, value, ts, " +
        "CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hb FROM events), " +
        "h AS (SELECT user_id, hb, value AS v FROM (SELECT user_id, hb, " +
        "value, row_number() OVER (PARTITION BY user_id, hb " +
        "ORDER BY ts DESC, event_id DESC) AS rn FROM e) t WHERE rn = 1), " +
        "b AS (SELECT user_id, min(hb) AS lo, max(hb) AS hi FROM e " +
        "GROUP BY user_id), " +
        "g AS (SELECT user_id, unnest(range(lo, hi + 1)) AS hb FROM b), " +
        "j AS (SELECT g.user_id, g.hb, h.v FROM g LEFT JOIN h " +
        "ON h.user_id = g.user_id AND h.hb = g.hb) " +
        "SELECT user_id, hb AS hour_bucket, " +
        "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id " +
        "ORDER BY hb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS value, v IS NULL AS filled FROM j"),
    // as-of join: DuckDB's NATIVE ASOF LEFT JOIN is the oracle for the
    // union+window rewrite (purchases deduped per (user_id, ts) on both
    // sides so the as-of match is unique)
    "q_asof_join" ->
      ("SELECT l.event_id, l.user_id, " +
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.event_type, " +
        "strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, " +
        "r.value AS purchase_value " +
        "FROM events l ASOF LEFT JOIN " +
        "(SELECT user_id, ts, max(value) AS value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts) r " +
        "ON l.user_id = r.user_id AND l.ts >= r.ts"),
    // same workload through the custom physical operators
    // (plans/AsOfJoinExec.scala) — one oracle per execution path
    // forward direction: DuckDB ASOF with the inequality flipped picks
    // the nearest LATER right row — the only oracle-side pin of the
    // forward merge (other directions' forward forms are spec-pinned)
    "q_asof_forward" ->
      ("SELECT l.event_id, l.user_id, " +
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.event_type, " +
        "strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, " +
        "r.value AS purchase_value " +
        "FROM events l ASOF LEFT JOIN " +
        "(SELECT user_id, ts, max(value) AS value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts) r " +
        "ON l.user_id = r.user_id AND l.ts <= r.ts"),
    // tolerance form: the ASOF nearest match is NULLed when older than
    // one hour — CASE replays the exec's withinTolerance check exactly
    "q_asof_tolerance" ->
      ("SELECT l.event_id, l.user_id, " +
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.event_type, " +
        "CASE WHEN r.ts IS NOT NULL AND l.ts - r.ts <= INTERVAL 1 HOUR " +
        "THEN strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') END AS purchase_ts, " +
        "CASE WHEN r.ts IS NOT NULL AND l.ts - r.ts <= INTERVAL 1 HOUR " +
        "THEN r.value END AS purchase_value " +
        "FROM events l ASOF LEFT JOIN " +
        "(SELECT user_id, ts, max(value) AS value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts) r " +
        "ON l.user_id = r.user_id AND l.ts >= r.ts"),
    "q_asof_broadcast" ->
      ("SELECT l.event_id, l.user_id, " +
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.event_type, " +
        "strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, " +
        "r.value AS purchase_value " +
        "FROM events l ASOF LEFT JOIN " +
        "(SELECT user_id, ts, max(value) AS value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts) r " +
        "ON l.user_id = r.user_id AND l.ts >= r.ts"),
    "q_asof_exec" ->
      ("SELECT l.event_id, l.user_id, " +
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.event_type, " +
        "strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, " +
        "r.value AS purchase_value " +
        "FROM events l ASOF LEFT JOIN " +
        "(SELECT user_id, ts, max(value) AS value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts) r " +
        "ON l.user_id = r.user_id AND l.ts >= r.ts"),
    // the salted form (hot keys, replicable right sides): left salt +
    // right replication must reproduce the same ASOF rows exactly
    "q_asof_salted" ->
      ("SELECT l.event_id, l.user_id, " +
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.event_type, " +
        "strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, " +
        "r.value AS purchase_value " +
        "FROM events l ASOF LEFT JOIN " +
        "(SELECT user_id, ts, max(value) AS value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts) r " +
        "ON l.user_id = r.user_id AND l.ts >= r.ts"),
    // the ts-range-split form (hot keys with huge right sides): the
    // carry construction must reproduce the same ASOF rows exactly
    "q_asof_bucketed" ->
      ("SELECT l.event_id, l.user_id, " +
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.event_type, " +
        "strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, " +
        "r.value AS purchase_value " +
        "FROM events l ASOF LEFT JOIN " +
        "(SELECT user_id, ts, max(value) AS value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts) r " +
        "ON l.user_id = r.user_id AND l.ts >= r.ts"),
    // the ROUTED factory (auto-broadcast skew path): same semantics,
    // same oracle — the router may pick either exec and must stay exact
    "q_asof_auto" ->
      ("SELECT l.event_id, l.user_id, " +
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.event_type, " +
        "strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, " +
        "r.value AS purchase_value " +
        "FROM events l ASOF LEFT JOIN " +
        "(SELECT user_id, ts, max(value) AS value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts) r " +
        "ON l.user_id = r.user_id AND l.ts >= r.ts"),
    // range join: the binned equi-join rewrite must equal the plain
    // inequality join (which DuckDB runs natively as an IEJoin)
    "q_range_join" ->
      ("SELECT e.event_id AS error_id, c.event_id AS click_id, " +
        "epoch_us(c.ts) - epoch_us(e.ts) AS gap_us " +
        "FROM events e JOIN events c ON e.event_type = 'error' " +
        "AND c.event_type = 'click' " +
        "AND c.ts BETWEEN e.ts - INTERVAL 60 SECOND " +
        "AND e.ts + INTERVAL 60 SECOND"),
    // SQL band join via the optimizer rule — same oracle shape as
    // q_range_join (DuckDB IEJoin runs the plain inequality form)
    "q_sql_range_join" ->
      ("SELECT e.event_id AS error_id, c.event_id AS click_id, " +
        "epoch_us(c.ts) - epoch_us(e.ts) AS gap_us " +
        "FROM events e JOIN events c ON e.event_type = 'error' " +
        "AND c.event_type = 'click' " +
        "AND c.ts BETWEEN e.ts - INTERVAL 60 SECOND " +
        "AND e.ts + INTERVAL 60 SECOND"),
    // LEFT OUTER band join (rule's r16 extension): DuckDB runs the
    // plain LEFT JOIN inequality form natively (IEJoin)
    "q_sql_range_join_left" ->
      ("SELECT e.event_id AS error_id, c.event_id AS click_id, " +
        "epoch_us(c.ts) - epoch_us(e.ts) AS gap_us " +
        "FROM (SELECT * FROM events WHERE event_type = 'error') e " +
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON c.ts BETWEEN e.ts - INTERVAL 2 SECOND " +
        "AND e.ts + INTERVAL 2 SECOND"),
    "q_sql_range_join_right" ->
      ("SELECT e.event_id AS error_id, c.event_id AS click_id, " +
        "epoch_us(c.ts) - epoch_us(e.ts) AS gap_us " +
        "FROM (SELECT * FROM events WHERE event_type = 'error') e " +
        "RIGHT JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON c.ts BETWEEN e.ts - INTERVAL 2 SECOND " +
        "AND e.ts + INTERVAL 2 SECOND"),
    "q_sql_range_join_full" ->
      ("SELECT e.event_id AS error_id, c.event_id AS click_id, " +
        "epoch_us(c.ts) - epoch_us(e.ts) AS gap_us " +
        "FROM (SELECT * FROM events WHERE event_type = 'error') e " +
        "FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c " +
        "ON c.ts BETWEEN e.ts - INTERVAL 2 SECOND " +
        "AND e.ts + INTERVAL 2 SECOND"),
    // interval-overlap join: the canonical-bin rewrite must equal the
    // plain two-inequality join (DuckDB IEJoin); day-number arithmetic
    // keeps both engines integer-exact
    "q_overlap_join" ->
      ("WITH li AS (SELECT l_orderkey, l_linenumber, l_partkey, " +
        "datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS lo " +
        "FROM lineitem) " +
        "SELECT a.l_orderkey AS a_orderkey, a.l_linenumber AS a_linenumber, " +
        "b.l_orderkey AS b_orderkey, b.l_linenumber AS b_linenumber, " +
        "a.l_partkey AS partkey, " +
        "CAST(least(a.lo + 7, b.lo + 7) - greatest(a.lo, b.lo) + 1 AS BIGINT) " +
        "AS overlap_days " +
        "FROM li a JOIN li b ON a.l_partkey = b.l_partkey " +
        "AND a.lo <= b.lo + 7 AND b.lo <= a.lo + 7 " +
        "AND (a.l_orderkey < b.l_orderkey OR (a.l_orderkey = b.l_orderkey " +
        "AND a.l_linenumber < b.l_linenumber))"),
  )
}
