package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.WordCount
import graft.queries.{Events, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB `oracleSql` (same column
  * names, same total row ordering, exact-typed aggregates) unless the
  * operator is not SQL-expressible, in which case the driver records a
  * weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's batch WordCount dataflow (SURVEY §3.2) over the
    * documents table.
    */
  def entry(spark: SparkSession): DataFrame =
    WordCount.wordCount(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"), "text")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- WordCount family (reference batch + streaming normalization) --
    "wordcount" -> ((s, d) => WordCount.wordCount(Tables.load(s, d, "documents"), "text")),
    "wordcount_topk" -> ((s, d) => WordCount.topWords(Tables.load(s, d, "documents"), "text", 50)),
    // -- Relational pack (star schema) --
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q6_revenue_filter" -> (Relational.q6RevenueFilter _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_region_revenue" -> (Relational.q5RegionRevenue _),
    "q_brand_volume" -> (Relational.qBrandVolume _),
    "q_top_orders" -> (Relational.qTopOrders _),
    "q_top_suppliers_per_nation" -> (Relational.qTopSuppliersPerNation _),
    "q_running_total" -> (Relational.qRunningTotal _),
    "q_customers_no_orders" -> (Relational.qCustomersNoOrders _),
    "q_big_spenders" -> (Relational.qBigSpenders _),
    "q_priority_customers" -> (Relational.qPriorityCustomers _),
    "q_rollup_returns" -> (Relational.qRollupReturns _),
    "q_nations_both_sides" -> (Relational.qNationsBothSides _),
    // -- Events (stream-shaped table) --
    "q_events_hourly" -> (Events.hourlyByType _),
    "q_events_props" -> (Events.propsByType _),
    "q_events_user_gaps" -> (Events.userGaps _),
    "q_events_daily_active" -> (Events.dailyActive _),
  )

  /** DuckDB oracle SQL, one per queries key (same columns, same ordering).
    * Numeric parity strategy documented at queries.Relational.
    */
  def oracleSql: Map[String, String] = Map(
    "wordcount" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0)) AS word
        |      FROM documents) t
        |GROUP BY word ORDER BY word""".stripMargin,
    "wordcount_topk" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT upper(unnest(list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0))) AS word
        |      FROM documents) t
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 50""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_revenue_filter" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_brand_volume" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, o_custkey,
        |  o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM orders
        |ORDER BY orders.o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_top_suppliers_per_nation" ->
      """SELECT s_nationkey, rnk, s_suppkey, s_name, s_acctbal
        |FROM (SELECT *, row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk
        |      FROM supplier) t
        |WHERE rnk <= 3 ORDER BY s_nationkey, rnk""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "q_big_spenders" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_priority_customers" ->
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rollup_returns" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_nations_both_sides" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_events_props" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_events_user_gaps" ->
      """SELECT user_id, COUNT(*) AS n_gaps, CAST(SUM(gap_ms) AS BIGINT) AS sum_gap_ms, MAX(gap_ms) AS max_gap_ms,
        |  CAST(CAST(SUM(gap_ms) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_gap_ms
        |FROM (SELECT user_id,
        |        epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
        |      FROM events) t
        |WHERE gap_ms IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_events_daily_active" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
  )
}
