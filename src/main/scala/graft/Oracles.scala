package graft

/** DuckDB oracle SQL for every SQL-expressible query in [[SparkEntry.queries]].
  *
  * Contract (driver compare): the oracle runs over the same parquet tables;
  * columns are sorted by name before value hashing, so every computed
  * column here is aliased EXACTLY as in the Spark query. Every query ends
  * in a deterministic ORDER BY (unique key suffix) so row order matches.
  * Money aggregates are rounded to 2 decimals on both sides so double
  * summation order cannot flip a hash.
  */
object Oracles {

  /** `round(avg(e), outDecimals)` as exact integer arithmetic — the DuckDB
    * twin of [[graft.queries.GridMath.gridAvgRound]]: identical per-row
    * grid snap, HUGEINT sum (no overflow), and the literally identical
    * `(num + den // 2) // den` half-up integral division, so both engines
    * agree by construction. DuckDB `//` gives null on a zero divisor
    * (empty group), matching the Spark LEGACY `div`.
    */
  private[graft] def exactAvg(e: String, decimals: Int, outDecimals: Int): String = {
    val scale = math.pow(10, decimals).toLong
    val out = math.pow(10, outDecimals).toLong
    s"CAST((CAST(sum(CAST(round(($e) * $scale.0) AS BIGINT)) AS HUGEINT) * $out" +
      s" + (count($e) * $scale) // 2) // (count($e) * $scale) AS BIGINT) / $out.0"
  }

  val relational: Map[String, String] = Map(
    // Relational.q34SupplierHhi: per-row 4-decimal grid snap, HUGEINT
    // unit sums, half-up micro shares, HHI = Σ share² divided once at
    // presentation — identical integer path on both engines.
    "q34_supplier_hhi" ->
      """WITH rev AS (SELECT n_name, s_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |      * 10000.0) AS BIGINT)) AS HUGEINT) AS units
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |sh AS (SELECT n_name, units,
        |    CAST(sum(units) OVER (PARTITION BY n_name) AS HUGEINT) AS tot
        |  FROM rev),
        |sm AS (SELECT n_name, tot,
        |    CAST((units * 1000000 + tot // 2) // tot AS BIGINT)
        |      AS share_micro
        |  FROM sh)
        |SELECT n_name, count(*) AS n_suppliers,
        |  round(CAST(max(tot) AS DOUBLE) / 1e4, 2) AS revenue,
        |  round(CAST(sum(CAST(share_micro AS HUGEINT) * share_micro)
        |    AS DOUBLE) / 1e12, 6) AS hhi,
        |  round(CAST(max(share_micro) AS DOUBLE) / 1e6, 6) AS top_share
        |FROM sm GROUP BY n_name ORDER BY n_name""".stripMargin,

    // Relational.q32BasketPairs: identical DISTINCT-items basket,
    // within-order pair join, support filter, and total-order top-100.
    "q32_basket_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS p
        |  FROM lineitem)
        |SELECT a.p AS pa, b.p AS pb, count(*) AS support
        |FROM items a JOIN items b ON a.okey = b.okey AND a.p < b.p
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY support DESC, pa, pb LIMIT 100""".stripMargin,

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0 AS sum_base_price,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) / 10000.0 AS sum_disc_price,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_charge,
        |  ${exactAvg("l_quantity", 2, 2)} AS avg_qty,
        |  ${exactAvg("l_extendedprice", 2, 6)} AS avg_price,
        |  ${exactAvg("l_discount", 2, 6)} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_join_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) / 10000.0 AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    // Relational.q28RevenueShare: shares as half-up micro divisions of
    // the SAME integer grid units on both engines (sum promotes to
    // HUGEINT here, decimal(38,0) in Spark — equal integers either way).
    "q28_revenue_share" ->
      """WITH j AS (SELECT r_name, n_name,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT) AS u
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |g AS (SELECT r_name, n_name, sum(u) AS units, count(*) AS n_lines
        |  FROM j GROUP BY 1, 2),
        |w AS (SELECT *, sum(units) OVER (PARTITION BY r_name) AS runits
        |  FROM g),
        |t AS (SELECT sum(units) AS gunits FROM g)
        |SELECT r_name, n_name,
        |  CAST(units AS DOUBLE) / 10000.0 AS revenue, n_lines,
        |  round(CAST((units * 1000000 + runits // 2) // runits AS DOUBLE)
        |    / 1e6, 6) AS share_in_region,
        |  round(CAST((units * 1000000 + gunits // 2) // gunits AS DOUBLE)
        |    / 1e6, 6) AS share_global
        |FROM w, t ORDER BY r_name, n_name""".stripMargin,

    "q3_order_lineitem_join" ->
      """SELECT o_orderkey, o_totalprice, line_revenue, n_items, o_orderpriority
        |FROM (SELECT l_orderkey,
        |        sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) / 10000.0 AS line_revenue,
        |        count(*) AS n_items
        |      FROM lineitem GROUP BY l_orderkey) li
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey
        |LIMIT 500""".stripMargin,

    "q4_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey
        |LIMIT 1000""".stripMargin,

    "q5_anti_join" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q6_window" ->
      """SELECT o_custkey, rn, o_orderkey, totalprice, running_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn,
        |    round(o_totalprice, 2) AS totalprice,
        |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) t WHERE rn <= 3
        |ORDER BY o_custkey, rn
        |LIMIT 2000""".stripMargin,

    "q7_topk_per_group" ->
      """SELECT p_brand, rk, p_partkey, p_name, retailprice FROM (
        |  SELECT p_brand, p_partkey, p_name,
        |    round(p_retailprice, 2) AS retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) t
        |WHERE rk <= 2
        |ORDER BY p_brand, rk""".stripMargin,

    "q8_global_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q9_set_ops" ->
      """WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer),
        |     sn AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
        |SELECT nationkey, src FROM (
        |  SELECT nationkey, 'both' AS src FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        |  UNION ALL
        |  SELECT nationkey, 'cust_only' AS src FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
        |) u
        |ORDER BY nationkey, src""".stripMargin,

    "q10_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q11_date_agg" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(month(o_orderdate) AS INT) AS o_month,
        |  count(*) AS n_orders,
        |  sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS sum_total
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY o_year, o_month""".stripMargin,

    "q12_case_agg" ->
      s"""SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        |  ${exactAvg("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 2, 6)} AS avg_f_total
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q13_scalar_fns" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  substring(p_type, 1, 5) AS type5,
        |  round(sqrt(p_retailprice), 2) AS price_sqrt,
        |  round(ln(p_retailprice + 1), 2) AS price_ln,
        |  CAST(p_size % 7 AS INT) AS size_mod7,
        |  round(abs(p_retailprice - 1000.0), 2) AS price_dev
        |FROM part
        |ORDER BY p_partkey
        |LIMIT 1000""".stripMargin,

    "q14_rollup" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |  sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS sum_total,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name)
        |ORDER BY nation""".stripMargin,

    "q15_having" ->
      s"""SELECT o_custkey, sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS spend,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 >
        |  (SELECT ${exactAvg("o_totalprice", 2, 6)} FROM orders) * 10
        |ORDER BY spend DESC, o_custkey
        |LIMIT 200""".stripMargin,
    "q16_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Relational.q16bApproxPercentiles — bounded-error gate: the exact
    // percentiles hash-match; the _ok booleans (Spark-side sketch-vs-
    // exact-band checks) must all come back TRUE.
    "q16b_approx_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
        |  TRUE AS p50_ok, TRUE AS p25_ok, TRUE AS p75_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q17_string_fns" ->
      """SELECT p_partkey,
        |  replace(p_name, ' ', '_') AS name_u,
        |  lpad(p_brand, 12, '#') AS brand_pad,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  CAST(strpos(p_name, 'a') AS INT) AS first_a,
        |  (strpos(p_name, 'z') > 0) AS has_z
        |FROM part WHERE p_name LIKE '%a%'
        |ORDER BY p_partkey LIMIT 1000""".stripMargin,

    "q18_above_brand_avg" ->
      s"""SELECT p_partkey, p_brand,
        |  round(p_retailprice, 2) AS retailprice,
        |  brand_avg_price
        |FROM part
        |JOIN (SELECT p_brand AS b_brand,
        |        ${exactAvg("p_retailprice", 2, 6)} AS brand_avg,
        |        ${exactAvg("p_retailprice", 2, 2)} AS brand_avg_price
        |      FROM part GROUP BY 1) b ON p_brand = b_brand
        |WHERE p_retailprice > brand_avg
        |ORDER BY p_partkey LIMIT 2000""".stripMargin,

    "q19_null_semantics" ->
      s"""WITH x AS (SELECT o_orderkey,
        |    nullif(o_orderstatus, 'P') AS status_or_null,
        |    coalesce(nullif(o_orderpriority, '1-URGENT'), 'OTHER') AS prio_c,
        |    CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS big_or_null
        |  FROM orders)
        |SELECT prio_c, count(*) AS n_rows,
        |  count(status_or_null) AS n_status,
        |  count(big_or_null) AS n_big,
        |  ${exactAvg("big_or_null", 2, 6)} AS avg_big
        |FROM x GROUP BY prio_c ORDER BY prio_c""".stripMargin,
    "q20_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS sum_total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q21_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q23_native_topk" ->
      """SELECT o_orderpriority, rk, o_orderkey, totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    round(o_totalprice, 2) AS totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,

    "q24_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS sum_total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin,

    "q22_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |) u
        |ORDER BY p_partkey, attr
        |LIMIT 3000""".stripMargin,

    // Relational.q26LateralTopk: textually identical lateral subquery —
    // the gate checks the LATERAL feature itself.
    "q26_lateral_topk" ->
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin,

    // Relational.q27RollingRevenue: identical integer day key and cents
    // snapping; the RANGE frame is value-based so same-day ties agree.
    "q27_rolling_revenue" ->
      """WITH x AS (SELECT o_custkey, o_orderkey,
        |    date_diff('day', DATE '1992-01-01', o_orderdate) AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, day,
        |  sum(cents) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) / 100.0 AS rev_30d,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS n_30d
        |FROM x ORDER BY o_custkey, o_orderkey LIMIT 3000""".stripMargin,

    // Relational.q29WindowBattery: identical unique ordering; explicit
    // ROWS frame for the frame-sensitive functions on both engines.
    "q29_window_battery" ->
      """SELECT o_custkey, o_orderkey,
        |  round(o_totalprice, 2) AS price,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        |  round(nth_value(o_totalprice, 2) OVER wr, 2) AS second_price,
        |  round(first_value(o_totalprice) OVER wr, 2) AS first_price,
        |  round(last_value(o_totalprice) OVER wr, 2) AS last_price
        |FROM orders WHERE o_custkey <= 200
        |WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey),
        |  wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey LIMIT 3000""".stripMargin,

    // Relational.q30SubquerySemantics: textually identical three-valued
    // logic battery — NOT IN over a null-bearing set must return 0.
    "q30_subquery_semantics" ->
      """SELECT
        |  (SELECT count(*) FROM orders WHERE o_custkey IN
        |    (SELECT c_custkey FROM customer
        |     WHERE c_mktsegment = 'BUILDING')) AS n_in,
        |  (SELECT count(*) FROM orders o WHERE EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
        |     AND c.c_mktsegment = 'BUILDING')) AS n_exists,
        |  (SELECT count(*) FROM orders WHERE o_custkey NOT IN
        |    (SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN c_custkey END
        |     FROM customer)) AS n_not_in_nullset,
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
        |     AND c.c_mktsegment = 'BUILDING')) AS n_not_exists,
        |  (SELECT count(*) FROM orders WHERE o_custkey NOT IN
        |    (SELECT c_custkey FROM customer
        |     WHERE c_mktsegment = 'BUILDING')) AS n_not_in_clean""".stripMargin,

    // Relational.q31ScalarSubqueries: the COUNT bug battery — correlated
    // count(*) is 0 for empty groups, correlated sum/max stay NULL.
    "q31_scalar_subqueries" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |     / CAST(100 AS DOUBLE)
        |   FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS sum_price,
        |  (SELECT max(o_orderdate) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_totalprice > 400000) AS last_big_order
        |FROM customer c
        |ORDER BY c_custkey LIMIT 1000""".stripMargin,
  )

  def all: Map[String, String] = relational
}
