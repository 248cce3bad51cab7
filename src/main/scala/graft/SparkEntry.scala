package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * query key maps to. Column names are aliased identically in the Spark
  * plan and the DuckDB oracle SQL (driver hash-compares by sorted column
  * name); floating aggregates round(·,4); result ordering explicit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Analytics.pricingSummary(Tables.lineitem(spark, d), "1998-09-02 00:00:00")
  }

  /** Tick view over events — same derivation as Tables.ticks (SURVEY §3). */
  val ticksSql: String =
    "(SELECT user_id AS symbol, ts, value AS bid, value*1.0002+0.01 AS ask FROM events)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- C. SQL analytics (SURVEY §2.C) ----
    "q1_agg" -> ((s, d) =>
      Analytics.pricingSummary(Tables.lineitem(s, d), "1998-09-02 00:00:00")),
    "q_join_agg" -> ((s, d) =>
      Analytics.shippingPriority(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), "BUILDING")),
    "q_multi_join" -> ((s, d) =>
      Analytics.regionRevenue(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.supplier(s, d), "ASIA")),
    "q_topk_per_group" -> ((s, d) =>
      Analytics.topKPerGroup(Tables.part(s, d), "p_brand", "p_retailprice",
        "p_partkey", 3)),
    "q_rollup" -> ((s, d) => Analytics.rollupSummary(Tables.lineitem(s, d))),
    "q_anti_join" -> ((s, d) =>
      Analytics.customersWithoutOrders(Tables.customer(s, d), Tables.orders(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),4) AS sum_qty,
        |  round(sum(l_extendedprice),4) AS sum_base_price,
        |  round(sum(l_extendedprice*(1.0-l_discount)),4) AS sum_disc_price,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_agg" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_multi_join" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_topk_per_group" ->
      """SELECT * FROM (
        |  SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |  FROM part) t
        |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
        |  coalesce(l_linestatus,'ALL') AS linestatus,
        |  round(sum(l_quantity),4) AS sum_qty, count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
  )
}
