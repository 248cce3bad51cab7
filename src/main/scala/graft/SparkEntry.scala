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
    "(SELECT event_id AS tick_id, user_id AS symbol, ts, value AS bid, value*1.0002+0.01 AS ask FROM events)"

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
      Analytics.customersWithoutOrders(Tables.customer(s, d),
        Tables.orders(s, d).filter(
          org.apache.spark.sql.functions.col("o_orderdate") >=
            org.apache.spark.sql.functions.lit("2001-06-01 00:00:00").cast("timestamp")))),

    // ---- A. Ingest & storage (SURVEY §2.A) ----
    "q_quality_scan" -> ((s, d) =>
      Lakehouse.qualityScan(Tables.events(s, d), "event_type",
        Seq("user_id", "value", "props"))),
    "q_partition_stats" -> ((s, d) =>
      Lakehouse.partitionStats(Tables.orders(s, d), "o_orderdate", "o_totalprice")),
    "q_time_travel" -> ((s, d) =>
      Lakehouse.snapshotAsOf(Tables.events(s, d),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.lit("2024-01-15 00:00:00").cast("timestamp"),
        "event_type")),

    // ---- B. Tick cleaning (SURVEY §2.B) ----
    "q_session_filter" -> ((s, d) => TickOps.sessionWindowFilter(Tables.ticks(s, d))),
    "q_downsample_1s" -> ((s, d) => TickOps.secondDownsample(Tables.ticks(s, d))),
    "q_daily_window_counts" -> ((s, d) => TickOps.dailyWindowCounts(Tables.ticks(s, d))),
    "q_ffill" -> ((s, d) => TickOps.forwardFill(Tables.ticks(s, d), 10.0)),
    "q_tick_dedup" -> ((s, d) => TickOps.tickDedup(Tables.ticks(s, d))),
    "q_tz_shift" -> ((s, d) => TickOps.shiftTz(Tables.ticks(s, d), 2)),

    // ---- D. Feature engineering & anomaly pipeline (SURVEY §2.D) ----
    "q_features_spread" -> ((s, d) => Features.tickFeatures(Tables.ticks(s, d))),
    "q_rolling_stats" -> ((s, d) => Features.rollingStats(Tables.ticks(s, d), 5)),
    "q_log_returns" -> ((s, d) => Features.logReturns(Tables.ticks(s, d))),
    "q_anomaly_zscore" -> ((s, d) => Features.zScoreAnomaly(Tables.ticks(s, d), 3.0)),
    "q_anomaly_threshold" -> ((s, d) =>
      Features.anomalyThresholds(Tables.events(s, d), "value", Seq(92.0, 99.5))),
    "q_resample_ticks" -> ((s, d) => Features.resampleWindow(Tables.ticks(s, d), 8)),
    "q_chrono_split" -> ((s, d) => Features.chronoSplit(Tables.ticks(s, d), 0.6, 0.2)),
    "q_standard_scale" -> ((s, d) =>
      Features.standardScale(Tables.events(s, d), "value", "event_id",
        org.apache.spark.sql.functions.col("ts") <=
          org.apache.spark.sql.functions.lit("2024-01-15 00:00:00").cast("timestamp"))),
    "q_walk_forward" -> ((s, d) => Features.walkForward(Tables.ticks(s, d), 4, 5, 10, 3)),
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
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2001-06-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q_quality_scan" ->
      """SELECT event_type, count(*) AS total_rows,
        |  count(*) FILTER (WHERE user_id IS NULL) AS user_id_nulls,
        |  count(*) FILTER (WHERE value IS NULL) AS value_nulls,
        |  count(*) FILTER (WHERE props IS NULL) AS props_nulls
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_partition_stats" ->
      """SELECT year(o_orderdate) AS yr, count(*) AS n_rows,
        |  round(sum(o_totalprice),4) AS sum_val
        |FROM orders GROUP BY year(o_orderdate) ORDER BY yr""".stripMargin,
    "q_time_travel" ->
      """SELECT event_type, count(*) AS n_rows FROM events
        |WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_session_filter" ->
      s"""SELECT tick_id, symbol, date_trunc('second', ts) AS ts_s,
        |  bid, ask
        |FROM $ticksSql t
        |WHERE (hour(ts) = 7 OR hour(ts) = 13) AND minute(ts) >= 50
        |ORDER BY symbol, tick_id""".stripMargin,
    "q_downsample_1s" ->
      s"""SELECT symbol, date_trunc('second', ts) AS ts_s,
        |  min(tick_id) AS tick_id,
        |  arg_min(bid, tick_id) AS bid,
        |  arg_min(ask, tick_id) AS ask
        |FROM $ticksSql t
        |WHERE (hour(ts) = 7 OR hour(ts) = 13) AND minute(ts) >= 50
        |GROUP BY symbol, date_trunc('second', ts)
        |ORDER BY symbol, ts_s""".stripMargin,
    "q_daily_window_counts" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS date,
        |  count(*) FILTER (WHERE hour(ts) = 7 AND minute(ts) >= 50) AS ticks_window1,
        |  count(*) FILTER (WHERE hour(ts) = 13 AND minute(ts) >= 50) AS ticks_window2
        |FROM $ticksSql t
        |WHERE (hour(ts) = 7 OR hour(ts) = 13) AND minute(ts) >= 50
        |GROUP BY strftime(ts, '%Y-%m-%d') ORDER BY date""".stripMargin,
    "q_ffill" ->
      s"""SELECT tick_id, symbol,
        |  CASE WHEN bid < 10 THEN NULL ELSE bid END AS bid_raw,
        |  last_value(CASE WHEN bid < 10 THEN NULL ELSE bid END IGNORE NULLS)
        |    OVER (PARTITION BY symbol ORDER BY tick_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bid_filled
        |FROM $ticksSql t ORDER BY symbol, tick_id""".stripMargin,
    "q_tick_dedup" ->
      s"""SELECT tick_id, symbol, ts_m, bid FROM (
        |  SELECT tick_id, symbol, date_trunc('minute', ts) AS ts_m, bid,
        |    row_number() OVER (PARTITION BY symbol, date_trunc('minute', ts)
        |      ORDER BY tick_id) AS rn
        |  FROM $ticksSql t) x
        |WHERE rn = 1 ORDER BY symbol, ts_m""".stripMargin,
    "q_tz_shift" ->
      s"""SELECT tick_id, symbol,
        |  date_trunc('second', ts + INTERVAL 2 HOUR) AS ts_shifted,
        |  hour(ts + INTERVAL 2 HOUR) AS hour_shifted
        |FROM $ticksSql t ORDER BY tick_id""".stripMargin,
    "q_features_spread" ->
      s"""SELECT tick_id, symbol, greatest(ask - bid, 0) AS spread,
        |  (bid + ask) / 2.0 AS mid
        |FROM $ticksSql t ORDER BY tick_id""".stripMargin,
    "q_rolling_stats" ->
      s"""SELECT tick_id, symbol,
        |  round(avg(bid) OVER w, 4) AS roll_avg,
        |  round(stddev_samp(bid) OVER w, 4) AS roll_std
        |FROM $ticksSql t
        |WINDOW w AS (PARTITION BY symbol ORDER BY tick_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY symbol, tick_id""".stripMargin,
    "q_log_returns" ->
      s"""SELECT tick_id, symbol,
        |  ln(bid / lag(bid, 1) OVER (PARTITION BY symbol ORDER BY tick_id)) AS log_ret
        |FROM $ticksSql t ORDER BY symbol, tick_id""".stripMargin,
    "q_anomaly_zscore" ->
      s"""SELECT tick_id, symbol, round(z, 4) AS zscore, abs(z) > 3.0 AS is_anomaly
        |FROM (SELECT tick_id, symbol,
        |    (bid - avg(bid) OVER (PARTITION BY symbol))
        |      / stddev_samp(bid) OVER (PARTITION BY symbol) AS z
        |  FROM $ticksSql t) x
        |ORDER BY symbol, tick_id""".stripMargin,
    "q_anomaly_threshold" ->
      """WITH thr AS (SELECT quantile_cont(value, 0.92) AS t0,
        |    quantile_cont(value, 0.995) AS t1 FROM events)
        |SELECT 92.0 AS pct, round(t0, 4) AS threshold,
        |  (SELECT count(*) FROM events WHERE value > thr.t0) AS n_above FROM thr
        |UNION ALL
        |SELECT 99.5 AS pct, round(t1, 4) AS threshold,
        |  (SELECT count(*) FROM events WHERE value > thr.t1) AS n_above FROM thr
        |ORDER BY pct""".stripMargin,
    "q_resample_ticks" ->
      s"""WITH b AS (SELECT tick_id, symbol, strftime(ts, '%Y-%m-%d') AS date, bid,
        |    row_number() OVER (PARTITION BY symbol, strftime(ts, '%Y-%m-%d')
        |      ORDER BY tick_id) AS rn,
        |    count(*) OVER (PARTITION BY symbol, strftime(ts, '%Y-%m-%d')) AS cnt
        |  FROM $ticksSql t),
        |g AS (SELECT DISTINCT symbol, date, cnt FROM b),
        |idx AS (SELECT symbol, date, i,
        |    CASE WHEN cnt = 1 THEN 1 ELSE (i * (cnt - 1)) // 7 + 1 END AS target_rn
        |  FROM g, (SELECT unnest(range(8)) AS i) s)
        |SELECT idx.symbol, idx.date, idx.i, b.rn AS src_rn, b.bid AS bid
        |FROM idx JOIN b ON b.symbol = idx.symbol AND b.date = idx.date
        |  AND b.rn = idx.target_rn
        |ORDER BY idx.symbol, idx.date, idx.i""".stripMargin,
    "q_chrono_split" ->
      """WITH days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS date FROM events),
        |d2 AS (SELECT date, row_number() OVER (ORDER BY date) AS rn,
        |    count(*) OVER () AS n FROM days)
        |SELECT date, rn,
        |  CASE WHEN rn <= floor(n * 0.6) THEN 'train'
        |       WHEN rn <= floor(n * 0.6) + floor(n * 0.2) THEN 'val'
        |       ELSE 'test' END AS split
        |FROM d2 ORDER BY date""".stripMargin,
    "q_standard_scale" ->
      """WITH s AS (SELECT avg(value) AS mu, stddev_samp(value) AS sigma
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |SELECT event_id, round((value - mu) / sigma, 4) AS scaled
        |FROM events, s ORDER BY event_id""".stripMargin,
    "q_walk_forward" ->
      """SELECT fold, date, role FROM (
        |  SELECT fold, date,
        |    CASE WHEN rn >= fold * 5 + 1 AND rn < fold * 5 + 11 THEN 'train'
        |         WHEN rn >= fold * 5 + 11 AND rn < fold * 5 + 14 THEN 'test'
        |    END AS role
        |  FROM (SELECT date, row_number() OVER (ORDER BY date) AS rn
        |    FROM (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS date FROM events) d) d2,
        |    (SELECT unnest(range(4)) AS fold) f) x
        |WHERE role IS NOT NULL ORDER BY fold, date""".stripMargin,
  )
}
