package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-analytics operators — the role Trino plays over the reference's
  * gold Iceberg tables (ref: `README.md` §7.3 "SQL analytics on Iceberg
  * tables … research queries for feature engineering").
  *
  * Scale notes (SURVEY §5): `broadcast()` hints only on inputs bounded
  * BY CONSTRUCTION (region/nation: fixed cardinality). Anything that
  * grows with the data (customer, supplier) is left to AQE, which
  * broadcasts at runtime when the built side actually fits. Fact-fact
  * joins shuffle on the join key only after filters are pushed to the
  * scan; aggregates are plain `groupBy` → partial map-side aggregation.
  */
object Analytics {

  /** TPC-H Q1-style pricing summary: single scan, partial agg. */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** C30 — TPC-H Q6's essence (the forecasting-revenue-change probe):
    * a single scan whose ENTIRE cost is the scan — every predicate
    * (shipdate year range, discount band, small quantity) is pushed
    * to the parquet reader and the lone global aggregate collapses
    * map-side, so `.explain` shows PushedFilters carrying the whole
    * WHERE clause and zero joins. The canonical pushdown benchmark:
    * at 100 TB this query reads only the row groups whose min/max
    * stats intersect the year. Revenue Σ(price·discount) round(4),
    * line count beside it (the H5 discipline: the aggregate's
    * correctness is auditable against the row count). */
  def forecastRevenue(lineitem: DataFrame, year: Int, discLo: Double,
                      discHi: Double, maxQty: Double): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(s"$year-01-01 00:00:00")
          .cast("timestamp") &&
        col("l_shipdate") < lit(s"${year + 1}-01-01 00:00:00")
          .cast("timestamp") &&
        col("l_discount") >= discLo && col("l_discount") <= discHi &&
        col("l_quantity") < maxQty)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q3-style: revenue of top orders for a segment.
    * `orders⨝lineitem` shuffles on orderkey; the customer join strategy
    * is left to AQE (broadcast where it fits, shuffle-hash where not).
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String): DataFrame =
    // customer is unbounded at scale - no broadcast hint; AQE broadcasts
    // at small SFs where it fits and shuffle-hash-joins where it doesn't
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer.filter(col("c_mktsegment") === segment),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** TPC-H Q18-style "large volume orders": customers whose single
    * orders exceed a quantity threshold. The aggregate-filtered key
    * set (HAVING sum > minQty) is computed FIRST from lineitem alone —
    * one partial-agg shuffle on orderkey — and only the surviving
    * keys join orders/customer, so the expensive joins see a
    * pre-shrunk input (the plan TPC-H's correlated-IN subquery is
    * meant to elicit). Join strategies are AQE's call.
    */
  def largeVolumeOrders(customer: DataFrame, orders: DataFrame,
                        lineitem: DataFrame, minQty: Double): DataFrame = {
    val big = lineitem
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > minQty)
    orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_totalprice"),
        round(col("total_qty"), 4).as("total_qty"))
      .orderBy(col("o_orderkey"))
  }

  /** TPC-H Q5-style: revenue per nation within a region. Bounded dims
    * (region, nation) broadcast; unbounded sides (customer, supplier)
    * are AQE's call.
    */
  def regionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                    regionName: String): DataFrame = {
    val dims = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
    // nation/region are bounded (broadcast above); customer-bearing dims
    // and supplier are unbounded at scale - leave the join strategy to AQE
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top-k rows per group by a ranking column — window `row_number`,
    * deterministic tie-break on the id column. One shuffle by group key.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, rankCol: String,
                   idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(rankCol).desc, col(idCol))
    df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col(groupCol), col("rnk"))
  }

  /** Hierarchical rollup; grouping nulls replaced by 'ALL' so ordering
    * is engine-independent (SURVEY §6). */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("cnt"))
      .orderBy("returnflag", "linestatus")

  /** C14 — decorrelated-EXISTS priority count (TPC-H Q4's essence on
    * this schema: "orders in a quarter with at least one deeply
    * discounted line, counted by priority"): the correlated
    * `EXISTS (SELECT … WHERE l_orderkey = o_orderkey AND …)` becomes
    * a LEFT SEMI join — one existence probe per order, no fact-side
    * duplication (an inner join + distinct would carry every matching
    * line through the shuffle just to collapse them). Date filter
    * pushed to the orders scan, discount filter pushed to the
    * lineitem scan, then one small groupBy. */
  def priorityExists(orders: DataFrame, lineitem: DataFrame,
                     lo: String, hi: String, discount: Double): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .join(lineitem.filter(col("l_discount") > discount),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** C13 — GROUPING SETS aggregation: the four-set lattice
    * ((flag,status),(flag),(status),()) that neither rollup (C5) nor
    * cube alone expresses — the "marginals + total in one pass" OLAP
    * shape (Trino/ad-hoc SQL surface, ref README §7.3). One Expand +
    * one aggregate: Spark plans grouping sets as a 4× row expansion
    * feeding a single hash aggregate with map-side partials — one
    * shuffle regardless of set count, never four scans. The set id
    * (`gid`) is derived from grouping-column nullness with CASE
    * arithmetic rather than `grouping_id()` so both engines compute
    * an identical int32 (bit order of native grouping_id is
    * engine-defined); sound here because the TPC-H grouping columns
    * are NOT NULL by construction. */
  def groupingSetsSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum(expr("l_extendedprice*(1.0-l_discount)")), 4).as("revenue"),
        count(lit(1)).as("cnt"))
      .select(
        (when(col("l_returnflag").isNull, 2).otherwise(0) +
          when(col("l_linestatus").isNull, 1).otherwise(0)).as("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("revenue"), col("cnt"))
      .orderBy("gid", "returnflag", "linestatus")

  /** Customers with no orders — left-anti join (research/validation
    * query shape; no row explosion, shuffles on custkey only). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** Suppliers with at least one qualifying shipment — left-semi join:
    * existence check without duplication (the EXISTS shape; dual of
    * the anti join above). */
  def suppliersWithShipments(supplier: DataFrame, lineitem: DataFrame,
                             minQty: Double): DataFrame =
    supplier
      .join(lineitem.filter(col("l_quantity") >= minQty),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")

  /** Event-type pivot: one row per user, one count column per type —
    * a single-pass conditional aggregation (explicit pivot values, so
    * no extra distinct-values job and a deterministic schema). */
  def eventTypePivot(events: DataFrame, types: Seq[String]): DataFrame = {
    val counts = types.map(t =>
      count(when(col("event_type") === t, 1)).as(s"n_$t"))
    events.groupBy(col("user_id").as("symbol"))
      .agg(counts.head, counts.tail: _*)
      .orderBy("symbol")
  }

  /** Fixed-width value histogram: floor-bucket + count/avg per bucket
    * (single-pass, partial agg; the plan a data-profiling query needs
    * at 100 TB — never a driver-side collect). */
  def valueHistogram(events: DataFrame, width: Double): DataFrame =
    events
      .groupBy(floor(col("value") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
      .orderBy("bucket")

  /** C12 — groupwise-min JOIN-BACK (TPC-H Q2's plan essence, adapted
    * to this schema: lineitem is the part↔supplier link): for every
    * part of `brand`, the supplier(s) that shipped it at the MINIMUM
    * extended price — all ties kept, exactly Q2's correlated
    * `= (SELECT min(...))` subquery, expressed as the scalable
    * aggregate-then-rejoin: brand filter PUSHED into the part scan,
    * the pruned part set broadcast into the fact join, one groupBy-min
    * on the narrowed facts, and an equi-join back on (part, price) —
    * never a per-row subquery execution. `min_price` is a picked raw
    * value (unrounded, SURVEY §6). */
  def minCostSupplier(part: DataFrame, supplier: DataFrame,
                      lineitem: DataFrame, brand: String): DataFrame = {
    val parts = part.filter(col("p_brand") === brand).select("p_partkey")
    val li = lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val mins = li.groupBy("p_partkey")
      .agg(min("l_extendedprice").as("min_price"))
    li.join(mins, Seq("p_partkey"))
      .filter(col("l_extendedprice") === col("min_price"))
      .select("p_partkey", "l_suppkey", "min_price").distinct()
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
        col("min_price"))
      .orderBy("p_partkey", "s_suppkey")
  }

  /** Relative price position of each part within its type —
    * `percent_rank` + `cume_dist` analytic window (research-query
    * shape over gold tables). */
  def pricePosition(part: DataFrame): DataFrame = {
    val w = Window.partitionBy("p_type").orderBy(col("p_retailprice"), col("p_partkey"))
    part.select(
      col("p_partkey"), col("p_type"),
      round(percent_rank().over(w), 4).as("price_pct_rank"),
      round(cume_dist().over(w), 4).as("price_cume_dist"))
      .orderBy("p_partkey")
  }

  /** C15 — TPC-H Q17's essence: revenue locked up in small-quantity
    * line items of one brand's parts. The correlated scalar subquery
    * `l_quantity < frac * (SELECT avg(l_quantity) WHERE same part)`
    * is DECORRELATED: per-part averages come from ONE groupBy over
    * the brand-pruned fact slice and join back on the same part key
    * — never a per-row subquery. The brand filter is pushed to the
    * part scan and the pruned key set broadcast into the fact join
    * (C12's shape), so the 100 TB lineitem streams once and is
    * filtered map-side before the partkey shuffle; the avg and the
    * join-back share that one exchange. Cross-engine determinism:
    * the avg is ROUNDED (4dp) BEFORE the threshold compare, so both
    * engines compare every row against an identical double (the
    * D18/D19 derived-from-rounded rule). */
  def smallQuantityRevenue(part: DataFrame, lineitem: DataFrame,
                           brand: String, frac: Double): DataFrame = {
    val parts = part.filter(col("p_brand") === brand).select("p_partkey")
    val li = lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgs = li.groupBy("p_partkey")
      .agg(round(avg("l_quantity"), 4).as("avg_qty"))
    li.join(avgs, Seq("p_partkey"))
      .filter(col("l_quantity") < lit(frac) * col("avg_qty"))
      .agg(round(sum("l_extendedprice") / 7.0, 4).as("avg_yearly"))
  }

  /** C17 — CUMULATIVE monthly revenue + running share per order
    * priority (the "how fast does each segment accrete revenue"
    * running-total report — the window-function OLAP shape C8's ranks
    * don't cover). Engine-exactness is total: revenue is computed in
    * exact integer CENTI-CENTS — `cents(price) · (100 − pct(discount))`
    * is int64 (both factors are exact 2-decimal quantizations) — so
    * the monthly sums, the running window sum AND the whole-partition
    * total are reduction-order-free, and the share is ONE IEEE
    * division of exact ints, UNROUNDED (D24's discipline applied to
    * a window shape). One shuffle for the monthly aggregate; both
    * windows reuse its (priority) exchange; months are unique within
    * a priority so the RANGE-to-current-row default frame is
    * identical in both engines. */
  def cumulativeRevenue(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"),
      (round(col("l_extendedprice") * 100.0, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100.0, 0).cast("long")))
        .as("rev_cc"))
    val monthly = orders
      .select(col("o_orderkey"), col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("_month"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority", "_month")
      .agg(sum("rev_cc").as("rev_cc"))
    val wRun = Window.partitionBy("o_orderpriority").orderBy("_month")
    val wAll = Window.partitionBy("o_orderpriority")
    monthly
      .withColumn("cum_cc", sum("rev_cc").over(wRun))
      .withColumn("share",
        col("cum_cc").cast("double") /
          sum("rev_cc").over(wAll).cast("double"))
      .select(col("o_orderpriority"),
        date_format(col("_month"), "yyyy-MM").as("month"),
        col("rev_cc"), col("cum_cc"), col("share"))
      .orderBy("o_orderpriority", "month")
  }

  /** C16 — TPC-H Q13's essence: how many customers placed exactly k
    * (non-excluded) orders, including the zero-order long tail. The
    * scale-correct shape aggregates orders per custkey FIRST — the
    * partial-agg shuffle moves one count per customer, never whole
    * order rows — and only then left-joins the customer roster so
    * orderless customers surface as k = 0. A left join BEFORE a
    * groupBy(c_custkey) would shuffle every order row through the
    * join just to collapse it. All counts exact int64. */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame,
                             excludePriority: String): DataFrame = {
    val perCust = orders
      .filter(col("o_orderpriority") =!= excludePriority)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    customer
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Exact centi-cent revenue `cents(price)·(100 − pct(discount))` as
    * int64 — both factors are exact 2-decimal quantizations, so sums
    * are reduction-order-free across engines (C17's discipline). */
  private def revCc(price: Column, discount: Column): Column =
    round(price * 100.0, 0).cast("long") *
      (lit(100L) - round(discount * 100.0, 0).cast("long"))

  /** C18 — TPC-H Q7's essence: bilateral shipping volume between
    * nation pairs by ship year. The fact table streams ONCE: the
    * supplier side resolves through a supplier⨝nation broadcast-able
    * dim (supplier is the small fact here; AQE picks broadcast where
    * it fits), the customer side through orders⨝customer, which is
    * the one unavoidable fact-fact shuffle — on orderkey, after the
    * shipdate range is pushed to the lineitem scan. The ≠-nation
    * predicate is applied AFTER both dims resolve, as a cheap
    * map-side filter, never as a join condition (a ≠ join degenerates
    * to NL). Revenue in exact centi-cents → int64 sums. */
  def shippingVolume(nation: DataFrame, customer: DataFrame,
                     orders: DataFrame, lineitem: DataFrame,
                     supplier: DataFrame,
                     fromDate: String, toDate: String): DataFrame = {
    val li = lineitem
      .filter(col("l_shipdate") >= lit(fromDate).cast("timestamp") &&
        col("l_shipdate") <= lit(toDate).cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        revCc(col("l_extendedprice"), col("l_discount")).as("rev_cc"))
    val suppNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    li.join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("rev_cc").as("revenue_cc"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** C19 — TPC-H Q8's essence: one supplier nation's market share of
    * a part type's revenue, per order year. Two-level conditional
    * aggregate: the year groupBy sums BOTH total revenue and the
    * CASE-gated nation slice in one pass (never two scans). The
    * p_type filter prunes parts first and the pruned key set is
    * broadcast into the fact join, so lineitem is filtered map-side
    * before the orderkey shuffle. Share = ONE IEEE division of two
    * exact int64 centi-cent sums, unrounded — bit-identical across
    * engines (D24's rule). */
  def marketShare(nation: DataFrame, customer: DataFrame,
                  orders: DataFrame, lineitem: DataFrame,
                  supplier: DataFrame, part: DataFrame,
                  pType: String, suppNationName: String): DataFrame = {
    val parts = part.filter(col("p_type") === pType).select("p_partkey")
    val suppNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        revCc(col("l_extendedprice"), col("l_discount")).as("rev_cc"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_year")
      .agg(
        sum("rev_cc").as("total_cc"),
        sum(when(col("supp_nation") === suppNationName, col("rev_cc"))
          .otherwise(lit(0L))).as("nation_cc"))
      .withColumn("mkt_share",
        col("nation_cc").cast("double") / col("total_cc").cast("double"))
      .orderBy("o_year")
  }

  /** C20 — TPC-H Q10's essence: top-20 customers by revenue lost to
    * returned items in one quarter. Aggregation BEFORE the dim join:
    * the returned-flag + orderdate filters prune at the scans, the
    * orders⨝lineitem shuffle carries only pruned rows, and the
    * per-customer sum collapses the fact side to ≤|customer| rows
    * before customer/nation attach. Top-20 via TakeOrderedAndProject
    * (revenue desc, custkey) — total order, no global sort. */
  def returnedItemRevenue(nation: DataFrame, customer: DataFrame,
                          orders: DataFrame, lineitem: DataFrame,
                          qStart: String, qEnd: String): DataFrame = {
    val perCust = lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        revCc(col("l_extendedprice"), col("l_discount")).as("rev_cc"))
      .join(orders
        .filter(col("o_orderdate") >= lit(qStart).cast("timestamp") &&
          col("o_orderdate") < lit(qEnd).cast("timestamp"))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("rev_cc").as("revenue_cc"))
    perCust
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"), col("revenue_cc"))
      .orderBy(col("revenue_cc").desc, col("c_custkey"))
      .limit(20)
  }

  /** C21 — TPC-H Q14's essence: promo-type revenue share per order
    * month. One conditional aggregate over the part-typed fact slice;
    * p_type rides a broadcast-able part dim join (partkey is the
    * shuffle key only if part outgrows broadcast — AQE's call).
    * Share = ONE IEEE division of exact int64 sums, unrounded. */
  def promoRevenueShare(part: DataFrame, lineitem: DataFrame,
                        promoType: String): DataFrame = {
    lineitem
      .join(part.select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        col("p_type"),
        revCc(col("l_extendedprice"), col("l_discount")).as("rev_cc"))
      .groupBy("ship_month")
      .agg(
        sum(when(col("p_type") === promoType, col("rev_cc"))
          .otherwise(lit(0L))).as("promo_cc"),
        sum("rev_cc").as("total_cc"))
      .withColumn("promo_share",
        col("promo_cc").cast("double") / col("total_cc").cast("double"))
      .orderBy("ship_month")
  }

  /** C22 — TPC-H Q19's essence: revenue under a DISJUNCTION of three
    * conjunctive brand/size/quantity envelopes. The semantically
    * interesting bit is predicate handling: the OR-of-ANDs stays ONE
    * residual filter on the joined row (Catalyst extracts the common
    * `p_partkey` equi-join and pushes per-table conjuncts — the size
    * floor, the quantity envelope — below the join where possible),
    * never three scans unioned. Single exact int64 sum out. */
  def disjunctiveRevenue(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val joined = lineitem.join(part, col("l_partkey") === col("p_partkey"))
    val arm1 = col("p_brand") === "Brand#13" &&
      col("p_size").between(1, 10) && col("l_quantity").between(1, 11)
    val arm2 = col("p_brand") === "Brand#20" &&
      col("p_size").between(1, 20) && col("l_quantity").between(10, 20)
    val arm3 = col("p_brand") === "Brand#25" &&
      col("p_size").between(1, 30) && col("l_quantity").between(20, 30)
    joined.filter(arm1 || arm2 || arm3)
      .agg(sum(revCc(col("l_extendedprice"), col("l_discount")))
        .as("revenue_cc"))
  }

  /** C23 — TPC-H Q22's essence: well-funded customers gone QUIET (no
    * order since `sinceDate`), by nation. The scalar subquery (global
    * average positive balance) is ONE tiny aggregate broadcast as a
    * 1-row cross join; the NOT EXISTS is a left-anti join on custkey
    * against the date-pruned orders slice (pre-projected to its key
    * column, so the anti shuffle moves 8 bytes/row and the date
    * filter is pushed to the orders scan). Exactness without rounding
    * the average: the compare is CROSS-MULTIPLIED into int64 —
    * `cents·n_pos > sum_pos_cents` ⟺ `acctbal > avg(positive
    * acctbal)` — so no engine ever materializes the average as a
    * double. */
  def idleCustomerBalance(nation: DataFrame, customer: DataFrame,
                          orders: DataFrame, sinceDate: String): DataFrame = {
    val cust = customer.select(col("c_custkey"), col("c_nationkey"),
      round(col("c_acctbal") * 100.0, 0).cast("long").as("bal_cents"))
    val posAgg = cust.filter(col("bal_cents") > 0L)
      .agg(sum("bal_cents").as("sum_pos_cents"),
        count(lit(1)).as("n_pos"))
    cust
      .join(orders
        .filter(col("o_orderdate") >= lit(sinceDate).cast("timestamp"))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(posAgg))
      .filter(col("bal_cents") * col("n_pos") > col("sum_pos_cents"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"), sum("bal_cents").as("totacctbal_cents"))
      .orderBy("n_name")
  }

  /** C26 — TRAILING 3-MONTH revenue per priority via a RANGE window
    * frame — the moving-aggregate OLAP shape C17's running total
    * doesn't cover, and deliberately RANGE, not ROWS: a priority with
    * a silent month still gets that month counted out of its trailing
    * window (a 2-PRECEDING-ROWS frame would wrongly stretch across
    * the gap). The frame key is an INTEGER month index (yr·12+mo) so
    * both engines share exact frame-boundary arithmetic — interval
    * range frames are engine-dialect quicksand. Same scale shape as
    * C17: one monthly partial-agg shuffle, the window reuses its
    * (priority) exchange; revenue exact int64 centi-cents so the
    * trailing sums are order-free. */
  def trailingRevenue(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"),
      revCc(col("l_extendedprice"), col("l_discount")).as("rev_cc"))
    val monthly = orders
      .select(col("o_orderkey"), col("o_orderpriority"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .as("month_idx"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority", "month_idx")
      .agg(sum("rev_cc").as("rev_cc"))
    val w = Window.partitionBy("o_orderpriority").orderBy("month_idx")
      .rangeBetween(-2, 0)
    monthly
      .withColumn("trailing3_cc", sum("rev_cc").over(w))
      .withColumn("n_months_in_window", count(lit(1)).over(w))
      .select(col("o_orderpriority"), col("month_idx"), col("rev_cc"),
        col("trailing3_cc"), col("n_months_in_window"))
      .orderBy("o_orderpriority", "month_idx")
  }

  /** C25 — TPC-H Q15's essence: the top-revenue supplier(s) over a
    * quarter, TIES KEPT — the `revenue = (SELECT max(revenue))`
    * groupwise-max view shape (C12's min-join-back applied to a
    * global max). One partial-agg shuffle on suppkey builds the
    * revenue view; the scalar max reads the already-collapsed frame
    * and rides back as a 1-row broadcast cross join — the fact is
    * never rescanned and no window-over-everything exists. Exact
    * int64 centi-cents throughout, so "equal to the max" is an exact
    * integer compare, not a float trap. */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
                  qStart: String, qEnd: String): DataFrame = {
    val perSupp = lineitem
      .filter(col("l_shipdate") >= lit(qStart).cast("timestamp") &&
        col("l_shipdate") < lit(qEnd).cast("timestamp"))
      .select(col("l_suppkey"),
        revCc(col("l_extendedprice"), col("l_discount")).as("rev_cc"))
      .groupBy("l_suppkey")
      .agg(sum("rev_cc").as("total_revenue_cc"))
      .localCheckpoint(true) // same double-scan barrier as C24
    val top = perSupp.agg(max("total_revenue_cc").as("max_cc"))
    perSupp
      .crossJoin(broadcast(top))
      .filter(col("total_revenue_cc") === col("max_cc"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_cc"))
      .orderBy("s_suppkey")
  }

  /** C24 — TPC-H Q11's essence: suppliers whose shipped value exceeds
    * a global-share threshold. Two aggregates share ONE exchange
    * shape: per-supplier value (partial-agg shuffle on suppkey) and
    * the global total (a second full aggregate over the per-supplier
    * rows — tiny, it reads the already-collapsed frame, not the
    * fact). The HAVING-vs-global-scalar compare is cross-multiplied
    * into exact int64 basis points: `supp_cc · 10000 > total_cc ·
    * thresholdBp` — no double threshold ever exists. */
  def supplierValueShare(supplier: DataFrame, lineitem: DataFrame,
                         thresholdBp: Long): DataFrame = {
    // Materialization barrier: perSupp feeds BOTH the threshold
    // compare and the global total — without it Catalyst re-expands
    // the shared subtree and the 100 TB fact is scanned twice (plan
    // audit showed two lineitem FileScans). The frame is
    // supplier-sized, so the checkpoint is free at any scale.
    val perSupp = lineitem
      .select(col("l_suppkey"),
        revCc(col("l_extendedprice"), col("l_discount")).as("rev_cc"))
      .groupBy("l_suppkey")
      .agg(sum("rev_cc").as("value_cc"))
      .localCheckpoint(true)
    val total = perSupp.agg(sum("value_cc").as("total_cc"))
    perSupp
      .crossJoin(broadcast(total))
      .filter(col("value_cc") * lit(10000L) > col("total_cc") * lit(thresholdBp))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("value_cc"))
      .orderBy(col("value_cc").desc, col("s_suppkey"))
  }

  /** C27 — TPC-H Q9's essence: product-line PROFIT by supplier nation
    * and order year. The testdata has no partsupp, so unit cost is
    * proxied by the part's retail price (the join SHAPE — fact
    * resolving through a name-filtered part dim, a supplier→nation
    * dim and orders for the year — is Q9's; only the cost column
    * differs). Profit stays exact int64 end-to-end: revenue in
    * centi-cents (C17's rule) minus `retail_cents · qty · 100`
    * (quantities are whole in this corpus; the cast is a checked
    * truncation, not a rounding). The p_name LIKE filter prunes part
    * FIRST and the pruned key set broadcasts into the fact join —
    * lineitem never shuffles unfiltered. One fact-fact shuffle
    * (orderkey), one group aggregate. */
  def productProfit(nation: DataFrame, orders: DataFrame,
                    lineitem: DataFrame, supplier: DataFrame,
                    part: DataFrame, nameContains: String): DataFrame = {
    val parts = part.filter(col("p_name").contains(nameContains))
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100.0, 0).cast("long")
          .as("retail_cents"))
    val suppNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (revCc(col("l_extendedprice"), col("l_discount")) -
          col("retail_cents") * round(col("l_quantity"), 0).cast("long")
            * lit(100L)).as("profit_cc"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("nation", "o_year")
      .agg(sum("profit_cc").as("profit_cc"),
        count(lit(1)).as("n_lines"))
      .orderBy("nation", "o_year")
  }

  /** C28 — TPC-H Q16's essence: how many DISTINCT suppliers can
    * provide each (brand, type) part family, excluding suppliers on a
    * quality blacklist (Q16's complaints NOT IN; here the predicate is
    * a negative account balance). Shape discipline: the fact bridge
    * collapses to DISTINCT (partkey, suppkey) PAIRS first — one
    * dedup shuffle on the pair, map-side combined, so the count-
    * distinct aggregate downstream never sees fact-table multiplicity
    * — then resolves part attrs via broadcast and drops blacklisted
    * suppliers with a broadcast LEFT ANTI (C6's shape; the blacklist
    * is dim-sized). supplier_cnt is an exact distinct count per
    * (brand, type) — at 100 TB swap to approx_count_distinct is NOT
    * offered here: Q16's semantics are exact and the pair-dedup'd
    * input is dim×dim bounded. */
  def supplierCandidates(part: DataFrame, supplier: DataFrame,
                         lineitem: DataFrame): DataFrame = {
    val blacklist = supplier.filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey").as("bad_suppkey"))
    val pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(blacklist),
        col("l_suppkey") === col("bad_suppkey"), "left_anti")
    pairs
      .join(broadcast(part.select("p_partkey", "p_brand", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
  }

  /** C29 — TPC-H Q21's essence: suppliers who kept orders WAITING —
    * for each supplier, the number of multi-supplier orders on which
    * it was the ONLY late supplier (late := l_shipdate more than
    * `lateDays` after o_orderdate — the trimmed schema's stand-in for
    * receipt-past-commit). Q21 is the canonical correlated
    * EXISTS + NOT-EXISTS pair; the Spark-first form DECORRELATES both
    * into two stacked aggregates instead of three fact self-joins:
    * per (order, supplier) collapse the lines to one `was_late` bit
    * (first aggregate — fact multiplicity dies here), then per order
    * count suppliers and late suppliers (second aggregate, order-
    * sized input); "sole late on a shared order" is then a pure
    * row-local predicate (`was_late ∧ n_suppliers > 1 ∧
    * n_late_suppliers = 1`) — the EXISTS and NOT EXISTS both became
    * counts. Supplier names resolve via broadcast at the end
    * (dim-sized). Counts exact int64; Q21's ORDER BY numwait DESC,
    * name kept (total order via the name tiebreak). */
  def waitingSuppliers(orders: DataFrame, lineitem: DataFrame,
                       supplier: DataFrame, lateDays: Int): DataFrame = {
    val perOrderSupp = lineitem
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"), 1L)
        .otherwise(0L)).as("was_late"))
      // barrier: feeds BOTH the per-order rollup and the verdict join —
      // without it the fact⨝orders join and first aggregate run twice
      .localCheckpoint(true)
    val perOrder = perOrderSupp
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("was_late")).as("n_late_suppliers"))
    perOrderSupp
      .join(perOrder, Seq("l_orderkey"))
      .filter(col("was_late") === 1L && col("n_suppliers") > 1L &&
        col("n_late_suppliers") === 1L)
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }
}
