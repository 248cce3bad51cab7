package graft

import graft.operators.{Analytics, Lakehouse}
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup ranks within group with deterministic ties") {
    val df = Seq(
      (1L, "A", 10.0), (2L, "A", 10.0), (3L, "A", 5.0), (4L, "B", 1.0))
      .toDF("id", "grp", "score")
    val out = Analytics.topKPerGroup(df, "grp", "score", "id", 2)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 4L)) // tie broken by id; B has only one row
  }

  test("rollupSummary emits per-group, subtotal and grand-total rows") {
    val df = Seq(("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 3.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val out = Analytics.rollupSummary(df)
      .as[(String, String, Double, Long)].collect().toSeq
    assert(out.contains(("ALL", "ALL", 6.0, 3L)))
    assert(out.contains(("A", "ALL", 3.0, 2L)))
    assert(out.contains(("B", "x", 3.0, 1L)))
  }

  test("groupingSetsSummary emits both marginals, the cross table and " +
      "the grand total with distinct gids") {
    val df = Seq(("A", "x", 1.0, 10.0, 0.0), ("A", "y", 2.0, 10.0, 0.0),
      ("B", "x", 3.0, 10.0, 0.5))
      .toDF("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount")
    val out = Analytics.groupingSetsSummary(df)
      .as[(Int, String, String, Double, Double, Long)].collect().toSeq
    assert(out.contains((0, "A", "x", 1.0, 10.0, 1L)))   // cross cell
    assert(out.contains((1, "A", "ALL", 3.0, 20.0, 2L))) // flag marginal
    assert(out.contains((2, "ALL", "x", 4.0, 15.0, 2L))) // status marginal
    assert(out.contains((3, "ALL", "ALL", 6.0, 25.0, 3L))) // grand total
    assert(out.length == 3 + 2 + 2 + 1) // cells + 2 marginals + total
  }

  test("priorityExists counts each qualifying order once regardless of " +
      "how many lines match, and respects the date range") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val orders = Seq(
      (1L, "1-URGENT", ts("2001-02-01 00:00:00")),  // 2 matching lines → 1
      (2L, "1-URGENT", ts("2001-03-01 00:00:00")),  // no matching line
      (3L, "2-HIGH", ts("2001-08-01 00:00:00")),    // out of range
      (4L, "2-HIGH", ts("2001-04-01 00:00:00")))    // 1 matching line
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val lineitem = Seq(
      (1L, 0.10), (1L, 0.09), (2L, 0.01), (3L, 0.10), (4L, 0.08))
      .toDF("l_orderkey", "l_discount")
    val out = Analytics.priorityExists(orders, lineitem,
      "2001-01-01 00:00:00", "2001-07-01 00:00:00", 0.07)
      .as[(String, Long)].collect().toMap
    assert(out == Map("1-URGENT" -> 1L, "2-HIGH" -> 1L))
  }

  test("smallQuantityRevenue sums only lines under frac*avg of their " +
      "own part, restricted to the brand") {
    val part = Seq((1L, "Brand#1"), (2L, "Brand#1"), (3L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
    // part 1: avg qty = 10 → threshold 5; only the qty-4 line passes.
    // part 2: avg qty = 2 → threshold 1; nothing passes.
    // part 3: other brand, would pass but is filtered out.
    val lineitem = Seq(
      (1L, 4.0, 70.0), (1L, 16.0, 99.0), (2L, 2.0, 50.0), (3L, 0.1, 11.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val out = Analytics.smallQuantityRevenue(part, lineitem, "Brand#1", 0.5)
      .as[Double].collect().toSeq
    assert(out == Seq(10.0)) // 70 / 7
  }

  test("cumulativeRevenue: exact centi-cent sums, running cumulative " +
      "and share per priority") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val orders = Seq(
      (1L, "A", ts("2024-01-05 00:00:00")),
      (2L, "A", ts("2024-02-10 00:00:00")),
      (3L, "B", ts("2024-01-20 00:00:00")))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val lineitem = Seq(
      (1L, 10.0, 0.10),  // 1000 cents · 90 = 90000 cc
      (2L, 5.0, 0.00),   // 500 · 100 = 50000 cc
      (3L, 1.0, 0.50))   // 100 · 50  = 5000 cc
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val out = Analytics.cumulativeRevenue(orders, lineitem)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("A", "2024-01", 90000L, 90000L, 90000.0 / 140000.0),
      ("A", "2024-02", 50000L, 140000L, 1.0),
      ("B", "2024-01", 5000L, 5000L, 1.0)))
  }

  test("orderCountDistribution keeps zero-order customers and drops the " +
      "excluded priority before counting") {
    val customer = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "5-LOW"), (11L, 1L, "5-LOW"),   // cust 1 → 2 orders
      (12L, 2L, "1-URGENT"),                    // excluded → cust 2 at 0
      (13L, 3L, "2-HIGH"))                      // cust 3 → 1 order
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = Analytics.orderCountDistribution(customer, orders, "1-URGENT")
      .as[(Long, Long)].collect().toSeq
    // two customers (2 and 4) at zero, one at one, one at two
    assert(out == Seq((0L, 2L), (2L, 1L), (1L, 1L)))
  }

  test("minCostSupplier keeps every supplier tied at the per-part " +
      "minimum, restricted to the brand, deduped across lineitems") {
    val part = Seq(
      (1L, "Brand#1"), (2L, "Brand#1"), (3L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
    val supplier = Seq((10L, "alpha"), (11L, "beta"), (12L, "gamma"))
      .toDF("s_suppkey", "s_name")
    val lineitem = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0),  // tie at the min → both kept
      (1L, 12L, 9.0),                  // above min → dropped
      (1L, 10L, 5.0),                  // duplicate shipment → deduped
      (2L, 12L, 3.0),                  // sole supplier
      (3L, 10L, 1.0))                  // other brand → filtered out
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val out = Analytics.minCostSupplier(part, supplier, lineitem, "Brand#1")
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 10L, "alpha", 5.0),
      (1L, 11L, "beta", 5.0),
      (2L, 12L, "gamma", 3.0)))
  }

  test("customersWithoutOrders is a left-anti join") {
    val cust = Seq((1L, "a", "S"), (2L, "b", "S"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    val ords = Seq(Tuple1(1L)).toDF("o_custkey")
    val out = Analytics.customersWithoutOrders(cust, ords)
      .select("c_custkey").as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("qualityScan counts nulls per column in one pass") {
    val df = Seq(
      ("click", Some(1L), Some(1.0)), ("click", None, Some(2.0)),
      ("view", Some(2L), None))
      .toDF("event_type", "user_id", "value")
    val out = Lakehouse.qualityScan(df, "event_type", Seq("user_id", "value"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("click", 2L, 1L, 0L), ("view", 1L, 0L, 1L)))
  }

  test("snapshotAsOf filters the append log at a cutoff") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = Lakehouse.snapshotAsOf(df, col("v"), lit(2), "k")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 2L)))
  }

  private val ts = java.sql.Timestamp.valueOf(_: String)

  test("shippingVolume drops same-nation flows, splits by ship year and " +
      "sums exact centi-cents") {
    val nation = Seq((0, "N0", 0), (1, "N1", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((10L, "s0", 0), (11L, "s1", 1))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val customer = Seq((20L, "c", 1, 0.0, "M"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq((30L, 20L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      // supp N0 → cust N1, 1996: kept. 10.00 * (100-5) = 95000 cc
      (30L, 10L, 10.0, 0.05, ts("1996-03-01 00:00:00")),
      // supp N1 → cust N1: same nation, dropped
      (30L, 11L, 10.0, 0.00, ts("1996-03-01 00:00:00")),
      // supp N0 → cust N1, 1997: separate year row
      (30L, 10L, 1.0, 0.00, ts("1997-03-01 00:00:00")),
      // out of date range, dropped
      (30L, 10L, 9.0, 0.00, ts("1999-03-01 00:00:00")))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
    val out = Analytics.shippingVolume(nation, customer, orders, lineitem,
      supplier, "1996-01-01 00:00:00", "1997-12-31 23:59:59")
      .as[(String, String, Int, Long)].collect().toSeq
    assert(out == Seq(("N0", "N1", 1996, 95000L), ("N0", "N1", 1997, 10000L)))
  }

  test("marketShare divides the CASE-gated nation slice by the year total") {
    val nation = Seq((0, "N0", 0), (1, "N1", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((10L, "s0", 0), (11L, "s1", 1))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val customer = Seq((20L, "c", 1, 0.0, "M"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val part = Seq((40L, "p", "B", "PROMO", 1, 1.0),
      (41L, "p2", "B", "LARGE", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val orders = Seq((30L, ts("1996-05-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val lineitem = Seq(
      (30L, 40L, 10L, 3.0, 0.0),  // N0 promo: 30000 cc
      (30L, 40L, 11L, 1.0, 0.0),  // N1 promo: 10000 cc
      (30L, 41L, 10L, 9.0, 0.0))  // non-promo type, dropped
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
    val out = Analytics.marketShare(nation, customer, orders, lineitem,
      supplier, part, "PROMO", "N0")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1996, 40000L, 30000L, 0.75)))
  }

  test("promoRevenueShare emits one row per ship month with the exact " +
      "conditional ratio") {
    val part = Seq((1L, "PROMO"), (2L, "SMALL")).toDF("p_partkey", "p_type")
    val lineitem = Seq(
      (1L, 1.0, 0.0, ts("1996-01-10 00:00:00")),
      (2L, 3.0, 0.0, ts("1996-01-20 00:00:00")),
      (2L, 5.0, 0.0, ts("1996-02-20 00:00:00")))
      .toDF("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
    val out = Analytics.promoRevenueShare(part, lineitem, "PROMO")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("1996-01", 10000L, 40000L, 0.25),
      ("1996-02", 0L, 50000L, 0.0)))
  }

  test("disjunctiveRevenue keeps a row iff ANY arm's brand+size+qty " +
      "envelope matches") {
    val part = Seq(
      (1L, "n", "Brand#13", "T", 5, 1.0),   // arm1 sized
      (2L, "n", "Brand#20", "T", 15, 1.0),  // arm2 sized
      (3L, "n", "Brand#13", "T", 40, 1.0))  // size out of every arm
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val lineitem = Seq(
      (1L, 5.0, 2.0, 0.0),   // arm1: qty 5 in [1,11] → 20000 cc
      (1L, 15.0, 2.0, 0.0),  // qty 15 out of arm1 envelope
      (2L, 12.0, 1.0, 0.0),  // arm2: qty 12 in [10,20] → 10000 cc
      (3L, 5.0, 9.0, 0.0))   // part excluded by size
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val out = Analytics.disjunctiveRevenue(part, lineitem)
      .as[Long].collect().toSeq
    assert(out == Seq(30000L))
  }

  test("idleCustomerBalance keeps above-average-balance customers with " +
      "no RECENT order, via the cross-multiplied compare") {
    val nation = Seq((0, "N0", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    // positive balances: 10.00, 20.00, 30.00 → avg 20.00; strict >
    val customer = Seq(
      (1L, "a", 0, 10.0, "M"),   // below avg
      (2L, "b", 0, 20.0, "M"),   // equal to avg → excluded (strict)
      (3L, "c", 0, 30.0, "M"),   // above avg, old order only → kept
      (4L, "d", 0, -5.0, "M"))   // negative, excluded from avg and result
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (3L, ts("1999-06-01 00:00:00")),  // old → does not disqualify
      (2L, ts("2000-06-01 00:00:00")))
      .toDF("o_custkey", "o_orderdate")
    val out = Analytics.idleCustomerBalance(nation, customer, orders,
      "2000-01-01 00:00:00")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("N0", 1L, 3000L)))
  }

  test("supplierValueShare keeps suppliers strictly above the basis-point " +
      "threshold of the global total") {
    val supplier = Seq((1L, "s1", 0), (2L, "s2", 0), (3L, "s3", 0))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val lineitem = Seq(
      (1L, 96.0, 0.0),  // 960000 cc = 96% of total
      (2L, 3.5, 0.0),   // 35000 cc = 3.5% > 80bp? 3.5% = 350bp yes
      (3L, 0.5, 0.0))   // 50bp < 80bp threshold → dropped
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val out = Analytics.supplierValueShare(supplier, lineitem, 80L)
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "s1", 960000L), (2L, "s2", 35000L)))
  }

  test("trailingRevenue: RANGE frame counts gap months OUT of the " +
      "window where a ROWS frame would stretch across") {
    val orders = Seq(
      (1L, "P", ts("1996-01-15 00:00:00")),
      (2L, "P", ts("1996-02-15 00:00:00")),
      // March silent, April active: trailing window at April must
      // cover {Feb, Mar, Apr} -> Feb + Apr only, NOT Jan.
      (3L, "P", ts("1996-04-15 00:00:00")))
      .toDF("o_orderkey", "o_custkey_unused", "o_orderdate")
      .withColumnRenamed("o_custkey_unused", "o_orderpriority")
    val li = Seq((1L, 1.0, 0.0), (2L, 2.0, 0.0), (3L, 4.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val out = Analytics.trailingRevenue(orders, li)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._3, r._4, r._5)) == Seq(
      (10000L, 10000L, 1L),            // Jan: itself
      (20000L, 30000L, 2L),            // Feb: Jan+Feb
      (40000L, 60000L, 2L)))           // Apr: Feb+Apr (Jan aged out)
  }

  test("constraintAudit evaluates every predicate in one scan and " +
      "referentialViolations counts orphan keys") {
    val li = Seq(
      (1L, 5.0, 0.1, Some(ts("1996-01-01 00:00:00"))),
      (2L, -1.0, 0.5, Some(ts("1996-01-02 00:00:00"))),  // qty violation
      (3L, 3.0, 1.5, None))                              // disc + null ship
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_shipdate")
    val audit = Lakehouse.constraintAudit(li, Seq(
      ("qty_pos", col("l_quantity") <= 0),
      ("disc_range", col("l_discount") < 0 || col("l_discount") > 1),
      ("ship_nn", col("l_shipdate").isNull)))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(audit == Seq(
      ("disc_range", 1L, 3L, false),
      ("qty_pos", 1L, 3L, false),
      ("ship_nn", 1L, 3L, false)))
    val orders = Seq(Tuple1(1L), Tuple1(3L)).toDF("o_orderkey")
    val ref = Lakehouse.referentialViolations(li, "l_orderkey",
      orders, "o_orderkey", "fk")
      .as[(String, Long, Long, Boolean)].collect().head
    assert(ref == ("fk", 1L, 3L, false)) // orderkey 2 is orphan
  }

  test("topSupplier keeps ALL suppliers tied at the max quarter revenue") {
    val supplier = Seq((1L, "s1", 0), (2L, "s2", 0), (3L, "s3", 0))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val lineitem = Seq(
      (1L, 5.0, 0.0, ts("1996-02-01 00:00:00")),
      (2L, 5.0, 0.0, ts("1996-02-01 00:00:00")),  // tie with s1
      (3L, 4.0, 0.0, ts("1996-02-01 00:00:00")),  // below max
      (1L, 9.0, 0.0, ts("1996-06-01 00:00:00")))  // outside quarter
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val out = Analytics.topSupplier(supplier, lineitem,
      "1996-01-01 00:00:00", "1996-04-01 00:00:00")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "s1", 50000L), (2L, "s2", 50000L)))
  }

  test("returnedItemRevenue aggregates only R-flagged lines inside the " +
      "order-date quarter, top-k by revenue then custkey") {
    val nation = Seq((0, "N0", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((1L, "a", 0, 1.0, "M"), (2L, "b", 0, 2.0, "M"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, ts("1996-11-01 00:00:00")),  // in quarter
      (11L, 2L, ts("1997-02-01 00:00:00")))  // out of quarter
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (10L, "R", 4.0, 0.0),   // kept: 40000 cc
      (10L, "N", 9.0, 0.0),   // wrong flag
      (11L, "R", 9.0, 0.0))   // out-of-quarter order
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val out = Analytics.returnedItemRevenue(nation, customer, orders,
      lineitem, "1996-10-01 00:00:00", "1997-01-01 00:00:00")
      .as[(Long, String, String, Double, Long)].collect().toSeq
    assert(out == Seq((1L, "a", "N0", 1.0, 40000L)))
  }

  test("productProfit: exact int64 profit, name filter prunes parts, " +
      "grouped by supplier nation and order year") {
    val nation = Seq((0, "N0", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((1L, "s1", 0, 10.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val part = Seq(
      (1L, "red widget", 2.00),   // matches "red": cost 200c/unit
      (2L, "blue bolt", 3.00))    // pruned by the name filter
      .toDF("p_partkey", "p_name", "p_retailprice")
    val orders = Seq((10L, ts("1996-05-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val lineitem = Seq(
      // rev_cc = 1000c * 90 = 90000; cost = 200c * 3 * 100 = 60000.
      (10L, 1L, 1L, 3.0, 10.00, 0.10),
      (10L, 2L, 1L, 1.0, 99.00, 0.00)) // filtered part
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    val out = Analytics.productProfit(nation, orders, lineitem, supplier,
      part, "red").as[(String, Int, Long, Long)].collect().toSeq
    assert(out == Seq(("N0", 1996, 30000L, 1L)))
  }

  test("supplierCandidates: fact multiplicity collapses to distinct " +
      "pairs, blacklisted suppliers are excluded") {
    val part = Seq((1L, "B1", "T1"), (2L, "B1", "T2"))
      .toDF("p_partkey", "p_brand", "p_type")
    val supplier = Seq(
      (1L, "s1", 0, 5.0),
      (2L, "s2", 0, -1.0), // blacklisted: negative balance
      (3L, "s3", 0, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val lineitem = Seq(
      (1L, 1L), (1L, 1L), // duplicate pair counts once
      (1L, 2L),           // blacklisted supplier
      (1L, 3L),
      (2L, 2L))           // part 2 served ONLY by the blacklisted one
      .toDF("l_partkey", "l_suppkey")
    val out = Analytics.supplierCandidates(part, supplier, lineitem)
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("B1", "T1", 2L)))
  }

  test("waitingSuppliers: only the SOLE late supplier on a multi-" +
      "supplier order counts (Q21 essence)") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, t("2024-01-01")), (2L, t("2024-01-01")),
      (3L, t("2024-01-01")), (4L, t("2024-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    // late = shipped > 10 days after order date
    val li = Seq(
      // O1: A late (two lines, one late), B on time → A counted
      (1L, 100L, t("2024-01-20")), (1L, 100L, t("2024-01-02")),
      (1L, 200L, t("2024-01-05")),
      // O2: A and B both late → nobody
      (2L, 100L, t("2024-01-20")), (2L, 200L, t("2024-01-20")),
      // O3: single-supplier order, late → not counted
      (3L, 100L, t("2024-01-20")),
      // O4: nobody late → nobody
      (4L, 100L, t("2024-01-02")), (4L, 200L, t("2024-01-03")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((100L, "Supplier#A"), (200L, "Supplier#B"))
      .toDF("s_suppkey", "s_name")
    val out = Analytics.waitingSuppliers(orders, li, supp, 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("Supplier#A", 1L)))
  }

  test("forecastRevenue (Q6 essence): only the year/discount/quantity " +
      "slice contributes; revenue = sum(price * discount)") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val li = Seq(
      // qualifies: 1996, disc in band, qty < 24
      (t("1996-03-01 00:00:00"), 100.0, 0.06, 10.0),
      (t("1996-12-31 00:00:00"), 200.0, 0.05, 23.0),
      // out: wrong year / discount below band / above band / big qty
      (t("1995-03-01 00:00:00"), 100.0, 0.06, 10.0),
      (t("1996-03-01 00:00:00"), 100.0, 0.04, 10.0),
      (t("1996-03-01 00:00:00"), 100.0, 0.08, 10.0),
      (t("1996-03-01 00:00:00"), 100.0, 0.06, 24.0))
      .toDF("l_shipdate", "l_extendedprice", "l_discount", "l_quantity")
    val out = Analytics.forecastRevenue(li, 1996, 0.05, 0.07, 24.0)
      .as[(Double, Long)].head()
    assert(out == (16.0, 2L)) // 100*0.06 + 200*0.05
  }
}
