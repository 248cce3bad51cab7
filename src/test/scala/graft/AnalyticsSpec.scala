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
}
