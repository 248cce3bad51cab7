package graft

import java.sql.Timestamp
import graft.operators.TickOps

class TickOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // (tick_id, symbol, ts, bid, ask)
  private def ticks(rows: (Long, Long, String, Double, Double)*) =
    rows.toSeq.map { case (id, sym, ts, b, a) => (id, sym, t(ts), b, a) }
      .toDF("tick_id", "symbol", "ts", "bid", "ask")

  test("tickRule classifies against the previous bid; first tick " +
      "unclassified; net flow = up - down") {
    val df = ticks(
      (1L, 1L, "2024-01-01 10:00:01", 10.0, 10.1), // first: unclassified
      (2L, 1L, "2024-01-01 10:00:02", 11.0, 11.1), // up
      (3L, 1L, "2024-01-01 10:00:03", 11.0, 11.1), // zero
      (4L, 1L, "2024-01-01 10:00:04", 10.5, 10.6), // down
      (5L, 1L, "2024-01-01 10:00:05", 10.9, 11.0), // up
      (6L, 2L, "2024-01-01 10:00:01", 5.0, 5.1))   // lone tick: all zero
    val out = TickOps.tickRule(df)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 1L, 1L),
      (2L, 0L, 0L, 0L, 0L)))
  }

  test("sessionWindowFilter keeps only 07:50+ and 13:50+ ticks") {
    val df = ticks(
      (1L, 1L, "2024-01-01 07:49:59.5", 10.0, 10.1),
      (2L, 1L, "2024-01-01 07:50:00.0", 11.0, 11.1),
      (3L, 1L, "2024-01-01 13:55:30.0", 12.0, 12.1),
      (4L, 1L, "2024-01-01 14:00:00.0", 13.0, 13.1))
    val out = TickOps.sessionWindowFilter(df)
    assert(out.select("tick_id").as[Long].collect().toSeq == Seq(2L, 3L))
  }

  test("secondDownsample keeps first tick per (symbol, second)") {
    val df = ticks(
      (1L, 1L, "2024-01-01 07:55:01.100", 10.0, 10.1),
      (2L, 1L, "2024-01-01 07:55:01.900", 99.0, 99.1), // same second, dropped
      (3L, 1L, "2024-01-01 07:55:02.000", 12.0, 12.1),
      (4L, 2L, "2024-01-01 07:55:01.500", 20.0, 20.1)) // other symbol kept
    val out = TickOps.secondDownsample(df).collect()
    assert(out.length == 3)
    val s1 = out.filter(_.getLong(0) == 1L).map(r => (r.getLong(2), r.getDouble(3)))
    assert(s1.toSet == Set((1L, 10.0), (3L, 12.0)))
  }

  test("dailyWindowCounts zero-fills a window with no ticks") {
    val df = ticks(
      (1L, 1L, "2024-01-01 07:55:00", 1.0, 1.1),
      (2L, 1L, "2024-01-01 07:56:00", 1.0, 1.1),
      (3L, 1L, "2024-01-02 13:55:00", 1.0, 1.1))
    val out = TickOps.dailyWindowCounts(df)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("2024-01-01", 2L, 0L), ("2024-01-02", 0L, 1L)))
  }

  test("forwardFill carries last valid value, leading nulls stay null") {
    val df = ticks(
      (1L, 1L, "2024-01-01 00:00:01", 5.0, 5.1),   // below threshold -> null
      (2L, 1L, "2024-01-01 00:00:02", 50.0, 50.1),
      (3L, 1L, "2024-01-01 00:00:03", 7.0, 7.1),   // null -> filled 50.0
      (4L, 1L, "2024-01-01 00:00:04", 60.0, 60.1))
    val out = TickOps.forwardFill(df, 10.0)
      .select("bid_filled").collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, Some(50.0), Some(50.0), Some(60.0)))
  }

  test("tickDedup keeps lowest tick_id per (symbol, minute)") {
    val df = ticks(
      (5L, 1L, "2024-01-01 00:01:30", 1.0, 1.1),
      (2L, 1L, "2024-01-01 00:01:10", 2.0, 2.1), // lower id, same minute -> kept
      (7L, 1L, "2024-01-01 00:02:00", 3.0, 3.1))
    val kept = TickOps.tickDedup(df).select("tick_id").as[Long].collect().toSeq
    assert(kept == Seq(2L, 7L))
  }

  test("ohlcBars picks open/close by tick order, high/low by value") {
    val df = ticks(
      (1L, 1L, "2024-01-01 10:00:05", 10.0, 10.1),
      (2L, 1L, "2024-01-01 10:20:00", 50.0, 50.1),
      (3L, 1L, "2024-01-01 10:40:00", 5.0, 5.1),
      (4L, 1L, "2024-01-01 10:59:59", 20.0, 20.1),
      (5L, 1L, "2024-01-01 11:00:00", 99.0, 99.1)) // next bar
    val bars = TickOps.ohlcBars(df, "hour").collect()
    assert(bars.length == 2)
    val b = bars.head
    assert((b.getDouble(2), b.getDouble(3), b.getDouble(4), b.getDouble(5)) ==
      ((10.0, 50.0, 5.0, 20.0)))
  }

  test("vwap weights prices by the JSON qty and rounds in integer space") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 10.0, """{"k": 1}"""),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1L, 20.0, """{"k": 3}"""),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 2L, 5.0, """{"k": 0}"""))
      .toDF("event_id", "ts", "user_id", "value", "props")
    val out = TickOps.vwap(df).collect()
    val s1 = out.find(_.getLong(0) == 1L).get
    assert(s1.getDouble(2) == 17.5) // (10*1 + 20*3) / 4
    val s2 = out.find(_.getLong(0) == 2L).get
    assert(s2.isNullAt(2)) // zero total weight -> null vwap
  }

  test("vwap truncates like the oracle on a negative sum (refund rows)") {
    // S = sum(cents*k) = -1001, K = 3: vwap = -10.01/3 = -3.336666...
    // Spark's `div` and DuckDB's integer `//` BOTH truncate toward
    // zero (probed: SELECT -200197 // 6 = -33366 in DuckDB), so the
    // engine-agreed e4 value is -3.3366 — half-toward-zero for
    // negatives. This spec pins that truncating parity; a flooring
    // "fix" on either side would be the actual divergence.
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, -10.01, """{"k": 1}"""),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1L, 0.0, """{"k": 2}"""))
      .toDF("event_id", "ts", "user_id", "value", "props")
    val out = TickOps.vwap(df).collect().head
    assert(out.getDouble(2) == -3.3366, s"got ${out.getDouble(2)}")
  }

  test("shiftTz adds broker offset") {
    val df = ticks((1L, 1L, "2024-01-01 23:30:00", 1.0, 1.1))
    val r = TickOps.shiftTz(df, 2).collect().head
    assert(r.getTimestamp(2) == t("2024-01-02 01:30:00"))
    assert(r.getInt(3) == 1)
  }

  test("burstDetection flags seconds above the rounded per-symbol " +
      "percentile rate") {
    // symbol 1 per-second counts (3,1,1,1): p75 of sorted (1,1,1,3)
    // interpolates to 1.5 → only the 3-tick second is a burst.
    val df = ticks(
      (1L, 1L, "2024-01-01 10:00:01", 1.0, 1.1),
      (2L, 1L, "2024-01-01 10:00:01", 1.0, 1.1),
      (3L, 1L, "2024-01-01 10:00:01", 1.0, 1.1),
      (4L, 1L, "2024-01-01 10:00:02", 1.0, 1.1),
      (5L, 1L, "2024-01-01 10:00:03", 1.0, 1.1),
      (6L, 1L, "2024-01-01 10:00:04", 1.0, 1.1))
    val r = TickOps.burstDetection(df, 0.75).collect().head
    assert(r.getAs[Long]("n_seconds") == 4L)
    assert(r.getAs[Long]("n_burst") == 1L)
    assert(r.getAs[Long]("max_rate") == 3L)
    assert(r.getAs[Double]("thr") == 1.5)
  }

  test("spikeRepair: only both-direction reverting jumps flag; " +
      "persistent jumps and edges are kept; repair is the midpoint") {
    // cents: 100, 160, 160, 100, 250, 101 (threshold 50%).
    // t2 jumps +60 but PERSISTS (next is equal) -> kept.
    // t4 drops -60 from 160: 600000 <= 5000*160 -> below threshold.
    // t5 spikes to 250 against 100 and 101 -> repaired to 101.
    val tk = ticks(
      (1L, 1L, "2024-01-01 00:00:01", 1.00, 0.0),
      (2L, 1L, "2024-01-01 00:00:02", 1.60, 0.0),
      (3L, 1L, "2024-01-01 00:00:03", 1.60, 0.0),
      (4L, 1L, "2024-01-01 00:00:04", 1.00, 0.0),
      (5L, 1L, "2024-01-01 00:00:05", 2.50, 0.0),
      (6L, 1L, "2024-01-01 00:00:06", 1.01, 0.0))
    val out = TickOps.spikeRepair(tk, 5000L).collect()
    val spikes = out.filter(_.getAs[Boolean]("is_spike"))
      .map(_.getAs[Long]("tick_id")).toSeq
    assert(spikes == Seq(5L))
    val t5 = out.find(_.getAs[Long]("tick_id") == 5L).get
    assert(t5.getAs[Long]("repaired_cents") == 101L) // (100+101+1) div 2
    val t2 = out.find(_.getAs[Long]("tick_id") == 2L).get
    assert(t2.getAs[Long]("repaired_cents") == 160L)
  }

  test("twap: next-tick holding weights, last tick weightless, " +
      "single-tick day reports NULL") {
    // day 1: 100c held 10 s, 200c held 30 s, 110c weightless →
    // (100·10 + 200·30) / 40 = 175c = 1.75.
    val tk = ticks(
      (1L, 1L, "2024-01-01 00:00:00", 1.00, 0.0),
      (2L, 1L, "2024-01-01 00:00:10", 2.00, 0.0),
      (3L, 1L, "2024-01-01 00:00:40", 1.10, 0.0),
      (4L, 2L, "2024-01-01 05:00:00", 9.00, 0.0)) // lone tick
    val out = TickOps.twap(tk).collect()
    val s1 = out.find(_.getAs[Long]("symbol") == 1L).get
    assert(s1.getAs[Double]("twap") == 1.75)
    assert(s1.getAs[Long]("n_weighted") == 2L)
    val s2 = out.find(_.getAs[Long]("symbol") == 2L).get
    assert(s2.isNullAt(s2.fieldIndex("twap")))
    assert(s2.getAs[Long]("n_weighted") == 0L)
  }

  test("twQuotedSpread: holding-interval weights on exact-cent " +
      "spreads; last quote unweighted; single-tick day NULL " +
      "time-weighted, plain mean kept") {
    // symbol 1: spreads 2¢/4¢/6¢ held 10 s/20 s/(open):
    // tw = (2·10 + 4·20)/30 = 10/3; mean = 4.
    val out = TickOps.twQuotedSpread(ticks(
      (1L, 1L, "2024-01-01 10:00:00", 1.00, 1.02),
      (2L, 1L, "2024-01-01 10:00:10", 1.00, 1.04),
      (3L, 1L, "2024-01-01 10:00:30", 1.00, 1.06),
      (4L, 2L, "2024-01-01 10:00:00", 1.00, 1.05)))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_ticks"),
          Option(r.getAs[java.lang.Double]("twq_spread_cents")),
          r.getAs[Double]("avg_spread_cents")))).toMap
    assert(out(1L) == ((3L, Some(100.0 / 30.0), 4.0)))
    assert(out(2L) == ((1L, None, 5.0)),
      "a single-tick day has no holding interval")
  }
}
