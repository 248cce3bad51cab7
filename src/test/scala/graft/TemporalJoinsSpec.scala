package graft

import java.sql.Timestamp
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks latest right row at-or-before left ts, per key") {
    val trades = Seq(
      (1L, 10L, t("2024-01-01 10:00:05")),
      (1L, 11L, t("2024-01-01 10:00:00")), // equal-ts quote visible
      (2L, 12L, t("2024-01-01 10:00:01")), // other key
      (1L, 13L, t("2024-01-01 09:00:00"))) // before any quote -> dropped
      .toDF("symbol", "trade_id", "ts")
    val quotes = Seq(
      (1L, 100L, t("2024-01-01 10:00:00"), 1.5),
      (1L, 101L, t("2024-01-01 10:00:03"), 1.6),
      (2L, 102L, t("2024-01-01 10:00:00"), 2.5))
      .toDF("symbol", "quote_id", "ts", "bid")
    val pairs = TemporalJoins.asOfJoin(trades, quotes, "symbol", "ts",
      "trade_id", "quote_id", Seq("bid"))
      .select("trade_id", "asof_id").as[(Long, Long)].collect().toMap
    assert(pairs == Map(10L -> 101L, 11L -> 100L, 12L -> 102L))
    assert(!pairs.contains(13L))
  }

  test("asOfJoinForward picks earliest right row at-or-after left ts, " +
      "per key") {
    val trades = Seq(
      (1L, 10L, t("2024-01-01 10:00:01")), // next quote at :03
      (1L, 11L, t("2024-01-01 10:00:03")), // equal-ts quote visible
      (2L, 12L, t("2024-01-01 09:59:59")), // other key
      (1L, 13L, t("2024-01-01 11:00:00"))) // after every quote -> dropped
      .toDF("symbol", "trade_id", "ts")
    val quotes = Seq(
      (1L, 100L, t("2024-01-01 10:00:00"), 1.5), // before all trades
      (1L, 101L, t("2024-01-01 10:00:03"), 1.6),
      (2L, 102L, t("2024-01-01 10:00:00"), 2.5))
      .toDF("symbol", "quote_id", "ts", "bid")
    val out = TemporalJoins.asOfJoinForward(trades, quotes, "symbol", "ts",
      "trade_id", "quote_id", Seq("bid"))
      .select("trade_id", "next_id", "next_bid")
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(r => r._1 -> r._2).toMap
    assert(pairs == Map(10L -> 101L, 11L -> 101L, 12L -> 102L))
    assert(!pairs.contains(13L))
    assert(out.find(_._1 == 10L).get._3 == 1.6)
  }

  test("asOfJoinTolerance: fresh quote priced with exact age, stale " +
      "quote nullified, quote-less trade kept with nulls, boundary age " +
      "== tolerance is fresh") {
    val trades = Seq(
      (1L, 10L, t("2024-01-01 10:00:05")), // 2s-old quote → fresh
      (1L, 11L, t("2024-01-01 10:30:03")), // 1800s-old quote → stale
      (1L, 12L, t("2024-01-01 10:00:13")), // exactly 10s → fresh
      (2L, 13L, t("2024-01-01 10:00:00"))) // no quote at all
      .toDF("symbol", "trade_id", "ts")
    val quotes = Seq(
      (1L, 100L, t("2024-01-01 10:00:03"), 1.5))
      .toDF("symbol", "quote_id", "ts", "bid")
    val out = TemporalJoins.asOfJoinTolerance(trades, quotes, "symbol",
      "ts", "trade_id", "quote_id", Seq("bid"), toleranceSec = 10L)
      .select("trade_id", "asof_id", "asof_bid", "age_us")
      .as[(Long, Option[Long], Option[Double], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(10L) == ((Some(100L), Some(1.5), Some(2000000L))))
    assert(out(11L) == ((None, None, None)))
    assert(out(12L) == ((Some(100L), Some(1.5), Some(10000000L))))
    assert(out(13L) == ((None, None, None)))
    assert(out.size == 4) // left flavor: every trade survives
  }

  test("nearestJoin picks the closer side, exact ties go backward, " +
      "equal-ts quotes count as backward age 0, no-quote rows null") {
    val trades = Seq(
      (1L, 10L, t("2024-01-01 10:00:10")), // back 2s vs fwd 5s → back
      (1L, 11L, t("2024-01-01 10:00:13")), // back 5s vs fwd 2s → fwd
      (1L, 12L, t("2024-01-01 10:00:08")), // equal ts → back, age 0
      (1L, 13L, t("2024-01-01 10:00:04")), // before every quote → fwd 4s
      (2L, 14L, t("2024-01-01 10:00:00"))) // no quotes for key 2
      .toDF("symbol", "trade_id", "ts")
    val quotes = Seq(
      (1L, 100L, t("2024-01-01 10:00:08"), 1.5),
      (1L, 101L, t("2024-01-01 10:00:15"), 1.6))
      .toDF("symbol", "quote_id", "ts", "bid")
    val out = TemporalJoins.nearestJoin(trades, quotes, "symbol", "ts",
      "trade_id", "quote_id", Seq("bid"))
      .select("trade_id", "near_id", "direction", "near_age_us", "near_bid")
      .as[(Long, Option[Long], Option[String], Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(10L) == ((Some(100L), Some("back"), Some(2000000L), Some(1.5))))
    assert(out(11L) == ((Some(101L), Some("fwd"), Some(2000000L), Some(1.6))))
    assert(out(12L) == ((Some(100L), Some("back"), Some(0L), Some(1.5))))
    assert(out(13L) == ((Some(100L), Some("fwd"), Some(4000000L), Some(1.5))))
    assert(out(14L) == ((None, None, None, None)))
  }

  test("nearestJoin exact midpoint tie prefers the backward quote") {
    val trades = Seq((1L, 10L, t("2024-01-01 10:00:10")))
      .toDF("symbol", "trade_id", "ts")
    val quotes = Seq(
      (1L, 100L, t("2024-01-01 10:00:07"), 1.5),  // 3s back
      (1L, 101L, t("2024-01-01 10:00:13"), 1.6))  // 3s fwd
      .toDF("symbol", "quote_id", "ts", "bid")
    val out = TemporalJoins.nearestJoin(trades, quotes, "symbol", "ts",
      "trade_id", "quote_id", Seq("bid"))
      .select("near_id", "direction").as[(Long, String)].collect().head
    assert(out == ((100L, "back")))
  }

  test("rangeJoinCount counts right rows in [t-w, t) per key") {
    val trades = Seq((1L, 10L, t("2024-01-01 10:00:00")))
      .toDF("symbol", "trade_id", "ts")
    val clicks = Seq(
      (1L, t("2024-01-01 09:30:00")), // inside
      (1L, t("2024-01-01 10:00:00")), // boundary: excluded (< t)
      (1L, t("2024-01-01 08:59:59")), // outside
      (2L, t("2024-01-01 09:30:00"))) // other key
      .toDF("symbol", "ts")
    val out = TemporalJoins.rangeJoinCount(trades, clicks, "symbol", "ts",
      "trade_id", 3600L).select("n_in_window").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("sessionize splits on gaps larger than the threshold") {
    val df = Seq(
      (1L, 1L, t("2024-01-01 10:00:00"), 1.0, 1.1),
      (2L, 1L, t("2024-01-01 10:10:00"), 1.0, 1.1), // same session
      (3L, 1L, t("2024-01-01 12:00:00"), 1.0, 1.1), // gap > 1h -> new
      (4L, 2L, t("2024-01-01 10:00:00"), 1.0, 1.1))
      .toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = TemporalJoins.sessionize(df, "symbol", "ts", 3600L)
      .select("symbol", "session_id", "n_ticks")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("sessionOverlap: interval intersection per pair, touching " +
      "sessions count zero seconds, non-overlapping pairs drop") {
    // symbol 1 sessions (gap 60 s): [10:00:00,10:00:10], [10:05:00,10:05:30]
    // symbol 2 sessions:            [10:00:05,10:00:20], [10:05:30,10:05:40]
    // overlaps: 5 s (00:05..00:10) and 0 s (touching at 05:30)
    // symbol 3: [11:00:00] — no overlap with symbol 1
    val df = Seq(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 10:00:10"),
      (3L, 1L, "2024-01-01 10:05:00"), (4L, 1L, "2024-01-01 10:05:30"),
      (5L, 2L, "2024-01-01 10:00:05"), (6L, 2L, "2024-01-01 10:00:20"),
      (7L, 2L, "2024-01-01 10:05:30"), (8L, 2L, "2024-01-01 10:05:40"),
      (9L, 3L, "2024-01-01 11:00:00"))
      .map { case (id, s, ts) => (id, s, t(ts), 1.0, 1.1) }
      .toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = TemporalJoins.sessionOverlap(df, "symbol", "ts", 60L,
      Seq((1L, 2L), (1L, 3L))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("sym_a") == 1L && r.getAs[Long]("sym_b") == 2L)
    assert(r.getAs[Long]("n_overlaps") == 2L)
    assert(r.getAs[Long]("total_overlap_s") == 5L)
  }

  test("leadLagCorr: grid takes the first tick per bucket, corr matches " +
      "the hand-built formula, pairs without overlap drop out") {
    // symbol 1 per-second cents 100,102,101,105 → d = +2,−1,+4
    // symbol 2 per-second cents 200,201,203,202,210 → d = +1,+2,−1,+8
    // pair (1,2) lag 1: x=(2,−1,4) vs y=(2,−1,8).
    // Second tick in symbol 1's first bucket (id 99) must be ignored.
    val df = Seq(
      (1L, 1L, "2024-01-01 10:00:01", 1.00), (99L, 1L, "2024-01-01 10:00:01", 9.99),
      (2L, 1L, "2024-01-01 10:00:02", 1.02), (3L, 1L, "2024-01-01 10:00:03", 1.01),
      (4L, 1L, "2024-01-01 10:00:04", 1.05),
      (5L, 2L, "2024-01-01 10:00:01", 2.00), (6L, 2L, "2024-01-01 10:00:02", 2.01),
      (7L, 2L, "2024-01-01 10:00:03", 2.03), (8L, 2L, "2024-01-01 10:00:04", 2.02),
      (9L, 2L, "2024-01-01 10:00:05", 2.10))
      .map { case (id, s, ts, b) => (id, s, t(ts), b, b + 0.01) }
      .toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = TemporalJoins.leadLagCorr(df,
      Seq((1L, 2L), (1L, 3L)), "second", 1).collect()
    assert(out.length == 1) // (1,3) has no overlap → dropped
    val r = out.head
    assert(r.getAs[Long]("sym_lead") == 1L && r.getAs[Long]("sym_lag") == 2L)
    assert(r.getAs[Long]("n_pairs") == 3L)
    val expected = 66.0 / math.sqrt(38.0 * 126.0)
    assert(r.getAs[Double]("leadlag_corr") ==
      math.rint(expected * 1e4) / 1e4)
  }

  test("calendarCoverage counts missing days inside each symbol's own span") {
    val tk = Seq(
      (1L, 1L, t("2024-01-01 10:00:00"), 1.0, 1.0),
      (2L, 1L, t("2024-01-03 10:00:00"), 1.0, 1.0),  // Jan 2 missing
      (3L, 1L, t("2024-01-04 10:00:00"), 1.0, 1.0),
      (4L, 2L, t("2024-02-01 10:00:00"), 1.0, 1.0))  // single day
      .toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = TemporalJoins.calendarCoverage(tk)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 3L, 1L, 0.75),
      (2L, 1L, 1L, 0L, 1.0)))
  }

  test("rollingPairCorr: perfectly co-moving symbols give corr 1.0 and " +
      "sub-2-point windows give NULL") {
    // bid = base + day²·sym → daily move (2·day−1)·sym varies with the
    // day (a constant move would zero the variance and NULL the corr)
    // while staying an exact affine multiple across the two symbols.
    val rows = for {
      day <- 1 to 5
      (sym, base) <- Seq((1L, 100.0), (2L, 200.0))
    } yield ((day * 10 + sym), sym,
      t(f"2024-01-$day%02d 10:00:00"), base + day * day * sym, 0.0)
    val tk = rows.toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = TemporalJoins.rollingPairCorr(tk, Seq((1L, 2L)), 3)
      .collect()
    assert(out.length == 4) // 4 move days
    val first = out.head // single-point window → corr NULL
    assert(first.isNullAt(first.fieldIndex("roll_corr")))
    assert(first.getAs[Long]("n_in_window") == 1L)
    // moves are affine multiples → corr exactly 1 once ≥2 points
    assert(out.drop(1).forall(_.getAs[Double]("roll_corr") == 1.0))
    assert(out.last.getAs[Long]("n_in_window") == 3L) // capped at window
  }

  test("funnel: greedy earliest chain, out-of-window steps ignored, " +
      "dropouts keep NULLs") {
    def ev(id: Long, u: Long, ty: String, s: String) =
      (id, u, t(s), ty, 0.0, "{}")
    val events = Seq(
      // user 1 completes: view 10:00, click 10:30, purchase 11:00
      ev(1L, 1L, "view", "2024-01-01 10:00:00"),
      ev(2L, 1L, "click", "2024-01-01 10:30:00"),
      // an EARLIER click before the first view must not count
      ev(3L, 1L, "click", "2024-01-01 09:00:00"),
      ev(4L, 1L, "purchase", "2024-01-01 11:00:00"),
      // user 2: click arrives past the 1h window → funnel stops at t1
      ev(5L, 2L, "view", "2024-01-01 10:00:00"),
      ev(6L, 2L, "click", "2024-01-01 12:00:01"),
      // user 3: no view at all → not in the cohort
      ev(7L, 3L, "purchase", "2024-01-01 10:00:00"))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = TemporalJoins.funnel(events, "view", "click", "purchase",
      3600000000L) // 1 hour
      .collect()
    assert(out.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 2L))
    val u1 = out(0)
    assert(u1.getAs[Boolean]("completed"))
    assert(u1.getAs[Long]("t2_us") - u1.getAs[Long]("t1_us") == 1800000000L)
    val u2 = out(1)
    assert(!u2.getAs[Boolean]("completed"))
    assert(u2.isNullAt(u2.fieldIndex("t2_us")))
    assert(u2.isNullAt(u2.fieldIndex("t3_us")))
  }

  test("eppsCurve: per-scale grid corr, scales with <2 shared moves " +
      "drop, zero-variance pair reports NULL (never NaN)") {
    // 10 s scale: s1 moves +1,+2,+1; s2 moves +2,+4,+2 → corr 1.0.
    // s3 moves +1,+1,+1 (zero variance) → corr(1,3) NULL.
    // 40 s scale: every symbol has ONE bucket → no moves → no rows.
    def tks(sym: Long, base: Long, cents: Seq[Long]) =
      cents.zipWithIndex.map { case (c, i) =>
        (base + i, sym, t(f"2024-01-01 00:00:${i * 10}%02d"), c / 100.0, 0.0)
      }
    val tk = (tks(1L, 10L, Seq(100L, 101L, 103L, 104L)) ++
      tks(2L, 20L, Seq(200L, 202L, 206L, 208L)) ++
      tks(3L, 30L, Seq(300L, 301L, 302L, 303L)))
      .toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = TemporalJoins.eppsCurve(tk, Seq((1L, 2L), (1L, 3L)),
      Seq(10L, 40L)).collect()
    assert(out.forall(_.getAs[Long]("scale_sec") == 10L))
    val p12 = out.find(_.getAs[Long]("sym_b") == 2L).get
    assert(p12.getAs[Long]("n_buckets") == 3L)
    assert(p12.getAs[Double]("grid_corr") == 1.0)
    val p13 = out.find(_.getAs[Long]("sym_b") == 3L).get
    assert(p13.isNullAt(p13.fieldIndex("grid_corr")))
  }

  test("hayashiYoshida: overlap products in exact cents, a pair meeting " +
      "in several buckets counts ONCE (overlap-start dedup rule)") {
    // sym 1: cents 100,102,101 at 0s,10s,20s → r=+2 on (0,10], r=−1 on
    // (10,20]. sym 2: cents 200,203 at 5s,15s → r=+3 on (5,15].
    // Overlaps: (+2,+3) and (−1,+3) → cov = 6 − 3 = 3; var₁ = 5,
    // var₂ = 9. bucketSec=7 makes every interval span ≥2 buckets, so
    // the dedup rule is load-bearing: double-counting would give 6.
    val tk = Seq(
      (1L, 1L, t("2024-01-01 00:00:00"), 1.00, 0.0),
      (2L, 1L, t("2024-01-01 00:00:10"), 1.02, 0.0),
      (3L, 1L, t("2024-01-01 00:00:20"), 1.01, 0.0),
      (4L, 2L, t("2024-01-01 00:00:05"), 2.00, 0.0),
      (5L, 2L, t("2024-01-01 00:00:15"), 2.03, 0.0))
      .toDF("tick_id", "symbol", "ts", "bid", "ask")
    val r = TemporalJoins.hayashiYoshida(tk, Seq((1L, 2L)), 7L)
      .collect().head
    assert(r.getAs[Long]("n_overlaps") == 2L)
    assert(r.getAs[Long]("hy_cov_cc2") == 3L)
    assert(r.getAs[Long]("var_a_cc2") == 5L)
    assert(r.getAs[Long]("var_b_cc2") == 9L)
    assert(r.getAs[Double]("hy_corr") ==
      3.0 / (math.sqrt(5.0) * math.sqrt(9.0)))
  }

  test("interpolateGrid: missing buckets interpolate in exact int64 with " +
      "half-up rounding; observed buckets pass the anchor through") {
    val ticks = Seq(
      // symbol 1: anchors at hours 0 (100c), 3 (106c), 4 (105c);
      // hour 0 has a second tick that must NOT win (anchor = first
      // tick by tick_id). Hours 1-2 interpolate on the 100->106 line.
      (1L, 1L, t("2024-01-01 00:05:00"), 1.00, 0.0),
      (2L, 1L, t("2024-01-01 00:50:00"), 9.99, 0.0),
      (3L, 1L, t("2024-01-01 03:10:00"), 1.06, 0.0),
      (4L, 1L, t("2024-01-01 04:20:00"), 1.05, 0.0),
      // symbol 2: 100c then 101c two hours later -> midpoint 100.5
      // rounds HALF-UP to 101 (the B8 integer formula).
      (5L, 2L, t("2024-01-01 00:00:00"), 1.00, 0.0),
      (6L, 2L, t("2024-01-01 02:00:00"), 1.01, 0.0))
      .toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = TemporalJoins.interpolateGrid(ticks, "hour").collect()
    val bySym = out.groupBy(_.getAs[Long]("symbol"))
    val s1 = bySym(1L).map(r =>
      r.getAs[String]("bucket_ts") -> (r.getAs[Long]("cents"),
        r.getAs[Boolean]("is_observed"))).toMap
    assert(s1.size == 5)
    assert(s1("2024-01-01 00:00:00") == (100L, true))
    assert(s1("2024-01-01 01:00:00") == (102L, false))
    assert(s1("2024-01-01 02:00:00") == (104L, false))
    assert(s1("2024-01-01 03:00:00") == (106L, true))
    assert(s1("2024-01-01 04:00:00") == (105L, true))
    val s2 = bySym(2L).map(r =>
      r.getAs[String]("bucket_ts") -> r.getAs[Long]("cents")).toMap
    assert(s2 == Map(
      "2024-01-01 00:00:00" -> 100L,
      "2024-01-01 01:00:00" -> 101L, // 100.5 half-up
      "2024-01-01 02:00:00" -> 101L))
  }

  test("sessionAssign: inside/boundary points get the session id, " +
      "gap and pre-session points get NULL") {
    // sessions (gap 60 s) for symbol 1: [10:00:00, 10:00:30] (ticks at
    // 0 s and 30 s) and [10:05:00, 10:05:00] (single tick).
    val src = Seq(
      (1L, 1L, t("2024-01-01 10:00:00")),
      (2L, 1L, t("2024-01-01 10:00:30")),
      (3L, 1L, t("2024-01-01 10:05:00")),
      (4L, 2L, t("2024-01-01 09:00:00"))) // other key
      .toDF("tick_id", "symbol", "ts")
    val pts = Seq(
      (101L, 1L, t("2024-01-01 10:00:15")),   // inside session 1
      (102L, 1L, t("2024-01-01 10:00:30.7")), // final second → inside
      (103L, 1L, t("2024-01-01 10:02:00")),   // gap → NULL
      (104L, 1L, t("2024-01-01 10:05:00")),   // boundary tie → session 2
      (105L, 1L, t("2024-01-01 09:59:59")),   // before any session
      (106L, 2L, t("2024-01-01 09:00:00")))   // other key, inside
      .toDF("point_id", "symbol", "ts")
    val out = TemporalJoins.sessionAssign(src, pts, 60L)
      .select("point_id", "session_id", "in_session")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(out == Seq(
      (101L, Some(1L), true),
      (102L, Some(1L), true),
      (103L, None, false),
      (104L, Some(2L), true),
      (105L, None, false),
      (106L, Some(1L), true)))
  }

  test("funnelWithout: blocker strictly inside the matched window " +
      "kills completion; boundary and outside blockers do not; no " +
      "chain gives NULL blocked") {
    def ev(id: Long, u: Long, ty: String, s: String) =
      (id, u, t(s), ty, 0.0, "{}")
    val events = Seq(
      // user 1: view 10:00 → purchase 11:00 with a click between →
      // blocked
      ev(1L, 1L, "view", "2024-01-01 10:00:00"),
      ev(2L, 1L, "click", "2024-01-01 10:30:00"),
      ev(3L, 1L, "purchase", "2024-01-01 11:00:00"),
      // user 2: clean chain; the click AFTER purchase is outside
      ev(4L, 2L, "view", "2024-01-01 10:00:00"),
      ev(5L, 2L, "purchase", "2024-01-01 10:30:00"),
      ev(6L, 2L, "click", "2024-01-01 11:00:00"),
      // user 3: view only → no window, blocked NULL
      ev(7L, 3L, "view", "2024-01-01 10:00:00"),
      // user 4: click lands exactly AT the purchase us → boundary is
      // strict, chain completes
      ev(8L, 4L, "view", "2024-01-01 10:00:00"),
      ev(9L, 4L, "click", "2024-01-01 11:00:00"),
      ev(10L, 4L, "purchase", "2024-01-01 11:00:00"))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = TemporalJoins.funnelWithout(events, "view", "purchase",
      "click", 3600000000L)
      .select("user_id", "n_blockers", "blocked", "completed")
      .as[(Long, Option[Long], Option[Boolean], Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, Some(1L), Some(true), false),
      (2L, Some(0L), Some(false), true),
      (3L, None, None, false),
      (4L, Some(0L), Some(false), true)))
  }

  test("pointInTimeJoin: each fact carries the latest at-or-before " +
      "value from BOTH feature tables independently; missing history " +
      "is NULL with NULL age; equal-ts updates are visible") {
    def tbl(rows: (Long, Long, String, Double)*) =
      rows.map { case (sym, id, s, v) => (sym, t(s), id, v) }
        .toDF("symbol", "ts", "id", "v")
    val featA = tbl(
      (1L, 10L, "2024-01-01 10:00:00", 1.0),
      (1L, 11L, "2024-01-01 10:00:20", 2.0))
    val featB = tbl(
      (1L, 20L, "2024-01-01 10:00:10", 5.0))
    val facts = Seq(
      (1L, t("2024-01-01 10:00:05"), 100L), // A@1.0; B has no history
      (1L, t("2024-01-01 10:00:10"), 101L), // B@5.0 exactly at fact ts
      (1L, t("2024-01-01 10:00:30"), 102L), // A@2.0, B@5.0
      (2L, t("2024-01-01 10:00:30"), 103L)) // other key: no features
      .toDF("symbol", "ts", "id")
    val out = TemporalJoins.pointInTimeJoin(facts, featA, featB)
      .as[(Long, Long, Option[Double], Option[Long],
        Option[Double], Option[Long])].collect().toSeq
    assert(out == Seq(
      (100L, 1L, Some(1.0), Some(5000000L), None, None),
      (101L, 1L, Some(1.0), Some(10000000L), Some(5.0), Some(0L)),
      (102L, 1L, Some(2.0), Some(10000000L), Some(5.0), Some(20000000L)),
      (103L, 2L, None, None, None, None)))
  }

  test("cohortRetention: first-seen-day cohorts, distinct-user offsets, " +
      "exact shares") {
    // user 1 first seen Jan 1, active Jan 1 (twice — must dedup) + Jan 3;
    // user 2 first seen Jan 1, active Jan 1 only;
    // user 3 first seen Jan 2, active Jan 2 + Jan 3.
    val ev = Seq(
      (1L, 1L, t("2024-01-01 10:00:00")),
      (2L, 1L, t("2024-01-01 11:00:00")), // same user+day → one active row
      (3L, 1L, t("2024-01-03 09:00:00")),
      (4L, 2L, t("2024-01-01 12:00:00")),
      (5L, 3L, t("2024-01-02 08:00:00")),
      (6L, 3L, t("2024-01-03 23:59:59")))
      .toDF("event_id", "user_id", "ts")
    val out = TemporalJoins.cohortRetention(ev)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0), // both Jan-1 users active day 0
      ("2024-01-01", 2L, 1L, 2L, 0.5), // user 1 back on offset 2
      ("2024-01-02", 0L, 1L, 1L, 1.0),
      ("2024-01-02", 1L, 1L, 1L, 1.0))) // user 3 back next day
  }

  test("orderVelocity: strictly-earlier days inside the window count; " +
      "same-day siblings and window-edge days do not") {
    val orders = Seq(
      // customer 1: days 0, 30, 100, 150 — plus a same-day sibling
      (1L, 1L, "2020-01-01 00:00:00"),
      (2L, 1L, "2020-01-31 00:00:00"),  // +30d: sees day 0
      (3L, 1L, "2020-04-10 00:00:00"),  // +100d: sees +30 only (day 0
                                        // is exactly 100 days back)
      (4L, 1L, "2020-05-30 00:00:00"),  // +150d: sees +100 only
      (5L, 1L, "2020-05-30 00:00:00"),  // same-day sibling of 4
      // customer 2: exactly-90-days-back boundary IS inside RANGE 90
      (6L, 2L, "2020-01-01 00:00:00"),
      (7L, 2L, "2020-03-31 00:00:00"))  // +90d
      .map { case (k, c, d) => (k, c, t(d)) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = TemporalJoins.orderVelocity(orders, 90)
      .select("o_orderkey", "n_prior").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 0L, 7L -> 1L))
  }

  test("eventPaths: per-user consecutive transitions counted, " +
      "cross-user edges pooled, share = edge/outgoing mass; no " +
      "cross-user phantom edge") {
    def ev(id: Long, u: Long, ty: String, s: String) =
      (id, u, t(s), ty, 0.0, "{}")
    val events = Seq(
      // user 1: view → click → view   user 2: view → click
      ev(1L, 1L, "view", "2024-01-01 10:00:00"),
      ev(2L, 1L, "click", "2024-01-01 10:01:00"),
      ev(3L, 1L, "view", "2024-01-01 10:02:00"),
      ev(4L, 2L, "view", "2024-01-01 09:00:00"),
      ev(5L, 2L, "click", "2024-01-01 09:30:00"))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = TemporalJoins.eventPaths(events, 10)
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        ((r.getInt(0), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // edges: view→click ×2 (users 1, 2), click→view ×1 (user 1);
    // user 1's trailing view must NOT chain into user 2's stream
    assert(out.size == 2)
    assert(out(("view", "click")) == ((1, 2L, 2L, 1.0)))
    assert(out(("click", "view")) == ((2, 1L, 1L, 1.0)))
  }

  test("intervalCoverage: overlapping intervals merge into islands, " +
      "exactly-touching intervals merge (half-open), gaps split; " +
      "coverage = union/span") {
    val orders = Seq(
      // customer 1: [0,30)+[14,44) merge (covered 44), gap, [59,89)
      (1L, 1L, "1995-01-01 00:00:00"),
      (2L, 1L, "1995-01-15 00:00:00"),
      (3L, 1L, "1995-03-01 00:00:00"),
      // customer 2: a single interval
      (4L, 2L, "1995-06-01 00:00:00"),
      // customer 3: [0,30) and [30,60) touch exactly → ONE island
      (5L, 3L, "1995-01-01 00:00:00"),
      (6L, 3L, "1995-01-31 00:00:00"))
      .map { case (k, c, d) => (k, c, t(d)) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = TemporalJoins.intervalCoverage(orders, 30)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(out(1L) == ((3L, 2L, 74L, 89L, 74.0 / 89.0)))
    assert(out(2L) == ((1L, 1L, 30L, 30L, 1.0)))
    assert(out(3L) == ((2L, 1L, 60L, 60L, 1.0)))
  }
}
