package graft

import java.sql.Timestamp
import graft.operators.Features
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private def ticks(rows: (Long, Long, String, Double, Double)*) =
    rows.toSeq.map { case (id, sym, ts, b, a) => (id, sym, t(ts), b, a) }
      .toDF("tick_id", "symbol", "ts", "bid", "ask")

  test("meanReversion: a noiseless half-decaying shock fits rho = 0.5 " +
      "with half-life exactly 1 tick; an alternator (rho = -1) has none") {
    // symbol 1: cents 260,180,140,120,110 — deviations from 100 halve
    // each tick, so c = 0.5·c_prev + 50 EXACTLY: slope 0.5,
    // half-life −ln2/ln(0.5) = 1. symbol 2: 100/102 alternator →
    // slope −1 → no half-life.
    val rows = Seq(2.60, 1.80, 1.40, 1.20, 1.10).zipWithIndex.map {
      case (p, i) => (i.toLong + 1, 1L, f"2024-01-01 00:00:0${i + 1}", p, 9.9)
    } ++ Seq(
      (10L, 2L, "2024-01-01 00:00:01", 1.00, 9.9),
      (11L, 2L, "2024-01-01 00:00:02", 1.02, 9.9),
      (12L, 2L, "2024-01-01 00:00:03", 1.00, 9.9),
      (13L, 2L, "2024-01-01 00:00:04", 1.02, 9.9),
      (14L, 2L, "2024-01-01 00:00:05", 1.00, 9.9))
    val out = Features.meanReversion(ticks(rows: _*)).collect()
    val s1 = out.find(_.getAs[Long]("symbol") == 1L).get
    assert(s1.getAs[Long]("n_pairs") == 4L)
    assert(s1.getAs[Double]("rho") == 0.5)
    assert(s1.getAs[Double]("halflife_ticks") == 1.0)
    val s2 = out.find(_.getAs[Long]("symbol") == 2L).get
    assert(s2.getAs[Double]("rho") == -1.0)
    assert(s2.isNullAt(s2.fieldIndex("halflife_ticks")))
  }

  test("tickFeatures clamps negative spread to zero (np.maximum semantics)") {
    val df = ticks((1L, 1L, "2024-01-01 00:00:00", 10.0, 9.5))
    val r = Features.tickFeatures(df).collect().head
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 9.75)
  }

  test("rollingStats window covers at most n rows") {
    val df = ticks(
      (1L, 1L, "2024-01-01 00:00:01", 1.0, 1.1),
      (2L, 1L, "2024-01-01 00:00:02", 2.0, 2.1),
      (3L, 1L, "2024-01-01 00:00:03", 3.0, 3.1),
      (4L, 1L, "2024-01-01 00:00:04", 4.0, 4.1))
    val avgs = Features.rollingStats(df, 2).select("roll_avg")
      .as[Double].collect().toSeq
    assert(avgs == Seq(1.0, 1.5, 2.5, 3.5))
  }

  test("marketBeta: a symbol moving 1x/2x the equal-weight market gets " +
      "beta 1/1.5 and 2/1.5") {
    val rows = (1 to 3).flatMap { i =>
      Seq((i.toLong, 1L, f"2024-01-01 00:00:$i%02d", i.toDouble, i + 0.1),
        (10L + i, 2L, f"2024-01-01 00:00:$i%02d", 2.0 * i, 2.0 * i + 0.1))
    }
    val out = Features.marketBeta(ticks(rows: _*))
      .as[(Long, Option[Double], Long)].collect().toSeq
    // mkt = 1.5, 3.0, 4.5 (exact after round); cov/var = 1/1.5, 2/1.5
    assert(out == Seq(
      (1L, Some(0.6667), 3L), (2L, Some(1.3333), 3L)))
  }

  test("realizedVol sums squared intraday log returns per (symbol, day); " +
      "overnight gaps never cross days") {
    val rows = Seq(
      (1L, 1L, "2024-01-01 10:00:01", 100.0, 100.1),
      (2L, 1L, "2024-01-01 10:00:02", 110.0, 110.1), // r = ln(1.1)
      (3L, 1L, "2024-01-01 10:00:03", 99.0, 99.1),   // r = ln(0.9)
      (4L, 1L, "2024-01-02 10:00:01", 500.0, 500.1)) // new day: no return
    val out = Features.realizedVol(ticks(rows: _*))
      .as[(Long, String, Option[Double], Long)].collect().toSeq
    val expected = math.pow(math.log(1.1), 2) + math.pow(math.log(0.9), 2)
    assert(out.map(r => (r._1, r._2, r._4)) == Seq(
      (1L, "2024-01-01", 2L), (1L, "2024-01-02", 0L)))
    assert(math.abs(out.head._3.get - expected) < 1e-3)
    assert(out(1)._3.isEmpty) // zero returns → NULL vol, not 0.0
  }

  test("autocorr(1) is +1 on a linear ramp, -1 on an alternating " +
      "series, with the first k ticks pairless") {
    val ramp = (1 to 6).map(i =>
      (i.toLong, 1L, f"2024-01-01 00:00:$i%02d", i.toDouble, i + 0.1))
    val alt = (1 to 6).map(i =>
      (10L + i, 2L, f"2024-01-01 00:00:$i%02d",
        if (i % 2 == 0) 1.0 else -1.0, 0.1))
    val out = Features.autocorr(ticks((ramp ++ alt): _*), 1)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1.0, 5L)))   // perfectly linear → corr +1
    assert(out(2L) == ((-1.0, 5L)))  // alternating → corr -1
  }

  test("ewma folds (x+e)/2 in (ts, tick_id) order per (symbol, day), " +
      "independent of input row order") {
    val rows = Seq(
      (1L, 1L, "2024-01-01 00:00:01", 10.0, 10.1),
      (2L, 1L, "2024-01-01 00:00:02", 20.0, 20.1),
      (3L, 1L, "2024-01-01 00:00:03", 40.0, 40.1),
      (4L, 1L, "2024-01-02 00:00:01", 7.0, 7.1), // next day: fresh fold
      (5L, 2L, "2024-01-01 00:00:01", 1.0, 1.1),
      (6L, 2L, "2024-01-01 00:00:01", 3.0, 3.1)) // same ts: tick_id order
    // sym1 day1: e1=10, e2=(20+10)/2=15, e3=(40+15)/2=27.5
    val expected = Map(
      (1L, "2024-01-01") -> ((3L, 27.5)),
      (1L, "2024-01-02") -> ((1L, 7.0)),
      (2L, "2024-01-01") -> ((2L, (3.0 + 1.0) / 2)))
    Seq(rows, rows.reverse).foreach { order =>
      val out = Features.ewma(ticks(order: _*))
        .as[(Long, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      assert(out == expected)
    }
  }

  test("logReturns is null on first tick, ln(p1/p0) after") {
    val df = ticks(
      (1L, 1L, "2024-01-01 00:00:01", 100.0, 100.1),
      (2L, 1L, "2024-01-01 00:00:02", 110.0, 110.1))
    val out = Features.logReturns(df).select("log_ret").collect()
    assert(out(0).isNullAt(0))
    assert(math.abs(out(1).getDouble(0) - math.log(1.1)) < 1e-12)
  }

  test("zScoreAnomaly flags values beyond the threshold") {
    val vals = (1 to 20).map(_.toDouble) :+ 1000.0
    val df = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, t("2024-01-01 00:00:01"), v, v + 0.1)
    }.toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = Features.zScoreAnomaly(df, 3.0)
    assert(out.filter(col("is_anomaly")).count() == 1)
  }

  test("anomalyThresholds reproduces percentile/count logic of test.py") {
    val df = (1 to 100).map(v => (v.toLong, v.toDouble)).toDF("id", "score")
    val out = Features.anomalyThresholds(df, "score", Seq(92.0, 99.5))
      .as[(Double, Double, Long)].collect().toSeq
    // percentile(1..100, .92) = 1 + 0.92*99 = 92.08 -> 8 above
    assert(out.head == (92.0, 92.08, 8L))
    assert(out(1)._3 == 1L) // only 100 > 99.505
  }

  test("resampleWindow picks linspace-truncated positions like model.py") {
    // 10 ticks resampled to 4 -> np.linspace(0,9,4).astype(int) = 0,3,6,9
    val rows = (0 until 10).map(i =>
      (i.toLong, 1L, t("2024-01-01 00:00:01"), i * 10.0, i * 10.0 + 0.1))
    val df = rows.toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = Features.resampleWindow(df, 4).select("src_rn").as[Int].collect().toSeq
    assert(out == Seq(1, 4, 7, 10))
  }

  test("resampleWindow duplicates rows when group smaller than target") {
    val df = ticks(
      (1L, 1L, "2024-01-01 00:00:01", 1.0, 1.1),
      (2L, 1L, "2024-01-01 00:00:02", 2.0, 2.1))
    val out = Features.resampleWindow(df, 4).select("src_rn").as[Int].collect().toSeq
    assert(out.length == 4 && out.head == 1 && out.last == 2)
  }

  test("chronoSplit uses int-truncation boundaries like model.py") {
    // 7 days: int(7*.6)=4 train, int(7*.2)=1 val, rest test
    val rows = (1 to 7).map(i =>
      (i.toLong, 1L, t(f"2024-01-$i%02d 00:00:01"), 1.0, 1.1))
    val df = rows.toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = Features.chronoSplit(df, 0.6, 0.2).select("split").as[String].collect()
    assert(out.count(_ == "train") == 4)
    assert(out.count(_ == "val") == 1)
    assert(out.count(_ == "test") == 2)
  }

  test("standardScale uses train-only statistics") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 1000.0)).toDF("id", "v")
    val out = Features.standardScale(df, "v", "id", col("id") <= 2)
      .as[(Long, Double)].collect().toMap
    // train stats: mu=15, sigma=sqrt(50)
    assert(math.abs(out(1L) - (10.0 - 15.0) / math.sqrt(50.0)) < 1e-3)
  }

  test("constant/degenerate series scale to NULL, never an ANSI " +
      "divide-by-zero crash") {
    // symbol 1: constant bid (max=min, sigma=0); symbol 2: varies
    val df = ticks(
      (1L, 1L, "2024-01-01 00:00:00", 5.0, 5.1),
      (2L, 1L, "2024-01-01 00:00:01", 5.0, 5.1),
      (3L, 2L, "2024-01-01 00:00:00", 1.0, 1.1),
      (4L, 2L, "2024-01-01 00:00:01", 3.0, 3.1))
    val mm = Features.minMaxScale(df)
      .select("tick_id", "bid_scaled")
      .as[(Long, Option[Double])].collect().toMap
    assert(mm(1L).isEmpty && mm(2L).isEmpty)
    assert(mm(3L).contains(0.0) && mm(4L).contains(1.0))
    val zs = Features.zScoreAnomaly(df, 3.0)
      .select("tick_id", "zscore")
      .as[(Long, Option[Double])].collect().toMap
    assert(zs(1L).isEmpty && zs(2L).isEmpty && zs(3L).isDefined)
    // constant train slice -> sigma 0 -> every scaled value NULL
    val ss = Features.standardScale(
      df.filter($"symbol" === 1L), "bid", "tick_id", lit(true))
      .select("scaled").as[Option[Double]].collect()
    assert(ss.forall(_.isEmpty))
    // zero-priced series: drawdown NULL at cummax=0
    val dd = Features.drawdown(ticks(
      (1L, 3L, "2024-01-01 00:00:00", 0.0, 0.1),
      (2L, 3L, "2024-01-01 00:00:01", 2.0, 2.1)))
      .select("tick_id", "drawdown")
      .as[(Long, Option[Double])].collect().toMap
    assert(dd(1L).isEmpty && dd(2L).contains(0.0))
  }

  test("walkForward emits rolling train/test folds") {
    val rows = (1 to 12).map(i =>
      (i.toLong, 1L, t(f"2024-01-$i%02d 00:00:01"), 1.0, 1.1))
    val df = rows.toDF("tick_id", "symbol", "ts", "bid", "ask")
    val out = Features.walkForward(df, 2, 3, 5, 2)
      .as[(Long, String, String)].collect()
    val f0 = out.filter(_._1 == 0L)
    assert(f0.count(_._3 == "train") == 5 && f0.count(_._3 == "test") == 2)
    val f1train = out.filter(r => r._1 == 1L && r._3 == "train").map(_._2)
    assert(f1train.head == "2024-01-04") // fold 1 starts at day 4
  }

  test("tripleBarrier: first barrier hit wins, timeout labels 0, " +
      "truncated-horizon tail entries are dropped") {
    // entryEvery=2 → entries at idx 1, 3, 5, ...; horizon=3; ±2000 bp.
    // prices (cents): 1000, 1000, 1250, 1000, 790, 1000, 1000, 1000
    //   entry idx1 (1000): up needs ≥1200, dn ≤800. idx3=1000, idx2=1000?
    val df = ticks(
      (1L, 1L, "2024-01-01 00:00:01", 10.00, 10.1),
      (2L, 1L, "2024-01-01 00:00:02", 10.00, 10.1),
      (3L, 1L, "2024-01-01 00:00:03", 12.50, 12.6), // +25% from 10.00
      (4L, 1L, "2024-01-01 00:00:04", 10.00, 10.1),
      (5L, 1L, "2024-01-01 00:00:05", 7.90, 8.0),  // −21% from 10.00
      (6L, 1L, "2024-01-01 00:00:06", 10.00, 10.1),
      (7L, 1L, "2024-01-01 00:00:07", 10.00, 10.1),
      (8L, 1L, "2024-01-01 00:00:08", 10.00, 10.1))
    val out = Features.tripleBarrier(df, 2, 3, 2000L)
      .select("e_idx", "label", "up_idx", "dn_idx", "n_lookahead")
      .as[(Long, Int, Option[Long], Option[Long], Long)].collect().toSeq
    // idx1 entry: lookahead idx 2..4 — up hit at idx3 (1250 ≥ 1200) → +1
    // idx3 entry (1250): lookahead 4..6 — dn needs ≤1000: idx4=1000 → −1
    // idx5 entry (790): lookahead 6..8 — up needs ≥948: idx6=1000 → +1
    // idx7 entry (1000): lookahead idx8 only — no hit → 0, n_lookahead=1
    assert(out == Seq(
      (1L, 1, Some(3L), None, 3L),
      (3L, -1, None, Some(4L), 3L),
      (5L, 1, Some(6L), None, 3L),
      (7L, 0, None, None, 1L)))
  }

  test("tripleBarrier: both-hit race resolved by FIRST index; entry " +
      "with empty lookahead vanishes") {
    // up hit late (idx4), dn hit early (idx3) → label −1 even though
    // the up excursion is larger.
    val df = ticks(
      (1L, 7L, "2024-01-01 00:00:01", 10.00, 10.1),
      (2L, 7L, "2024-01-01 00:00:02", 10.00, 10.1),
      (3L, 7L, "2024-01-01 00:00:03", 7.00, 7.1),
      (4L, 7L, "2024-01-01 00:00:04", 14.00, 14.1))
    val out = Features.tripleBarrier(df, 4, 10, 2000L)
      .select("e_idx", "label").as[(Long, Int)].collect().toSeq
    // single entry at idx1; dn at idx3 precedes up at idx4
    assert(out == Seq((1L, -1)))
    // entry stride hitting the LAST tick produces no labeled row
    val tail = Features.tripleBarrier(
      ticks((1L, 9L, "2024-01-01 00:00:01", 10.0, 10.1)), 1, 5, 2000L)
    assert(tail.count() == 0L)
  }

  test("tripleBarrier matches a straight-line per-symbol reference " +
      "scan on a deterministic multi-symbol feed") {
    val rows = for {
      sym <- 1L to 3L
      i <- 1L to 60L
    } yield {
      val c = 1000 + ((i * 137 + sym * 59) % 400) - 200 // 800..1199
      (sym * 1000 + i, sym, f"2024-01-01 00:${(i / 60) % 60}%02d:${i % 60}%02d",
        c / 100.0, c / 100.0 + 0.1)
    }
    val (n, h, bp) = (7, 12, 900L)
    val df = ticks(rows: _*)
    val got = Features.tripleBarrier(df, n, h, bp)
      .select("symbol", "e_idx", "label")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    // reference: brute-force scan per symbol in plain Scala
    val bySym = rows.groupBy(_._2).view.mapValues(_.sortBy(_._1)).toMap
    val want = (for {
      (sym, ts) <- bySym.toSeq
      cents = ts.map(r => math.round(r._4 * 100))
      eIdx <- cents.indices.filter(i => (i + 1) % n == 1 % n)
      future = cents.slice(eIdx + 1, eIdx + 1 + h)
      if future.nonEmpty
    } yield {
      val ec = cents(eIdx)
      val up = future.indexWhere(c => c * 10000L >= ec * (10000L + bp))
      val dn = future.indexWhere(c => c * 10000L <= ec * (10000L - bp))
      val label =
        if (up >= 0 && (dn < 0 || up < dn)) 1
        else if (dn >= 0 && (up < 0 || dn < up)) -1 else 0
      (sym, (eIdx + 1).toLong, label)
    }).sorted
    assert(got == want)
  }

  test("shockRecovery: a reverting jump reports its recovery tick, " +
      "a permanent move reports NULL, quiet ticks never flag, and " +
      "the tail shock stays auditable via n_lookahead") {
    // symbol 1 cents: 100, 150 (shock +50%), 140, 105 (recovers at
    // +2 — within 10% of pre=100), then quiet; symbol 1 second
    // shock at the very tail: 105 -> 160 with NO lookahead left...
    // actually give it one lookahead row that does NOT recover.
    val df = ticks(
      (1L, 1L, "2024-01-01 10:00:01", 1.00, 1.01),
      (2L, 1L, "2024-01-01 10:00:02", 1.50, 1.51), // shock, pre=100
      (3L, 1L, "2024-01-01 10:00:03", 1.40, 1.41),
      (4L, 1L, "2024-01-01 10:00:04", 1.05, 1.06), // recovers shock 2
      (5L, 1L, "2024-01-01 10:00:05", 1.60, 1.61), // shock, pre=105
      (6L, 1L, "2024-01-01 10:00:06", 1.58, 1.59), // no recovery
      // symbol 2: drifts gently, never shocks
      (7L, 2L, "2024-01-01 10:00:01", 2.00, 2.01),
      (8L, 2L, "2024-01-01 10:00:02", 2.02, 2.03))
    val out = Features.shockRecovery(df, 3000L, 1000L, 40)
      .as[(Long, Long, Long, Long, Long, Option[Long], Boolean, Long)]
      .collect().toSeq
    assert(out == Seq(
      // shock at tick 2: pre 100, move 5000 bp, recovers 2 ticks on
      // (idx 4: |105-100| = 5% <= 10%), 4 lookahead rows exist
      (1L, 2L, 100L, 150L, 5000L, Some(2L), true, 4L),
      // shock at tick 5: pre 105, |160-105|*1e4/105 = 5238 bp,
      // lookahead sees ONE row (158: |158-105|=50% > 10%) — no
      // recovery, auditable truncation
      (1L, 5L, 105L, 160L, 5238L, None, false, 1L)))
  }

  test("windowTensors: linspace downsample, ffill pad, single-tick " +
      "window, train-fit scaler — hand-derived k=4 case") {
    // One symbol, three MORNING session windows (07:5x):
    //   A (01-01): 6 ticks, cents 100..105  -> downsample
    //   B (01-02): 3 ticks, cents 200,210,220 -> pad
    //   C (01-03): 1 tick, cents 300          -> constant
    // Split over 3 windows: train = int(3*0.6) = 1 (A), val =
    // int(3*0.2) = 0, so B and C are test.
    def w(id: Long, day: Int, sec: Int, bid: Double) =
      (id, 1L, f"2024-01-0$day 07:50:$sec%02d", bid, 9.9)
    val rows =
      (0 until 6).map(i => w(i + 1, 1, i, 1.00 + i * 0.01)) ++
        Seq(w(11, 2, 0, 2.00), w(12, 2, 1, 2.10), w(13, 2, 2, 2.20)) ++
        Seq(w(21, 3, 0, 3.00))
    val out = Features.windowTensors(ticks(rows: _*), 4)
      .collect().map(r => (r.getAs[String]("date"),
        (r.getAs[String]("split"), r.getAs[Long]("n_ticks"),
          r.getSeq[Double](r.fieldIndex("tensor")))))
      .toMap
    // slot maps: n=6>k: i*(5) div 3 -> ranks 1,2,4,6; n=3<k:
    // ((i+1)*2-1) div 3 -> ranks 1,2,2,3; n=1: all rank 1.
    val aSlots = Seq(100, 101, 103, 105)
    // train scaler = population stats of A's SLOT values
    val mu = aSlots.sum / 4.0
    val sd = math.sqrt(aSlots.map(c => c.toDouble * c).sum / 4.0 - mu * mu)
    def q(x: Double): Double =
      (if (x >= 0) math.floor(x * 1000000.0 + 0.5)
       else -math.floor(-x * 1000000.0 + 0.5)) / 1000000.0
    def sc(c: Int): Double = q((c - mu) / sd)
    assert(out("2024-01-01") ==
      (("train", 6L, aSlots.map(sc))))
    assert(out("2024-01-02") ==
      (("test", 3L, Seq(200, 210, 210, 220).map(sc))))
    assert(out("2024-01-03") ==
      (("test", 1L, Seq(300, 300, 300, 300).map(sc))))
  }

  test("windowTensorRows: the scalar per-slot frame carries exactly " +
      "the array export's elements, keyed by slot index") {
    def w(id: Long, day: Int, sec: Int, bid: Double) =
      (id, 1L, f"2024-01-0$day 07:50:$sec%02d", bid, 9.9)
    val rows =
      (0 until 6).map(i => w(i + 1, 1, i, 1.00 + i * 0.01)) ++
        Seq(w(11, 2, 0, 2.00), w(12, 2, 1, 2.10), w(13, 2, 2, 2.20)) ++
        Seq(w(21, 3, 0, 3.00))
    val df = ticks(rows: _*)
    val fromArrays = Features.windowTensors(df, 4).collect().flatMap { r =>
      r.getSeq[Double](r.fieldIndex("tensor")).zipWithIndex.map {
        case (el, i) =>
          (r.getAs[String]("date"), r.getAs[String]("win"),
            r.getAs[String]("split"), r.getAs[Long]("n_ticks"),
            i, el)
      }
    }.toSet
    val scalarRows = Features.windowTensorRows(df, 4).collect().map { r =>
      (r.getAs[String]("date"), r.getAs[String]("win"),
        r.getAs[String]("split"), r.getAs[Long]("n_ticks"),
        r.getAs[Int]("i"), r.getAs[Double]("el"))
    }.toSet
    assert(scalarRows == fromArrays && scalarRows.size == 12)
  }

  test("purgedWalkForward: the purge tail leaves each train window, " +
      "the embargo band follows each test window, every excluded day " +
      "is an auditable row") {
    // 12 days, folds=2 step=3 train=6 test=2 purge=2 embargo=1:
    //  fold 0 (start rn 1): train 1-4, purged 5-6, test 7-8, embargo 9
    //  fold 1 (start rn 4): train 4-7, purged 8-9, test 10-11, emb. 12
    val rows = (1 to 12).map(d =>
      (d.toLong, 1L, f"2024-01-$d%02d 10:00:00", 1.0, 9.9))
    val out = Features.purgedWalkForward(ticks(rows: _*),
        folds = 2, step = 3, trainLen = 6, testLen = 2,
        purge = 2, embargo = 1)
      .collect()
      .map(r => (r.getAs[Long]("fold"), r.getAs[String]("date")) ->
        r.getAs[String]("role")).toMap
    def d(i: Int) = f"2024-01-$i%02d"
    assert(out((0L, d(4))) == "train" && out((0L, d(5))) == "purged")
    assert(out((0L, d(6))) == "purged" && out((0L, d(7))) == "test")
    assert(out((0L, d(9))) == "embargo" && !out.contains((0L, d(10))))
    assert(out((1L, d(7))) == "train" && out((1L, d(8))) == "purged")
    assert(out((1L, d(10))) == "test" && out((1L, d(12))) == "embargo")
    // role census: per fold 4 train + 2 purged + 2 test + 1 embargo
    assert(out.size == 18)
    assert(out.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map("train" -> 8, "purged" -> 4, "test" -> 4, "embargo" -> 2))
  }

  test("psiDrift: a level shift between train and test slices prices " +
      "the hand-computed smoothed PSI; out-of-range test values clamp " +
      "into the edge bucket") {
    // 3 days -> train d1, test d2-d3 (val empty). B = 2 buckets over
    // the TRAIN range [100, 199]. Train cents 100,100,199 -> (2,1);
    // test cents 250,250 clamp to bucket 1 -> (0,2). Smoothed
    // p=(3/5,2/5), q=(1/4,3/4).
    val rows = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 1.00, 9.9),
      (2L, 1L, "2024-01-01 11:00:00", 1.00, 9.9),
      (3L, 1L, "2024-01-01 12:00:00", 1.99, 9.9),
      (4L, 1L, "2024-01-02 10:00:00", 2.50, 9.9),
      (5L, 1L, "2024-01-03 10:00:00", 2.50, 9.9))
    val out = Features.psiDrift(ticks(rows: _*), buckets = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_train") == 3L && r.getAs[Long]("n_test") == 2L)
    val expected0 = (0.6 - 0.25) * math.log(12.0 / 5.0)
    val expectedPsi = expected0 + (0.4 - 0.75) * math.log(8.0 / 15.0)
    def q6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    assert(r.getAs[Double]("psi") == q6(expectedPsi))
  }

  test("volAdaptiveBarrier: yesterday's exact rv sets today's cent " +
      "barrier; warm-up-day entries drop") {
    // Day 1: cents 100,110,105 -> diffs 10,-5 -> rv = 125 ->
    // bc = floor(2*sqrt(125)+0.5) = 22. Day 2 (entryEvery=2, H=2):
    // the only odd-idx tick is idx 5 (c=125); lookahead {idx 6,
    // c=70}: 70 <= 125-22 -> down barrier, label -1. Day-1 entries
    // (idx 1, 3) have no prior rv and must not appear.
    val rows = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 1.00, 9.9),
      (2L, 1L, "2024-01-01 11:00:00", 1.10, 9.9),
      (3L, 1L, "2024-01-01 12:00:00", 1.05, 9.9),
      (4L, 1L, "2024-01-02 10:00:00", 1.00, 9.9),
      (5L, 1L, "2024-01-02 11:00:00", 1.25, 9.9),
      (6L, 1L, "2024-01-02 12:00:00", 0.70, 9.9))
    val out = Features.volAdaptiveBarrier(ticks(rows: _*),
      entryEvery = 2, horizon = 2, volMult = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("e_idx") == 5L && r.getAs[Long]("bc") == 22L)
    assert(r.getAs[Long]("dn_idx") == 6L && r.isNullAt(r.fieldIndex("up_idx")))
    assert(r.getAs[Long]("n_lookahead") == 1L &&
      r.getAs[Int]("label") == -1)
  }

  test("combinatorialCv: every C(N,2) pair appears, test groups are " +
      "the pair, purge bands hug each test block, the rest trains") {
    // 8 days, 4 groups of 2, purge 1 -> C(4,2) = 6 combos x 8 days.
    val rows = (1 to 8).map(d =>
      (d.toLong, 1L, f"2024-01-0$d 10:00:00", 1.0, 9.9))
    val out = Features.combinatorialCv(ticks(rows: _*), 4, 1)
      .collect()
      .map(r => (r.getAs[Long]("combo_id"), r.getAs[String]("date")) ->
        r.getAs[String]("role")).toMap
    assert(out.size == 48)
    assert(out.keys.map(_._1).toSet ==
      Set(1L, 2L, 3L, 6L, 7L, 11L)) // a*4+b for a<b
    // combo (0,2) = id 2: test days 1-2 and 5-6; purge 3 (after blk 0)
    // and 4, 7 (around blk 2); train: day 8 only.
    def d(i: Int) = f"2024-01-0$i"
    val c = (1 to 8).map(i => out((2L, d(i))))
    assert(c == Seq("test", "test", "purged", "purged", "test", "test",
      "purged", "train"))
    // combo (2,3) = id 11: blocks 5-6 and 7-8 test; purge day 4;
    // train days 1-3.
    val c2 = (1 to 8).map(i => out((11L, d(i))))
    assert(c2 == Seq("train", "train", "train", "purged", "test",
      "test", "test", "test"))
  }

  test("fracDiff: (1-B)^d weights match the binomial recursion and " +
      "the K-lag combination is exact on a hand case") {
    // d = 0.5, K = 2: w = [1, -0.5, -0.125]
    val w = Features.fracDiffWeights(0.5, 2)
    assert(w.toSeq == Seq(1.0, -0.5, -0.125))
    // cents 100,100,100,400: only idx 3 and 4 emit;
    //   idx 3: 100*(1-0.5-0.125) = 37.5
    //   idx 4: 400 - 0.5*100 - 0.125*100 = 337.5
    val rows = Seq(1.00, 1.00, 1.00, 4.00).zipWithIndex.map {
      case (p, i) => (i.toLong + 1, 1L, f"2024-01-01 00:00:0${i + 1}", p, 9.9)
    }
    val out = Features.fracDiff(ticks(rows: _*), 0.5, 2)
      .collect().map(r => r.getAs[Long]("tick_id") ->
        r.getAs[Double]("ffd")).toMap
    assert(out == Map(3L -> 37.5, 4L -> 337.5))
  }

  test("labelUniqueness: overlapping spans dilute the weight by the " +
      "exact concurrency; the tape's final entry carries no row") {
    // 4 ticks, entry every tick, horizon 2. Spans: e1 -> {2,3},
    // e2 -> {3,4}, e3 -> {4}, e4 -> empty (dropped).
    // Concurrency: c2 = 1 (e1), c3 = 2 (e1, e2), c4 = 2 (e2, e3).
    // u(e1) = (1 + 1/2)/2 = 0.75; u(e2) = (1/2 + 1/2)/2 = 0.5;
    // u(e3) = (1/2)/1 = 0.5.
    val rows = (1 to 4).map(i =>
      (i.toLong, 1L, f"2024-01-01 00:00:0$i", 1.0, 9.9))
    val out = Features.labelUniqueness(ticks(rows: _*), 1, 2)
      .collect()
      .map(r => r.getAs[Long]("e_idx") ->
        ((r.getAs[Long]("n_span"), r.getAs[Double]("uniqueness"))))
      .toMap
    assert(out == Map(1L -> ((2L, 0.75)), 2L -> ((2L, 0.5)),
      3L -> ((1L, 0.5))))
  }

  test("anomalyPipeline: identical windows score zero against the " +
      "train centroid; the one deviant TEST window is the only flag") {
    // 10 identical morning windows (days 1-9 share the tick shape);
    // day 10's second tick spikes. Split: train d1-6, val d7-8, test
    // d9-10. Centroid = the shared shape, so every err is 0 except
    // day 10's, and the per-symbol p99 over the two test errors
    // interpolates BELOW the spike — exactly one flag.
    val rows = (1 to 10).flatMap { d =>
      (0 to 3).map { i =>
        val bid = if (d == 10 && i == 1) 5.00 else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid, 9.9)
      }
    }
    val out = Features.anomalyPipeline(ticks(rows: _*), 4).collect()
      .map(r => (r.getAs[String]("date"), r.getAs[String]("split"),
        r.getAs[Double]("err"), r.getAs[Boolean]("is_anomaly")))
    assert(out.length == 10)
    val flagged = out.filter(_._4)
    assert(flagged.map(_._1).toSeq == Seq("2024-01-10"))
    assert(flagged.head._2 == "test" && flagged.head._3 > 0)
    out.filterNot(_._1 == "2024-01-10").foreach { w =>
      assert(w._3 == 0.0, s"non-deviant window scored ${w._3}")
    }
  }

  test("elmRecon: the Spark plan's per-window errors equal an " +
      "independent straight-line Scala mirror of the ELM recipe " +
      "(same dyadic weights, Gram ints, Cholesky, substitution), " +
      "and only the deviant TEST window flags") {
    val k = 4
    val rows = (1 to 10).flatMap { d =>
      (0 to 3).map { i =>
        val bid = if (d == 10 && i == 1) 5.00 else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid, 9.9)
      }
    }
    val df = ticks(rows: _*)
    // ---- mirror: plain-Scala re-derivation off the shared slot frame
    val slots = Features.windowSlots(df, k, 0.6, 0.2).collect()
      .map(r => (r.getAs[String]("date"), r.getAs[String]("win"),
        r.getAs[String]("split"), r.getAs[Int]("i"), r.getAs[Long]("u")))
    val wins = slots.groupBy(t => (t._1, t._2, t._3)).map { case (key, g) =>
      key -> g.sortBy(_._4).map(_._5).toArray
    }
    def zOf(j: Int, s: Array[Long]): Double = {
      var acc = Features.elmBInt(j) / 1024.0
      (0 until k).foreach { i =>
        acc += (Features.elmWInt(j, i, k) / 4096.0) * (s(i).toDouble / 1e6)
      }
      acc
    }
    def vOf(z: Double): Long =
      if (z >= 0) math.floor((z / (1.0 + z)) * 1e6 + 0.5).toLong
      else -math.floor(((-z) / (1.0 - z)) * 1e6 + 0.5).toLong
    val hidden = wins.map { case (key, s) =>
      key -> (1 to 3).map(j => vOf(zOf(j, s))).toArray
    }
    val tr = hidden.filter(_._1._3 == "train").values.toSeq
    val nTr = tr.size
    def gsum(f: Array[Long] => Long): Long = tr.map(f).sum
    val lam = Features.ElmLambda
    val a11 = gsum(v => v(0) * v(0)).toDouble / 1e12 + lam
    val a21 = gsum(v => v(1) * v(0)).toDouble / 1e12
    val a22 = gsum(v => v(1) * v(1)).toDouble / 1e12 + lam
    val a31 = gsum(v => v(2) * v(0)).toDouble / 1e12
    val a32 = gsum(v => v(2) * v(1)).toDouble / 1e12
    val a33 = gsum(v => v(2) * v(2)).toDouble / 1e12 + lam
    val a41 = gsum(_(0)).toDouble / 1e6
    val a42 = gsum(_(1)).toDouble / 1e6
    val a43 = gsum(_(2)).toDouble / 1e6
    val a44 = nTr.toDouble + lam
    val l11 = math.sqrt(a11)
    val l21 = a21 / l11; val l31 = a31 / l11; val l41 = a41 / l11
    val l22 = math.sqrt(a22 - l21 * l21)
    val l32 = (a32 - l31 * l21) / l22; val l42 = (a42 - l41 * l21) / l22
    val l33 = math.sqrt(a33 - l31 * l31 - l32 * l32)
    val l43 = (a43 - l41 * l31 - l42 * l32) / l33
    val l44 = math.sqrt(a44 - l41 * l41 - l42 * l42 - l43 * l43)
    // per-slot rhs over train (window, slot) pairs
    val trainSlots = slots.filter(_._3 == "train")
    val beta = (0 until k).map { i =>
      val rowsI = trainSlots.filter(_._4 == i).map { t =>
        (hidden((t._1, t._2, t._3)), t._5)
      }
      val r1 = rowsI.map { case (v, u) => v(0) * u }.sum.toDouble / 1e12
      val r2 = rowsI.map { case (v, u) => v(1) * u }.sum.toDouble / 1e12
      val r3 = rowsI.map { case (v, u) => v(2) * u }.sum.toDouble / 1e12
      val r4 = rowsI.map(_._2).sum.toDouble / 1e6
      val y1 = r1 / l11
      val y2 = (r2 - l21 * y1) / l22
      val y3 = (r3 - l31 * y1 - l32 * y2) / l33
      val y4 = (r4 - l41 * y1 - l42 * y2 - l43 * y3) / l44
      val b4 = y4 / l44
      val b3 = (y3 - l43 * b4) / l33
      val b2 = (y2 - l32 * b3 - l42 * b4) / l22
      val b1 = (y1 - l21 * b2 - l31 * b3 - l41 * b4) / l11
      i -> (b1, b2, b3, b4)
    }.toMap
    val expected = wins.map { case (key, s) =>
      val v = hidden(key)
      val tq = (0 until k).map { i =>
        val (b1, b2, b3, b4) = beta(i)
        val xh = b1 * (v(0).toDouble / 1e6) + b2 * (v(1).toDouble / 1e6) +
          b3 * (v(2).toDouble / 1e6) + b4
        val d = s(i).toDouble / 1e6 - xh
        math.floor(d * d * 1e6 + 0.5).toLong
      }.sum
      key -> tq / k
    }
    // ---- the Spark plan
    val out = Features.elmRecon(df, k).collect()
      .map(r => (r.getAs[String]("date"), r.getAs[String]("win"),
        r.getAs[String]("split")) ->
        ((r.getAs[Long]("err_ppm"), r.getAs[Boolean]("is_anomaly"))))
      .toMap
    assert(out.size == 10)
    expected.foreach { case (key, e) =>
      assert(out(key)._1 == e,
        s"window $key: spark ${out(key)._1} vs mirror $e")
    }
    // ridge fit over 6 identical train windows reconstructs the
    // shared shape almost exactly; the day-10 spike dominates
    val flagged = out.filter(_._2._2).keys.toSeq
    assert(flagged == Seq(("2024-01-10", "morning", "test")))
    assert(out(("2024-01-05", "morning", "train"))._1 <
      out(("2024-01-10", "morning", "test"))._1)
  }

  test("anomalySignalBacktest: flag enters against the deviation, " +
      "recovery exits, P&L in exact cents — hand-derived") {
    // 11 morning windows: d1-6 train, d7-8 val, d9-11 test. All share
    // the shape 100..103 cents except d10 (tick 1 spikes to 500 ->
    // the only flag; last slot 103 > train mean -> SHORT) and d11
    // (90..93 -> small error, recovers below exitFrac*qu -> exit).
    // P&L: enter short at d10 close 103, exit at d11 close 93 ->
    // pos_prev(-1)*(93-103) = +10 cents.
    val rows = (1 to 11).flatMap { d =>
      (0 to 3).map { i =>
        val bid =
          if (d == 10 && i == 1) 5.00
          else if (d == 11) 0.90 + i * 0.01
          else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid, 9.9)
      }
    }
    val out = Features.anomalySignalBacktest(ticks(rows: _*), 4)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_windows") == 3L)
    assert(r.getAs[Long]("n_trades") == 1L)
    assert(r.getAs[Long]("windows_in_pos") == 1L)
    assert(r.getAs[Long]("pnl_cents") == 10L)
  }

  test("backtestReport: win/loss steps, hit rate, max equity-curve " +
      "drawdown — winning and losing symbols hand-derived") {
    // symbol 1: the D76 corpus with d11 RISING (110..113) instead of
    // recovering down — the short LOSES 10 cents (d11's moderate error
    // recovers below exitFrac·qu, exits after the loss). Equity curve
    // 0, 0, -10 -> running peak 0 -> max drawdown 10.
    // symbol 2: the original winning corpus (d11 drops to 90..93) ->
    // +10 cents, curve 0, 0, +10 -> never under water, drawdown 0.
    val rows = (1 to 11).flatMap { d =>
      (0 to 3).flatMap { i =>
        val bid1 =
          if (d == 10 && i == 1) 5.00
          else if (d == 11) 1.10 + i * 0.01
          else 1.00 + i * 0.01
        val bid2 =
          if (d == 10 && i == 1) 5.00
          else if (d == 11) 0.90 + i * 0.01
          else 1.00 + i * 0.01
        Seq((d * 100L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid1, 9.9),
          (d * 100L + 50 + i, 2L, f"2024-01-$d%02d 07:51:0$i", bid2, 9.9))
      }
    }
    val out = Features.backtestReport(ticks(rows: _*), 4).collect()
      .map(r => r.getAs[Long]("symbol") -> r).toMap
    assert(out.size == 2)
    val s1 = out(1L)
    assert(s1.getAs[Long]("n_windows") == 3L)
    assert(s1.getAs[Long]("n_trades") == 1L)
    assert(s1.getAs[Long]("n_win_steps") == 0L)
    assert(s1.getAs[Long]("n_loss_steps") == 1L)
    assert(s1.getAs[Long]("pnl_cents") == -10L)
    assert(s1.getAs[Long]("max_dd_cents") == 10L)
    assert(s1.getAs[Double]("hit_rate") == 0.0)
    val s2 = out(2L)
    assert(s2.getAs[Long]("n_win_steps") == 1L)
    assert(s2.getAs[Long]("n_loss_steps") == 0L)
    assert(s2.getAs[Long]("pnl_cents") == 10L)
    assert(s2.getAs[Long]("max_dd_cents") == 0L)
    assert(s2.getAs[Double]("hit_rate") == 1.0)
  }

  test("stalenessReport: consecutive breaches cluster into runs, the " +
      "Nth window of a long run dates the retrain alert; clean " +
      "symbols report zeros with NULL alert") {
    // symbol 1: 9 morning windows — d1-d5 train the shape, d6-d7
    // drift hard (err ~80), d8 recovers, d9 drifts mildly (err ~20).
    // qu = p99 of the test errors (d7-d9: ~80, 0, ~20) interpolates
    // just below 80 -> only d6-d7 breach: ONE run of length 2, and
    // with consecutive=2 the alert lands on d7.
    // symbol 2: never drifts -> zero runs, NULL alert date.
    def bump(d: Int): Double =
      if (d == 6 || d == 7) 0.10 else if (d == 9) 0.05 else 0.0
    val rows = (1 to 9).flatMap { d =>
      (0 to 3).flatMap { i =>
        Seq((d * 100L + i, 1L, f"2024-01-$d%02d 07:51:0$i",
            1.00 + bump(d) + i * 0.01, 9.9),
          (d * 100L + 50 + i, 2L, f"2024-01-$d%02d 07:51:0$i",
            1.00 + i * 0.01, 9.9))
      }
    }
    val out = Features.stalenessReport(ticks(rows: _*), 4,
        consecutive = 2).collect()
      .map(r => r.getAs[Long]("symbol") -> r).toMap
    assert(out.size == 2)
    val s1 = out(1L)
    assert(s1.getAs[Long]("n_windows") == 9L)
    assert(s1.getAs[Long]("n_breach_w") == 2L)
    assert(s1.getAs[Long]("n_runs") == 1L)
    assert(s1.getAs[Long]("longest_run") == 2L)
    assert(s1.getAs[Long]("n_alerts") == 1L)
    assert(s1.getAs[String]("first_alert_date") == "2024-01-07")
    val s2 = out(2L)
    assert(s2.getAs[Long]("n_windows") == 9L)
    assert(s2.getAs[Long]("n_breach_w") == 0L)
    assert(s2.getAs[Long]("n_runs") == 0L)
    assert(s2.getAs[Long]("longest_run") == 0L)
    assert(s2.getAs[Long]("n_alerts") == 0L)
    assert(s2.isNullAt(s2.fieldIndex("first_alert_date")))
  }

  test("modelParams: centroid/scaler/threshold manifest mirrors the " +
      "trained pipeline exactly; untrained symbols absent") {
    // symbol 1: the D76 corpus — 6 identical train shapes, so the
    // centroid IS the quantized scaled shape and the scaler is the
    // population stats of 100..103 cents. symbol 2: ONE window (its
    // split is 'test' — no train rows) -> absent from the manifest.
    val rows = (1 to 11).flatMap { d =>
      (0 to 3).map { i =>
        val bid =
          if (d == 10 && i == 1) 5.00
          else if (d == 11) 0.90 + i * 0.01
          else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid, 9.9)
      }
    } ++ (0 to 3).map { i =>
      (900L + i, 2L, f"2024-01-01 07:51:0$i", 1.00 + i * 0.01, 9.9)
    }
    val out = Features.modelParams(ticks(rows: _*), 4).collect()
    assert(out.map(_.getAs[Long]("symbol")).distinct.toSeq == Seq(1L))
    assert(out.length == 4)
    val mu = (100 + 101 + 102 + 103) / 4.0
    val sd = math.sqrt(
      Seq(100, 101, 102, 103).map(c => c.toDouble * c).sum / 4.0 - mu * mu)
    def q(x: Double): Long =
      if (x >= 0) math.floor(x * 1e6 + 0.5).toLong
      else -math.floor(-x * 1e6 + 0.5).toLong
    out.sortBy(_.getAs[Int]("i")).zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("mu") == mu)
      assert(r.getAs[Double]("sd") == sd)
      assert(r.getAs[Double]("centroid_u") ==
        q((100.0 + i - mu) / sd).toDouble)
      assert(r.getAs[Long]("n_train_w") == 6L)
      assert(r.getAs[Long]("n_test_w") == 3L)
      assert(!r.isNullAt(r.fieldIndex("qu")))
    }
  }

  test("latencySensitivity: one-window-late execution forfeits the " +
      "single-step reversion profit — decay in exact cents") {
    // The winning D76 corpus: short entered at d10, price reverts at
    // d11 (+10 paper). Executed one window late the position is still
    // flat over (d10, d11] -> delayed P&L 0, decay 10 — the whole
    // edge is the immediacy.
    val rows = (1 to 11).flatMap { d =>
      (0 to 3).map { i =>
        val bid =
          if (d == 10 && i == 1) 5.00
          else if (d == 11) 0.90 + i * 0.01
          else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid, 9.9)
      }
    }
    val out = Features.latencySensitivity(ticks(rows: _*), 4).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_windows") == 3L)
    assert(r.getAs[Long]("pnl_cents") == 10L)
    assert(r.getAs[Long]("pnl_delayed_cents") == 0L)
    assert(r.getAs[Long]("decay_cents") == 10L)
  }

  test("signalSweep: a looser threshold flags the recovery window " +
      "and flips the position; the tight threshold exits — per-pct " +
      "machine rows hand-derived") {
    // errs over the three test windows sort [0, ~80, huge]. qu(0.25)
    // interpolates below the d11 error -> d11 FLAGS (last slot below
    // the trained mean -> LONG, flipping the short: 2 trades, 2
    // windows in position). qu(0.99) sits near the spike -> d11
    // recovers and exits (1 trade). Both keep the +10 reversion step.
    val rows = (1 to 11).flatMap { d =>
      (0 to 3).map { i =>
        val bid =
          if (d == 10 && i == 1) 5.00
          else if (d == 11) 0.90 + i * 0.01
          else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid, 9.9)
      }
    }
    val out = Features.signalSweep(ticks(rows: _*), 4, Seq(0.25, 0.99))
      .collect().map(r => r.getAs[String]("pct") -> r).toMap
    assert(out.size == 2)
    val loose = out("0.25")
    assert(loose.getAs[Long]("n_windows") == 3L)
    assert(loose.getAs[Long]("n_trades") == 2L)
    assert(loose.getAs[Long]("windows_in_pos") == 2L)
    assert(loose.getAs[Long]("n_symbols_pos") == 1L)
    assert(loose.getAs[Long]("pnl_cents") == 10L)
    val tight = out("0.99")
    assert(tight.getAs[Long]("n_trades") == 1L)
    assert(tight.getAs[Long]("windows_in_pos") == 1L)
    assert(tight.getAs[Long]("pnl_cents") == 10L)
  }

  test("bookReport: offsetting symbols net to a flat book curve; " +
      "extremes tie-break deterministic") {
    // The backtestReport corpus: symbol 1 shorts d10 and LOSES 10 at
    // d11 (price rises), symbol 2 shorts d10 and WINS 10 (price
    // drops). Book steps (d9, d10, d11) net to 0, 0, 0 — the equity
    // curve is flat and the book drawdown is ZERO even though symbol
    // 1 alone draws down 10 (the offset a per-symbol report hides).
    val rows = (1 to 11).flatMap { d =>
      (0 to 3).flatMap { i =>
        val bid1 =
          if (d == 10 && i == 1) 5.00
          else if (d == 11) 1.10 + i * 0.01
          else 1.00 + i * 0.01
        val bid2 =
          if (d == 10 && i == 1) 5.00
          else if (d == 11) 0.90 + i * 0.01
          else 1.00 + i * 0.01
        Seq((d * 100L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid1, 9.9),
          (d * 100L + 50 + i, 2L, f"2024-01-$d%02d 07:51:0$i", bid2, 9.9))
      }
    }
    val out = Features.bookReport(ticks(rows: _*), 4).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_steps") == 3L)
    assert(r.getAs[Long]("n_symbols") == 2L)
    assert(r.getAs[Long]("pnl_cents") == 0L)
    assert(r.getAs[Long]("max_dd_cents") == 0L)
    assert(r.getAs[Long]("best_symbol") == 2L)
    assert(r.getAs[Long]("best_pnl_cents") == 10L)
    assert(r.getAs[Long]("worst_symbol") == 1L)
    assert(r.getAs[Long]("worst_pnl_cents") == -10L)
  }

  test("walkForwardRetrain: expanding-origin re-fit per fold, " +
      "out-of-sample scoring, fold-train threshold flags; exhausted " +
      "symbols drop per fold — mirror-derived") {
    // symbol 1: four morning windows — d1-d3 share the shape 100..103
    // cents, d4 jumps to 200..203. folds 0/1 train and eval inside
    // the identical shapes (zero error, zero flags); fold 2 trains on
    // d1-d3 and meets d4 out-of-sample (large error, flagged against
    // the fold's qu=0 train threshold).
    // symbol 2: ONE window — never has an eval window, in no fold.
    val rows = (1 to 4).flatMap { d =>
      (0 to 3).map { i =>
        val bid = if (d == 4) 2.00 + i * 0.01 else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-0$d%d 07:51:0$i", bid, 9.9)
      }
    } ++ (0 to 3).map { i =>
      (90L + i, 2L, f"2024-01-01 07:51:0$i", 1.00 + i * 0.01, 9.9)
    }
    val out = Features.walkForwardRetrain(ticks(rows: _*), 4,
        folds = 3, minTrain = 1, step = 1).collect()
      .map(r => r.getAs[Long]("fold") -> r).toMap
    assert(out.size == 3 && out.values.forall(_.getAs[Long]("symbol") == 1L))
    // folds 0/1: eval window identical to the trained shape
    Seq(0L, 1L).foreach { f =>
      assert(out(f).getAs[Long]("n_train_w") == f + 1)
      assert(out(f).getAs[Long]("n_eval_w") == 1L)
      assert(out(f).getAs[Double]("mean_err") == 0.0)
      assert(out(f).getAs[Long]("n_flagged") == 0L)
    }
    // fold 2: mirror the slot arithmetic — scaler from the 12
    // identical train cells, centroid = the shared train shape,
    // eval error = mean squared scaled deviation of 200..203
    val cents = Seq(100L, 101L, 102L, 103L)
    val n = 12.0
    val mu = cents.map(_.toDouble).sum * 3 / n
    val sd = math.sqrt(cents.map(c => c.toDouble * c).sum * 3 / n - mu * mu)
    def q(x: Double): Long =
      if (x >= 0) math.floor(x * 1e6 + 0.5).toLong
      else -math.floor(-x * 1e6 + 0.5).toLong
    val e0 = (0 to 3).map { i =>
      val uTr = q((100.0 + i - mu) / sd)
      val uEv = q((200.0 + i - mu) / sd)
      val d = uEv.toDouble - uTr.toDouble
      d * d / 1e6 / 1e6
    }.sum
    val uErr = math.floor(e0 / 4 * 1e6 + 0.5).toLong
    val f2 = out(2L)
    assert(f2.getAs[Long]("n_train_w") == 3L)
    assert(f2.getAs[Long]("n_eval_w") == 1L)
    assert(f2.getAs[Double]("mean_err") == uErr.toDouble / 1e6)
    assert(f2.getAs[Long]("n_flagged") == 1L)
  }

  test("windowTensors: symbol with zero-variance train stats scales " +
      "flat to 0.0") {
    val rows = Seq(
      (1L, 7L, "2024-01-01 07:51:00", 5.00, 9.9),
      (2L, 7L, "2024-01-01 07:52:00", 5.00, 9.9),
      (3L, 7L, "2024-01-02 13:55:00", 6.00, 9.9))
    val out = Features.windowTensors(ticks(rows: _*), 4).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getSeq[Double](r.fieldIndex("tensor")) == Seq(0.0, 0.0, 0.0, 0.0))
    }
  }

  test("gdAutoencoder: the distributed GD loop equals an independent " +
      "straight-line Scala mirror (same dyadic init, quantized " +
      "gradient ints, IEEE update/loss chains) — loss descends, only " +
      "the deviant TEST window flags") {
    val k = 4; val h = 2; val epochs = 3; val lr = 0.0625
    val rows = (1 to 10).flatMap { d =>
      (0 to 3).map { i =>
        val bid = if (d == 10 && i == 1) 5.00 else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid, 9.9)
      }
    }
    val df = ticks(rows: _*)
    // ---- mirror: plain-Scala GD off the shared slot frame
    val slots = Features.windowSlots(df, k, 0.6, 0.2).collect()
      .map(r => (r.getAs[String]("date"), r.getAs[String]("win"),
        r.getAs[String]("split"), r.getAs[Int]("i"), r.getAs[Long]("u")))
    val wins = slots.groupBy(t => (t._1, t._2, t._3)).map { case (key, g) =>
      key -> g.sortBy(_._4).map(_._5).toArray
    }
    val we = Array.tabulate(h, k)((j, i) => Features.gdWe0(j, i, k))
    val wd = Array.tabulate(k, h)((i, j) => Features.gdWd0(i, j, h))
    def q(x: Double): Long =
      if (x >= 0) math.floor(x * 1e6 + 0.5).toLong
      else -math.floor(-x * 1e6 + 0.5).toLong
    // forward pass with CURRENT weights — left-assoc chains, the
    // gdZExpr/gdXhExpr/gdRExpr/gdEExpr op order exactly
    def fwd(s: Array[Long])
        : (Array[Double], Array[Double], Array[Double]) = {
      val x = Array.tabulate(k)(i => s(i).toDouble / 1e6)
      val z = Array.tabulate(h) { j =>
        var acc = we(j)(0) * x(0)
        (1 until k).foreach(i => acc += we(j)(i) * x(i)); acc
      }
      val r = Array.tabulate(k) { i =>
        var acc = wd(i)(0) * z(0)
        (1 until h).foreach(j => acc += wd(i)(j) * z(j))
        acc - x(i)
      }
      (x, z, r)
    }
    val trainWins = wins.filter(_._1._3 == "train").values.toSeq
    val n = trainWins.size.toLong
    val mirrorLoss = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until epochs).foreach { _ =>
      val gd = Array.ofDim[Long](k, h)
      val ge = Array.ofDim[Long](h, k)
      var sl = 0L
      trainWins.foreach { s =>
        val (x, z, r) = fwd(s)
        val eb = Array.tabulate(h) { j =>
          var acc = wd(0)(j) * r(0)
          (1 until k).foreach(i => acc += wd(i)(j) * r(i)); acc
        }
        for (i <- 0 until k; j <- 0 until h) gd(i)(j) += q(r(i) * z(j))
        for (j <- 0 until h; i <- 0 until k) ge(j)(i) += q(eb(j) * x(i))
        (0 until k).foreach(i =>
          sl += math.floor(r(i) * r(i) * 1e6 + 0.5).toLong)
      }
      mirrorLoss += Features.gdLoss(sl, n, k)
      for (j <- 0 until h; i <- 0 until k)
        we(j)(i) = Features.gdStep(we(j)(i), ge(j)(i), lr, n)
      for (i <- 0 until k; j <- 0 until h)
        wd(i)(j) = Features.gdStep(wd(i)(j), gd(i)(j), lr, n)
    }
    // final scoring with the trained weights
    val errPpm = wins.map { case (key, s) =>
      val (_, _, r) = fwd(s)
      key -> (0 until k).map(i =>
        math.floor(r(i) * r(i) * 1e6 + 0.5).toLong).sum / k
    }
    val slFinal = wins.toSeq.filter(_._1._3 == "train").map { case (key, s) =>
      val (_, _, r) = fwd(s)
      (0 until k).map(i => math.floor(r(i) * r(i) * 1e6 + 0.5).toLong).sum
    }.sum
    mirrorLoss += Features.gdLoss(slFinal, n, k)
    // ---- the Spark operator
    val out = Features.gdAutoencoder(df, k, h, epochs, lr).collect()
    val lossOut = out.filter(_.getAs[String]("kind") == "loss")
      .map(r => r.getAs[String]("a") -> r.getAs[Double]("value")).toMap
    assert(lossOut.size == epochs + 1)
    (0 to epochs).foreach { e =>
      assert(lossOut(f"e$e%02d") == mirrorLoss(e),
        s"epoch $e loss: spark ${lossOut(f"e$e%02d")} vs ${mirrorLoss(e)}")
    }
    // GD on the standardized tensors must actually DESCEND
    (1 to epochs).foreach(e => assert(mirrorLoss(e) < mirrorLoss(e - 1),
      s"loss did not descend at epoch $e: $mirrorLoss"))
    val weOut = out.filter(_.getAs[String]("kind") == "we")
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        r.getAs[Double]("value")).toMap
    val wdOut = out.filter(_.getAs[String]("kind") == "wd")
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        r.getAs[Double]("value")).toMap
    for (j <- 0 until h; i <- 0 until k) {
      assert(weOut((s"j$j", f"i$i%02d")) == we(j)(i))
      assert(wdOut((f"i$i%02d", s"j$j")) == wd(i)(j))
    }
    // only the deviant day-10 TEST window clears the p99 threshold
    val flags = out.filter(_.getAs[String]("kind") == "flag")
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
    assert(flags.toSeq == Seq(("2024-01-10", "morning")))
    assert(errPpm(("2024-01-10", "morning", "test")) >
      errPpm(("2024-01-05", "morning", "train")))
  }

  test("gdValCurve: per-epoch train/val losses equal the straight-line " +
      "mirror at the post-update weights; the monotone-improving tape " +
      "picks the last epoch as best and never early-stops") {
    val k = 4; val h = 2; val epochs = 3; val lr = 0.0625
    // 10 morning windows: train d1-6, val d7-8, test d9-10 (d10 spikes)
    val rows = (1 to 10).flatMap { d =>
      (0 to 3).map { i =>
        val bid = if (d == 10 && i == 1) 5.00 else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid, 9.9)
      }
    }
    val df = ticks(rows: _*)
    // ---- mirror: the gdAutoencoder spec's GD loop, additionally
    // pricing train AND val losses at each post-update weight state
    val slots = Features.windowSlots(df, k, 0.6, 0.2).collect()
      .map(r => (r.getAs[String]("date"), r.getAs[String]("win"),
        r.getAs[String]("split"), r.getAs[Int]("i"), r.getAs[Long]("u")))
    val wins = slots.groupBy(t => (t._1, t._2, t._3)).map { case (key, g) =>
      key -> g.sortBy(_._4).map(_._5).toArray
    }
    val we = Array.tabulate(h, k)((j, i) => Features.gdWe0(j, i, k))
    val wd = Array.tabulate(k, h)((i, j) => Features.gdWd0(i, j, h))
    def q(x: Double): Long =
      if (x >= 0) math.floor(x * 1e6 + 0.5).toLong
      else -math.floor(-x * 1e6 + 0.5).toLong
    def fwd(s: Array[Long])
        : (Array[Double], Array[Double], Array[Double]) = {
      val x = Array.tabulate(k)(i => s(i).toDouble / 1e6)
      val z = Array.tabulate(h) { j =>
        var acc = we(j)(0) * x(0)
        (1 until k).foreach(i => acc += we(j)(i) * x(i)); acc
      }
      val r = Array.tabulate(k) { i =>
        var acc = wd(i)(0) * z(0)
        (1 until h).foreach(j => acc += wd(i)(j) * z(j))
        acc - x(i)
      }
      (x, z, r)
    }
    def lossOf(split: String, n: Long): Double = {
      val sl = wins.toSeq.filter(_._1._3 == split).map { case (_, s) =>
        val (_, _, r) = fwd(s)
        (0 until k).map(i =>
          math.floor(r(i) * r(i) * 1e6 + 0.5).toLong).sum
      }.sum
      Features.gdLoss(sl, n, k)
    }
    val trainWins = wins.filter(_._1._3 == "train").values.toSeq
    val nT = trainWins.size.toLong
    val nV = wins.count(_._1._3 == "val").toLong
    assert(nV == 2L) // the tape must actually exercise the val branch
    val mirrorTl = scala.collection.mutable.ArrayBuffer.empty[Double]
    val mirrorVl = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until epochs).foreach { _ =>
      val gd = Array.ofDim[Long](k, h)
      val ge = Array.ofDim[Long](h, k)
      trainWins.foreach { s =>
        val (x, z, r) = fwd(s)
        val eb = Array.tabulate(h) { j =>
          var acc = wd(0)(j) * r(0)
          (1 until k).foreach(i => acc += wd(i)(j) * r(i)); acc
        }
        for (i <- 0 until k; j <- 0 until h) gd(i)(j) += q(r(i) * z(j))
        for (j <- 0 until h; i <- 0 until k) ge(j)(i) += q(eb(j) * x(i))
      }
      for (j <- 0 until h; i <- 0 until k)
        we(j)(i) = Features.gdStep(we(j)(i), ge(j)(i), lr, nT)
      for (i <- 0 until k; j <- 0 until h)
        wd(i)(j) = Features.gdStep(wd(i)(j), gd(i)(j), lr, nT)
      // losses AT the post-update weights (the curve's convention)
      mirrorTl += lossOf("train", nT)
      mirrorVl += lossOf("val", nV)
    }
    // ---- the operator
    val out = Features.gdValCurve(df, k, h, epochs, lr, patience = 2)
      .collect()
      .map(r => r.getAs[Int]("epoch") ->
        ((r.getAs[Double]("train_loss"), r.getAs[Double]("val_loss"),
          r.getAs[Boolean]("is_best"), r.getAs[Int]("stop_epoch"))))
      .toMap
    assert(out.size == epochs)
    (1 to epochs).foreach { e =>
      assert(out(e)._1 == mirrorTl(e - 1),
        s"epoch $e train: ${out(e)._1} vs ${mirrorTl(e - 1)}")
      assert(out(e)._2 == mirrorVl(e - 1),
        s"epoch $e val: ${out(e)._2} vs ${mirrorVl(e - 1)}")
    }
    // identical train/val shapes -> val loss descends with train:
    // best = last epoch, no early stop
    (2 to epochs).foreach(e => assert(mirrorVl(e - 1) < mirrorVl(e - 2)))
    assert(out.filter(_._2._3).keys.toSeq == Seq(epochs))
    assert(out.values.forall(_._4 == epochs))
  }

  test("gdEarlyStop: the verdict pair on crafted series — degrade " +
      "fires patience and best is what the stopped training KEPT; " +
      "plateau (exact tie) is not an improvement; val-less never " +
      "stops; recovery inside patience resets the counter") {
    import Features.gdEarlyStop
    def s(vs: Double*): IndexedSeq[Option[Double]] =
      vs.map(v => if (v.isNaN) None else Some(v)).toIndexedSeq
    // degrading after epoch 1, patience 2 -> stop at 3; the stopped
    // training keeps epoch 1's weights even though epoch 4 would
    // have been lower — it never ran
    assert(gdEarlyStop(s(1.0, 1.2, 1.3, 0.9), 2) == ((Some(1), 3)))
    // plateau: an exact tie is NOT an improvement (strict <)
    assert(gdEarlyStop(s(1.0, 1.0, 1.0), 2) == ((Some(1), 3)))
    // recovery at epoch 3 resets the counter; patience never fires
    assert(gdEarlyStop(s(1.0, 1.1, 0.8, 0.9), 2) == ((Some(3), 4)))
    // monotone improvement: best last, stop = length
    assert(gdEarlyStop(s(3.0, 2.0, 1.0), 1) == ((Some(3), 3)))
    // val-less: no best, never stops
    assert(gdEarlyStop(IndexedSeq(None, None, None), 1) == ((None, 3)))
    // gaps: missing epochs neither improve nor advance the last-imp
    // marker, but the COUNTER still runs on the epoch axis
    assert(gdEarlyStop(s(1.0, Double.NaN, Double.NaN), 2) ==
      ((Some(1), 3)))
  }

  test("gdAutoencoder: duplicating every train window leaves the " +
      "weight trajectory and loss curve EXACTLY unchanged — the " +
      "hand-provable full-batch linear case (gradient sums and " +
      "window count both double; the IEEE update chain cancels the " +
      "factor bit-for-bit)") {
    val k = 4
    def shape(p: Int, i: Int): Double = 1.00 + i * 0.01 + (p % 3) * 0.004
    // tape A: 5 distinct daily shapes (train = days 1-3)
    val a = (1 to 5).flatMap { d =>
      (0 to 3).map(i =>
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", shape(d, i), 9.9))
    }
    // tape B: each shape on TWO consecutive days (train = days 1-6 =
    // A's train duplicated; the scaler's mu/sd are ratios of doubled
    // sums and counts, so they too are bit-identical)
    val b = (1 to 10).flatMap { d =>
      val p = (d + 1) / 2
      (0 to 3).map(i =>
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", shape(p, i), 9.9))
    }
    def model(rows: Seq[(Long, Long, String, Double, Double)])
        : (Map[String, Double], Map[(String, String, String), Double]) = {
      val out = Features.gdAutoencoder(ticks(rows: _*), k).collect()
      (out.filter(_.getAs[String]("kind") == "loss")
        .map(r => r.getAs[String]("a") -> r.getAs[Double]("value"))
        .toMap,
        out.filter(r => r.getAs[String]("kind") == "we" ||
            r.getAs[String]("kind") == "wd")
          .map(r => (r.getAs[String]("kind"), r.getAs[String]("a"),
            r.getAs[String]("b")) -> r.getAs[Double]("value")).toMap)
    }
    val (lossA, wA) = model(a)
    val (lossB, wB) = model(b)
    assert(lossA == lossB)
    assert(wA == wB)
    assert(lossA.nonEmpty && wA.size == 2 * 2 * k)
  }
}
