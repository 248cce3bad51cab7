package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tick-cleaning operators — the distributed re-expression of the
  * reference's session-window cleaner and statistics scripts.
  *
  * The reference processes one symbol folder at a time on the driver
  * (ref: `Data Preprocessing and Cleaning/spark_session_window_tick_cleaner.py:98-184`);
  * here every operator is a single declarative plan over ALL symbols at
  * once — one shuffle keyed by symbol (or (symbol, window)) regardless
  * of symbol count, which is what survives a 1000-executor scale-up.
  *
  * Determinism: window orderings use `tick_id` (unique, monotone with
  * ingest order) as the final key, never the raw nanosecond timestamp
  * (SURVEY §6).
  */
object TickOps {

  /** Morning/afternoon session windows from the reference
    * (ref: `spark_session_window_tick_cleaner.py:141-144`,
    * `symbol_statistics_generate.py:30-31`): 07:50–08:00, 13:50–14:00.
    */
  val MorningH = 7; val AfternoonH = 13; val FromMin = 50

  private def inSessionWindow(ts: org.apache.spark.sql.Column) = {
    val h = hour(ts); val m = minute(ts)
    ((h === MorningH) || (h === AfternoonH)) && (m >= FromMin)
  }

  /** B1 — keep only ticks inside the two daily session windows.
    * Pure filter → pushed into the parquet scan by Catalyst.
    * (ref: spark_session_window_tick_cleaner.py:141-144) */
  def sessionWindowFilter(ticks: DataFrame): DataFrame =
    ticks.filter(inSessionWindow(col("ts")))
      .select(col("tick_id"), col("symbol"),
        date_trunc("second", col("ts")).as("ts_s"),
        col("bid"), col("ask"))
      .orderBy("symbol", "tick_id")

  /** B2 — 1-second downsample: first tick per (symbol, second), where
    * "first" = lowest tick_id (the reference takes the first non-null
    * within the truncated second, ref: cleaner.py:150-161). `min_by`
    * keeps this a single hash aggregation — no window, no sort of the
    * full data, partial agg on the map side.
    */
  def secondDownsample(ticks: DataFrame): DataFrame =
    ticks
      .filter(inSessionWindow(col("ts")))
      .groupBy(col("symbol"), date_trunc("second", col("ts")).as("ts_s"))
      .agg(
        min("tick_id").as("tick_id"),
        min_by(col("bid"), col("tick_id")).as("bid"),
        min_by(col("ask"), col("tick_id")).as("ask"))
      .orderBy("symbol", "ts_s")

  /** B3 — daily tick counts per session window. The reference runs two
    * filtered aggregations and outer-joins them with zero-fill
    * (ref: `symbol_statistics_generate.py:70-81`) — two scans + a
    * shuffle join. Here: ONE scan, conditional aggregation, zero-fill
    * free (count of an always-false filter is 0). SURVEY §5.
    */
  def dailyWindowCounts(ticks: DataFrame): DataFrame = {
    val h = hour(col("ts")); val m = minute(col("ts"))
    val w1 = (h === MorningH) && (m >= FromMin)
    val w2 = (h === AfternoonH) && (m >= FromMin)
    ticks.filter(w1 || w2)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date"))
      .agg(
        count(when(w1, 1)).as("ticks_window1"),
        count(when(w2, 1)).as("ticks_window2"))
      .orderBy("date")
  }

  /** B4 — forward-fill nulls per symbol in ingest order, the
    * distributed version of pandas `ffill` feature cleaning
    * (ref: `ML Model/Scripts/model.py:227-229`). Missing values are
    * synthesized deterministically (bid < threshold → null) so the
    * operator has something to fill on the synthetic data; the fill
    * itself is `last(ignoreNulls)` over a running window — one shuffle
    * by symbol, linear scan within partitions.
    */
  def forwardFill(ticks: DataFrame, missingBelow: Double): DataFrame = {
    val raw = when(col("bid") < missingBelow, lit(null)).otherwise(col("bid"))
    val w = Window.partitionBy("symbol").orderBy("tick_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ticks
      .withColumn("bid_raw", raw)
      .withColumn("bid_filled", last("bid_raw", ignoreNulls = true).over(w))
      .select(col("tick_id"), col("symbol"),
        col("bid_raw"), col("bid_filled"))
      .orderBy("symbol", "tick_id")
  }

  /** B5 — tick dedup: keep the earliest tick per (symbol, minute) —
    * the reference achieves uniqueness by cross-file ordering + first()
    * (ref: cleaner.py:59-88,150-161); here a window row_number with a
    * deterministic tie-break. */
  def tickDedup(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"), col("ts_m")).orderBy("tick_id")
    ticks
      .withColumn("ts_m", date_trunc("minute", col("ts")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("tick_id"), col("symbol"), col("ts_m"),
        col("bid"))
      .orderBy("symbol", "ts_m")
  }

  /** B7 — OHLC candlestick bars per (symbol, time bucket): the
    * canonical tick→bar aggregation (open/close via `min_by`/`max_by`
    * on the deterministic tick order — single hash aggregate, no
    * window, map-side partial agg). Open/high/low/close are PICKED
    * values → emitted unrounded (SURVEY §6).
    */
  def ohlcBars(ticks: DataFrame, bucket: String): DataFrame =
    ticks
      .groupBy(col("symbol"), date_trunc(bucket, col("ts")).as("bar_ts"))
      .agg(
        min_by(col("bid"), col("tick_id")).as("open"),
        max(col("bid")).as("high"),
        min(col("bid")).as("low"),
        max_by(col("bid"), col("tick_id")).as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy("symbol", "bar_ts")

  /** B8 — VWAP per (symbol, day): volume-weighted average price with
    * the weight pulled from the JSON props payload (`$.k`). One
    * grouped aggregate; the ratio of two sums is rounded (aggregate-
    * derived, SURVEY §6).
    *
    * The JSON parse is projected ONCE in a narrow select below the
    * groupBy: aggregate input expressions are not reliably CSE'd, so
    * inlining `get_json_object` into `sum(cents*k)`, `nullif(sum(k),0)`
    * and `sum(k)` ran the parse up to 3× per row (measured 8.3 s vs
    * ~1 s for the same parse in jsonExtractStats). */
  def vwap(events: DataFrame): DataFrame = {
    // prices are 2-decimal: accumulate exact integer cents so the sum
    // is order-independent (a double sum differs across engines in the
    // last ulp and flips round-4 boundaries; this data hits them)
    // Group on a DATE-typed key: to_date is integer day arithmetic,
    // while date_format runs a per-row formatter — measured ~4.7 s vs
    // ~0.7 s for the same scan+parse shape at sf0.1. The display
    // string is emitted once per GROUP in the final projection.
    val parsed = events.select(
      col("user_id").as("symbol"),
      to_date(col("ts")).as("_date"),
      get_json_object(col("props"), "$.k").cast("int").as("k"),
      round(col("value") * 100.0, 0).cast("long").as("cents"))
    // round-to-4-decimals in INTEGER space: vwap = S/(100·K); its e4
    // value is (S·200 + K) div (2K) — half-up for non-negative sums.
    // Engines disagree on rounding binary doubles that sit exactly on
    // .xxxx5 — integer arithmetic cannot. Cross-engine note: Spark's
    // `div` and DuckDB's integer `//` BOTH truncate toward zero
    // (probed: -7//2 = -3 in DuckDB), so negative sums (refund rows)
    // stay parity-exact too; their rounding convention is then
    // half-toward-zero, a documented property of this formula, not a
    // divergence.
    parsed
      .groupBy("symbol", "_date")
      .agg(
        sum(col("cents") * col("k")).as("_n"),
        nullif(sum(col("k")), lit(0)).as("_d"),
        sum(col("k")).as("total_qty"),
        count(lit(1)).as("n_trades"))
      .withColumn("vwap",
        expr("(_n * 200 + _d) div (_d * 2)").cast("double") / 10000.0)
      .withColumn("date", date_format(col("_date"), "yyyy-MM-dd"))
      .select("symbol", "date", "vwap", "total_qty", "n_trades")
      .orderBy("symbol", "date")
  }

  /** B6 — broker timezone shift (+2h), ref: `ML Model/Scripts/data_loader.py:50`. */
  def shiftTz(ticks: DataFrame, hours: Int): DataFrame =
    ticks.select(
      col("tick_id"), col("symbol"),
      date_trunc("second", col("ts") + expr(s"INTERVAL $hours HOURS")).as("ts_shifted"),
      hour(col("ts") + expr(s"INTERVAL $hours HOURS")).as("hour_shifted"))
      .orderBy("tick_id")

  /** B9 — TICK-RULE classification per symbol: count upticks,
    * downticks and zero-ticks against the previous bid (the
    * Lee–Ready-family direction heuristic microstructure stats are
    * built on), plus the net signed flow (up − down). One window lag
    * (shuffle by symbol, in-partition sort by tick_id) feeding one
    * conditional aggregation on the same exchange; the first tick of
    * each symbol is unclassified (NULL prev — not counted, like D16's
    * pairless head). All counts exact ints. */
  def tickRule(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    ticks
      .withColumn("prev", lag(col("bid"), 1).over(w))
      .groupBy("symbol")
      .agg(
        sum(when(col("prev").isNotNull && col("bid") > col("prev"), 1L)
          .otherwise(0L)).as("n_up"),
        sum(when(col("prev").isNotNull && col("bid") < col("prev"), 1L)
          .otherwise(0L)).as("n_down"),
        sum(when(col("prev").isNotNull && col("bid") === col("prev"), 1L)
          .otherwise(0L)).as("n_zero"))
      .withColumn("net_flow", col("n_up") - col("n_down"))
      .orderBy("symbol")
  }

  /** B10 — QUOTE-BURST (stuffing) detection per symbol: seconds whose
    * tick rate exceeds the symbol's own `pct`-percentile rate — the
    * market-surveillance screen for quote stuffing / feed storms, and
    * the data-quality screen for duplicated feed replays (a burst
    * second in a gold table usually means an ingest bug, not a market
    * event). Shape: one (symbol, second) grid aggregate (B2's
    * exchange), a per-symbol percentile over the grid (symbol-count-
    * sized), joined back on its own grouping key — no extra exchange
    * (F35's join-back rule) and never a broadcast of anything
    * data-scale-sized. The threshold is an exact `percentile` ROUNDED
    * (4dp) before the strict compare — integer rates sit exactly on
    * interpolation knots, so comparing against the rounded value is
    * the only cross-engine-safe spelling (D18's rule); counts exact
    * int64. At 100 TB swap `percentile` for `approx_percentile` and
    * keep everything else (F14's documented trade). */
  def burstDetection(ticks: DataFrame, pct: Double): DataFrame = {
    val perSec = ticks
      .groupBy(col("symbol"), date_trunc("second", col("ts")).as("sec"))
      .agg(count(lit(1)).as("n"))
    val thr = perSec.groupBy("symbol")
      .agg(round(expr(s"percentile(n, $pct)"), 4).as("thr"))
    perSec.join(thr, "symbol")
      .groupBy("symbol", "thr")
      .agg(count(lit(1)).as("n_seconds"),
        sum(when(col("n") > col("thr"), 1L).otherwise(0L)).as("n_burst"),
        max(col("n")).as("max_rate"))
      .select("symbol", "n_seconds", "n_burst", "max_rate", "thr")
      .orderBy("symbol")
  }

  /** B11 — LATE-ARRIVAL AUDIT per symbol: how disordered is the feed,
    * in watermark terms — a tick is LATE iff its event time is more
    * than `delayUs` behind the maximum event time already seen on its
    * symbol (arrival order = tick_id, the file/ingest sequence). This
    * is exactly the row a Structured Streaming watermark of the same
    * delay would DROP, so the report doubles as the watermark-sizing
    * tool: pick the delay where n_late goes to zero and that is the
    * safe `withWatermark` setting for every G-block query. Streaming
    * twin: [[graft.streaming.Streaming.lateFlags]] (G17), decisions
    * identical when the stream replays in tick_id order (spec'd).
    *
    * `arrival` is the replay order to audit — `col("tick_id")` for
    * the feed's own order (degenerate 0-late on an already-sorted
    * feed), or a deterministic jittered order to BACKTEST a watermark
    * against simulated feed disorder before deploying it (the
    * registry query replays with ±10 min portable-hash jitter).
    *
    * Shape: ONE symbol exchange — the running max (1-preceding frame,
    * so a tick is never late against itself) and the aggregate share
    * it. All event times exact int64 epoch µs (ns→µs rule);
    * max/count/sums are order-free. First tick per symbol has no
    * predecessor → on time by definition. */
  def lateArrivalAudit(ticks: DataFrame, delayUs: Long,
                       arrival: Column): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(arrival, col("tick_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ticks
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("wm_us", max(col("us")).over(w))
      .withColumn("late",
        col("wm_us").isNotNull && col("us") < col("wm_us") - delayUs)
      .groupBy("symbol")
      .agg(
        count(lit(1)).as("n_ticks"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        max(when(col("wm_us").isNotNull && col("wm_us") - col("us") > 0,
          col("wm_us") - col("us")).otherwise(0L)).as("max_lateness_us"))
      .withColumn("late_ratio",
        col("n_late").cast("double") / col("n_ticks").cast("double"))
      .select("symbol", "n_ticks", "n_late", "max_lateness_us", "late_ratio")
      .orderBy("symbol")
  }

  /** B12 — SPIKE-TICK detection and repair: a tick whose price jumps
    * more than `thresholdBp` basis points away from BOTH neighbors —
    * in OPPOSITE directions — is a feed glitch, not a move (the
    * classic single-point outlier rule every tick cleaner applies
    * before stats; the reference's cleaner drops malformed rows at
    * ingest — `spark_session_window_tick_cleaner.py` — this is the
    * price-level completion of that screen). A genuine jump that
    * PERSISTS (both deltas same direction) is kept. The repaired
    * value for a spike is the neighbor MIDPOINT in exact cents (B8's
    * half-up integer formula); edge ticks (no lag or no lead) are
    * never spikes.
    *
    * Engine-exactness: the bp comparison is CROSS-MULTIPLIED into
    * pure int64 — `|Δ|·10⁴ > threshold·prev_cents` — so no ratio
    * double ever materializes (C23/C24's discipline); products stay
    * < 10¹⁴ for any real price. Shape: ONE symbol exchange carries
    * lag, lead and the emit sort. */
  def spikeRepair(ticks: DataFrame, thresholdBp: Long): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    ticks
      .withColumn("cents", round(col("bid") * 100.0, 0).cast("long"))
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .withColumn("next", lead(col("cents"), 1).over(w))
      .withColumn("is_spike",
        col("prev").isNotNull && col("next").isNotNull &&
          abs(col("cents") - col("prev")) * lit(10000L) >
            lit(thresholdBp) * col("prev") &&
          abs(col("cents") - col("next")) * lit(10000L) >
            lit(thresholdBp) * col("next") &&
          (col("cents") - col("prev")) * (col("cents") - col("next")) > 0L)
      .withColumn("repaired_cents",
        when(col("is_spike"), expr("(prev + next + 1) div 2"))
          .otherwise(col("cents")))
      .select("tick_id", "symbol", "cents", "is_spike", "repaired_cents")
      .orderBy("tick_id")
  }

  /** B13 — TWAP per (symbol, day): time-weighted average price, the
    * execution benchmark beside B8's volume-weighted one — a quote is
    * worth the TIME it stood, not the prints it got (the right
    * average for quote-driven series where B8's trade weights don't
    * exist). Holding convention: each tick holds from its ts to the
    * NEXT tick's ts within the day; the day's last tick has no
    * holding interval and carries no weight (documented — the
    * alternative, padding to midnight, weights a quote into hours
    * that may belong to a halted session).
    *
    * Engine-exactness: Σ(cents·dur_µs) and Σdur_µs are pure int64
    * (day-bounded: ≤ 5·10⁴ cents × 8.64·10¹⁰ µs ≈ 4·10¹⁵, no
    * overflow); `twap` reuses B8's half-up integer e4 formula
    * `(S·200 + D) div (2D)` so no double sum ever exists. Zero-
    * duration ticks (same-µs prints) carry zero weight on both
    * engines identically. Shape: one (symbol, day) exchange carries
    * the lead and the aggregate (B9's shape). */
  def twap(ticks: DataFrame): DataFrame = {
    // Window keyed on the _date ATTRIBUTE, not a fresh to_date(ts)
    // expression: semantically equal, but Catalyst does not unify the
    // expression with the groupBy attribute and plans a SECOND
    // exchange (audited: 2 → 1).
    val w = Window.partitionBy("symbol", "_date").orderBy("tick_id")
    ticks
      .withColumn("_date", to_date(col("ts")))
      .withColumn("cents", round(col("bid") * 100.0, 0).cast("long"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("dur", lead(col("us"), 1).over(w) - col("us"))
      .groupBy("symbol", "_date")
      .agg(
        sum(when(col("dur").isNotNull, col("cents") * col("dur"))
          .otherwise(0L)).as("_s"),
        nullif(sum(coalesce(col("dur"), lit(0L))), lit(0L)).as("_d"),
        count(col("dur")).as("n_weighted"))
      .withColumn("twap",
        expr("(_s * 200 + _d) div (_d * 2)").cast("double") / 10000.0)
      .select(col("symbol"),
        date_format(col("_date"), "yyyy-MM-dd").as("date"),
        col("twap"), col("n_weighted"))
      .orderBy("symbol", "date")
  }

  /** D61 — TIME-WEIGHTED QUOTED SPREAD per (symbol, day): each
    * quote's spread (ask − bid, exact integer cents) weighted by how
    * long that quote STOOD (µs to the next tick, B13's holding-
    * interval discipline) — the SEC-605-family quoted-liquidity
    * benchmark beside D37's trade-conditioned EFFECTIVE spread: the
    * effective/quoted RATIO is the price-improvement headline, and
    * the time weighting is what makes a flickering tight quote count
    * for the milliseconds it actually stood, not once per print.
    * The simple per-tick mean rides along — the gap between the two
    * IS the flicker bias.
    *
    * Shape: the TWAP plan — one (symbol, day) exchange shared by the
    * lead window and the aggregate. Exact int64 throughout
    * (spread_cents × µs ≪ 2⁶³ at any per-day tick count); the two
    * outputs are single IEEE divisions of exact-int sums, unrounded
    * (§6 element-wise rule). Each day's last quote has no holding
    * interval and drops from the weighted sum (NULL on a single-tick
    * day via the nullif guard), matching the batch TWAP rule. */
  def twQuotedSpread(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol", "_date").orderBy("tick_id")
    ticks
      .withColumn("_date", to_date(col("ts")))
      .withColumn("sp",
        round(col("ask") * 100.0, 0).cast("long") -
          round(col("bid") * 100.0, 0).cast("long"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("dur", lead(col("us"), 1).over(w) - col("us"))
      .groupBy("symbol", "_date")
      .agg(
        sum(when(col("dur").isNotNull, col("sp") * col("dur"))
          .otherwise(0L)).as("_s"),
        nullif(sum(coalesce(col("dur"), lit(0L))), lit(0L)).as("_d"),
        sum(col("sp")).as("_ss"),
        count(lit(1)).as("n_ticks"))
      .withColumn("twq_spread_cents",
        col("_s").cast("double") / col("_d").cast("double"))
      .withColumn("avg_spread_cents",
        col("_ss").cast("double") / col("n_ticks").cast("double"))
      .select(col("symbol"),
        date_format(col("_date"), "yyyy-MM-dd").as("date"),
        col("n_ticks"), col("twq_spread_cents"), col("avg_spread_cents"))
      .orderBy("symbol", "date")
  }
}
