package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering and anomaly-pipeline operators — the distributed
  * re-expression of the reference's pandas/PyTorch prep code
  * (ref: `ML Model/Scripts/model.py`, `test.py`).
  *
  * The reference materializes every symbol's history in driver memory
  * (pandas) before any of this runs; here each step is a Spark plan
  * whose only wide operation is a shuffle keyed by symbol (window
  * functions) or a scalar-aggregate broadcast (scaling, thresholds) —
  * both survive a 1000-executor scale-up.
  */
object Features {

  /** D1 — spread/mid features; spread clamped at 0 exactly like
    * `np.maximum(Ask - Bid, 0)` (ref: model.py:213). Narrow projection:
    * stays inside whole-stage codegen, no shuffle at all. */
  def tickFeatures(ticks: DataFrame): DataFrame =
    ticks.select(
      col("tick_id"), col("symbol"),
      greatest(col("ask") - col("bid"), lit(0.0)).as("spread"),
      ((col("bid") + col("ask")) / 2.0).as("mid"))
      .orderBy("tick_id")

  /** D2 — rolling mean/std of bid over the last `n` ticks per symbol.
    * One shuffle by symbol; running frame, no self-join. */
  def rollingStats(ticks: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("tick_id")
      .rowsBetween(-(n - 1), Window.currentRow)
    ticks.select(
      col("tick_id"), col("symbol"),
      round(avg("bid").over(w), 4).as("roll_avg"),
      round(stddev_samp(col("bid")).over(w), 4).as("roll_std"))
      .orderBy("symbol", "tick_id")
  }

  /** D3 — log returns per symbol (lag window). Defined only on the
    * function's true domain — BOTH prices strictly positive: a zero
    * previous price is an ANSI x/0 hazard, and a zero CURRENT price
    * is the cross-engine one — Spark's `log(0)` returns NULL while
    * DuckDB's `ln(0)` is a hard error, so the unguarded form dies in
    * the oracle the moment a zero-priced row appears (sf0.1 has six;
    * the sf0.01 gate never sees one — caught by the round-8 sf0.1
    * float-sensitive sweep). The first row's NULL lag already
    * propagates NULL. */
  def logReturns(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    val prev = lag("bid", 1).over(w)
    ticks.select(
      col("tick_id"), col("symbol"),
      when(prev > 0 && col("bid") > 0, log(col("bid") / prev))
        .as("log_ret"))
      .orderBy("symbol", "tick_id")
  }

  /** D4 — per-symbol z-score anomaly score, the streaming-friendly
    * analog of the autoencoder's reconstruction error
    * (ref: model.py:180-185): how far a tick sits from its symbol's
    * distribution. Per-symbol (μ, σ) come from a groupBy aggregate
    * broadcast-joined back (the [[standardScale]] shape) — NOT a
    * whole-partition window, which buffers every symbol's full tick
    * history in one task and hands a hot symbol's entire volume to a
    * single partition at scale. The stats side is one row per symbol
    * (bounded, broadcastable); the fact side stays a map-only join. */
  def zScoreAnomaly(ticks: DataFrame, threshold: Double): DataFrame = {
    val stats = ticks.groupBy("symbol").agg(
      avg("bid").as("_mu"), stddev_samp("bid").as("_sigma"))
    // σ=0 guard (constant symbol): ANSI x/0 throws; z and the flag
    // stay NULL for a series with no variance
    val z = when(col("_sigma") =!= 0, (col("bid") - col("_mu")) / col("_sigma"))
    ticks.join(broadcast(stats), Seq("symbol"))
      .select(
        col("tick_id"), col("symbol"),
        round(z, 4).as("zscore"),
        (abs(z) > threshold).as("is_anomaly"))
      .orderBy("symbol", "tick_id")
  }

  /** D5 — percentile thresholds + anomaly counts over a score column,
    * exactly the reference's test-phase logic: thresholds at the
    * configured percentiles, then count of scores above each
    * (ref: test.py:333-344; percentiles from `Model
    * Parameters/parameters.json` → [92, 99.5]).
    *
    * Two scalar aggregates broadcast-joined back — no per-row shuffle.
    * At 100 TB the exact `percentile` becomes `percentile_approx`
    * (same plan shape); exact is kept here for oracle parity.
    */
  def anomalyThresholds(df: DataFrame, scoreCol: String,
                        pcts: Seq[Double]): DataFrame = {
    val score = col(scoreCol)
    val aggs = pcts.zipWithIndex.map { case (p, i) =>
      expr(s"percentile($scoreCol, ${p / 100.0})").as(s"t$i")
    }
    val thr = df.agg(aggs.head, aggs.tail: _*)
    // ONE aggregation over the broadcast-joined data computes every
    // n_above; stack() reshapes the single row to one row per
    // percentile (an agg pass per percentile would re-scan the full
    // table k times — a full-table read each at 100 TB).
    val countAggs = pcts.indices.map(i =>
      count(when(score > col(s"t$i"), 1)).as(s"n$i")) ++
      pcts.indices.map(i => round(first(col(s"t$i")), 4).as(s"thr$i"))
    val one = df.crossJoin(broadcast(thr))
      .agg(countAggs.head, countAggs.tail: _*)
    val stackArgs = pcts.zipWithIndex
      .map { case (p, i) => s"CAST($p AS DOUBLE), thr$i, n$i" }.mkString(", ")
    one.selectExpr(
      s"stack(${pcts.length}, $stackArgs) AS (pct, threshold, n_above)")
      .orderBy("pct")
  }

  /** D6 — evenly-spaced window resampling: pick exactly `n` ticks per
    * (symbol, day) at linspace positions, mirroring
    * `np.linspace(0, n_ticks-1, target).astype(int)` truncation
    * (ref: model.py:313-315).
    *
    * Scale shape (SURVEY §5): the index table is built from the
    * DISTINCT group keys (one row per group), exploded ×n, then joined
    * back on (group, rn) — group-level explosion, never row-level, so
    * a 600-tick resample of 10^9 groups shuffles 600·|groups| index
    * rows, not 600·|rows|.
    */
  def resampleWindow(ticks: DataFrame, n: Int): DataFrame = {
    val grpDate = date_format(col("ts"), "yyyy-MM-dd").as("date")
    val wRn = Window.partitionBy(col("symbol"), col("date")).orderBy("tick_id")
    val proj = ticks.select(col("tick_id"), col("symbol"), grpDate, col("bid"))
    val base = proj.withColumn("rn", row_number().over(wRn))
    // group sizes via groupBy (map-side partial agg + key-only shuffle),
    // not a second window pass + distinct over every row
    val groups = proj.groupBy("symbol", "date").agg(count(lit(1)).as("cnt"))
    val idx = groups
      .withColumn("i", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("target_rn",
        if (n == 1) lit(1) // linspace(0, cnt-1, 1) = [0] -> first row
        else when(col("cnt") === 1, lit(1))
          .otherwise(expr(s"(i * (cnt - 1)) div ${n - 1} + 1")))
    idx.join(base, Seq("symbol", "date"))
      .filter(col("rn") === col("target_rn"))
      .select(col("symbol"), col("date"), col("i"),
        col("rn").as("src_rn"), col("bid"))
      .orderBy("symbol", "date", "i")
  }

  /** D6b — the reference's exact windowing unit: resample each
    * (symbol, date, session-window) group — morning 07:50–08:00 /
    * afternoon 13:50–14:00 — to `n` evenly-spaced ticks, the
    * distributed form of `create_window_based_data` +
    * `prepare_window_data` (ref: model.py:233-324, 600 ticks per
    * window). Same group-level index-join shape as [[resampleWindow]].
    */
  def resampleSessionWindow(ticks: DataFrame, n: Int): DataFrame = {
    // Session-window bounds live in ONE place (TickOps) — a config
    // change must not desynchronize resampling from the tick filters.
    val h = hour(col("ts")); val m = minute(col("ts"))
    val wname = when((h === TickOps.MorningH) && (m >= TickOps.FromMin),
        "morning")
      .when((h === TickOps.AfternoonH) && (m >= TickOps.FromMin),
        "afternoon")
    val proj = ticks
      .withColumn("win", wname)
      .filter(col("win").isNotNull)
      .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
      .select(col("tick_id"), col("symbol"), col("date"), col("win"), col("bid"))
    val base = proj.withColumn("rn", row_number().over(
      Window.partitionBy(col("symbol"), col("date"), col("win"))
        .orderBy("tick_id")))
    val groups = proj.groupBy("symbol", "date", "win")
      .agg(count(lit(1)).as("cnt"))
    val idx = groups
      .withColumn("i", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("target_rn",
        if (n == 1) lit(1) // linspace(0, cnt-1, 1) = [0] -> first row
        else when(col("cnt") === 1, lit(1))
          .otherwise(expr(s"(i * (cnt - 1)) div ${n - 1} + 1")))
    idx.join(base, Seq("symbol", "date", "win"))
      .filter(col("rn") === col("target_rn"))
      .select(col("symbol"), col("date"), col("win"), col("i"),
        col("rn").as("src_rn"), col("bid"))
      .orderBy("symbol", "date", "win", "i")
  }

  /** D7 — chronological train/val/test split over ordered units
    * (days), with the reference's exact integer arithmetic:
    * `train_idx = int(n*0.6); val_idx = train_idx + int(n*0.2)`
    * (ref: model.py:326-349). Unit table is tiny (distinct days) —
    * the window over it is a single-partition agg on purpose; the
    * expensive part (joining the assignment back to rows) is a
    * broadcast join downstream.
    */
  def chronoSplit(ticks: DataFrame, trainRatio: Double,
                  valRatio: Double): DataFrame = {
    val days = ticks.select(date_format(col("ts"), "yyyy-MM-dd").as("date"))
      .distinct()
    val w = Window.orderBy("date")
    days
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("split",
        when(col("rn") <= floor(col("n") * trainRatio), "train")
          .when(col("rn") <= floor(col("n") * trainRatio) +
            floor(col("n") * valRatio), "val")
          .otherwise("test"))
      .select("date", "rn", "split")
      .orderBy("date")
  }

  /** D8 — standard scaling with train-only statistics applied to the
    * full set (ref: model.py:351-383 — scaler fit on train, transform
    * all). One scalar aggregate over the train slice, broadcast to
    * every row; no shuffle of the data itself. */
  def standardScale(df: DataFrame, valueCol: String, idCol: String,
                    trainFilter: Column): DataFrame = {
    val v = col(valueCol)
    val stats = df.filter(trainFilter)
      .agg(avg(v).as("mu"), stddev_samp(v).as("sigma"))
    df.crossJoin(broadcast(stats))
      // σ=0 guard (constant train slice): ANSI-mode x/0 THROWS in
      // Spark 4 — a degenerate series must scale to NULL, not kill
      // the job. σ=NULL (single-row train) already yields NULL.
      .select(col(idCol),
        when(col("sigma") =!= 0,
          round((v - col("mu")) / col("sigma"), 4)).as("scaled"))
      .orderBy(idCol)
  }

  /** D8b — multi-column standard scaling: ONE scaler fit over a whole
    * feature matrix at once (ref: model.py:351-383 scales all features
    * together), train-only statistics applied to the full set. A
    * single aggregate row carries every column's (mu, sigma) — still
    * one scan of the train slice and one broadcast, independent of the
    * number of features. */
  def standardScaleMulti(df: DataFrame, valueCols: Seq[String], idCol: String,
                         trainFilter: Column): DataFrame = {
    val aggs = valueCols.flatMap(c => Seq(
      avg(col(c)).as(s"mu_$c"), stddev_samp(col(c)).as(s"sigma_$c")))
    val stats = df.filter(trainFilter).agg(aggs.head, aggs.tail: _*)
    val scaled = valueCols.map(c =>
      when(col(s"sigma_$c") =!= 0,
        round((col(c) - col(s"mu_$c")) / col(s"sigma_$c"), 4))
        .as(s"${c}_scaled"))
    df.crossJoin(broadcast(stats))
      .select(col(idCol) +: scaled: _*)
      .orderBy(idCol)
  }

  /** D13 — running maximum + drawdown per symbol: the classic
    * peak-to-trough risk series. `cummax` is a running window max
    * (picked value) and the drawdown ratio is element-wise on picked
    * values → both unrounded (SURVEY §6). One shuffle by symbol. */
  def drawdown(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("tick_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ticks
      .withColumn("cummax", max("bid").over(w))
      // cummax=0 guard (zero-priced series): ANSI x/0 throws
      .withColumn("drawdown",
        when(col("cummax") =!= 0,
          (col("cummax") - col("bid")) / col("cummax")))
      .select("tick_id", "symbol", "cummax", "drawdown")
      .orderBy("symbol", "tick_id")
  }

  /** D26 — DRAWDOWN DURATION (time-under-water) per symbol: how long
    * does the price sit below its running peak — the duration
    * dimension D13's depth ratio misses (a 1% dip lasting a week is a
    * different risk than a 5% flash dip). A tick is UNDERWATER when
    * its exact-cent price is strictly below the running peak; a
    * stretch starts where an underwater tick follows an at-peak (or
    * first) tick — detected with one lag on the same exchange — and
    * stretch ids come from the running sum of starts, so a single
    * (symbol) exchange carries the peak window, the lag, and both
    * aggregations. Everything is exact int64 (cents compares and tick
    * counts); never-underwater symbols report zeros via the roster
    * left join, not a lost row. */
  def drawdownDuration(ticks: DataFrame): DataFrame = {
    val wRun = Window.partitionBy("symbol").orderBy("tick_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy("symbol").orderBy("tick_id")
    val marked = ticks
      .withColumn("cents", round(col("bid") * 100.0, 0).cast("long"))
      .withColumn("peak", max("cents").over(wRun))
      .withColumn("below", when(col("cents") < col("peak"), 1).otherwise(0))
      .withColumn("start",
        when(col("below") === 1 &&
          coalesce(lag(col("below"), 1).over(wLag), lit(0)) === 0, 1)
          .otherwise(0))
      .withColumn("stretch_id", sum("start").over(wRun))
    val stretches = marked.filter(col("below") === 1)
      .groupBy("symbol", "stretch_id")
      .agg(count(lit(1)).as("len"))
    val per = stretches.groupBy("symbol")
      .agg(count(lit(1)).as("n_stretches"),
        sum("len").as("n_underwater"),
        max("len").as("max_stretch_ticks"))
    ticks.select("symbol").distinct()
      .join(per, Seq("symbol"), "left")
      .select(col("symbol"),
        coalesce(col("n_stretches"), lit(0L)).as("n_stretches"),
        coalesce(col("n_underwater"), lit(0L)).as("n_underwater"),
        coalesce(col("max_stretch_ticks"), lit(0L)).as("max_stretch_ticks"))
      .orderBy("symbol")
  }

  /** D14 — inter-arrival statistics per symbol: mean/max gap between
    * consecutive ticks in seconds (liquidity profile; the stat behind
    * the reference's tick-count monitoring). Gap uses µs integer
    * diffs; aggregates rounded. */
  def interArrival(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    ticks
      .withColumn("gap_us", gapUs)
      .groupBy("symbol")
      .agg(
        round(avg(col("gap_us")) / 1000000.0, 4).as("avg_gap_sec"),
        round(max(col("gap_us")) / 1000000.0, 4).as("max_gap_sec"),
        count(col("gap_us")).as("n_gaps"))
      .orderBy("symbol")
  }

  /** D18 — per-symbol BETA against the equal-weight market: β =
    * covar_pop(bid, mkt) / var_pop(mkt) over second-aligned
    * observations, where the market series is the mean bid across
    * symbols in each second (the index the reference's multi-symbol
    * gold directory implies). Shape: one per-(symbol, second)
    * downsample (first tick by tick_id — B2's rule), one per-second
    * market aggregate (tiny — |seconds| rows), broadcast back, one
    * grouped covar/var. Symbols absent in a second contribute nothing
    * for that second (inner join) and a symbol's β is NULL when the
    * market variance over ITS seconds is 0 (no ANSI x/0). Aggregate
    * doubles → round(4), same determinism class as D10's corr. */
  def marketBeta(ticks: DataFrame): DataFrame = {
    val perSec = ticks
      .withColumn("sec", date_trunc("second", col("ts")))
      .groupBy("symbol", "sec")
      .agg(min_by(col("bid"), col("tick_id")).as("bid"))
    val market = perSec.groupBy("sec")
      .agg(round(avg("bid"), 4).as("mkt"))
    perSec.join(broadcast(market), "sec")
      .groupBy("symbol")
      .agg(
        when(expr("var_pop(mkt)") > 0,
          round(expr("covar_pop(bid, mkt) / var_pop(mkt)"), 4)).as("beta"),
        count(lit(1)).as("n_obs"))
      .orderBy("symbol")
  }

  /** D42 — MEAN-REVERSION HALF-LIFE per symbol: the AR(1) fit
    * `pₜ = c + ρ·pₜ₋₁ + ε` on exact integer cents, with the
    * Ornstein-Uhlenbeck half-life `−ln2 / ln ρ` (in ticks) — the
    * "how fast does a shock decay" screen that decides whether D4's
    * z-score anomalies are tradeable reversions or permanent moves.
    * ρ is the regression slope `covar_pop(p, p_prev)/var_pop(p_prev)`
    * (D18's corr-aggregate discipline: the quotient of unrounded
    * aggregates over EXACT int inputs, round(4) once); the half-life
    * divides the HARD literal −0.6931471805599453 (−ln 2, D27's
    * constant rule) by `ln ρ` of the ROUNDED slope — defined only for
    * 0 < ρ < 1 (a random-walk ρ ≥ 1 or oscillating ρ ≤ 0 has no
    * half-life; NULL). Pairs need a non-null lag, so each symbol's
    * first tick drops; one symbol exchange carries lag + aggregate
    * (D16's shape). In the float-sensitive sweep. */
  def meanReversion(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    ticks
      .withColumn("c", expr("CAST(round(bid * 100.0, 0) AS BIGINT)"))
      .withColumn("cp", lag(col("c"), 1).over(w))
      .groupBy("symbol")
      .agg(
        count(col("cp")).as("n_pairs"),
        when(expr("var_pop(cp)") > 0,
          round(expr("covar_pop(c, cp) / var_pop(cp)"), 4)).as("rho"))
      .withColumn("halflife_ticks",
        when(col("rho") > 0 && col("rho") < 1,
          round(lit(-0.6931471805599453) / log(col("rho")), 4)))
      .select("symbol", "n_pairs", "rho", "halflife_ticks")
      .orderBy("symbol")
  }

  /** D17 — REALIZED VOLATILITY per (symbol, trading day): the sum of
    * squared intraday log returns (the standard RV estimator; the
    * lag runs WITHIN the day so overnight gaps never contaminate a
    * day's vol). ln() parity across engines is already established by
    * D3 (`q_log_returns` passes unrounded); the squared-return sum is
    * an aggregate double → round(4) (SURVEY §6). One window lag +
    * grouped sum on the same (symbol, day) exchange. */
  def realizedVol(ticks: DataFrame): DataFrame = {
    // _date attribute in the window key, not to_date(ts): Catalyst
    // does not unify the expression with the groupBy attribute and
    // planned a second exchange (B13's audit finding, fixed here too).
    val w = Window.partitionBy("symbol", "_date").orderBy("tick_id")
    ticks
      .withColumn("_date", to_date(col("ts")))
      .withColumn("prev", lag(col("bid"), 1).over(w))
      // positive-price domain guard, as D3 (ln(0) errors in DuckDB)
      .withColumn("r",
        when(col("prev") > 0 && col("bid") > 0,
          log(col("bid") / col("prev"))))
      .groupBy(col("symbol"), col("_date"))
      .agg(round(sum(col("r") * col("r")), 4).as("realized_vol"),
        count(col("r")).as("n_returns"))
      .select(col("symbol"),
        date_format(col("_date"), "yyyy-MM-dd").as("date"),
        col("realized_vol"), col("n_returns"))
      .orderBy("symbol", "date")
  }

  /** D16 — lag-`k` AUTOCORRELATION of the bid per symbol: Pearson
    * corr(bidₜ, bidₜ₋ₖ) — the mean-reversion/momentum diagnostic a
    * research pipeline computes per instrument (pandas
    * `series.autocorr(k)`). One window pass for the lag (shuffle by
    * symbol, the same exchange the aggregate then reuses) and one
    * grouped `corr` with map-side partial aggregation; first `k` ticks
    * of each symbol contribute no pair (corr ignores NULL pairs in
    * both engines). Aggregate double → round(4) (SURVEY §6). */
  def autocorr(ticks: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    ticks
      .withColumn("lag_bid", lag(col("bid"), k).over(w))
      .groupBy("symbol")
      .agg(round(corr(col("bid"), col("lag_bid")), 4).as(s"autocorr_$k"),
        count(col("lag_bid")).as("n_pairs"))
      .orderBy("symbol")
  }

  /** D15 — EWMA (exponentially weighted moving average) of the bid
    * per (symbol, trading day) with α = 1/2: e₁ = x₁, eᵢ = (xᵢ+eᵢ₋₁)/2
    * — the standard smoothing feature the D-block lacked (pandas
    * `ewm(alpha=.5).mean().iloc[-1]` per session). The recursion is
    * inherently sequential, so it runs where the sequence lives: ONE
    * shuffle by (symbol, day), each group's ticks collected into an
    * array ordered by (ts, tick_id) and folded LEFT-TO-RIGHT — never a
    * driver loop, and bounded by a day's volume exactly like the D6b
    * session resampler. α = 1/2 makes every step `(x+e)·0.5` an IEEE
    * add plus an EXACT halving, and the DuckDB oracle folds the same
    * ordered list with the same lambda, so the unrounded doubles are
    * bit-identical (SURVEY §6 element-wise rule: same ops, same
    * order). Day key is DATE-typed (the q_vwap lesson: formatter keys
    * measured ~7× slower), display string emitted once per group. */
  def ewma(ticks: DataFrame): DataFrame =
    ticks
      .groupBy(col("symbol"), to_date(col("ts")).as("_date"))
      .agg(count(lit(1)).as("n_ticks"),
        expr("sort_array(collect_list(struct(ts, tick_id, bid)))").as("arr"))
      .withColumn("bids", expr("transform(arr, x -> x.bid)"))
      .withColumn("ewma_bid", expr(
        """aggregate(slice(bids, 2, size(bids) - 1), element_at(bids, 1),
          |  (acc, x) -> (x + acc) * cast(0.5 as double))""".stripMargin))
      .select(col("symbol"),
        date_format(col("_date"), "yyyy-MM-dd").as("date"),
        col("n_ticks"), col("ewma_bid"))
      .orderBy("symbol", "date")

  /** D12 — grouped exact percentiles: per-symbol spread quantiles
    * (the per-group flavor of [[anomalyThresholds]]; one shuffle by
    * group key, partial agg). */
  def groupPercentiles(ticks: DataFrame, pcts: Seq[Double]): DataFrame = {
    val spread = "(ask - bid)"
    val aggs = pcts.zipWithIndex.map { case (p, i) =>
      round(expr(s"percentile($spread, $p)"), 4).as(s"p$i")
    } :+ count(lit(1)).as("n")
    ticks.groupBy("symbol")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("symbol")
  }

  /** D10 — per-symbol bid/ask correlation and covariance (research
    * stats over the gold tables; single groupBy, partial agg). */
  def corrStats(ticks: DataFrame): DataFrame =
    ticks.groupBy("symbol")
      .agg(
        round(corr("bid", "ask"), 4).as("bid_ask_corr"),
        round(covar_samp("bid", "ask"), 4).as("bid_ask_covar"),
        count(lit(1)).as("n"))
      .orderBy("symbol")

  /** D11 — min-max scaling per symbol. min/max are picked values (not
    * sums), so the element-wise `(x - min) / (max - min)` is
    * bit-reproducible unrounded (SURVEY §6). */
  def minMaxScale(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol")
    val mn = min("bid").over(w); val mx = max("bid").over(w)
    ticks.select(
      col("tick_id"), col("symbol"),
      // constant-symbol guard (max=min): ANSI x/0 throws
      when(mx =!= mn, (col("bid") - mn) / (mx - mn)).as("bid_scaled"))
      .orderBy("symbol", "tick_id")
  }

  /** D9 — walk-forward validation folds (ref: README.md §9.2 "rolling
    * window evaluation"): fold k trains on days [k·step, k·step+train)
    * and tests on the following `test` days. Assignment is computed on
    * the distinct-day table (tiny) crossed with the fold list. */
  def walkForward(ticks: DataFrame, folds: Int, step: Int,
                  trainLen: Int, testLen: Int): DataFrame = {
    val days = ticks.select(date_format(col("ts"), "yyyy-MM-dd").as("date"))
      .distinct()
      .withColumn("rn", row_number().over(Window.orderBy("date")))
    val foldIdx = days.sparkSession.range(folds).select(col("id").as("fold"))
    days.crossJoin(broadcast(foldIdx))
      .withColumn("start", col("fold") * step + 1)
      .withColumn("role",
        when(col("rn") >= col("start") &&
          col("rn") < col("start") + trainLen, "train")
          .when(col("rn") >= col("start") + trainLen &&
            col("rn") < col("start") + trainLen + testLen, "test"))
      .filter(col("role").isNotNull)
      .select("fold", "date", "role")
      .orderBy("fold", "date")
  }

  /** D69 — PURGED + EMBARGOED WALK-FORWARD (López de Prado, Advances
    * in Financial ML ch.7): D9's split with the two leakage controls
    * a LABELED financial dataset needs — the tail of each train
    * window PURGES `purge` days (a D38 triple-barrier label there
    * looks `horizon` ticks FORWARD, i.e. into the fold's test period
    * — training on it leaks the test answer), and the `embargo` days
    * after each test window are MARKED so the consumer can exclude
    * serial-correlation bleed from the evaluated period. Roles are
    * assigned PER FOLD independently: a day labeled embargo in fold
    * i may legitimately be labeled train in a later fold whose train
    * range covers it — the embargo row is the audit signal the
    * consumer applies across folds (matching López de Prado, where
    * the embargo trims the train set adjacent to each test split),
    * not a global cross-fold exclusion.
    * Emits EVERY day of every fold with its role (train / purged /
    * test / embargo) — exclusions are auditable rows, not silent
    * drops (the B11/D38 discipline). Same shape as D9: the day roster
    * is distinct-days-sized, the fold grid broadcasts, roles are pure
    * integer-range arithmetic — nothing here touches the tick fact. */
  def purgedWalkForward(ticks: DataFrame, folds: Int, step: Int,
                        trainLen: Int, testLen: Int,
                        purge: Int, embargo: Int): DataFrame = {
    require(purge >= 0 && purge < trainLen,
      s"purge must sit inside the train window: $purge vs $trainLen")
    require(embargo >= 0, s"embargo must be >= 0: $embargo")
    val days = ticks.select(date_format(col("ts"), "yyyy-MM-dd").as("date"))
      .distinct()
      .withColumn("rn", row_number().over(Window.orderBy("date")))
    val foldIdx = days.sparkSession.range(folds).select(col("id").as("fold"))
    days.crossJoin(broadcast(foldIdx))
      .withColumn("start", col("fold") * step + 1)
      .withColumn("role",
        when(col("rn") >= col("start") &&
          col("rn") < col("start") + trainLen - purge, "train")
          .when(col("rn") >= col("start") + trainLen - purge &&
            col("rn") < col("start") + trainLen, "purged")
          .when(col("rn") >= col("start") + trainLen &&
            col("rn") < col("start") + trainLen + testLen, "test")
          .when(col("rn") >= col("start") + trainLen + testLen &&
            col("rn") < col("start") + trainLen + testLen + embargo,
            "embargo"))
      .filter(col("role").isNotNull)
      .select("fold", "date", "role")
      .orderBy("fold", "date")
  }

  /** D72 — COMBINATORIAL PURGED CROSS-VALIDATION (López de Prado
    * ch.7.4 CPCV): D69 walks forward once — ONE backtest path, so a
    * strategy can overfit the single train/test seam; CPCV splits the
    * calendar into N equal GROUPS and evaluates every C(N, 2)
    * combination of two test groups, purging `purge` days around each
    * test block — C(N,2) paths from one dataset, the standard defense
    * against backtest overfitting. Emits (combo_id, date, role ∈
    * train/purged/test) for EVERY combination × day — exclusions
    * auditable (D69's rule).
    *
    * Shape: the day roster is distinct-days-sized; group bounds come
    * FROM the roster (one tiny aggregate — never closed-form bounds
    * that could drift off the group assignment); the C(N,2) combo
    * grid and the bounds both broadcast; roles are integer-range
    * compares. The tick fact is never touched. */
  def combinatorialCv(ticks: DataFrame, groups: Int,
                      purge: Int): DataFrame = {
    require(groups >= 2 && purge >= 0,
      s"bad CPCV params: groups=$groups purge=$purge")
    val spark = ticks.sparkSession
    // one tiny driver count pins the group-assignment denominator
    val nDays = ticks.select(date_format(col("ts"), "yyyy-MM-dd"))
      .distinct().count()
    val roster = ticks
      .select(date_format(col("ts"), "yyyy-MM-dd").as("date")).distinct()
      .withColumn("rn", row_number().over(Window.orderBy("date")))
      .withColumn("g", expr(s"((rn - 1) * $groups) div ${nDays}L"))
      .localCheckpoint(true)
    val bounds = roster.groupBy("g")
      .agg(min(col("rn")).as("lo"), max(col("rn")).as("hi"))
    val combos = spark.range(groups).select(col("id").as("a"))
      .crossJoin(spark.range(groups).select(col("id").as("b")))
      .filter(col("a") < col("b"))
      .withColumn("combo_id", col("a") * groups + col("b"))
      .join(bounds.select(col("g").as("a"), col("lo").as("lo_a"),
        col("hi").as("hi_a")), Seq("a"))
      .join(bounds.select(col("g").as("b"), col("lo").as("lo_b"),
        col("hi").as("hi_b")), Seq("b"))
    roster.crossJoin(broadcast(combos))
      .withColumn("role",
        when(col("g") === col("a") || col("g") === col("b"), "test")
          .when((col("rn") >= col("lo_a") - purge &&
            col("rn") <= col("hi_a") + purge) ||
            (col("rn") >= col("lo_b") - purge &&
              col("rn") <= col("hi_b") + purge), "purged")
          .otherwise("train"))
      .select("combo_id", "date", "role")
      .orderBy("combo_id", "date")
  }

  /** D38 — TRIPLE-BARRIER LABELING (López de Prado, Advances in
    * Financial Machine Learning ch.3): the label-generation op a
    * financial training pipeline runs between feature prep (D1–D8)
    * and the walk-forward split (D9). Every `entryEvery`-th tick per
    * symbol opens a position; the label is decided by the FIRST event
    * among — price rising `barrierBp` over entry (+1), falling
    * `barrierBp` under it (−1), or `horizon` ticks elapsing (0).
    * Entries whose lookahead is empty (a symbol's final tick) carry
    * no label and are dropped — a truncated horizon is neither a hit
    * nor a timeout; `n_lookahead < horizon` makes partially-observed
    * tail entries auditable rather than silently mislabeled.
    *
    * Scale shape: NEVER an inequality join. The per-symbol tick index
    * rides ONE symbol exchange (row_number), and the entry→future
    * lookup is D33's bucketize trick: future ticks key on `idx div
    * horizon`, each entry explodes onto the ≤2 blocks its window
    * `(e_idx, e_idx+horizon]` can span, and the (symbol, block)
    * equi-join + post-filter replaces the range predicate. Joined
    * volume is entries × 2·horizon = (n/entryEvery)·2·horizon rows —
    * a constant multiple of the fact, tunable by sampling. First-hit
    * selection is two conditional MINs with map-side partials (≤2
    * partials per entry — the two blocks).
    *
    * Engine-exactness: barriers compare CROSS-MULTIPLIED int64 cents
    * (`f_c·10⁴ ≥ e_c·(10⁴+bp)` — no ratio double ever exists, B12's
    * rule); a tick cannot satisfy both barriers (bp > 0), so the
    * first-hit tie cannot arise. All emitted values exact ints. */
  def tripleBarrier(ticks: DataFrame, entryEvery: Int, horizon: Int,
                    barrierBp: Long): DataFrame = {
    require(entryEvery > 0 && horizon > 0,
      s"entryEvery and horizon must be positive: $entryEvery, $horizon")
    require(barrierBp > 0 && barrierBp < 10000,
      s"barrierBp must be in (0, 10000) for a reachable down barrier: " +
        s"$barrierBp")
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    val x = ticks
      .withColumn("c", round(col("bid") * 100.0, 0).cast("long"))
      .withColumn("idx", row_number().over(w).cast("long"))
      .select("symbol", "tick_id", "c", "idx")
      .localCheckpoint(true) // feeds both the entry and future sides
    val entries = x
      // `1 % entryEvery` so stride 1 means EVERY tick (idx % 1 is 0)
      .filter(pmod(col("idx"), lit(entryEvery.toLong)) === (1L % entryEvery))
      .select(col("symbol"), col("idx").as("e_idx"),
        col("tick_id").as("entry_id"), col("c").as("e_c"))
      .withColumn("blk", explode(array(
        expr(s"e_idx div ${horizon}L"),
        expr(s"e_idx div ${horizon}L + 1L"))))
    val futures = x.select(col("symbol"), col("idx").as("f_idx"),
      col("c").as("f_c"), expr(s"idx div ${horizon}L").as("blk"))
    entries
      .join(futures, Seq("symbol", "blk"))
      .filter(col("f_idx") > col("e_idx") &&
        col("f_idx") <= col("e_idx") + horizon)
      .groupBy("symbol", "e_idx", "entry_id", "e_c")
      .agg(
        min(when(col("f_c") * 10000L >= col("e_c") * (10000L + barrierBp),
          col("f_idx"))).as("up_idx"),
        min(when(col("f_c") * 10000L <= col("e_c") * (10000L - barrierBp),
          col("f_idx"))).as("dn_idx"),
        count(lit(1)).as("n_lookahead"))
      .withColumn("label",
        when(col("up_idx").isNotNull &&
          (col("dn_idx").isNull || col("up_idx") < col("dn_idx")), 1)
          .when(col("dn_idx").isNotNull &&
            (col("up_idx").isNull || col("dn_idx") < col("up_idx")), -1)
          .otherwise(0))
      .select("symbol", "e_idx", "entry_id", "e_c", "up_idx", "dn_idx",
        "n_lookahead", "label")
      .orderBy("symbol", "e_idx")
  }

  /** D70 — LABEL-UNIQUENESS SAMPLE WEIGHTS (López de Prado ch.4):
    * D38's triple-barrier labels OVERLAP — consecutive entries share
    * lookahead ticks, so their labels are not independent samples and
    * a trainer that weights them equally over-counts the dense
    * stretches. The standard fix: per covered tick j the CONCURRENCY
    * c_j (how many open labels span it), per entry the average
    * uniqueness `u = mean_{j∈span}(1/c_j)` — the sample weight ch.4
    * feeds the fit. Entries with an empty lookahead (the tape's final
    * tick) carry no weight row, the D38 truncation discipline; short
    * tail spans keep their observed n_span (auditable).
    *
    * Scale shape: the span enumeration is D33/D38's bucketize trick
    * (entries explode onto ≤2 idx-blocks, equi-join + post-filter —
    * never an inequality join), the coverage frame checkpoints once
    * (it feeds the concurrency aggregate AND the per-entry fold), and
    * concurrency joins back on (symbol, f_idx) — all shuffles keyed,
    * joined volume = entries × horizon.
    *
    * Engine-exactness: c_j exact int64; 1/c one IEEE division via the
    * shared `CAST(1 AS DOUBLE) / c` spelling; the per-entry sum folds
    * ascending-f_idx (ordered list fold, never an unordered double
    * SUM); the mean quantizes through the sign-split floor spelling. */
  def labelUniqueness(ticks: DataFrame, entryEvery: Int,
                      horizon: Int): DataFrame = {
    require(entryEvery > 0 && horizon > 0,
      s"entryEvery and horizon must be positive: $entryEvery, $horizon")
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    val x = ticks
      .withColumn("idx", row_number().over(w).cast("long"))
      .select("symbol", "tick_id", "idx")
      .localCheckpoint(true) // feeds both the entry and future sides
    val entries = x
      .filter(pmod(col("idx"), lit(entryEvery.toLong)) === (1L % entryEvery))
      .select(col("symbol"), col("idx").as("e_idx"),
        col("tick_id").as("entry_id"))
      .withColumn("blk", explode(array(
        expr(s"e_idx div ${horizon}L"),
        expr(s"e_idx div ${horizon}L + 1L"))))
    val futures = x.select(col("symbol"), col("idx").as("f_idx"),
      expr(s"idx div ${horizon}L").as("blk"))
    val cover = entries.join(futures, Seq("symbol", "blk"))
      .filter(col("f_idx") > col("e_idx") &&
        col("f_idx") <= col("e_idx") + horizon)
      .select("symbol", "e_idx", "entry_id", "f_idx")
      .localCheckpoint(true) // feeds concurrency AND the entry fold
    val conc = cover.groupBy("symbol", "f_idx")
      .agg(count(lit(1)).as("c"))
    cover.join(conc, Seq("symbol", "f_idx"))
      .withColumn("inv", expr("CAST(1 AS DOUBLE) / c"))
      .groupBy("symbol", "e_idx", "entry_id")
      .agg(count(lit(1)).as("n_span"),
        aggregate(transform(
          array_sort(collect_list(struct(col("f_idx"), col("inv")))),
          s => s.getField("inv")), lit(0.0), (a, b) => a + b).as("s0"))
      .withColumn("uniqueness", expr(
        "CAST(floor(s0 / n_span * 1000000.0D + 0.5D) AS BIGINT)" +
          " / 1000000.0D + 0.0D"))
      .select("symbol", "e_idx", "entry_id", "n_span", "uniqueness")
      .orderBy("symbol", "e_idx")
  }

  /** The D71 fixed-width fracdiff weights: w₀ = 1,
    * wₖ = −wₖ₋₁·(d−k+1)/k — the binomial-series coefficients of
    * (1−B)^d, truncated at `k` lags. Computed once on the driver;
    * both engines receive the SAME shortest-round-trip literals, so
    * the weight spelling cannot drift. */
  private[graft] def fracDiffWeights(d: Double, k: Int): Array[Double] = {
    val w = new Array[Double](k + 1)
    w(0) = 1.0
    for (i <- 1 to k) w(i) = -w(i - 1) * (d - i + 1) / i
    w
  }

  /** D74 — PSI FEATURE DRIFT (population stability index): the
    * model-monitoring drift stat between the chronological TRAIN and
    * TEST slices (D7's 60/20/20 day split) — `Σ(pᵢ−qᵢ)·ln(pᵢ/qᵢ)`
    * over B fixed-width buckets of the train value range, the number
    * every scoring pipeline alarms on (rule of thumb: >0.25 = retrain).
    * F-block's KS drift compares full CDFs; PSI is the BUCKETED,
    * additive form production monitors actually threshold.
    *
    * Engine-exactness: buckets are integer arithmetic off the exact
    * train cents min/max (test values clamp into the edge buckets);
    * +1 smoothing keeps empty buckets finite and integer; each
    * contribution's ln takes ONE ratio of exact int64 products
    * (`ln((cᵢ+1)(m+B) / ((dᵢ+1)(n+B)))` — identical doubles both
    * engines); p−q is a difference of two exact-int divisions; the B
    * contributions fold in ascending-bucket order and the total
    * quantizes via the sign-split floor spelling. */
  def psiDrift(ticks: DataFrame, buckets: Int = 10,
               trainRatio: Double = 0.6,
               valRatio: Double = 0.2): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets: $buckets")
    val days = ticks.select(date_format(col("ts"), "yyyy-MM-dd").as("date"))
      .distinct()
      .withColumn("rn", row_number().over(Window.orderBy("date")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("split",
        when(col("rn") <= floor(col("n") * trainRatio), "train")
          .when(col("rn") <= floor(col("n") * trainRatio) +
            floor(col("n") * valRatio), "val")
          .otherwise("test"))
      .select("date", "split")
    val x = ticks
      .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("c", expr("CAST(round(bid * 100.0, 0) AS BIGINT)"))
      .join(broadcast(days), Seq("date"))
      .filter(col("split") =!= "val")
      .select("split", "c")
      .localCheckpoint(true) // feeds the range scan and the histogram
    val range = x.filter(col("split") === "train")
      .agg(min(col("c")).as("mn"), max(col("c")).as("mx"))
    val hist = x.crossJoin(broadcast(range))
      .withColumn("b", expr(
        s"CAST(least(${buckets - 1}L, greatest(0L," +
          s" ((c - mn) * $buckets) div (mx - mn + 1))) AS BIGINT)"))
      .groupBy("b").agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("tr"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("te"))
    val spark = ticks.sparkSession
    val full = spark.range(buckets).select(col("id").as("b"))
      .join(hist, Seq("b"), "left")
      .select(col("b"), coalesce(col("tr"), lit(0L)).as("tr"),
        coalesce(col("te"), lit(0L)).as("te"))
    val tots = full.agg(sum(col("tr")).as("n_tr"), sum(col("te")).as("n_te"))
    full.crossJoin(broadcast(tots))
      .withColumn("contrib", expr(
        s"(CAST(tr + 1 AS DOUBLE) / (n_tr + $buckets)" +
          s" - CAST(te + 1 AS DOUBLE) / (n_te + $buckets))" +
          s" * ln(CAST((tr + 1) * (n_te + $buckets) AS DOUBLE)" +
          s" / CAST((te + 1) * (n_tr + $buckets) AS DOUBLE))"))
      .groupBy("n_tr", "n_te")
      .agg(aggregate(transform(
        array_sort(collect_list(struct(col("b"), col("contrib")))),
        s => s.getField("contrib")), lit(0.0), (a, y) => a + y).as("s0"))
      .select(lit(buckets.toLong).as("n_buckets"),
        col("n_tr").as("n_train"), col("n_te").as("n_test"),
        expr("CAST(CASE WHEN s0 >= 0 THEN floor(s0 * 1000000.0D + 0.5D)" +
          " ELSE -floor(-s0 * 1000000.0D + 0.5D) END AS BIGINT)" +
          " / 1000000.0D + 0.0D").as("psi"))
  }

  /** D71 — FRACTIONAL DIFFERENTIATION, fixed-width window (López de
    * Prado ch.5 FFD): the stationarity transform that keeps MEMORY —
    * integer differencing (D3's returns) erases all of it, raw levels
    * are non-stationary; `x̃ₜ = Σₖ wₖ·xₜ₋ₖ` with the (1−B)^d series
    * truncated at K lags interpolates, and is THE feature transform
    * ch.5 argues a price-ML pipeline should feed the model instead of
    * returns. Weights are driver-computed constants (one recursion,
    * shortest-round-trip literals in both engines); the series is one
    * K-lag pass over the symbol exchange (Spark evaluates all K lags
    * in a single WindowExec); the combination is an EXPLICIT
    * left-associated chain over exact int64 cents — deterministic
    * IEEE in both engines, quantized via the sign-split floor
    * spelling. Only complete windows emit (idx > K — a partial
    * window is a different estimator, the D63 full-window rule). */
  def fracDiff(ticks: DataFrame, d: Double = 0.4,
               k: Int = 10): DataFrame = {
    require(k >= 1 && d > 0 && d < 1, s"bad fracdiff params: d=$d k=$k")
    val ws = fracDiffWeights(d, k)
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    val base = ticks
      .withColumn("c", expr("CAST(round(bid * 100.0, 0) AS BIGINT)"))
      .withColumn("idx", row_number().over(w))
    val lagged = (1 to k).foldLeft(base)((df, i) =>
      df.withColumn(s"c$i", lag(col("c"), i).over(w)))
    val comb = (1 to k).foldLeft(s"${ws(0)} * CAST(c AS DOUBLE)")(
      (acc, i) => s"($acc + ${ws(i)} * CAST(c$i AS DOUBLE))")
    lagged
      .filter(col("idx") > k)
      .withColumn("ffd", expr(
        s"CAST(CASE WHEN ($comb) >= 0" +
          s" THEN floor(($comb) * 1000000.0D + 0.5D)" +
          s" ELSE -floor(-($comb) * 1000000.0D + 0.5D) END AS BIGINT)"))
      .withColumn("ffd", expr(
        "CAST(ffd AS DOUBLE) / 1000000.0D + 0.0D"))
      .select("symbol", "tick_id", "ffd")
      .orderBy("symbol", "tick_id")
  }

  /** D73 — VOLATILITY-ADAPTIVE TRIPLE-BARRIER LABELS (López de Prado
    * ch.3's actual recipe): D38 uses a FIXED barrier — too tight for
    * a volatile symbol (everything labels ±1 on noise), too wide for
    * a quiet one (everything times out). Here each (symbol, day)'s
    * barrier is `m·√rv_prev` cents — the previous day's realized
    * volatility sets today's profit-take/stop distance, so labels
    * mean the same thing across symbols and regimes. rv is the exact
    * int64 Σ(Δcents)² day collapse (D63's frame); the barrier is one
    * correctly-rounded √ + floor(·+0.5) into int64 CENTS (never a
    * ratio — the compare stays pure integer); first days (no prior
    * rv) drop with the D38 truncation discipline. Same
    * bucketize-equi-join lookahead as D38 — the dynamic barrier rides
    * the entry row; nothing else changes shape. */
  def volAdaptiveBarrier(ticks: DataFrame, entryEvery: Int, horizon: Int,
                         volMult: Int): DataFrame = {
    require(entryEvery > 0 && horizon > 0 && volMult > 0,
      s"bad params: $entryEvery $horizon $volMult")
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    val x = ticks
      .withColumn("c", expr("CAST(round(bid * 100.0, 0) AS BIGINT)"))
      .withColumn("day", to_date(col("ts")))
      .withColumn("idx", row_number().over(w).cast("long"))
      .select("symbol", "tick_id", "day", "c", "idx")
      .localCheckpoint(true)
    val rv = x
      .withColumn("dd", col("c") - lag(col("c"), 1).over(
        Window.partitionBy("symbol", "day").orderBy("tick_id")))
      .groupBy("symbol", "day")
      .agg(sum(col("dd") * col("dd")).as("rv"))
      .withColumn("rv_prev", lag(col("rv"), 1).over(
        Window.partitionBy("symbol").orderBy("day")))
      .filter(col("rv_prev").isNotNull)
      .withColumn("bc", expr(
        s"greatest(1L, CAST(floor($volMult * sqrt(CAST(rv_prev" +
          " AS DOUBLE)) + 0.5) AS BIGINT))"))
      .select("symbol", "day", "bc")
    val entries = x
      .filter(pmod(col("idx"), lit(entryEvery.toLong)) === (1L % entryEvery))
      .join(rv, Seq("symbol", "day")) // drops no-prior-rv days
      .select(col("symbol"), col("idx").as("e_idx"),
        col("tick_id").as("entry_id"), col("c").as("e_c"), col("bc"))
      .withColumn("blk", explode(array(
        expr(s"e_idx div ${horizon}L"),
        expr(s"e_idx div ${horizon}L + 1L"))))
    val futures = x.select(col("symbol"), col("idx").as("f_idx"),
      col("c").as("f_c"), expr(s"idx div ${horizon}L").as("blk"))
    entries
      .join(futures, Seq("symbol", "blk"))
      .filter(col("f_idx") > col("e_idx") &&
        col("f_idx") <= col("e_idx") + horizon)
      .groupBy("symbol", "e_idx", "entry_id", "e_c", "bc")
      .agg(
        min(when(col("f_c") >= col("e_c") + col("bc"), col("f_idx")))
          .as("up_idx"),
        min(when(col("f_c") <= col("e_c") - col("bc"), col("f_idx")))
          .as("dn_idx"),
        count(lit(1)).as("n_lookahead"))
      .withColumn("label",
        when(col("up_idx").isNotNull &&
          (col("dn_idx").isNull || col("up_idx") < col("dn_idx")), 1)
          .when(col("dn_idx").isNotNull &&
            (col("up_idx").isNull || col("dn_idx") < col("up_idx")), -1)
          .otherwise(0))
      .select("symbol", "e_idx", "entry_id", "e_c", "bc", "up_idx",
        "dn_idx", "n_lookahead", "label")
      .orderBy("symbol", "e_idx")
  }

  /** D58 — SHOCK-RECOVERY TIME (liquidity resilience event study):
    * for every tick that JUMPS ≥ `shockBp` off the previous print,
    * how many ticks until price first returns within `recoverBp` of
    * the PRE-shock level (NULL if not within `horizon`) — the
    * event-study that separates transient liquidity dislocations
    * (fast reversion: the B12-class glitch a resilient book absorbs)
    * from permanent information moves (no recovery: repricing).
    * D42 fits reversion as one AR(1) number per symbol; this
    * measures it PER EVENT, which is what an execution desk reads
    * before trading through a dislocation. Probed at sf0.01
    * (3000/1000 bp, H=40): 8216 shocks, 63% recover, mean 11.7
    * ticks — genuinely two-sided.
    *
    * Scale shape: D38's machinery verbatim — shocks are a filtered
    * subset, the lookahead is the `idx div horizon` block bucketize
    * (≤2 blocks per shock, equi-join + post-filter, never an
    * inequality join), first-recovery is one conditional MIN with
    * map-side partials. Both thresholds compare CROSS-MULTIPLIED
    * exact int64 cents (B12's rule — no ratio double exists);
    * `abs_move_bp` is a non-negative exact `div` (Spark div ==
    * DuckDB // on non-negatives); truncated-tail shocks stay
    * auditable via `n_lookahead`. */
  def shockRecovery(ticks: DataFrame, shockBp: Long, recoverBp: Long,
                    horizon: Int): DataFrame = {
    require(shockBp > 0 && recoverBp > 0 && recoverBp < shockBp,
      s"need 0 < recoverBp < shockBp: $recoverBp, $shockBp")
    require(horizon > 0, s"horizon must be positive: $horizon")
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    val x = ticks
      .withColumn("c", round(col("bid") * 100.0, 0).cast("long"))
      .withColumn("idx", row_number().over(w).cast("long"))
      .select("symbol", "tick_id", "c", "idx")
      .localCheckpoint(true) // feeds both the shock and future sides
    val shocks = x
      .withColumn("prev", lag(col("c"), 1).over(
        Window.partitionBy("symbol").orderBy("idx")))
      .filter(col("prev") > 0 &&
        abs(col("c") - col("prev")) * 10000L >= col("prev") * shockBp)
      .select(col("symbol"), col("idx").as("s_idx"),
        col("tick_id").as("shock_id"), col("prev").as("pre_c"),
        col("c").as("shock_c"))
      .withColumn("blk", explode(array(
        expr(s"s_idx div ${horizon}L"),
        expr(s"s_idx div ${horizon}L + 1L"))))
    val futures = x.select(col("symbol"), col("idx").as("f_idx"),
      col("c").as("f_c"), expr(s"idx div ${horizon}L").as("blk"))
    shocks
      .join(futures, Seq("symbol", "blk"))
      .filter(col("f_idx") > col("s_idx") &&
        col("f_idx") <= col("s_idx") + horizon)
      .groupBy("symbol", "s_idx", "shock_id", "pre_c", "shock_c")
      .agg(
        min(when(abs(col("f_c") - col("pre_c")) * 10000L <=
          col("pre_c") * recoverBp, col("f_idx"))).as("r_idx"),
        count(lit(1)).as("n_lookahead"))
      .withColumn("abs_move_bp",
        expr("(abs(shock_c - pre_c) * 10000) div pre_c"))
      .withColumn("recovery_ticks", col("r_idx") - col("s_idx"))
      .withColumn("recovered", col("r_idx").isNotNull)
      .select("symbol", "shock_id", "pre_c", "shock_c", "abs_move_bp",
        "recovery_ticks", "recovered", "n_lookahead")
      .orderBy("symbol", "shock_id")
  }

  /** D66 — WINDOWED-TENSOR FEATURE EXPORT: the reference's actual ML
    * handoff format (ref: model.py:233-325 `create_window_based_data`
    * / `prepare_window_data` — fixed-count tick arrays per (symbol,
    * day, session window); model.py:48-80 deterministic even-spacing
    * pad; model.py:326-349 chrono window split; model.py:351-384
    * train-fit scaler applied to all splits). D6b resamples, D7
    * splits, D8 scales — this assembles the END PRODUCT a trainer
    * consumes: one row per window, a fixed-length scaled DOUBLE
    * array.
    *
    * Slot mapping (one closed form, both pad and sample):
    *  - n ≥ k: slot i ← tick `(i·(n−1)) div (k−1)` — the linspace
    *    downsample (D6's spelling);
    *  - n < k: the reference places tick j at slot
    *    `(j·(k−1)) div (n−1)` and forward-fills, so slot i holds the
    *    LAST tick placed at-or-before it — algebraically tick
    *    `((i+1)·(n−1)−1) div (k−1)`, no fill pass needed (head
    *    backfill is vacuous: slot 0 is always placed);
    *  - n = 1: every slot is that tick.
    *
    * Split: per SYMBOL (the reference pipeline runs per symbol),
    * windows ranked chronologically (date, morning < afternoon),
    * `train = int(n·0.6)`, `val = next int(n·0.2)` — D7's truncation
    * arithmetic. DELIBERATE deviation from the reference's
    * `sorted(window_ids)` (model.py:326-349), where the string
    * '{date}_afternoon' sorts before '{date}_morning': a time-series
    * split must be chronological or the val/test boundary leaks
    * half a day — we rank by actual session order, so split
    * membership can differ from the reference within the boundary
    * day (documented, r12 advisory). Scaler: population mean/std of the TRAIN windows'
    * slot cents (sklearn StandardScaler ddof=0), from exact int64
    * sums; a symbol with no train stats or zero variance scales to
    * 0.0 flat.
    *
    * Scale shape: group-level index explosion (k·|windows| rows, not
    * k·|ticks| — D6's discipline), one broadcastable per-symbol stats
    * join, one final (window-key) aggregate. No full-table window
    * functions; every tensor row is independent.
    *
    * Engine-exactness: cents exact int64 end-to-end; µ = Σ/n and
    * σ = √(Σx²/n − µ²) are fixed IEEE spellings of exact ints; each
    * element is one subtract + one divide, then quantized to the
    * 1e-6 grid with the floor(x·1e6 + 0.5) sign-split spelling — fp
    * ops identical in BOTH engines (never `round(double, d)`, whose
    * BigDecimal-vs-fp-multiply semantics differ at boundaries — the
    * r11 lesson), `+ 0.0` normalizing the signed zero. */
  def windowTensors(ticks: DataFrame, k: Int,
                    trainRatio: Double = 0.6,
                    valRatio: Double = 0.2,
                    cacheKey: Option[String] = None): DataFrame = {
    val slots = slotChain(ticks, k, trainRatio, valRatio, cacheKey).scaled
    slots
      .withColumn("el", expr("CAST(u AS DOUBLE) / 1000000.0D + 0.0D"))
      .groupBy(col("symbol"), col("date"), col("win"), col("split"),
        col("cnt").as("n_ticks"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("el")))),
        s => s.getField("el")).as("tensor"))
      .orderBy("symbol", "date", "win")
  }

  /** D66 (driver shape) — the tensor export as SCALAR rows: one row
    * per (symbol, date, win, split, n_ticks, slot i) with the scaled
    * element `el`, straight off [[windowSlots]]. Identical values to
    * [[windowTensors]] (same slot chain, same micro-quantized
    * element), but no ARRAY column: array cells are unhashable in
    * pandas-based comparators (the round-12 driver red), and the
    * downstream consumers (D67/D68) already operate per slot. The
    * array spelling stays as the library's ML-handoff API. */
  def windowTensorRows(ticks: DataFrame, k: Int,
                       trainRatio: Double = 0.6,
                       valRatio: Double = 0.2,
                       cacheKey: Option[String] = None): DataFrame =
    slotChain(ticks, k, trainRatio, valRatio, cacheKey).scaled
      .withColumn("el", expr("CAST(u AS DOUBLE) / 1000000.0D + 0.0D"))
      .select(col("symbol"), col("date"), col("win"), col("split"),
        col("cnt").as("n_ticks"), col("i"), col("el"))
      .orderBy("symbol", "date", "win", "i")

  /** The D66 slot-level core: one row per (symbol, date, win, slot i)
    * with the scaled value held EXACT as int64 micros `u` — shared by
    * the tensor export (which divides back to doubles) and the D67
    * anomaly pipeline (which keeps integer/pinned-fold arithmetic).
    */
  /** Shared D66 slot machinery: the UNSCALED slot frame (symbol,
    * date, win, cnt, i, cents — k rows per session window, the
    * linspace/pad map applied) and the per-symbol chronological
    * window-rank roster (symbol, date, win, rn_w, n_w). Factored so
    * the global-split consumers (D66/D67/D68/D76 via [[windowSlots]])
    * and the per-fold retrain (D77 [[walkForwardRetrain]], which must
    * re-fit the scaler inside every fold) share one spelling of the
    * slot arithmetic. */
  private[graft] def slotFrames(ticks: DataFrame, k: Int)
      : (DataFrame, DataFrame) = {
    require(k >= 2, s"need >= 2 slots per window: $k")
    val h = hour(col("ts")); val m = minute(col("ts"))
    val wname =
      when((h === TickOps.MorningH) && (m >= TickOps.FromMin), "morning")
        .when((h === TickOps.AfternoonH) && (m >= TickOps.FromMin),
          "afternoon")
    val proj = ticks
      .withColumn("win", wname).filter(col("win").isNotNull)
      .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("cents",
        expr("CAST(round(bid * 100.0, 0) AS BIGINT)"))
      .select("tick_id", "symbol", "date", "win", "cents")
    val keys = Seq("symbol", "date", "win")
    val base = proj.withColumn("target_rn", row_number().over(
      Window.partitionBy(keys.map(col): _*).orderBy("tick_id")))
    val groups = proj.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val idx = groups
      .withColumn("i", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("target_rn",
        when(col("cnt") === 1, lit(1))
          .when(col("cnt") >= k, expr(s"(i * (cnt - 1)) div ${k - 1} + 1"))
          .otherwise(expr(s"((i + 1) * (cnt - 1) - 1) div ${k - 1} + 1")))
    val slots = idx.join(base, keys :+ "target_rn")
      .select(col("symbol"), col("date"), col("win"), col("cnt"),
        col("i"), col("cents"))
    val winOrd = when(col("win") === "morning", 0).otherwise(1)
    val ranked = groups
      .withColumn("rn_w", row_number().over(
        Window.partitionBy("symbol").orderBy(col("date"), winOrd)))
      .withColumn("n_w", count(lit(1)).over(Window.partitionBy("symbol")))
      .select("symbol", "date", "win", "rn_w", "n_w")
    (slots, ranked)
  }

  /** The split-tagged UNSCALED slot frame — [[slotFrames]] joined
    * with the per-symbol chronological train/val/test roster,
    * checkpointed: it feeds BOTH the train stats and the final
    * scaling, so the tick-scan chain must run once (the F35 barrier
    * discipline; the plan audit showed the uncheckpointed spelling
    * recomputing the whole window chain per consumer). */
  private[graft] def taggedSlots(ticks: DataFrame, k: Int,
                                 trainRatio: Double,
                                 valRatio: Double): DataFrame = {
    val (slots, rankFrame) = slotFrames(ticks, k)
    taggedFrom(slots, rankFrame, trainRatio, valRatio)
  }

  /** [[taggedSlots]] body over pre-built [[slotFrames]] outputs — the
    * seam the session-shared [[slotChain]] uses to derive the split
    * tagging from its CHECKPOINTED slot/rank frames instead of
    * re-scanning the tick fact. */
  private def taggedFrom(slots: DataFrame, rankFrame: DataFrame,
                         trainRatio: Double,
                         valRatio: Double): DataFrame = {
    val ranked = rankFrame
      .withColumn("split",
        when(col("rn_w") <= floor(col("n_w") * trainRatio), "train")
          .when(col("rn_w") <= floor(col("n_w") * trainRatio) +
            floor(col("n_w") * valRatio), "val")
          .otherwise("test"))
      .select("symbol", "date", "win", "split")
    slots.join(ranked, Seq("symbol", "date", "win"))
      .localCheckpoint(true)
  }

  /** The session-shareable D66 slot-chain bundle: every frame the
    * trading/model layer derives from the tick fact, checkpointed
    * once —
    *  - `slots`/`ranks`: [[slotFrames]]' raw outputs (D77's per-fold
    *    retrain re-splits from these),
    *  - `tagged`: the split-tagged unscaled frame (D82's scaler),
    *  - `scaled`: [[windowSlots]]' scaled int64-micro frame,
    *  - `errs`: [[windowErrs]]' per-window train-centroid errors.
    * Values are bit-identical to the per-call spellings (same plans,
    * checkpoints only add barriers). */
  private[graft] final case class SlotChain(slots: DataFrame,
                                            ranks: DataFrame,
                                            tagged: DataFrame,
                                            scaled: DataFrame,
                                            errs: DataFrame)

  private def buildSlotChain(ticks: DataFrame, k: Int,
                             trainRatio: Double,
                             valRatio: Double): SlotChain = {
    val (s0, r0) = slotFrames(ticks, k)
    val slots = s0.localCheckpoint(true)
    val ranks = r0.localCheckpoint(true)
    val tagged = taggedFrom(slots, ranks, trainRatio, valRatio)
    val scaled = scaleSlots(tagged, trainScaler(tagged))
      .localCheckpoint(true)
    val errs = windowErrs(scaled, k)
    SlotChain(slots, ranks, tagged, scaled, errs)
  }

  /** D66 slot chain, optionally SESSION-SHARED. Round 13 measured 11
    * registry consumers (q_anomaly_pipeline … q_staleness_report)
    * each re-deriving `taggedSlots`→`windowErrs` from the tick fact —
    * ~20-30 s of redundant scan work per bench run and the reason
    * q_error_profile led the driver heads at 16.3 s while
    * q_anomaly_pipeline (the same chain) ran 3.1 s. With `cacheKey`
    * set (the registry passes the sfDir), the whole bundle builds
    * ONCE per (session, corpus, k, ratios) — the pairCensus
    * discipline: pinned localCheckpoints served from
    * [[graft.SessionFrameCache]], purged when the session stops.
    * `cacheKey = None` (library callers, specs) builds uncached. */
  private[graft] def slotChain(ticks: DataFrame, k: Int,
                               trainRatio: Double, valRatio: Double,
                               cacheKey: Option[String]): SlotChain =
    cacheKey match {
      case None => buildSlotChain(ticks, k, trainRatio, valRatio)
      case Some(key) =>
        val ss = ticks.sparkSession
        graft.SessionFrameCache.getOrBuild(
          ss, s"slotChain|$key|$k|$trainRatio|$valRatio") {
          val before = graft.CkptGc.snapshot(ss)
          val chain = buildSlotChain(ticks, k, trainRatio, valRatio)
          graft.CkptGc.pinNewSince(ss, before)
          chain
        }
    }

  /** The per-symbol TRAIN scaler off a [[taggedSlots]] frame —
    * population mean/σ of the train slot cents from exact int64 sums
    * (one spelling for D66's scaling, D77's per-fold re-fit and
    * D82's parameter manifest). */
  private[graft] def trainScaler(tagged: DataFrame): DataFrame =
    tagged
      .filter(col("split") === "train")
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_tr"),
        sum(col("cents")).as("sa"),
        sum(col("cents") * col("cents")).as("sq"))
      .withColumn("mu", expr("CAST(sa AS DOUBLE) / n_tr"))
      .withColumn("sd", expr(
        "CASE WHEN CAST(sq AS DOUBLE) / n_tr" +
          " - (CAST(sa AS DOUBLE) / n_tr) * (CAST(sa AS DOUBLE) / n_tr)" +
          " > 0 THEN sqrt(CAST(sq AS DOUBLE) / n_tr" +
          " - (CAST(sa AS DOUBLE) / n_tr) * (CAST(sa AS DOUBLE) / n_tr))" +
          " END"))
      .select("symbol", "mu", "sd")

  /** Scale a [[taggedSlots]] frame against a [[trainScaler]] frame —
    * D66's quantized standard scaling. */
  private def scaleSlots(tagged: DataFrame, stats: DataFrame): DataFrame =
    tagged
      .join(broadcast(stats), Seq("symbol"), "left")
      .withColumn("x",
        when(col("sd").isNotNull && col("sd") > 0,
          (col("cents") - col("mu")) / col("sd")).otherwise(lit(0.0)))
      // double-suffixed literals: Spark parses a bare `1000000.0` as
      // DECIMAL and the whole tensor would silently become DecimalType
      .withColumn("u", expr(
        "CAST(CASE WHEN x >= 0 THEN floor(x * 1000000.0D + 0.5D)" +
          " ELSE -floor(-x * 1000000.0D + 0.5D) END AS BIGINT)"))
      .select("symbol", "date", "win", "split", "cnt", "i", "u")

  private[graft] def windowSlots(ticks: DataFrame, k: Int,
                                 trainRatio: Double,
                                 valRatio: Double): DataFrame = {
    val tagged = taggedSlots(ticks, k, trainRatio, valRatio)
    scaleSlots(tagged, trainScaler(tagged))
  }

  /** D67 — END-TO-END PER-SYMBOL ANOMALY PIPELINE: the composed
    * automate_pipeline.py / main.py flow (ref: automate_pipeline.py
    * per-symbol train→val→test cycle; main.py's live scoring of the
    * session windows; test.py:333-344 percentile thresholds on test
    * errors) as ONE declarative plan — session filter (B1) → window
    * tensors (D66) → train-fit scaler (D8) → per-window error against
    * the train centroid (the 0-component linear form of F99's
    * reconstruction error) → per-symbol p99 flag on TEST windows:
    *
    *   err(w) = Σᵢ (uᵢ − ūᵢ)²/10¹²/k over the k slots, ū the
    *   per-(symbol, slot) TRAIN mean — how far the window sits from
    *   the symbol's trained shape; flags = test windows whose error
    *   clears the symbol's p99 test-error percentile (the reference's
    *   own thresholding).
    *
    * Engine-exactness: slot values are D66's exact int64 micros;
    * per-slot train sums are order-free int64; each window's error
    * folds its k terms in ascending-slot order (ordered list fold,
    * never an unordered SUM of doubles); the error quantizes via the
    * sign-split floor spelling; the flag compare is int64-vs-double
    * percentile over int64 inputs (D5 pairing). */
  def anomalyPipeline(ticks: DataFrame, k: Int,
                      trainRatio: Double = 0.6, valRatio: Double = 0.2,
                      pct: Double = 0.99,
                      cacheKey: Option[String] = None): DataFrame = {
    val errsCk = slotChain(ticks, k, trainRatio, valRatio, cacheKey).errs
    val thr = errsCk.filter(col("split") === "test")
      .groupBy("symbol")
      .agg(expr(s"percentile(u_err, $pct)").as("qu"))
    errsCk.join(broadcast(thr), Seq("symbol"), "left")
      .select(col("symbol"), col("date"), col("win"), col("split"),
        (col("u_err").cast("double") / lit(1000000.0) + lit(0.0))
          .as("err"),
        (col("split") === "test" && col("qu").isNotNull &&
          col("u_err").cast("double") > col("qu")).as("is_anomaly"))
      .orderBy("symbol", "date", "win")
  }

  /** The D67 per-window train-centroid error chain over a
    * [[windowSlots]] frame — (symbol, date, win, split, u_err int64
    * micros), checkpointed (it feeds thresholds + output in every
    * consumer: D67 pipeline, D68 profile, D76 backtest). */
  private def windowErrs(slots: DataFrame, k: Int): DataFrame = {
    val trainMeans = slots.filter(col("split") === "train")
      .groupBy("symbol", "i")
      .agg(sum(col("u")).as("su"), count(lit(1)).as("n_tr"))
    val terms = slots.join(broadcast(trainMeans), Seq("symbol", "i"), "left")
      .withColumn("t", expr(
        "CASE WHEN n_tr IS NULL THEN 0.0D ELSE" +
          " (CAST(u AS DOUBLE) - CAST(su AS DOUBLE) / n_tr)" +
          " * (CAST(u AS DOUBLE) - CAST(su AS DOUBLE) / n_tr)" +
          " / 1000000.0D / 1000000.0D END"))
    terms
      .groupBy(col("symbol"), col("date"), col("win"), col("split"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("i"), col("t")))),
          s => s.getField("t")),
        lit(0.0), (acc, x) => acc + x).as("e0"))
      .withColumn("u_err", expr(
        s"CAST(floor(e0 / $k * 1000000.0D + 0.5D) AS BIGINT)"))
      .drop("e0")
      .localCheckpoint(true)
  }

  /** D77 — WALK-FORWARD MODEL RETRAIN (ref: README.md §9.2 "Walk
    * Forward Validation — rolling window evaluation, mimics
    * production retraining cycles"; automate_pipeline.py's per-cycle
    * retrain): the anomaly MODEL itself re-fit at each rolling
    * origin, not just the fold bookkeeping of D9/D69. Fold f trains
    * on each symbol's first `minTrain + f·step` session windows
    * (EXPANDING origin — the production "retrain on everything we
    * have" cycle) and scores the NEXT `step` windows out-of-sample;
    * train and eval roles here are per-fold and intentionally overlap
    * across folds (fold f+1's train absorbs fold f's eval — that IS
    * the retraining cycle; the eval blocks themselves are disjoint).
    * Per fold the FULL model re-fits exactly as D66/D67 fit it once:
    * scaler = population mean/σ of the fold-train slot cents (exact
    * int64 sums), centroid = per-slot mean of the fold-train scaled
    * micros, threshold = percentile(pct) of the fold-TRAIN window
    * errors (the only split that exists at the origin — the
    * reference's test-phase percentile applied to what production
    * would have). Report per (fold, symbol): train/eval window
    * counts, mean out-of-sample error (IEEE division of exact int64
    * micros, unrounded), and eval windows flagged above the fold's
    * trained threshold — the overfitting-across-regimes read README
    * §8.3/9.2 asks for. Symbols whose roster is exhausted at a fold
    * (no eval windows left) drop from that fold — D7's truncation
    * discipline.
    *
    * Scale shape: ONE tick-fact collapse (shared [[slotFrames]]) to
    * the k·|windows| slot frame, checkpointed; everything after runs
    * on that frame × |folds| (calendar-bounded, never tick-bounded) —
    * per-(fold, symbol) scaler/centroid/threshold aggregates are all
    * map-side-combinable with bounded broadcast joins back. */
  def walkForwardRetrain(ticks: DataFrame, k: Int, folds: Int,
                         minTrain: Int, step: Int,
                         pct: Double = 0.99,
                         cacheKey: Option[String] = None): DataFrame = {
    require(folds >= 1, s"need >= 1 fold: $folds")
    require(minTrain >= 1, s"need >= 1 seed train window: $minTrain")
    require(step >= 1, s"need >= 1 eval window per fold: $step")
    // ratios don't matter to D77 (it re-splits per fold) but the
    // cache key carries them — use the defaults so the registry
    // consumers land on the ONE shared bundle
    val chain = slotChain(ticks, k, 0.6, 0.2, cacheKey)
    val tagged = chain.slots
      .join(chain.ranks.select("symbol", "date", "win", "rn_w"),
        Seq("symbol", "date", "win")).localCheckpoint(true)
    val foldGrid = ticks.sparkSession.range(folds)
      .select(col("id").cast("long").as("fold"))
      .withColumn("origin", lit(minTrain.toLong) + col("fold") * step)
    val ft = tagged.crossJoin(broadcast(foldGrid))
      .withColumn("role",
        when(col("rn_w") <= col("origin"), "train")
          .when(col("rn_w") <= col("origin") + step, "eval"))
      .filter(col("role").isNotNull)
    // per-(fold, symbol) scaler — windowSlots' exact spelling with the
    // fold key riding along
    val st = ft.filter(col("role") === "train")
      .groupBy("fold", "symbol")
      .agg(count(lit(1)).as("n_tr"),
        sum(col("cents")).as("sa"),
        sum(col("cents") * col("cents")).as("sq"))
      .withColumn("mu", expr("CAST(sa AS DOUBLE) / n_tr"))
      .withColumn("sd", expr(
        "CASE WHEN CAST(sq AS DOUBLE) / n_tr" +
          " - (CAST(sa AS DOUBLE) / n_tr) * (CAST(sa AS DOUBLE) / n_tr)" +
          " > 0 THEN sqrt(CAST(sq AS DOUBLE) / n_tr" +
          " - (CAST(sa AS DOUBLE) / n_tr) * (CAST(sa AS DOUBLE) / n_tr))" +
          " END"))
      .select("fold", "symbol", "mu", "sd")
    val ux = ft.join(broadcast(st), Seq("fold", "symbol"), "left")
      .withColumn("x",
        when(col("sd").isNotNull && col("sd") > 0,
          (col("cents") - col("mu")) / col("sd")).otherwise(lit(0.0)))
      .withColumn("u", expr(
        "CAST(CASE WHEN x >= 0 THEN floor(x * 1000000.0D + 0.5D)" +
          " ELSE -floor(-x * 1000000.0D + 0.5D) END AS BIGINT)"))
      .localCheckpoint(true) // feeds the centroid agg + the terms join
    // per-(fold, symbol, i) train centroid + per-window error — the
    // windowErrs chain with the fold key riding along
    val tm = ux.filter(col("role") === "train")
      .groupBy("fold", "symbol", "i")
      .agg(sum(col("u")).as("su"), count(lit(1)).as("n_ct"))
    val terms = ux.join(broadcast(tm), Seq("fold", "symbol", "i"), "left")
      .withColumn("t", expr(
        "CASE WHEN n_ct IS NULL THEN 0.0D ELSE" +
          " (CAST(u AS DOUBLE) - CAST(su AS DOUBLE) / n_ct)" +
          " * (CAST(u AS DOUBLE) - CAST(su AS DOUBLE) / n_ct)" +
          " / 1000000.0D / 1000000.0D END"))
    val errs = terms
      .groupBy(col("fold"), col("symbol"), col("date"), col("win"),
        col("role"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("i"), col("t")))),
          s => s.getField("t")),
        lit(0.0), (acc, x) => acc + x).as("e0"))
      .withColumn("u_err", expr(
        s"CAST(floor(e0 / $k * 1000000.0D + 0.5D) AS BIGINT)"))
      .drop("e0")
      .localCheckpoint(true) // feeds threshold + train count + eval
    val thr = errs.filter(col("role") === "train")
      .groupBy("fold", "symbol")
      .agg(expr(s"percentile(u_err, $pct)").as("qu"),
        count(lit(1)).as("n_train_w"))
    errs.filter(col("role") === "eval")
      .join(broadcast(thr), Seq("fold", "symbol"))
      .groupBy("fold", "symbol")
      .agg(max(col("n_train_w")).as("n_train_w"),
        count(lit(1)).as("n_eval_w"),
        sum(col("u_err")).as("se"),
        sum(when(col("u_err").cast("double") > col("qu"), 1L)
          .otherwise(0L)).as("n_flagged"))
      .withColumn("mean_err",
        expr("CAST(se AS DOUBLE) / n_eval_w / 1000000.0D"))
      .select("fold", "symbol", "n_train_w", "n_eval_w", "mean_err",
        "n_flagged")
      .orderBy("fold", "symbol")
  }

  /** D68 — ERROR-PROFILE EVALUATION TABLE: the reference's test-phase
    * report (ref: test.py:326-349 — `np.percentile` thresholds over
    * the window errors plus the anomaly count each threshold yields,
    * logged per run): per split, the window count, the ppm-exact mean
    * error, and per requested percentile the threshold and the number
    * of windows clearing it. One pass over D67's error frame, one
    * tiny per-split threshold aggregate broadcast back, ONE final
    * aggregate, stack() reshaping to a (split, pct) row — D5's
    * one-aggregation discipline (k threshold scans would re-read the
    * errors k times). Mean is exact int division of ppm errors;
    * thresholds are the D5 percentile/quantile_cont pairing. */
  def errorProfile(ticks: DataFrame, k: Int,
                   pcts: Seq[Double] = Seq(92.0, 99.5),
                   cacheKey: Option[String] = None): DataFrame = {
    val errs = anomalyPipeline(ticks, k, cacheKey = cacheKey)
      .withColumn("u",
        expr("CAST(floor(err * 1000000.0D + 0.5D) AS BIGINT)"))
    val thrAggs = pcts.zipWithIndex.map { case (p, i) =>
      expr(s"percentile(u, ${p / 100.0})").as(s"t$i")
    }
    val thr = errs.groupBy("split").agg(thrAggs.head, thrAggs.tail: _*)
    val cAggs = Seq(count(lit(1)).as("n_windows"),
      expr("sum(u) div count(1)").as("mean_err_ppm")) ++
      pcts.indices.flatMap(i => Seq(
        sum(when(col("u").cast("double") > col(s"t$i"), 1L)
          .otherwise(0L)).as(s"n$i"),
        first(col(s"t$i")).as(s"thr$i")))
    val one = errs.join(broadcast(thr), "split")
      .groupBy("split").agg(cAggs.head, cAggs.tail: _*)
    val stackArgs = pcts.zipWithIndex.map { case (p, i) =>
      s"CAST($p AS DOUBLE), round(thr$i, 4) + 0.0D, n$i"
    }.mkString(", ")
    one.selectExpr("split", "n_windows", "mean_err_ppm",
      s"stack(${pcts.length}, $stackArgs)" +
        " AS (pct, threshold_ppm, n_above)")
      .orderBy("split", "pct")
  }

  // ===== D75 — deterministic ELM autoencoder ======================

  /** D75 hidden width (3 hidden units + the bias feature → a 4×4
    * normal-equation system, unrolled Cholesky). */
  val ElmHidden = 3
  /** D75 ridge term added to the unit-scaled Gram diagonal. */
  val ElmLambda = 0.01

  /** Deterministic pseudo-random stream for the FIXED hidden weights:
    * one LCG step (Knuth/glibc constants — public arithmetic), kept
    * in exact int64 so BOTH engines derive identical dyadic-rational
    * weights. NOT cryptographic and deliberately so: the ELM recipe
    * (Huang et al. 2006) only needs fixed random-ish projections,
    * and reproducibility across engines beats entropy here. */
  def elmHash(t: Long): Long = (1103515245L * t + 12345L) % 2048L
  /** Hidden weight numerator for unit j, input slot i ∈ [-1024, 1023];
    * the weight is `elmWInt / 4096.0` (dyadic — exactly representable
    * in binary, so the decimal literal parses to the identical double
    * in both engines). The 1/4096 = (1/1024)·(1/4) folds in a 1/√k
    * input scaling FOR k = 16 (the registry's tensorSlots); for other
    * k the projection scale is simply 1/4096 — still a fixed
    * deterministic hidden layer, which is all the ELM recipe
    * requires (the ridge output layer absorbs any fixed input scale;
    * only conditioning, not validity, prefers 1/√k). The constant is
    * deliberately k-independent so the k=4 spec mirror and the k=16
    * registry key share one spelling (r13 advice: the doc claimed
    * the 1/√k fold unconditionally). */
  def elmWInt(j: Int, i: Int, k: Int): Long = elmHash(j.toLong * k + i) - 1024L
  /** Hidden bias numerator for unit j ∈ [-1024, 1023]; bias is
    * `elmBInt / 1024.0`. */
  def elmBInt(j: Int): Long = elmHash(100000L + j) - 1024L

  /** Double literal in E-notation: approximate-numeric literals are
    * DOUBLE in both Spark SQL and DuckDB, while a bare `0.5` is
    * DECIMAL in Spark — the one literal-typing divergence that can
    * silently change arithmetic. Every D75 shared fragment goes
    * through this. */
  def dlit(v: Double): String = {
    val s = java.lang.Double.toString(v)
    if (s.contains("E") || s.contains("e")) s else s + "E0"
  }

  /** The hidden pre-activation z_j over pivoted slot columns s0..s(k-1)
    * (int64 micros): `b_j + Σ_i w_ji · (s_i/1e6)` — a fixed
    * left-associative chain, ONE text for both engines. */
  def elmZExpr(j: Int, k: Int): String =
    s"(${dlit(elmBInt(j) / 1024.0)}" + (0 until k).map { i =>
      s" + (${dlit(elmWInt(j, i, k) / 4096.0)})*(CAST(s$i AS DOUBLE)/1.0E6)"
    }.mkString + ")"

  /** Softsign activation z/(1+|z|) quantized to int64 micros via the
    * sign-split floor spelling (the r11 discipline — identical IEEE
    * ops in both engines, no round()). */
  def elmVExpr(z: String): String =
    s"CAST(CASE WHEN $z >= 0.0E0" +
      s" THEN floor(($z/(1.0E0 + $z))*1.0E6 + 5.0E-1)" +
      s" ELSE -floor(((-($z))/(1.0E0 - $z))*1.0E6 + 5.0E-1) END AS BIGINT)"

  /** Unit-scaled regularized normal-equation entries over the exact
    * int64 Gram sums (g11..g33, sv1..sv3, n_tr); the bias feature is
    * the constant 1e6 micros, so its cross terms reduce to sv_j/1e6
    * and the corner to n_tr. */
  def elmAExprs: Seq[(String, String)] = {
    val lam = dlit(ElmLambda)
    Seq(
      "a11" -> s"(CAST(g11 AS DOUBLE)/1.0E12 + $lam)",
      "a21" -> "(CAST(g21 AS DOUBLE)/1.0E12)",
      "a22" -> s"(CAST(g22 AS DOUBLE)/1.0E12 + $lam)",
      "a31" -> "(CAST(g31 AS DOUBLE)/1.0E12)",
      "a32" -> "(CAST(g32 AS DOUBLE)/1.0E12)",
      "a33" -> s"(CAST(g33 AS DOUBLE)/1.0E12 + $lam)",
      "a41" -> "(CAST(sv1 AS DOUBLE)/1.0E6)",
      "a42" -> "(CAST(sv2 AS DOUBLE)/1.0E6)",
      "a43" -> "(CAST(sv3 AS DOUBLE)/1.0E6)",
      "a44" -> s"(CAST(n_tr AS DOUBLE) + $lam)")
  }

  /** Unrolled 4×4 Cholesky of the SPD system, as SEQUENTIAL stages
    * (each entry only references earlier stages — no same-SELECT
    * alias references, which the two engines resolve differently). */
  def elmCholStages: Seq[Seq[(String, String)]] = Seq(
    Seq("l11" -> "sqrt(a11)"),
    Seq("l21" -> "(a21/l11)", "l31" -> "(a31/l11)", "l41" -> "(a41/l11)"),
    Seq("l22" -> "sqrt(a22 - l21*l21)"),
    Seq("l32" -> "((a32 - l31*l21)/l22)",
      "l42" -> "((a42 - l41*l21)/l22)"),
    Seq("l33" -> "sqrt(a33 - l31*l31 - l32*l32)"),
    Seq("l43" -> "((a43 - l41*l31 - l42*l32)/l33)"),
    Seq("l44" -> "sqrt(a44 - l41*l41 - l42*l42 - l43*l43)"))

  /** Forward (Ly = r) then back (Lᵀβ = y) substitution stages over
    * the per-slot rhs (r1..r4) and the symbol's factor. */
  def elmSolveStages: Seq[Seq[(String, String)]] = Seq(
    Seq("y1" -> "(r1/l11)"),
    Seq("y2" -> "((r2 - l21*y1)/l22)"),
    Seq("y3" -> "((r3 - l31*y1 - l32*y2)/l33)"),
    Seq("y4" -> "((r4 - l41*y1 - l42*y2 - l43*y3)/l44)"),
    Seq("b4" -> "(y4/l44)"),
    Seq("b3" -> "((y3 - l43*b4)/l33)"),
    Seq("b2" -> "((y2 - l32*b3 - l42*b4)/l22)"),
    Seq("b1" -> "((y1 - l21*b2 - l31*b3 - l41*b4)/l11)"))

  /** Per-slot reconstruction x̂ = β·[h;1] over the window's hidden
    * micros v1..v3 and the slot's solved β — one fixed chain. */
  val elmXhExpr: String =
    "(b1*(CAST(v1 AS DOUBLE)/1.0E6) + b2*(CAST(v2 AS DOUBLE)/1.0E6)" +
      " + b3*(CAST(v3 AS DOUBLE)/1.0E6) + b4)"
  /** Per-slot squared reconstruction-error micros (non-negative, so a
    * plain floor-HALF_UP — no sign split needed). */
  val elmTqExpr: String =
    "CAST(floor((CAST(u AS DOUBLE)/1.0E6 - xh)" +
      "*(CAST(u AS DOUBLE)/1.0E6 - xh)*1.0E6 + 5.0E-1) AS BIGINT)"

  /** D75 — NONLINEAR AUTOENCODER ANOMALY SCORING, trained closed-form
    * (the round-12 verdict's ML-capability gap, #6): the reference
    * gradient-trains a per-symbol autoencoder over the session-window
    * tensors and thresholds reconstruction error (ref: ML Model/
    * Scripts/train.py:1-515, model.py `Autoencoder`, test.py:333-344
    * percentile flags). Gradient descent is nondeterministic across
    * engines, so this is the EXTREME-LEARNING-MACHINE form (Huang et
    * al. 2006): a FIXED pseudo-random hidden layer (LCG-derived
    * dyadic weights, softsign activation — rational arithmetic only,
    * no cross-engine libm tanh) and an OUTPUT layer solved exactly
    * per symbol via ridge normal equations — F61's exact-sum
    * discipline, here as an unrolled 4×4 Cholesky whose every entry
    * is one fixed IEEE expression over exact int64 sums. The model
    * is nonlinear in the inputs (softsign of 16-slot projections),
    * deterministic, and ORACLE-CHECKABLE: DuckDB re-derives the same
    * weights, the same Gram integers, the same factor, the same β.
    *
    * Flow per symbol: D66 slots → hidden micros v_j (softsign,
    * 1e-6-quantized so Gram sums are EXACT int64, order-free) →
    * train-window Gram + per-slot cross sums → Cholesky solve for
    * β(slot) → reconstruction error per window (per-term quantized
    * micros, integer sum, div k) → p99 flag on TEST windows (the D67
    * pairing). Symbols with no train windows score 0 (D67's rule).
    *
    * Scale shape: everything is keyed by symbol — Gram/rhs are
    * per-symbol aggregates over ≤ k·|windows| rows, the factor is a
    * 1-row-per-symbol broadcast, β is k rows per symbol; no global
    * barrier, no driver-side linear algebra. At 10⁴ symbols × years
    * of days the largest shuffle is the (symbol, window)-keyed slot
    * frame D66 already pays. */
  def elmRecon(ticks: DataFrame, k: Int,
               trainRatio: Double = 0.6, valRatio: Double = 0.2,
               pct: Double = 0.99,
               cacheKey: Option[String] = None): DataFrame = {
    require(k >= 2, s"need >= 2 slots: $k")
    // feeds pivot, rhs and prediction (checkpointed in the chain)
    val slots = slotChain(ticks, k, trainRatio, valRatio, cacheKey).scaled
    val pivAggs = (0 until k).map(i =>
      max(when(col("i") === i, col("u"))).as(s"s$i"))
    val winKey = Seq("symbol", "date", "win", "split")
    var hid0 = slots.groupBy(winKey.map(col): _*)
      .agg(pivAggs.head, pivAggs.tail: _*)
    (1 to ElmHidden).foreach { j =>
      hid0 = hid0.withColumn(s"z$j", expr(elmZExpr(j, k)))
    }
    (1 to ElmHidden).foreach { j =>
      hid0 = hid0.withColumn(s"v$j", expr(elmVExpr(s"z$j")))
    }
    val hid = hid0.select(
      (winKey.map(col) ++ (1 to ElmHidden).map(j => col(s"v$j"))): _*)
      .localCheckpoint(true) // feeds Gram, rhs and prediction
    val gs = hid.filter(col("split") === "train")
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_tr"),
        sum(expr("v1*v1")).as("g11"), sum(expr("v2*v1")).as("g21"),
        sum(expr("v2*v2")).as("g22"), sum(expr("v3*v1")).as("g31"),
        sum(expr("v3*v2")).as("g32"), sum(expr("v3*v3")).as("g33"),
        sum(col("v1")).as("sv1"), sum(col("v2")).as("sv2"),
        sum(col("v3")).as("sv3"))
    var ch = elmAExprs.foldLeft(gs) { case (df, (n, e)) =>
      df.withColumn(n, expr(e))
    }
    elmCholStages.foreach { st =>
      ch = st.foldLeft(ch) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
    }
    val chol = ch.select(col("symbol") +:
      elmCholStages.flatten.map { case (n, _) => col(n) }: _*)
    val rh = slots.join(hid, winKey)
      .filter(col("split") === "train")
      .groupBy("symbol", "i")
      .agg(sum(expr("v1*u")).as("c1"), sum(expr("v2*u")).as("c2"),
        sum(expr("v3*u")).as("c3"), sum(col("u")).as("c0"))
      .withColumn("r1", expr("(CAST(c1 AS DOUBLE)/1.0E12)"))
      .withColumn("r2", expr("(CAST(c2 AS DOUBLE)/1.0E12)"))
      .withColumn("r3", expr("(CAST(c3 AS DOUBLE)/1.0E12)"))
      .withColumn("r4", expr("(CAST(c0 AS DOUBLE)/1.0E6)"))
    var bt = rh.join(broadcast(chol), Seq("symbol"))
    elmSolveStages.foreach { st =>
      bt = st.foldLeft(bt) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
    }
    val beta = bt.select("symbol", "i", "b1", "b2", "b3", "b4")
    val errs = slots.join(hid, winKey)
      .join(broadcast(beta), Seq("symbol", "i"), "left")
      .withColumn("xh", expr(elmXhExpr))
      .withColumn("tq",
        expr(s"CASE WHEN b1 IS NULL THEN 0L ELSE $elmTqExpr END"))
      .groupBy(winKey.map(col): _*)
      .agg(sum(col("tq")).as("stq"))
      .withColumn("err_ppm", expr(s"stq div $k"))
      .drop("stq")
      .localCheckpoint(true) // feeds thresholds + output
    val thr = errs.filter(col("split") === "test")
      .groupBy("symbol")
      .agg(expr(s"percentile(err_ppm, $pct)").as("qu"))
    errs.join(broadcast(thr), Seq("symbol"), "left")
      .select(col("symbol"), col("date"), col("win"), col("split"),
        col("err_ppm"),
        (col("split") === "test" && col("qu").isNotNull &&
          col("err_ppm").cast("double") > col("qu")).as("is_anomaly"))
      .orderBy("symbol", "date", "win")
  }

  /** D76 — MODEL-SIGNAL BACKTEST (the round-12 verdict's gap #7; ref
    * README §9.1/9.3 — backtesting the model's signals on history):
    * D62's position state machine driven by the ANOMALY MODEL's own
    * flags instead of a cointegration z-score. Per symbol, over the
    * TEST windows in session order: an anomaly flag (D67's p99 rule)
    * ENTERS a position against the window's deviation direction
    * (window above its trained mean → short, below → long — the
    * mean-reversion read of a shape anomaly), and the position EXITS
    * once the window error recovers below `exitFrac`·threshold. The
    * state machine is D62's spelling exactly — threshold crossings
    * emit signals, position = last(signal) IGNORE NULLS — and P&L
    * accrues in EXACT int64 cents: posₜ₋₁·(closeₜ − closeₜ₋₁) with
    * integer closes, so the report has no float surface at all.
    *
    * Scale shape: the error chain is D67's (shared [[windowErrs]]);
    * closes are one more keyed collapse of the session ticks; the
    * state windows run on the per-symbol WINDOW roster (days×2 rows
    * per symbol, not ticks). */
  def anomalySignalBacktest(ticks: DataFrame, k: Int,
                            trainRatio: Double = 0.6,
                            valRatio: Double = 0.2,
                            pct: Double = 0.99,
                            exitFrac: Double = 0.5,
                            cacheKey: Option[String] = None): DataFrame =
    signalWindowFrame(ticks, k, trainRatio, valRatio, pct, exitFrac,
      cacheKey)
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("pos") =!= 0 && col("pos") =!= col("pos_prev"), 1L)
          .otherwise(0L)).as("n_trades"),
        sum(when(col("pos") =!= 0, 1L).otherwise(0L)).as("windows_in_pos"),
        sum(col("pnl")).as("pnl_cents"))
      .orderBy("symbol")

  /** Window close = slot k−1 (the linspace/pad map lands the LAST
    * tick there for every n); its scaled value signs the deviation
    * direction. One spelling for D76/D81 (r13 review dedup). */
  private def lastSlotU(slots: DataFrame, k: Int): DataFrame =
    slots.filter(col("i") === k - 1)
      .select(col("symbol"), col("date"), col("win"),
        col("u").as("u_last"))

  /** Exact-cent session-window closes straight off the ticks (the
    * slot frame carries scaled micros, P&L wants raw cents). One
    * spelling for D76/D81 (r13 review dedup). */
  private def sessionCloses(ticks: DataFrame): DataFrame = {
    val h = hour(col("ts")); val m = minute(col("ts"))
    val wname =
      when((h === TickOps.MorningH) && (m >= TickOps.FromMin), "morning")
        .when((h === TickOps.AfternoonH) && (m >= TickOps.FromMin),
          "afternoon")
    ticks
      .withColumn("win", wname).filter(col("win").isNotNull)
      .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("cents", expr("CAST(round(bid * 100.0, 0) AS BIGINT)"))
      .groupBy("symbol", "date", "win")
      .agg(max_by(col("cents"), col("tick_id")).as("close_cents"))
  }

  /** The D76 per-window traded frame — one row per (symbol, TEST
    * window) carrying the position machine's pos/pos_prev and the
    * exact-cent P&L step. Shared by the D76 aggregate report and the
    * D78 performance statistics. */
  private def signalWindowFrame(ticks: DataFrame, k: Int,
                                trainRatio: Double, valRatio: Double,
                                pct: Double,
                                exitFrac: Double,
                                cacheKey: Option[String]): DataFrame = {
    require(exitFrac > 0 && exitFrac < 1, s"exitFrac in (0,1): $exitFrac")
    val chain = slotChain(ticks, k, trainRatio, valRatio, cacheKey)
    val slots = chain.scaled
    val errs = chain.errs
    val thr = errs.filter(col("split") === "test")
      .groupBy("symbol")
      .agg(expr(s"percentile(u_err, $pct)").as("qu"))
    val base = errs.filter(col("split") === "test")
      .join(lastSlotU(slots, k), Seq("symbol", "date", "win"))
      .join(sessionCloses(ticks), Seq("symbol", "date", "win"))
      .join(broadcast(thr), Seq("symbol"))
    val winOrd = when(col("win") === "morning", 0).otherwise(1)
    val wSym = Window.partitionBy("symbol").orderBy(col("date"), winOrd)
    val wRun = wSym.rowsBetween(Window.unboundedPreceding, 0)
    val traded = base
      .withColumn("sig",
        when(col("u_err").cast("double") > col("qu"),
          when(col("u_last") > 0, -1).otherwise(1))
          .when(col("u_err").cast("double") <= col("qu") * exitFrac, 0))
      .withColumn("pos", coalesce(
        last(col("sig"), ignoreNulls = true).over(wRun), lit(0)))
      .withColumn("pos_prev",
        coalesce(lag(col("pos"), 1).over(wSym), lit(0)))
      .withColumn("dc",
        col("close_cents") - lag(col("close_cents"), 1).over(wSym))
      .withColumn("pnl", when(col("dc").isNotNull,
        col("pos_prev") * col("dc")).otherwise(0L))
    traded
  }

  /** D78 — BACKTEST PERFORMANCE REPORT (ref: README.md §9.1 "MT5
    * Historical Backtest — tests model-generated signals", §8.4
    * "final performance validation"): the evaluation statistics a
    * desk actually reads off D76's per-window P&L series before
    * promoting a model — per symbol: window/trade counts, winning vs
    * losing steps and the hit rate among them, total P&L, and the
    * MAXIMUM DRAWDOWN of the cumulative P&L curve (running peak minus
    * running cumulative, maximized — D13's drawdown discipline
    * applied to the strategy's own equity curve instead of the
    * price). Everything exact int64 cents/counts off the shared
    * [[signalWindowFrame]]; the single float is the hit-rate — ONE
    * IEEE division of exact counts (D21's rule, unrounded), NULL when
    * no step ever had P&L (never 0/0). The equity-curve windows run
    * per symbol over the TEST-window roster (days×2 rows per symbol,
    * calendar-bounded — never ticks), sharing the position machine's
    * (symbol) partitioning: one exchange carries the state machine,
    * both running aggregates, and the final collapse. */
  def backtestReport(ticks: DataFrame, k: Int,
                     trainRatio: Double = 0.6, valRatio: Double = 0.2,
                     pct: Double = 0.99,
                     exitFrac: Double = 0.5,
                     cacheKey: Option[String] = None): DataFrame = {
    val t = signalWindowFrame(ticks, k, trainRatio, valRatio, pct,
      exitFrac, cacheKey)
    val winOrd = when(col("win") === "morning", 0).otherwise(1)
    val wRun = Window.partitionBy("symbol").orderBy(col("date"), winOrd)
      .rowsBetween(Window.unboundedPreceding, 0)
    val curve = t
      .withColumn("cum", sum(col("pnl")).over(wRun))
      .withColumn("dd", max(col("cum")).over(wRun) - col("cum"))
    curve.groupBy("symbol")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("pos") =!= 0 && col("pos") =!= col("pos_prev"), 1L)
          .otherwise(0L)).as("n_trades"),
        sum(when(col("pnl") > 0, 1L).otherwise(0L)).as("n_win_steps"),
        sum(when(col("pnl") < 0, 1L).otherwise(0L)).as("n_loss_steps"),
        sum(col("pnl")).as("pnl_cents"),
        max(col("dd")).as("max_dd_cents"))
      .withColumn("hit_rate", expr(
        "CASE WHEN n_win_steps + n_loss_steps > 0 THEN" +
          " CAST(n_win_steps AS DOUBLE) / (n_win_steps + n_loss_steps)" +
          " END"))
      .orderBy("symbol")
  }

  /** D83 — MODEL-STALENESS / BREACH-RUN REPORT (G42's batch twin;
    * ref: README.md §8.2 retraining cycles, §11 metric tracking —
    * the "does this model need retraining" evidence table): per
    * symbol, every session window scored against the DEPLOYED
    * threshold (the test-percentile qu — exactly what G40/G42 ship),
    * consecutive breaches clustered into maximal runs (D26's
    * run-id idiom: lag + running sum of run starts on the SAME
    * (symbol) exchange), reporting windows scored, windows breached,
    * run count, longest run, retrain alerts (runs reaching
    * `consecutive` — G42's rule), and the date of the first alert
    * (min over each run's Nth window — a string min, engine-stable).
    * Symbols whose threshold exists but never breach report zeros
    * with NULL first alert (left join back to the roster — auditable
    * absence, the B11 discipline). All exact int64 counts; the only
    * doubles are the threshold compares (identical both engines).
    * One exchange carries the lag, both running sums and the
    * collapse; the frame is the window roster, never ticks. */
  def stalenessReport(ticks: DataFrame, k: Int,
                      trainRatio: Double = 0.6, valRatio: Double = 0.2,
                      pct: Double = 0.99,
                      consecutive: Int = 3,
                      cacheKey: Option[String] = None): DataFrame = {
    require(consecutive >= 1, s"need >= 1 breach to alert: $consecutive")
    val errs = slotChain(ticks, k, trainRatio, valRatio, cacheKey).errs
    val thr = errs.filter(col("split") === "test")
      .groupBy("symbol")
      .agg(expr(s"percentile(u_err, $pct)").as("qu"))
    val winOrd = when(col("win") === "morning", 0).otherwise(1)
    val wSym = Window.partitionBy("symbol").orderBy(col("date"), winOrd)
    val wRun = wSym.rowsBetween(Window.unboundedPreceding, 0)
    val flagged = errs.join(broadcast(thr), Seq("symbol"))
      .withColumn("breach",
        when(col("u_err").cast("double") > col("qu"), 1).otherwise(0))
      .withColumn("start",
        when(col("breach") === 1 &&
          coalesce(lag(col("breach"), 1).over(wSym), lit(0)) === 0, 1)
          .otherwise(0))
      .withColumn("run_id", sum(col("start")).over(wRun))
      .localCheckpoint(true) // feeds the run stats + the roster
    val runs = flagged.filter(col("breach") === 1)
      .withColumn("rn_in_run", row_number().over(
        Window.partitionBy("symbol", "run_id")
          .orderBy(col("date"), winOrd)))
      .groupBy("symbol", "run_id")
      .agg(count(lit(1)).as("run_len"),
        min(when(col("rn_in_run") === consecutive, col("date")))
          .as("alert_date"))
    val perSym = runs.groupBy("symbol")
      .agg(sum(col("run_len")).as("n_breach_w"),
        count(lit(1)).as("n_runs"),
        max(col("run_len")).as("longest_run"),
        sum(when(col("run_len") >= consecutive, 1L).otherwise(0L))
          .as("n_alerts"),
        min(col("alert_date")).as("first_alert_date"))
    flagged.groupBy("symbol").agg(count(lit(1)).as("n_windows"))
      .join(perSym, Seq("symbol"), "left")
      .select(col("symbol"), col("n_windows"),
        coalesce(col("n_breach_w"), lit(0L)).as("n_breach_w"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"),
        coalesce(col("n_alerts"), lit(0L)).as("n_alerts"),
        col("first_alert_date"))
      .orderBy("symbol")
  }

  /** D82 — MODEL-PARAMETER MANIFEST (ref: ML Model/Model Parameters/
    * parameters.json + mlflow_utils.py's logged params/artifacts —
    * the serialized model the live endpoint loads): the trained
    * anomaly model AS A QUERYABLE TABLE, one row per (symbol, slot):
    * the per-slot train centroid (exact int64 sum over train count —
    * ONE IEEE division, unrounded), and the per-symbol scalars riding
    * along — scaler mean/σ (train population stats off exact sums),
    * p-percentile flag threshold, train/test window counts. This is
    * the A25 run registry's ARTIFACT payload made first-class: what
    * D67/G40/G41 deploy is exactly these numbers, so serving parity
    * is auditable by SELECT instead of by replaying the pipeline.
    * Symbols that never trained (no train windows) have no rows;
    * symbols without test windows carry NULL thresholds (the D67
    * inner-join conservatism made visible). Scale: one tick collapse
    * (shared [[taggedSlots]] checkpoint), then symbol-keyed
    * aggregates on calendar-bounded frames; output k rows/symbol. */
  def modelParams(ticks: DataFrame, k: Int,
                  trainRatio: Double = 0.6, valRatio: Double = 0.2,
                  pct: Double = 0.99,
                  cacheKey: Option[String] = None): DataFrame = {
    val chain = slotChain(ticks, k, trainRatio, valRatio, cacheKey)
    val stats = trainScaler(chain.tagged)
    val scaled = chain.scaled
    val errs = chain.errs
    val tm = scaled.filter(col("split") === "train")
      .groupBy("symbol", "i")
      .agg(sum(col("u")).as("su"), count(lit(1)).as("n_ct"))
    val tw = errs.groupBy("symbol").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L))
        .as("n_train_w"),
      sum(when(col("split") === "test", 1L).otherwise(0L))
        .as("n_test_w"))
    val thr = errs.filter(col("split") === "test").groupBy("symbol")
      .agg(expr(s"percentile(u_err, $pct)").as("qu"))
    tm.withColumn("centroid_u", expr("CAST(su AS DOUBLE) / n_ct"))
      .join(tw, Seq("symbol"))
      .join(broadcast(stats), Seq("symbol"), "left")
      .join(broadcast(thr), Seq("symbol"), "left")
      .select("symbol", "i", "centroid_u", "n_train_w", "n_test_w",
        "mu", "sd", "qu")
      .orderBy("symbol", "i")
  }

  /** D81 — SIGNAL-THRESHOLD SWEEP (ref: README.md §8.3 "tunes
    * hyperparameters"; test.py:326-349 sweeps percentile thresholds):
    * the "which flag percentile ships" decision table — D76's full
    * position machine re-run at every candidate threshold percentile
    * over the SAME error frame, reported per candidate: windows,
    * trades, windows-in-position, symbols ever in position
    * (exact distinct count), and total book P&L in exact cents. The
    * F71/F74 decision-artifact discipline applied to the trading
    * layer: one artifact, the stakeholder picks a row.
    *
    * Scale shape: the error chain runs ONCE (shared [[windowErrs]],
    * checkpointed); ALL thresholds come out of ONE per-symbol
    * aggregate (D68's stack discipline — never |pcts| passes), the
    * machine runs on the TEST-window roster × |pcts| (calendar-
    * bounded), partitioned (symbol, pct) so every sweep cell rides
    * the same exchange, and the final collapse is |pcts| rows. */
  def signalSweep(ticks: DataFrame, k: Int, pcts: Seq[Double],
                  trainRatio: Double = 0.6, valRatio: Double = 0.2,
                  exitFrac: Double = 0.5,
                  cacheKey: Option[String] = None): DataFrame = {
    require(pcts.nonEmpty, "need at least one percentile to sweep")
    require(pcts.map(pctTag).distinct.length == pcts.length,
      s"sweep percentiles collide after tagging: $pcts")
    require(exitFrac > 0 && exitFrac < 1, s"exitFrac in (0,1): $exitFrac")
    val chain = slotChain(ticks, k, trainRatio, valRatio, cacheKey)
    val slots = chain.scaled
    val errs = chain.errs
    val aggs = pcts.zipWithIndex.map { case (p, j) =>
      expr(s"percentile(u_err, ${dlit(p)})").as(s"qu_$j")
    }
    val thr = errs.filter(col("split") === "test")
      .groupBy("symbol").agg(aggs.head, aggs.tail: _*)
    val thrL = thr.select(col("symbol"), expr(
      s"stack(${pcts.length}, " + pcts.zipWithIndex.map { case (p, j) =>
        s"'${pctTag(p)}', qu_$j"
      }.mkString(", ") + ") AS (pct, qu)"))
    val base = errs.filter(col("split") === "test")
      .join(lastSlotU(slots, k), Seq("symbol", "date", "win"))
      .join(sessionCloses(ticks), Seq("symbol", "date", "win"))
      .join(broadcast(thrL), Seq("symbol"))
    val winOrd = when(col("win") === "morning", 0).otherwise(1)
    val wSym = Window.partitionBy("symbol", "pct")
      .orderBy(col("date"), winOrd)
    val wRun = wSym.rowsBetween(Window.unboundedPreceding, 0)
    base
      .withColumn("sig",
        when(col("u_err").cast("double") > col("qu"),
          when(col("u_last") > 0, -1).otherwise(1))
          .when(col("u_err").cast("double") <= col("qu") * exitFrac, 0))
      .withColumn("pos", coalesce(
        last(col("sig"), ignoreNulls = true).over(wRun), lit(0)))
      .withColumn("pos_prev",
        coalesce(lag(col("pos"), 1).over(wSym), lit(0)))
      .withColumn("dc",
        col("close_cents") - lag(col("close_cents"), 1).over(wSym))
      .withColumn("pnl", when(col("dc").isNotNull,
        col("pos_prev") * col("dc")).otherwise(0L))
      .groupBy("pct")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("pos") =!= 0 && col("pos") =!= col("pos_prev"), 1L)
          .otherwise(0L)).as("n_trades"),
        sum(when(col("pos") =!= 0, 1L).otherwise(0L)).as("windows_in_pos"),
        countDistinct(when(col("pos") =!= 0, col("symbol")))
          .as("n_symbols_pos"),
        sum(col("pnl")).as("pnl_cents"))
      .orderBy("pct")
  }

  /** Percentile tag ('0.9', '0.995') — a STRING sweep key, so the
    * grid join/groupBy never compares floats. Full decimal expansion
    * (shortest round-trip repr), never a fixed-width format: %.2f
    * collapsed 0.99 and 0.995 to the same key and the sweep silently
    * merged two threshold configurations (r13 review finding). */
  def pctTag(p: Double): String = {
    val s = java.math.BigDecimal.valueOf(p).stripTrailingZeros
      .toPlainString
    s
  }

  /** D80 — EXECUTION-LATENCY SENSITIVITY (ref: README.md §10.2 "live
    * /demo execution — execution logic separated from model logic";
    * the MT5 deployment's real slippage question): how much of D76's
    * backtest P&L survives when every signal executes ONE SESSION
    * WINDOW LATE — the difference between a signal's paper P&L and
    * what a live system that trades the NEXT window's close would
    * have kept. Delayed P&L re-prices each step with the position
    * decided two windows back (`pos₍t₋₂₎·(cₜ − cₜ₋₁)` — decided at
    * t−2, live over (t−1, t]); decay = paper − delayed, in exact
    * int64 cents. A strategy whose decay eats its P&L is trading
    * microstructure noise, not the model (the classic latency-decay
    * screen). One more lag on the SAME (symbol) exchange the position
    * machine already runs on — no new shuffle, calendar-bounded. */
  def latencySensitivity(ticks: DataFrame, k: Int,
                         trainRatio: Double = 0.6, valRatio: Double = 0.2,
                         pct: Double = 0.99,
                         exitFrac: Double = 0.5,
                         cacheKey: Option[String] = None): DataFrame = {
    val t = signalWindowFrame(ticks, k, trainRatio, valRatio, pct,
      exitFrac, cacheKey)
    val winOrd = when(col("win") === "morning", 0).otherwise(1)
    val wSym = Window.partitionBy("symbol").orderBy(col("date"), winOrd)
    t.withColumn("pos_prev2",
        coalesce(lag(col("pos"), 2).over(wSym), lit(0)))
      .withColumn("pnl_delayed", when(col("dc").isNotNull,
        col("pos_prev2") * col("dc")).otherwise(0L))
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_windows"),
        sum(col("pnl")).as("pnl_cents"),
        sum(col("pnl_delayed")).as("pnl_delayed_cents"))
      .withColumn("decay_cents",
        col("pnl_cents") - col("pnl_delayed_cents"))
      .orderBy("symbol")
  }

  /** D79 — BOOK-LEVEL BACKTEST REPORT (ref: README.md §9.3/10.2 —
    * the model deployed ACROSS symbols; the reference trades every
    * symbol's signals from one account): D76's per-window P&L rolled
    * up to the PORTFOLIO — per (date, session window) step the book's
    * net P&L across all symbols in a position, the running equity
    * curve and its max drawdown (the book risk a per-symbol report
    * structurally hides: symbol drawdowns can offset or stack), plus
    * the best/worst contributing symbols. All exact int64
    * cents/counts off the shared [[signalWindowFrame]]; extreme
    * contributors tie-break to the smallest symbol id (min-over-
    * equality, engine-stable — never a nondeterministic max_by). The
    * book curve runs on ONE global window over the (date, win) step
    * roster — global window BOUNDED by construction: the frame is the
    * calendar step roster (≤ 2·|days| rows), never ticks or windows×
    * symbols (the r12 WindowExec-warning audit pin). */
  def bookReport(ticks: DataFrame, k: Int,
                 trainRatio: Double = 0.6, valRatio: Double = 0.2,
                 pct: Double = 0.99,
                 exitFrac: Double = 0.5,
                 cacheKey: Option[String] = None): DataFrame = {
    val t = signalWindowFrame(ticks, k, trainRatio, valRatio, pct,
      exitFrac, cacheKey)
      .localCheckpoint(true) // feeds book steps + per-symbol
    val winOrd = when(col("win") === "morning", 0).otherwise(1)
    val steps = t.groupBy("date", "win")
      .agg(sum(col("pnl")).as("book_pnl"))
    val wRun = Window.orderBy(col("date"), winOrd)
      .rowsBetween(Window.unboundedPreceding, 0)
    val curve = steps
      .withColumn("cum", sum(col("book_pnl")).over(wRun))
      .withColumn("dd", max(col("cum")).over(wRun) - col("cum"))
    val book = curve.agg(count(lit(1)).as("n_steps"),
      sum(col("book_pnl")).as("pnl_cents"),
      max(col("dd")).as("max_dd_cents"))
    val perSym = t.groupBy("symbol").agg(sum(col("pnl")).as("sym_pnl"))
    val ext = perSym.agg(count(lit(1)).as("n_symbols"),
      max(col("sym_pnl")).as("best_pnl_cents"),
      min(col("sym_pnl")).as("worst_pnl_cents"))
    val picks = perSym.crossJoin(broadcast(ext))
      .agg(min(when(col("sym_pnl") === col("best_pnl_cents"),
        col("symbol"))).as("best_symbol"),
        min(when(col("sym_pnl") === col("worst_pnl_cents"),
          col("symbol"))).as("worst_symbol"))
    book.crossJoin(broadcast(ext)).crossJoin(broadcast(picks))
      .select("n_steps", "n_symbols", "pnl_cents", "max_dd_cents",
        "best_symbol", "best_pnl_cents", "worst_symbol",
        "worst_pnl_cents")
  }

  // ===== D84 — deterministic gradient-descent autoencoder ==========

  /** D84 initial encoder weight We₀[j][i] (hidden unit j, input slot
    * i): one LCG draw over a dedicated seed band, divided by 4096 —
    * dyadic, so BOTH engines parse the identical double (the D75
    * weight discipline; the band offsets keep D75's and D84's weight
    * streams disjoint). */
  def gdWe0(j: Int, i: Int, k: Int): Double =
    (elmHash(7000000L + j.toLong * k + i) - 1024L) / 4096.0
  /** D84 initial decoder weight Wd₀[i][j] (input slot i, hidden j). */
  def gdWd0(i: Int, j: Int, h: Int): Double =
    (elmHash(8000000L + i.toLong * h + j) - 1024L) / 4096.0

  /** Hidden activation z_j = Σᵢ we_j_i·(sᵢ/10⁶) over pivoted slot
    * columns s0..s(k−1) and joined weight columns — a fixed
    * left-associative chain, ONE text for both engines (the D75
    * shared-fragment discipline). */
  def gdZExpr(j: Int, k: Int): String =
    "(" + (0 until k).map { i =>
      s"we_${j}_$i*(CAST(s$i AS DOUBLE)/1.0E6)"
    }.mkString(" + ") + ")"
  /** Reconstruction x̂ᵢ = Σⱼ wd_i_j·z_j. */
  def gdXhExpr(i: Int, h: Int): String =
    "(" + (0 until h).map(j => s"wd_${i}_$j*z$j").mkString(" + ") + ")"
  /** Residual rᵢ = x̂ᵢ − sᵢ/10⁶. */
  def gdRExpr(i: Int): String = s"(xh$i - (CAST(s$i AS DOUBLE)/1.0E6))"
  /** Back-propagated hidden residual e_j = Σᵢ wd_i_j·rᵢ (the encoder
    * gradient's inner product). */
  def gdEExpr(j: Int, k: Int): String =
    "(" + (0 until k).map(i => s"wd_${i}_$j*r$i").mkString(" + ") + ")"
  /** Sign-split 10⁻⁶ quantization of a gradient term — the exact
    * int64 device that makes the per-symbol gradient SUM order-free
    * in both engines (SURVEY §6). */
  def gdQExpr(x: String): String =
    s"CAST(CASE WHEN $x >= 0.0E0 THEN floor(($x)*1.0E6 + 5.0E-1)" +
      s" ELSE -floor((-($x))*1.0E6 + 5.0E-1) END AS BIGINT)"
  /** Per-window squared-residual micros lq = Σᵢ ⌊rᵢ²·10⁶+½⌋ — int64
    * terms (non-negative, plain floor), int sum: order-free. One
    * spelling for the epoch losses AND the final window scoring. */
  def gdLqExpr(k: Int): String =
    "(" + (0 until k).map { i =>
      s"CAST(floor(r$i*r$i*1.0E6 + 5.0E-1) AS BIGINT)"
    }.mkString(" + ") + ")"
  /** The weight-update chain w ← w − lr·(g/10⁶)/n_tr — fixed IEEE op
    * order; the Scala driver update ([[gdStep]]) and the oracle's
    * generated CTE both spell exactly this. */
  def gdUpdExpr(w: String, g: String, lr: Double): String =
    s"($w - ${dlit(lr)}*(CAST($g AS DOUBLE)/1.0E6)/CAST(n_tr AS DOUBLE))"
  /** Driver-side twin of [[gdUpdExpr]] — identical IEEE ops on the
    * collected exact gradient int. */
  def gdStep(w: Double, g: Long, lr: Double, nTr: Long): Double =
    w - lr * (g.toDouble / 1.0e6) / nTr.toDouble
  /** Driver-side twin of the loss chain (sl/n_tr)/k/10⁶. */
  def gdLoss(sl: Long, nTr: Long, k: Int): Double =
    sl.toDouble / nTr.toDouble / k.toDouble / 1.0e6
  /** Oracle text of [[gdLoss]]. */
  def gdLossExpr(sl: String, k: Int): String =
    s"(CAST($sl AS DOUBLE)/CAST(n_tr AS DOUBLE)/${dlit(k.toDouble)}/1.0E6)"

  /** D84 — GRADIENT-TRAINED AUTOENCODER ANOMALY SCORING (the last
    * reference-ML gap after D75's closed-form ELM; ref: ML Model/
    * Scripts/train.py:292-416 — the reference Adam-trains a per-
    * symbol autoencoder over the session-window tensors for a fixed
    * epoch budget and thresholds reconstruction error): a LINEAR
    * autoencoder (encoder We h×k, decoder Wd k×h, untied) trained by
    * FULL-BATCH gradient descent for a fixed epoch count — the
    * deterministic, oracle-checkable analog of the reference's loop.
    * Adam's moment state and mini-batch order are engine-unportable;
    * fixed-epoch full-batch GD with dyadic init and learning rate is
    * the same training *mechanism* (iterative loss descent on the
    * same tensors) with every float derivable in BOTH engines.
    *
    * Engine-exactness: per-window forward/backward terms are fixed
    * left-assoc chains over the D66 slot micros ([[gdZExpr]] family);
    * each window's gradient contribution quantizes to exact int64
    * micros (sign-split floor) so the per-symbol epoch gradient is an
    * ORDER-FREE integer sum; the weight update ([[gdStep]]) and the
    * loss ([[gdLoss]]) are fixed IEEE chains on those ints. The
    * DuckDB oracle re-derives the identical weights via a GENERATED
    * unrolled per-epoch CTE cascade from the same constants (the
    * F61/F59 discipline).
    *
    * Weight updates are DRIVER-SIDE (A19's bounded-driver-decision
    * rule): each epoch collects |symbols|·(2kh+2) exact ints — the
    * model registry, not the data — and the next epoch's weights
    * broadcast-join back. At 10⁴ symbols that is ~650k ints per
    * epoch; the tensor scan stays distributed and the epoch count is
    * a constant.
    *
    * Output (one long-format table, scalar cells only):
    *  - kind='loss': a='e0'..'e{E}', the per-symbol train MSE before
    *    each update and after the last (E+1 points — the loss CURVE),
    *  - kind='we'/'wd': the FINAL weights (a/b = zero-padded
    *    row/col), the deployable model artifact,
    *  - kind='flag': TEST windows whose final reconstruction error
    *    clears the symbol's pct-percentile (D67/D75's thresholding),
    *    a=date, b=win, value=err.
    * Symbols with no train windows carry no model and emit nothing
    * (documented deviation from D67's score-0 rule: an untrained
    * autoencoder has no weights to score with). */
  /** The trained-fit bundle [[gdFit]] returns — shared by the D84
    * report and the D85 validation curve. Losses are keyed
    * (symbol, epoch) with epoch e meaning "evaluated at the weights
    * AFTER e updates" (e = 0 is the dyadic init, e = epochs the
    * final weights); `lossVa` only carries symbols with ≥ 1 val
    * window. `errs` is the final-weight per-window scoring frame
    * (symbol, date, win, split, stq, err_ppm), checkpointed. */
  private[graft] final case class GdFit(nTr: Map[Long, Long],
                                 nVa: Map[Long, Long],
                                 weights: Map[Long, Array[Double]],
                                 lossTr: Map[(Long, Int), Double],
                                 lossVa: Map[(Long, Int), Double],
                                 errs: DataFrame)

  /** The D84 training loop (see [[gdAutoencoder]] for semantics):
    * epoch jobs run over the train ∪ val windows — gradients
    * accumulate from TRAIN rows only (conditional sums, identical
    * ints to the train-filtered spelling) while the same pass prices
    * the epoch's val loss with the same pre-update weights (the
    * reference's per-epoch validation, train.py:377-393, for free —
    * no extra jobs). */
  private[graft] def gdFit(ticks: DataFrame, k: Int, h: Int, epochs: Int,
                    lr: Double, trainRatio: Double, valRatio: Double,
                    cacheKey: Option[String]): GdFit = cacheKey match {
    // D84 and D85 consume the IDENTICAL fit (same corpus, same
    // hyperparameters): session-share the whole bundle — epochs+1
    // distributed jobs, the driver collects and the errs checkpoint —
    // the slotChain/pairCensus discipline (r14 review)
    case Some(key) =>
      val ss = ticks.sparkSession
      graft.SessionFrameCache.getOrBuild(
        ss, s"gdFit|$key|$k|$h|$epochs|$lr|$trainRatio|$valRatio") {
        val before = graft.CkptGc.snapshot(ss)
        val fit = buildGdFit(ticks, k, h, epochs, lr, trainRatio,
          valRatio, cacheKey)
        // pin the bundle's errs frame; the loop's piv intermediate
        // was already unpersisted inside the build
        graft.CkptGc.pinNewSince(ss, before)
        fit
      }
    case None =>
      buildGdFit(ticks, k, h, epochs, lr, trainRatio, valRatio, None)
  }

  private def buildGdFit(ticks: DataFrame, k: Int, h: Int, epochs: Int,
                         lr: Double, trainRatio: Double,
                         valRatio: Double,
                         cacheKey: Option[String]): GdFit = {
    require(k >= 2, s"need >= 2 slots: $k")
    require(h >= 1, s"need >= 1 hidden unit: $h")
    require(epochs >= 1, s"need >= 1 epoch: $epochs")
    val ss = ticks.sparkSession
    val scaled = slotChain(ticks, k, trainRatio, valRatio, cacheKey)
      .scaled
    val pivAggs = (0 until k).map(i =>
      max(when(col("i") === i, col("u"))).as(s"s$i"))
    val piv = scaled
      .groupBy(col("symbol"), col("date"), col("win"), col("split"))
      .agg(pivAggs.head, pivAggs.tail: _*)
      .localCheckpoint(true) // consumed once per epoch + final score
    val weCols = for (j <- 0 until h; i <- 0 until k) yield s"we_${j}_$i"
    val wdCols = for (i <- 0 until k; j <- 0 until h) yield s"wd_${i}_$j"
    val wSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("symbol",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        (weCols ++ wdCols).map(c => org.apache.spark.sql.types
          .StructField(c, org.apache.spark.sql.types.DoubleType,
            nullable = false)))
    def weightsDf(w: Map[Long, Array[Double]]): DataFrame = {
      import scala.jdk.CollectionConverters._
      val rows: java.util.List[org.apache.spark.sql.Row] =
        w.toSeq.sortBy(_._1).map { case (s, a) =>
          org.apache.spark.sql.Row.fromSeq(s +: a.toSeq)
        }.asJava
      ss.createDataFrame(rows, wSchema)
    }
    def forward(base: DataFrame): DataFrame = {
      var f = base
      (0 until h).foreach(j => f = f.withColumn(s"z$j",
        expr(gdZExpr(j, k))))
      (0 until k).foreach(i => f = f.withColumn(s"xh$i",
        expr(gdXhExpr(i, h))))
      (0 until k).foreach(i => f = f.withColumn(s"r$i",
        expr(gdRExpr(i))))
      f
    }
    // rosters: per-symbol train (the GD normalizer) and val counts
    val rosters = piv.groupBy("symbol").agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("ntr"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("nva"))
      .collect()
    val nTr: Map[Long, Long] = rosters
      .map(r => r.getLong(0) -> r.getAs[Long]("ntr"))
      .filter(_._2 > 0).toMap
    val nVa: Map[Long, Long] = rosters
      .filter(r => nTr.contains(r.getLong(0)))
      .map(r => r.getLong(0) -> r.getAs[Long]("nva")).toMap
    // initial weights: the SAME dyadic constants per symbol
    val init: Array[Double] =
      ((for (j <- 0 until h; i <- 0 until k) yield gdWe0(j, i, k)) ++
        (for (i <- 0 until k; j <- 0 until h) yield gdWd0(i, j, h)))
        .toArray
    var weights: Map[Long, Array[Double]] =
      nTr.keys.map(s => s -> init.clone()).toMap
    val lossTr = scala.collection.mutable.Map.empty[(Long, Int), Double]
    val lossVa = scala.collection.mutable.Map.empty[(Long, Int), Double]
    val gdNames = for (i <- 0 until k; j <- 0 until h)
      yield s"gd_${i}_$j"
    val geNames = for (j <- 0 until h; i <- 0 until k)
      yield s"ge_${j}_$i"
    val isTr = col("split") === "train"
    (0 until epochs).foreach { e =>
      var f = forward(piv.filter(col("split").isin("train", "val"))
        .join(broadcast(weightsDf(weights)), Seq("symbol")))
      (0 until h).foreach(j => f = f.withColumn(s"e$j",
        expr(gdEExpr(j, k))))
      val aggs =
        (for (i <- 0 until k; j <- 0 until h)
          yield sum(when(isTr, expr(gdQExpr(s"r$i*z$j"))))
            .as(s"gd_${i}_$j")) ++
        (for (j <- 0 until h; i <- 0 until k)
          yield sum(when(isTr,
            expr(gdQExpr(s"e$j*(CAST(s$i AS DOUBLE)/1.0E6)"))))
            .as(s"ge_${j}_$i")) ++
        Seq(sum(when(isTr, expr(gdLqExpr(k)))).as("sl"),
          sum(when(!isTr, expr(gdLqExpr(k)))).as("sl_va"))
      val g = f.groupBy("symbol").agg(aggs.head, aggs.tail: _*)
        .collect()
      weights = weights.map { case (s, a) => s -> a.clone() }
      g.foreach { r =>
        val s = r.getLong(0)
        val n = nTr(s)
        lossTr((s, e)) = gdLoss(r.getAs[Long]("sl"), n, k)
        if (nVa.getOrElse(s, 0L) > 0 && !r.isNullAt(r.fieldIndex("sl_va")))
          lossVa((s, e)) = gdLoss(r.getAs[Long]("sl_va"), nVa(s), k)
        val a = weights(s)
        var idx = 0
        geNames.foreach { gn => // encoder block first (wSchema order)
          a(idx) = gdStep(a(idx), r.getAs[Long](gn), lr, n); idx += 1
        }
        gdNames.foreach { gn =>
          a(idx) = gdStep(a(idx), r.getAs[Long](gn), lr, n); idx += 1
        }
      }
    }
    // final pass: per-window error with the trained weights
    val errs = forward(piv.join(broadcast(weightsDf(weights)),
        Seq("symbol")))
      .withColumn("stq", expr(gdLqExpr(k)))
      .select(col("symbol"), col("date"), col("win"), col("split"),
        col("stq"))
      .withColumn("err_ppm", expr(s"stq div $k"))
      .localCheckpoint(true) // feeds final loss + thresholds + flags
    errs.filter(col("split").isin("train", "val")).groupBy("symbol")
      .agg(sum(when(isTr, col("stq"))).as("sl"),
        sum(when(!isTr, col("stq"))).as("sl_va"))
      .collect().foreach { r =>
        val s = r.getLong(0)
        if (nTr.contains(s)) {
          lossTr((s, epochs)) = gdLoss(r.getAs[Long]("sl"), nTr(s), k)
          if (nVa.getOrElse(s, 0L) > 0 &&
              !r.isNullAt(r.fieldIndex("sl_va")))
            lossVa((s, epochs)) =
              gdLoss(r.getAs[Long]("sl_va"), nVa(s), k)
        }
      }
    // all jobs done (errs is materialized): release the pivot's
    // blocks now so the session-cached bundle pins ONLY errs
    piv.unpersist(blocking = true)
    GdFit(nTr, nVa, weights, lossTr.toMap, lossVa.toMap, errs)
  }

  def gdAutoencoder(ticks: DataFrame, k: Int, hidden: Int = 2,
                    epochs: Int = 4, lr: Double = 0.0625,
                    trainRatio: Double = 0.6, valRatio: Double = 0.2,
                    pct: Double = 0.99,
                    cacheKey: Option[String] = None): DataFrame = {
    val ss = ticks.sparkSession
    val h = hidden
    val fit = gdFit(ticks, k, h, epochs, lr, trainRatio, valRatio,
      cacheKey)
    val errs = fit.errs
    val weights = fit.weights
    val thr = errs.filter(col("split") === "test")
      .groupBy("symbol")
      .agg(expr(s"percentile(err_ppm, $pct)").as("qu"))
    val flags = errs.filter(col("split") === "test")
      .join(broadcast(thr), Seq("symbol"))
      .filter(col("err_ppm").cast("double") > col("qu"))
      .select(col("symbol"), lit("flag").as("kind"),
        col("date").as("a"), col("win").as("b"),
        (col("err_ppm").cast("double") / lit(1000000.0)).as("value"))
    val driverRows: Seq[(Long, String, String, String, Double)] =
      fit.lossTr.toSeq.map { case ((s, e), v) =>
        (s, "loss", f"e$e%02d", "", v)
      } ++
        weights.toSeq.flatMap { case (s, a) =>
          var idx = -1
          (for (j <- 0 until h; i <- 0 until k) yield {
            idx += 1
            (s, "we", s"j$j", f"i$i%02d", a(idx))
          }) ++
            (for (i <- 0 until k; j <- 0 until h) yield {
              idx += 1
              (s, "wd", f"i$i%02d", s"j$j", a(idx))
            })
        }
    import ss.implicits._
    ss.sparkContext.parallelize(driverRows,
        emissionSlices(driverRows.size))
      .toDF("symbol", "kind", "a", "b", "value")
      .unionByName(flags)
      .orderBy("symbol", "kind", "a", "b")
  }

  /** Slice count for PARALLELIZED driver-row emission, never a
    * LocalRelation: a D84/D85 report is |symbols|-keyed (the model
    * registry) and a local table scan serializes it single-threaded
    * on the driver — measured at the 100x-symbol replica, 27.9 s of
    * a 39.6 s cold run was emission; parallelizing cut it to
    * seconds. The rows already live on the driver by design (A19);
    * only the DataFrame conversion fans out. ~20k rows/slice,
    * capped at 32. */
  private def emissionSlices(n: Int): Int =
    math.max(1, math.min(32, n / 20000 + 1))

  /** D85's verdict pair over a 1-based per-epoch val-loss series
    * (None = no val windows): `best` = the epoch whose weights an
    * early-stopped training KEEPS — the argmin over epochs ≤ stop
    * (strict-< improvements, earliest epoch on exact ties — the
    * reference's best_model_state rule, train.py:389-393); `stop` =
    * the first epoch sitting `patience` epochs past the last
    * improvement, else the series length (patience never fired).
    * Val-less series: (None, length). Exposed for direct spec
    * coverage of the plateau/degrade/val-less branches the real
    * tapes rarely exercise. */
  def gdEarlyStop(vals: IndexedSeq[Option[Double]], patience: Int)
      : (Option[Int], Int) = {
    require(patience >= 1, s"need patience >= 1: $patience")
    var bestSoFar = Double.PositiveInfinity
    var lastImp = 0
    var stop = vals.length
    var stopped = false
    (1 to vals.length).foreach { e =>
      vals(e - 1).foreach { v =>
        if (v < bestSoFar) { bestSoFar = v; lastImp = e }
      }
      if (!stopped && lastImp > 0 && e - lastImp >= patience) {
        stop = e; stopped = true
      }
    }
    val defined = (1 to stop)
      .flatMap(e => vals(e - 1).map(v => (v, e)))
    (if (defined.isEmpty) None else Some(defined.min._2), stop)
  }

  /** D85 — VALIDATION CURVE + EARLY-STOPPING VERDICT (ref: train.py:
    * 351-393 — the reference trains with per-epoch validation loss,
    * keeps the best-val model state, and stops after `patience`
    * epochs without improvement): the same evidence table for the
    * D84 deterministic loop. One row per (symbol, epoch 1..E):
    * train/val loss EVALUATED AT the weights after that epoch's
    * update (w_e — the clean deterministic reading of the
    * reference's post-epoch eval; job e+1's pre-update pass prices
    * w_e's losses, so the curve costs NO extra Spark jobs),
    * `is_best` on the epoch minimizing val loss (strict <, earliest
    * epoch tiebreak — the reference's best_model_state rule), and
    * `stop_epoch` = the first epoch sitting `patience` epochs past
    * the last improvement (else E — training ran out before patience
    * fired). Symbols without val windows carry NULL val losses,
    * never a best epoch, and stop_epoch = E (nothing to stop on —
    * the reference's empty val_loader edge made explicit).
    *
    * Engine-exactness: losses are the D84 chains on conditional
    * int64 sums; best/stop verdicts compare IDENTICAL doubles, so
    * the oracle's window-function derivation (running min of
    * preceding val losses, last-improving-epoch max, counter ≥
    * patience) lands on the same booleans. */
  def gdValCurve(ticks: DataFrame, k: Int, hidden: Int = 2,
                 epochs: Int = 4, lr: Double = 0.0625,
                 patience: Int = 2,
                 trainRatio: Double = 0.6, valRatio: Double = 0.2,
                 cacheKey: Option[String] = None): DataFrame = {
    require(patience >= 1, s"need patience >= 1: $patience")
    val ss = ticks.sparkSession
    val fit = gdFit(ticks, k, hidden, epochs, lr, trainRatio,
      valRatio, cacheKey)
    val rows = fit.nTr.keys.toSeq.sorted.flatMap { sym =>
      val series = (1 to epochs)
        .map(e => fit.lossVa.get((sym, e))).toIndexedSeq
      val (bestEpoch, stopEpoch) = gdEarlyStop(series, patience)
      (1 to epochs).map { e =>
        (sym, e, fit.lossTr((sym, e)), fit.lossVa.get((sym, e)),
          bestEpoch.contains(e), stopEpoch)
      }
    }
    import ss.implicits._
    // parallelized emission — the D84 rule (|symbols|·E rows)
    ss.sparkContext.parallelize(rows, emissionSlices(rows.size))
      .toDF("symbol", "epoch", "train_loss", "val_loss", "is_best",
        "stop_epoch")
      .orderBy("symbol", "epoch")
  }
}
