package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins and sessionization — tick-data workhorses the
  * reference approximates with per-file ordering + first() picks
  * (ref: `spark_session_window_tick_cleaner.py:59-88`) and that a
  * lakehouse query layer needs as first-class operators.
  */
object TemporalJoins {

  /** E1 — as-of join: for every left row, the latest right row of the
    * same key with `r.ts <= l.ts` (DuckDB/kdb ASOF JOIN semantics,
    * inner flavor: left rows with no prior right row are dropped).
    *
    * Scale shape (SURVEY §5): implemented as union + running
    * `last(ignoreNulls)` window — ONE shuffle on the key, linear scan
    * within partitions. Never a range cross-product (a naive
    * `l.ts >= r.ts` join explodes O(|L|·|R|) per key); never a
    * broadcast of a big side. This is the only as-of formulation that
    * survives both sides being 100 TB facts.
    *
    * Rows at equal timestamps: right side sorts before left
    * (`side` ordering) so an equal-ts right row IS visible to the left
    * row, matching `t.ts >= q.ts` inclusive semantics.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               leftId: String, rightId: String,
               rightVals: Seq[String]): DataFrame = {
    val lCols = Seq(col(key), col(ts), col(leftId),
      lit(null).cast("long").as(rightId)) ++
      rightVals.map(v => lit(null).cast("double").as(v)) :+ lit(0).as("side")
    val rCols = Seq(col(key), col(ts), lit(null).cast("long").as(leftId),
      col(rightId)) ++ rightVals.map(col) :+ lit(1).as("side")
    val l = left.select(lCols: _*)
    val r = right.select(rCols: _*)
    // side desc => right rows first at equal ts (inclusive asof)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("side").desc,
        coalesce(col(rightId), col(leftId)).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("asof_id", last(rightId, ignoreNulls = true).over(w))
    val fills = rightVals.map(v =>
      last(v, ignoreNulls = true).over(w).as(s"asof_$v"))
    filled
      .select(Seq(col(key), col(ts), col(leftId), col("side"),
        col("asof_id")) ++ fills: _*)
      .filter(col("side") === 0 && col("asof_id").isNotNull)
      .select(Seq(col(leftId), col(key),
        date_trunc("second", col(ts)).as("ts_s"),
        col("asof_id")) ++ rightVals.map(v => col(s"asof_$v")): _*)
      .orderBy(leftId)
  }

  /** E6 — FORWARD as-of join: for every left row, the EARLIEST right
    * row of the same key with `r.ts >= l.ts` (pandas
    * `merge_asof(direction='forward')`; the label-lookup join of
    * event-study pipelines — "the next quote after each trade").
    *
    * Same one-shuffle discipline as [[asOfJoin]], with the scan
    * REVERSED instead of a following-frame window: ordered by ts
    * DESC, the running `last(ignoreNulls)` over the preceding frame
    * is exactly the smallest right ts ≥ the current left row. The
    * following-frame spelling (`rowsBetween(current, unboundedFollowing)`
    * + `first`) computes the same thing but Spark's
    * UnboundedFollowing frame re-evaluates per row — O(n²) per
    * partition; the reversed running frame is the O(n) form. Equal
    * timestamps: right sorts before left in the reversed scan
    * (`side` desc), keeping `>=` inclusive, same rule as E1. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      ts: String, leftId: String, rightId: String,
                      rightVals: Seq[String]): DataFrame = {
    val lCols = Seq(col(key), col(ts), col(leftId),
      lit(null).cast("long").as(rightId)) ++
      rightVals.map(v => lit(null).cast("double").as(v)) :+ lit(0).as("side")
    val rCols = Seq(col(key), col(ts), lit(null).cast("long").as(leftId),
      col(rightId)) ++ rightVals.map(col) :+ lit(1).as("side")
    val l = left.select(lCols: _*)
    val r = right.select(rCols: _*)
    // ts desc: rows already seen have ts >= current; last non-null
    // right among them is the earliest such quote. id asc tiebreak =
    // among equal-ts quotes the LARGEST id is carried last — mirror
    // the id DESC order so the SMALLEST right id wins, matching the
    // oracle's ASOF determinism on (ts, id).
    val w = Window.partitionBy(key)
      .orderBy(col(ts).desc, col("side").desc,
        coalesce(col(rightId), col(leftId)).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("next_id", last(rightId, ignoreNulls = true).over(w))
    val fills = rightVals.map(v =>
      last(v, ignoreNulls = true).over(w).as(s"next_$v"))
    filled
      .select(Seq(col(key), col(ts), col(leftId), col("side"),
        col("next_id")) ++ fills: _*)
      .filter(col("side") === 0 && col("next_id").isNotNull)
      .select(Seq(col(leftId), col(key),
        date_trunc("second", col(ts)).as("ts_s"),
        col("next_id")) ++ rightVals.map(v => col(s"next_$v")): _*)
      .orderBy(leftId)
  }

  /** E4 — as-of join with a STALENESS TOLERANCE: the tick-data
    * variant every live pricing join actually runs — a quote older
    * than `toleranceSec` must not price a trade. LEFT flavor: every
    * left row survives; the as-of columns (and the exact µs `age_us`)
    * are NULL when there is no prior quote OR the latest one is stale.
    * Same union + running-`last` window shape as [[asOfJoin]] (ONE
    * shuffle on the key, no range product — the staleness check is a
    * post-window filter on carried columns, not a join predicate), with
    * the matched quote's own timestamp carried through the window so
    * age is computable without a second join. Age uses integer µs
    * diffs (exact; both engines truncate ns→µs the same way). */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        ts: String, leftId: String, rightId: String,
                        rightVals: Seq[String],
                        toleranceSec: Long): DataFrame = {
    require(toleranceSec >= 0, s"toleranceSec must be >= 0: $toleranceSec")
    val lCols = Seq(col(key), col(ts), col(leftId),
      lit(null).cast("long").as(rightId)) ++
      rightVals.map(v => lit(null).cast("double").as(v)) :+ lit(0).as("side")
    val rCols = Seq(col(key), col(ts), lit(null).cast("long").as(leftId),
      col(rightId)) ++ rightVals.map(col) :+ lit(1).as("side")
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("side").desc,
        coalesce(col(rightId), col(leftId)).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = left.select(lCols: _*)
      .unionByName(right.select(rCols: _*))
      .withColumn("rts", when(col("side") === 1, col(ts)))
      .withColumn("asof_id", last(rightId, ignoreNulls = true).over(w))
      .withColumn("asof_ts", last("rts", ignoreNulls = true).over(w))
    val fills = rightVals.map(v =>
      last(v, ignoreNulls = true).over(w).as(s"asof_$v"))
    val fresh = col("asof_id").isNotNull &&
      col("age_us") <= toleranceSec * 1000000L
    filled
      .select(Seq(col(key), col(ts), col(leftId), col("side"),
        col("asof_id"), col("asof_ts")) ++ fills: _*)
      .filter(col("side") === 0)
      .withColumn("age_us",
        unix_micros(col(ts)) - unix_micros(col("asof_ts")))
      .select(Seq(col(leftId), col(key),
        date_trunc("second", col(ts)).as("ts_s"),
        when(fresh, col("asof_id")).as("asof_id")) ++
        rightVals.map(v => when(fresh, col(s"asof_$v")).as(s"asof_$v")) :+
        when(fresh, col("age_us")).as("age_us"): _*)
      .orderBy(leftId)
  }

  /** E5 — NEAREST-event join: for every left row, the right row of
    * the same key minimizing |Δt| — the alignment rule sensor-fusion
    * and late-quote backfills need when "latest before" is too strict
    * (a quote 1 ms in the future beats one 10 min stale). Backward
    * candidate = latest right at-or-before (E1's inclusive rule);
    * forward candidate = earliest right STRICTLY after (equal-ts rows
    * already belong to backward, so no double-claim); the closer one
    * wins, exact-µs ties going BACKWARD (the side that was actually
    * knowable at event time). Left flavor: rows with no right at all
    * keep NULL match columns.
    *
    * Scale shape: ONE union + ONE hash exchange on the key feeding
    * TWO running-`last` window passes (ascending and descending time
    * — the second is an in-partition re-sort, not a second shuffle),
    * never a |Δt| cross product. */
  def nearestJoin(left: DataFrame, right: DataFrame, key: String,
                  ts: String, leftId: String, rightId: String,
                  rightVals: Seq[String]): DataFrame = {
    val lCols = Seq(col(key), col(ts), col(leftId),
      lit(null).cast("long").as(rightId)) ++
      rightVals.map(v => lit(null).cast("double").as(v)) :+ lit(0).as("side")
    val rCols = Seq(col(key), col(ts), lit(null).cast("long").as(leftId),
      col(rightId)) ++ rightVals.map(col) :+ lit(1).as("side")
    val ord = coalesce(col(rightId), col(leftId)).asc
    // backward: equal-ts rights sort BEFORE the left row → inclusive
    val wb = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("side").desc, ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: time reversed; equal-ts rights sort AFTER the left row
    // (side asc) → strictly-after semantics
    val wf = Window.partitionBy(key)
      .orderBy(col(ts).desc, col("side").asc, ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val union = left.select(lCols: _*)
      .unionByName(right.select(rCols: _*))
      .withColumn("rts", when(col("side") === 1, col(ts)))
    val withCands = union
      .withColumn("back_id", last(rightId, ignoreNulls = true).over(wb))
      .withColumn("back_ts", last("rts", ignoreNulls = true).over(wb))
      .withColumn("fwd_id", last(rightId, ignoreNulls = true).over(wf))
      .withColumn("fwd_ts", last("rts", ignoreNulls = true).over(wf))
    val backFills = rightVals.map(v =>
      last(v, ignoreNulls = true).over(wb).as(s"back_$v"))
    val fwdFills = rightVals.map(v =>
      last(v, ignoreNulls = true).over(wf).as(s"fwd_$v"))
    val useBack = col("back_id").isNotNull &&
      (col("fwd_id").isNull || col("back_age") <= col("fwd_age"))
    val useFwd = !coalesce(useBack, lit(false)) && col("fwd_id").isNotNull
    withCands
      .select(Seq(col(key), col(ts), col(leftId), col("side"),
        col("back_id"), col("back_ts"), col("fwd_id"), col("fwd_ts")) ++
        backFills ++ fwdFills: _*)
      .filter(col("side") === 0)
      .withColumn("back_age",
        unix_micros(col(ts)) - unix_micros(col("back_ts")))
      .withColumn("fwd_age",
        unix_micros(col("fwd_ts")) - unix_micros(col(ts)))
      .select(Seq(col(leftId), col(key),
        date_trunc("second", col(ts)).as("ts_s"),
        when(useBack, col("back_id")).otherwise(when(useFwd, col("fwd_id")))
          .as("near_id"),
        when(useBack, "back").when(useFwd, "fwd").as("direction"),
        when(useBack, col("back_age")).otherwise(
          when(useFwd, col("fwd_age"))).as("near_age_us")) ++
        rightVals.map(v =>
          when(useBack, col(s"back_$v")).otherwise(
            when(useFwd, col(s"fwd_$v"))).as(s"near_$v")): _*)
      .orderBy(leftId)
  }

  /** E2 — range (interval) join: right rows of the same key with
    * timestamp in `[l.ts - window, l.ts)`, aggregated per left row.
    * The equality key keeps this a shuffle HASH join (range predicate
    * applied post-match) — the scalable formulation; a pure range join
    * without an equi-key would degenerate to a nested-loop broadcast.
    */
  def rangeJoinCount(left: DataFrame, right: DataFrame, key: String,
                     ts: String, leftId: String,
                     windowSec: Long): DataFrame = {
    val l = left.select(col(key).as("lk"), col(ts).as("lts"), col(leftId))
    val r = right.select(col(key).as("rk"), col(ts).as("rts"))
    l.join(r,
      col("lk") === col("rk") &&
        col("rts") >= col("lts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("rts") < col("lts"),
      "left")
      .groupBy(col(leftId), col("lk").as("symbol"))
      .agg(count(col("rts")).as("n_in_window"))
      .orderBy(leftId)
  }

  /** E3 — gap-based sessionization: a new session starts when the gap
    * to the previous tick of the same key exceeds `gapSec` (the batch
    * analog of Structured Streaming's session windows). One shuffle by
    * key; running sum assigns session ids without iteration.
    */
  def sessionize(ticks: DataFrame, key: String, ts: String,
                 gapSec: Long): DataFrame = {
    val wOrd = Window.partitionBy(key).orderBy("tick_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSec * 1000000L
    val isNew = when(
      unix_micros(col(ts)) - unix_micros(lag(col(ts), 1).over(wOrd)) > gapUs ||
        lag(col(ts), 1).over(wOrd).isNull, 1).otherwise(0)
    ticks
      .withColumn("new_s", isNew)
      .withColumn("session_id", sum("new_s").over(wRun))
      .groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("n_ticks"),
        date_trunc("second", min(col(ts))).as("session_start"),
        date_trunc("second", max(col(ts))).as("session_end"))
      .orderBy(key, "session_id")
  }

  /** E12 — SESSION CONTAINMENT JOIN (point-in-interval): tag each
    * point event with the enclosing session interval of its key, or
    * NULL when it falls in a gap — the third temporal-join family
    * member beside as-of (E1) and range (E2), and the attribution
    * step behind "which browsing session does this purchase belong
    * to". Intervals come from [[sessionize]] (gap-derived, hence
    * NON-OVERLAPPING per key by construction) — which is what lets
    * containment run as ONE as-of pass instead of an interval join:
    * union session-boundary rows with point rows, per-key running
    * IGNORE-NULLS last carries (session_id, end) forward, and a point
    * is inside iff its second ≤ the carried end. One key exchange
    * total (E1's union discipline); the interval set never joins the
    * point set.
    *
    * Engine-exactness: session bounds are second-truncated (E3's
    * rule), so points compare at the SAME grain — the point ts is
    * floored to its second first (a point in its interval's final
    * second is inside). Boundary ties: the session row sorts before
    * the point row of the same second, so a point at exactly
    * session_start matches. All comparisons exact int64 µs. */
  def sessionAssign(ticks: DataFrame, points: DataFrame,
                    gapSec: Long): DataFrame = {
    val sess = sessionize(ticks, "symbol", "ts", gapSec)
      .select(col("symbol"),
        unix_micros(col("session_start")).as("us"),
        lit(0).as("kind"),
        col("session_id"),
        unix_micros(col("session_end")).as("end_us"),
        lit(null).cast("long").as("point_id"))
    val pts = points.select(col("symbol"),
      unix_micros(date_trunc("second", col("ts"))).as("us"),
      lit(1).as("kind"),
      lit(null).cast("long").as("session_id"),
      lit(null).cast("long").as("end_us"),
      col("point_id"))
    val w = Window.partitionBy("symbol").orderBy("us", "kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess.unionByName(pts)
      .withColumn("last_sid", last(col("session_id"), ignoreNulls = true).over(w))
      .withColumn("last_end", last(col("end_us"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .withColumn("in_session",
        col("last_sid").isNotNull && col("us") <= col("last_end"))
      .select(col("point_id"), col("symbol"),
        date_format(timestamp_micros(col("us")), "yyyy-MM-dd HH:mm:ss")
          .as("ts_s"),
        when(col("in_session"), col("last_sid")).as("session_id"),
        col("in_session"))
      .orderBy("point_id")
  }

  /** E8 — co-trading SESSION-OVERLAP aggregate between symbol pairs:
    * how much wall-clock time do two instruments' trading sessions
    * actually overlap — the liquidity-alignment number behind venue
    * routing and the sanity check before any E7 lead-lag claim (a
    * "correlation" between symbols that never trade simultaneously is
    * an artifact). Composes E3's gap sessionization with an interval-
    * overlap join: sessions are bounded BY CONSTRUCTION (≤ ticks, in
    * practice a handful per symbol-day), the pair list broadcasts,
    * and the join keeps its equi-key (the paired symbol) so Spark
    * plans a keyed join with the overlap range as a residual filter —
    * never a cross product over ticks. Touching sessions (equal
    * boundary) count as a zero-second overlap. Second-truncated
    * session bounds make every duration an exact int64 of seconds —
    * all sums order-free, no doubles anywhere. */
  def sessionOverlap(ticks: DataFrame, key: String, ts: String,
                     gapSec: Long, pairs: Seq[(Long, Long)]): DataFrame = {
    val ss = ticks.sparkSession
    import ss.implicits._
    val sess = sessionize(ticks, key, ts, gapSec)
      .select(col(key).as("_sym"),
        col("session_start").as("st"), col("session_end").as("en"))
    val a = sess.select(col("_sym").as("sym_a"),
      col("st").as("a_st"), col("en").as("a_en"))
    val b = sess.select(col("_sym").as("_bsym"),
      col("st").as("b_st"), col("en").as("b_en"))
    a.join(broadcast(pairs.toDF("sym_a", "sym_b")), Seq("sym_a"))
      .join(b,
        col("sym_b") === col("_bsym") &&
          col("b_st") <= col("a_en") && col("a_st") <= col("b_en"))
      .withColumn("ovl_s",
        unix_seconds(least(col("a_en"), col("b_en"))) -
          unix_seconds(greatest(col("a_st"), col("b_st"))))
      .groupBy("sym_a", "sym_b")
      .agg(count(lit(1)).as("n_overlaps"),
        sum("ovl_s").as("total_overlap_s"))
      .orderBy("sym_a", "sym_b")
  }

  /** E7 — LEAD-LAG cross-correlation between instrument pairs: does
    * symbol A's move predict symbol B's move `lagN` buckets later —
    * the cross-asset predictability scan behind pairs trading and
    * lead-lag discovery (Hayashi–Yoshida / Hoffmann-style studies,
    * run on a common time grid). Both series are first regularized to
    * a (symbol, `bucketUnit`) grid with B2's rule (first tick of the
    * bucket by tick_id), moves are exact integer-cent deltas on that
    * grid, and each requested (lead, lag) pair correlates A's move at
    * t with B's move at t + lagN.
    *
    * Scale shape: the grid aggregate and its within-symbol lag share
    * one (symbol) exchange; the pair list is bounded BY CONSTRUCTION
    * and broadcasts into the grid scan, replicating each grid row at
    * most |pairs-containing-it| times; the shifted equi-join keys on
    * (symbol, bucket) — never a cross product over raw ticks, and at
    * 100 TB the joined frames are bucket-grid-sized (downsampled),
    * not tick-sized. Correlation is an aggregate double → round(4)
    * (SURVEY §6); pairs with no overlapping grid points drop out
    * (inner join — no 0/0 corr row to disagree on). */
  def leadLagCorr(ticks: DataFrame, pairs: Seq[(Long, Long)],
                  bucketUnit: String, lagN: Int): DataFrame = {
    val ss = ticks.sparkSession
    import ss.implicits._
    val pairsDf = pairs.toDF("sym_lead", "sym_lag")
    val grid = ticks
      .groupBy(col("symbol"), date_trunc(bucketUnit, col("ts")).as("bucket"))
      .agg(min_by(col("bid"), col("tick_id")).as("bid"))
      .select(col("symbol"), col("bucket"),
        round(col("bid") * 100.0, 0).cast("long").as("cents"))
    val w = Window.partitionBy("symbol").orderBy("bucket")
    val rets = grid
      .withColumn("d", (col("cents") - lag(col("cents"), 1).over(w))
        .cast("double"))
      .filter(col("d").isNotNull)
    val lead = rets.select(col("symbol").as("sym_lead"), col("bucket"),
      col("d").as("d_lead"))
    val lagged = rets.select(col("symbol").as("_lagsym"),
      col("bucket").as("bucket_lag"), col("d").as("d_lag"))
    lead
      .join(broadcast(pairsDf), Seq("sym_lead"))
      .join(lagged,
        col("sym_lag") === col("_lagsym") &&
          col("bucket_lag") ===
            col("bucket") + expr(s"INTERVAL $lagN $bucketUnit"))
      .groupBy("sym_lead", "sym_lag")
      .agg(count(lit(1)).as("n_pairs"),
        round(corr(col("d_lead"), col("d_lag")), 4).as("leadlag_corr"))
      .orderBy("sym_lead", "sym_lag")
  }

  /** E10 — CALENDAR COVERAGE / GAP report per symbol: which days of
    * each instrument's own [first, last] span have NO ticks — the
    * completeness check behind every D-block daily statistic (a
    * missing day silently biases realized vol, beta, drawdown; this
    * op makes the bias measurable BEFORE trusting them). The grid is
    * GENERATED, not joined from a reference table: `sequence(first,
    * last, 1 day)` exploded per symbol — |span| rows per instrument,
    * bounded by calendar time, never by tick volume.
    *
    * Shape: one (symbol, day) partial-agg collapse of the fact, one
    * per-symbol min/max aggregate OF that collapsed frame, the grid
    * explode off the 1-row-per-symbol frame, and a left join back on
    * the collapsed days — the 100 TB scan happens once; everything
    * after is calendar-sized. Counts exact int64; coverage is one
    * IEEE division of exact ints, unrounded. */
  def calendarCoverage(ticks: DataFrame): DataFrame = {
    val days = ticks
      .groupBy(col("symbol"), to_date(col("ts")).as("_date"))
      .agg(count(lit(1)).as("n_ticks"))
      .localCheckpoint(true)
    val span = days.groupBy("symbol")
      .agg(min("_date").as("d0"), max("_date").as("d1"))
    val grid = span
      .select(col("symbol"),
        explode(sequence(col("d0"), col("d1"),
          expr("INTERVAL 1 DAY"))).as("_date"))
    grid.join(days, Seq("symbol", "_date"), "left")
      .groupBy("symbol")
      .agg(
        count(lit(1)).as("n_days_span"),
        sum(when(col("n_ticks").isNotNull, 1L).otherwise(0L))
          .as("n_days_active"),
        sum(when(col("n_ticks").isNull, 1L).otherwise(0L))
          .as("n_days_missing"))
      .withColumn("coverage",
        col("n_days_active").cast("double") /
          col("n_days_span").cast("double"))
      .select("symbol", "n_days_span", "n_days_active", "n_days_missing",
        "coverage")
      .orderBy("symbol")
  }

  /** D29 — ROLLING pairwise CORRELATION on the daily grid: E7's
    * lead-lag statistic turned into a TIME SERIES — for each symbol
    * pair, the trailing `windowDays`-day Pearson correlation of
    * daily moves, the rolling co-movement monitor risk models read
    * (a regime break shows as the rolling corr walking away from its
    * long-run value). Same grid as E7 (first tick per (symbol, day)
    * by tick_id, moves in exact cents); the pair frame aligns on the
    * shared bucket via the broadcast pair list; `corr` runs as a
    * WINDOW aggregate over a ROWS frame partitioned by pair — one
    * exchange on the pair key, |pairs|·|days| rows total, calendar-
    * bounded. Rolling corr round(4) (aggregate-double rule); windows
    * narrower than 2 points give NULL (corr undefined). */
  def rollingPairCorr(ticks: DataFrame, pairs: Seq[(Long, Long)],
                      windowDays: Int): DataFrame = {
    val ss = ticks.sparkSession
    import ss.implicits._
    val pairsDf = pairs.toDF("sym_a", "sym_b")
    val grid = ticks
      .groupBy(col("symbol"), to_date(col("ts")).as("_date"))
      .agg(min_by(col("bid"), col("tick_id")).as("bid"))
      .select(col("symbol"), col("_date"),
        round(col("bid") * 100.0, 0).cast("long").as("cents"))
    val w = Window.partitionBy("symbol").orderBy("_date")
    val rets = grid
      .withColumn("d", (col("cents") - lag(col("cents"), 1).over(w))
        .cast("double"))
      .filter(col("d").isNotNull)
      .localCheckpoint(true)
    val a = rets.select(col("symbol").as("sym_a"), col("_date"),
      col("d").as("d_a"))
    val b = rets.select(col("symbol").as("_bsym"),
      col("_date").as("_bdate"), col("d").as("d_b"))
    val aligned = a
      .join(broadcast(pairsDf), Seq("sym_a"))
      .join(b, col("sym_b") === col("_bsym") && col("_date") === col("_bdate"))
    val wRoll = Window.partitionBy("sym_a", "sym_b").orderBy("_date")
      .rowsBetween(-(windowDays - 1), 0)
    aligned
      .withColumn("roll_corr", round(corr(col("d_a"), col("d_b")).over(wRoll), 4))
      .withColumn("n_in_window", count(lit(1)).over(wRoll))
      .select(col("sym_a"), col("sym_b"),
        date_format(col("_date"), "yyyy-MM-dd").as("date"),
        col("roll_corr"), col("n_in_window"))
      .orderBy("sym_a", "sym_b", "date")
  }

  /** E9 — FUNNEL MATCH: the ordered event-sequence operator behind
    * every conversion report — per user, the earliest greedy chain
    * `step1 → step2 → step3` where each step is the FIRST qualifying
    * event strictly after the previous one and within `tauUs`
    * microseconds of it. Greedy-earliest is the standard funnel
    * semantic (deterministic, and a user who completes at all has a
    * greedy chain).
    *
    * Scale shape: NOT a per-user sort-and-scan — three tiny
    * conditional MIN aggregates, each keyed on user_id so all three
    * reuse one exchange footprint, chained by per-user joins whose
    * left side shrinks at every step (viewers ⊇ clickers ⊇ buyers).
    * The fact table streams once per step with the step's type filter
    * pushed to the scan; nothing is ever collected or windowed over
    * an unbounded frame.
    *
    * Engine-exactness: all comparisons in exact int64 epoch
    * MICROseconds (the ns-parquet truncation rule — DuckDB casts its
    * ns timestamps to µs the same way), emitted as BIGINT columns;
    * MIN over int64 is total; dropouts keep NULL step-2/3 times via
    * left joins, so the report covers the whole entry cohort. */
  def funnel(events: DataFrame, step1: String, step2: String,
             step3: String, tauUs: Long): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val t1 = ev.filter(col("event_type") === step1)
      .groupBy("user_id").agg(min("us").as("t1_us"))
    val t2 = ev.filter(col("event_type") === step2)
      .join(t1, "user_id")
      .filter(col("us") > col("t1_us") && col("us") <= col("t1_us") + tauUs)
      .groupBy("user_id").agg(min("us").as("t2_us"))
    val t3 = ev.filter(col("event_type") === step3)
      .join(t2, "user_id")
      .filter(col("us") > col("t2_us") && col("us") <= col("t2_us") + tauUs)
      .groupBy("user_id").agg(min("us").as("t3_us"))
    t1.join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
        col("t3_us").isNotNull.as("completed"))
      .orderBy("user_id")
  }

  /** E15 — SEQUENCE MATCH WITH NEGATION: `step1 → step2` within τ and
    * NO `blocker` event strictly between — the MATCH_RECOGNIZE-class
    * pattern E9's pure chain cannot express ("purchase after view
    * with no cancel in between"); every churn/abandonment report is
    * this shape. Greedy-earliest anchors as E9 (deterministic: the
    * earliest qualifying step2 after the earliest step1); negation is
    * decorrelated into ONE user-keyed count aggregate over the
    * blocker scan restricted to the matched window — never a per-user
    * sort-and-scan, never an EXISTS loop.
    *
    * `blocked` is NULL when the chain itself never completed (no
    * window to block — three-valued like the t-columns); `completed`
    * requires a matched chain AND a blocker-free window. All
    * comparisons exact int64 epoch µs (E9's truncation rule);
    * counts exact. One shuffle per aggregate on the user key, left
    * sides shrinking each step. */
  def funnelWithout(events: DataFrame, step1: String, step2: String,
                    blocker: String, tauUs: Long): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val t1 = ev.filter(col("event_type") === step1)
      .groupBy("user_id").agg(min("us").as("t1_us"))
    val t2 = ev.filter(col("event_type") === step2)
      .join(t1, "user_id")
      .filter(col("us") > col("t1_us") && col("us") <= col("t1_us") + tauUs)
      .groupBy("user_id").agg(min("us").as("t2_us"))
    val win = t1.join(t2, Seq("user_id"), "left")
    val blocks = ev.filter(col("event_type") === blocker)
      .join(win.filter(col("t2_us").isNotNull), "user_id")
      .filter(col("us") > col("t1_us") && col("us") < col("t2_us"))
      .groupBy("user_id").agg(count(lit(1)).as("n_blockers"))
    win.join(blocks, Seq("user_id"), "left")
      .select(col("user_id"), col("t1_us"), col("t2_us"),
        when(col("t2_us").isNotNull,
          coalesce(col("n_blockers"), lit(0L))).as("n_blockers"),
        when(col("t2_us").isNotNull,
          coalesce(col("n_blockers"), lit(0L)) > 0).as("blocked"),
        (col("t2_us").isNotNull &&
          coalesce(col("n_blockers"), lit(0L)) === 0).as("completed"))
      .orderBy("user_id")
  }

  /** D35 — EPPS-EFFECT CURVE per symbol pair: the pairwise correlation
    * of grid-aligned moves AS A FUNCTION of the sampling scale (Epps
    * 1979: measured correlation decays toward zero as the grid gets
    * finer than the quote arrival rate — the bias D33's HY estimator
    * removes; this measures it, and together they bracket the truth).
    * E7's statistic swept across `scalesSec` in ONE pass: scales ride
    * an explode (factor = |scales|, a handful — documented, never
    * data-sized), anchors are the first tick per (symbol, scale,
    * bucket) by tick_id (B2's rule), moves are exact cent deltas on
    * the per-scale grid, and `corr` aggregates per (pair, scale) with
    * map-side partials. Bucket ids are INTEGER `div` of epoch-µs
    * (D33's rule — no double quotient). corr round(4) (aggregate
    * rule), NULL when a pair shares <2 buckets at a scale. */
  def eppsCurve(ticks: DataFrame, pairs: Seq[(Long, Long)],
                scalesSec: Seq[Long]): DataFrame = {
    val ss = ticks.sparkSession
    import ss.implicits._
    // SCALE CASCADE — the 100 TB shape: the fact is aggregated ONCE at
    // the finest scale (carrying each bucket's winning tick_id), and
    // every coarser scale derives from the next finer one: the coarse
    // anchor is the cents of the globally-minimal tick_id in the
    // coarse bucket, which is exactly min_by over the fine winners.
    // Needs nested scales (each divides the next); the naive
    // |scales|-explode re-scanned the fact once per scale (measured
    // 24 s vs ~6 s at the 100× replica). Cascade aggregates run on
    // anchor-sized frames, not the fact. Non-nested sweeps FALL BACK
    // to direct per-scale aggregation off one checkpointed projection
    // — same semantics as the DuckDB oracle's per-scale arg_min, so
    // both engines accept the same parameter space.
    val nested = scalesSec.sliding(2).forall {
      case Seq(a, b) => b % a == 0
      case _         => true
    }
    val anchors: DataFrame = if (nested) {
      val baseUs = scalesSec.head * 1000000L
      val finest = ticks
        .withColumn("cents", round(col("bid") * 100.0, 0).cast("long"))
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(col("symbol"), expr(s"us div ${baseUs}L").as("bucket"))
        .agg(min(col("tick_id")).as("win_id"),
          min_by(col("cents"), col("tick_id")).as("a_cents"))
        .localCheckpoint(true)
      val perScale = scalesSec.scanLeft((0L, finest)) {
        case ((prevSec, prevAnc), sec) =>
          if (prevSec == 0L) (sec, prevAnc)
          else {
            val f = sec / prevSec
            // checkpoint every rung: without it, rung k's aggregate is
            // re-planned inside every coarser rung's lineage AND its own
            // union branch — on a sparse feed (anchors ≈ ticks) that
            // k²-recompute costs more than the explode it replaced
            (sec, prevAnc
              .groupBy(col("symbol"), expr(s"bucket div ${f}L").as("bucket"))
              .agg(min(col("win_id")).as("win_id"),
                min_by(col("a_cents"), col("win_id")).as("a_cents"))
              .localCheckpoint(true))
          }
      }.drop(1)
      perScale.map { case (sec, df) =>
        df.select(col("symbol"), lit(sec).as("scale_sec"), col("bucket"),
          col("a_cents"))
      }.reduce(_ unionByName _)
    } else {
      val base = ticks
        .withColumn("cents", round(col("bid") * 100.0, 0).cast("long"))
        .withColumn("us", unix_micros(col("ts")))
        .select(col("symbol"), col("us"), col("cents"), col("tick_id"))
        .localCheckpoint(true)
      scalesSec.map { sec =>
        val sUs = sec * 1000000L
        base
          .groupBy(col("symbol"), expr(s"us div ${sUs}L").as("bucket"))
          .agg(min_by(col("cents"), col("tick_id")).as("a_cents"))
          .select(col("symbol"), lit(sec).as("scale_sec"), col("bucket"),
            col("a_cents"))
      }.reduce(_ unionByName _)
    }
    val w = Window.partitionBy("symbol", "scale_sec").orderBy("bucket")
    val moves = anchors
      .withColumn("mv",
        (col("a_cents") - lag(col("a_cents"), 1).over(w)).cast("double"))
      .filter(col("mv").isNotNull)
      .localCheckpoint(true)
    val pairsDf = broadcast(pairs.toDF("sym_a", "sym_b"))
    val a = moves.join(pairsDf, col("symbol") === col("sym_a"))
      .select(col("sym_a"), col("sym_b"), col("scale_sec"),
        col("bucket"), col("mv").as("mv_a"))
    val b = moves
      .select(col("symbol").as("sym_b"), col("scale_sec"),
        col("bucket"), col("mv").as("mv_b"))
    a.join(b, Seq("sym_b", "scale_sec", "bucket"))
      .groupBy("sym_a", "sym_b", "scale_sec")
      .agg(count(lit(1)).as("n_buckets"),
        expr("covar_samp(mv_a, mv_b)").as("_cov"),
        expr("stddev_samp(mv_a)").as("_sa"),
        expr("stddev_samp(mv_b)").as("_sb"))
      // Pearson r from its components, NOT the corr aggregate: under
      // ANSI mode Spark's corr THROWS Division-by-zero on a
      // zero-variance group (a constant move series at a sparse scale
      // makes this reachable — spec'd), where DuckDB's corr returns
      // NULL. The guarded component form is spelled identically in
      // the oracle, so both engines divide the same aggregates.
      .withColumn("grid_corr",
        round(when(col("_sa") > 0.0 && col("_sb") > 0.0,
          col("_cov") / (col("_sa") * col("_sb"))), 4))
      .select("sym_a", "sym_b", "scale_sec", "n_buckets", "grid_corr")
      .orderBy("sym_a", "sym_b", "scale_sec")
  }

  /** D33 — HAYASHI–YOSHIDA asynchronous covariance per symbol pair:
    * the estimator that reads covariance straight off RAW ASYNCHRONOUS
    * ticks — no grid, no alignment, no ffill (Hayashi & Yoshida 2005,
    * Bernoulli 11(2); the fix for the Epps-effect bias that grid
    * estimators like E7/D29 inherit at fine scales):
    * `cov = Σᵢⱼ rₐ,ᵢ·r_b,ⱼ · 1[intervals overlap]` over consecutive-
    * tick return intervals `(t₋₁, t]`.
    *
    * The pair join is NEVER an inequality join (Spark would plan a
    * nested loop): each return interval explodes onto the
    * `bucketSec`-grain time buckets it spans, the two sides equi-join
    * on (pair, bucket), and the overlap predicate runs as a cheap
    * post-join filter. An overlapping pair can meet in several
    * buckets, so it COUNTS exactly once: in the bucket holding the
    * overlap's START, `greatest(t₀ₐ, t₀_b) div bucket` — the same
    * dedup rule F2's band buckets use. Explode volume is bounded by
    * `span/bucketSec + n_ticks` per symbol — calendar-bounded on
    * sparse feeds, tick-bounded on dense ones (both regimes safe at
    * 100 TB; pick bucketSec ≈ median inter-tick gap).
    *
    * Engine-exactness: returns are exact cent deltas; the covariance
    * and both variances are int64 sums of int products; `hy_corr =
    * cov/(√vₐ·√v_b)` is IEEE sqrt/multiply/divide on identical exact
    * ints — correctly-rounded ops, bit-identical across engines,
    * emitted unrounded (D21's rule). */
  def hayashiYoshida(ticks: DataFrame, pairs: Seq[(Long, Long)],
                     bucketSec: Long): DataFrame = {
    val ss = ticks.sparkSession
    import ss.implicits._
    val w = Window.partitionBy("symbol").orderBy("tick_id")
    val bUs = bucketSec * 1000000L
    val rets = ticks
      .withColumn("cents", round(col("bid") * 100.0, 0).cast("long"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_c", lag(col("cents"), 1).over(w))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_c").isNotNull)
      .select(col("symbol"), (col("cents") - col("prev_c")).as("r"),
        col("prev_us").as("t0"), col("us").as("t1"))
      .localCheckpoint(true)
    val pairsDf = broadcast(pairs.toDF("sym_a", "sym_b"))
    def exploded = rets.withColumn("bucket",
      explode(sequence(expr(s"t0 div ${bUs}L"), expr(s"t1 div ${bUs}L"))))
    val a = exploded.join(pairsDf, col("symbol") === col("sym_a"))
      .select(col("sym_a"), col("sym_b"), col("bucket"),
        col("r").as("r_a"), col("t0").as("t0_a"), col("t1").as("t1_a"))
    val b = exploded.join(pairsDf, col("symbol") === col("sym_b"))
      .select(col("sym_a").as("pa"), col("sym_b").as("pb"), col("bucket"),
        col("r").as("r_b"), col("t0").as("t0_b"), col("t1").as("t1_b"))
    val cov = a.join(b,
      col("sym_a") === col("pa") && col("sym_b") === col("pb") &&
        a("bucket") === b("bucket") &&
        col("t0_a") < col("t1_b") && col("t0_b") < col("t1_a") &&
        // integer div, never a double quotient: epoch-µs values sit
        // near 2^51 where a double ratio can round across the bucket
        // edge and double-count or drop an overlap
        expr(s"greatest(t0_a, t0_b) div ${bUs}L") === a("bucket"))
      .groupBy("sym_a", "sym_b")
      .agg(count(lit(1)).as("n_overlaps"),
        sum(col("r_a") * col("r_b")).as("hy_cov_cc2"))
    val vars = rets.groupBy("symbol")
      .agg(sum(col("r") * col("r")).as("v"))
    cov
      .join(broadcast(vars.select(col("symbol").as("sym_a"),
        col("v").as("var_a_cc2"))), Seq("sym_a"))
      .join(broadcast(vars.select(col("symbol").as("sym_b"),
        col("v").as("var_b_cc2"))), Seq("sym_b"))
      .withColumn("hy_corr",
        when(col("var_a_cc2") > 0L && col("var_b_cc2") > 0L,
          col("hy_cov_cc2").cast("double") /
            (sqrt(col("var_a_cc2").cast("double"))
              * sqrt(col("var_b_cc2").cast("double")))))
      .select("sym_a", "sym_b", "n_overlaps", "hy_cov_cc2",
        "var_a_cc2", "var_b_cc2", "hy_corr")
      .orderBy("sym_a", "sym_b")
  }

  /** E11 — LINEAR-INTERPOLATION GAP FILL onto a uniform time grid per
    * symbol: the resampling step every model-prep pipeline runs before
    * fixed-step learners (the reference ffills — `ML Model/Scripts/
    * model.py:227-229`; this is the interpolating upgrade, B4's
    * forward-fill generalized to two-sided). Each symbol's span
    * [first, last] `unit`-bucket is expanded to a dense calendar grid
    * (E10's `sequence` explode — calendar-bounded, never tick-volume-
    * bounded); buckets with ticks anchor to the FIRST tick's exact
    * cents (B2's rule, arg_min by tick_id); missing buckets
    * interpolate between the nearest anchors on either side.
    *
    * Engine-exactness: the interpolation never leaves int64. Because
    * the grid is uniform, time is the per-symbol grid INDEX (no epoch
    * arithmetic, no overflow): with prev anchor (i₁,p₁) and next
    * (i₂,p₂) at index i, `v = (2·(p₁·(i₂−i) + p₂·(i−i₁)) + (i₂−i₁))
    * div (2·(i₂−i₁))` — the B8 half-up integer rounding formula, so
    * both engines emit the same cent. No IEEE value ever materializes.
    *
    * Shape: the 100 TB fact collapses in the FIRST aggregate (one
    * (symbol, bucket) exchange with map-side partials); the grid,
    * span, both IGNORE NULLS window scans and the join all run on
    * calendar-sized data partitioned by symbol. Edges are safe by
    * construction: the span starts and ends at observed anchors. */
  def interpolateGrid(ticks: DataFrame, unit: String): DataFrame = {
    val anchors = ticks
      .withColumn("cents", round(col("bid") * 100.0, 0).cast("long"))
      .groupBy(col("symbol"), date_trunc(unit, col("ts")).as("bucket"))
      .agg(min_by(col("cents"), col("tick_id")).as("a_cents"))
      .localCheckpoint(true)
    val grid = anchors
      .groupBy("symbol")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col("symbol"),
        explode(sequence(col("b0"), col("b1"),
          expr(s"INTERVAL 1 ${unit.toUpperCase}"))).as("bucket"))
    // Forward pass: running (UnboundedPreceding, CurrentRow) frames are
    // O(n) streaming aggregates. The NEXT anchor deliberately re-sorts
    // the SAME symbol partition DESCENDING and reuses the running-frame
    // form — Spark evaluates an (CurrentRow, UnboundedFollowing) frame
    // by re-scanning the partition tail per row, O(n²) on a 90%-null
    // anchor column (measured 67 s at sf0.1 vs ~2 s for this shape; the
    // E2-nearest-join reversed-sort rule). Two in-partition sorts, ONE
    // exchange.
    val w = Window.partitionBy("symbol").orderBy("bucket")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNextRev = Window.partitionBy("symbol").orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val interp = grid.join(anchors, Seq("symbol", "bucket"), "left")
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("a_idx", when(col("a_cents").isNotNull, col("idx")))
      .withColumn("p_cents", last(col("a_cents"), ignoreNulls = true).over(wPrev))
      .withColumn("p_idx", last(col("a_idx"), ignoreNulls = true).over(wPrev))
      .withColumn("n_cents", last(col("a_cents"), ignoreNulls = true).over(wNextRev))
      .withColumn("n_idx", last(col("a_idx"), ignoreNulls = true).over(wNextRev))
      .withColumn("cents",
        when(col("a_cents").isNotNull, col("a_cents"))
          .otherwise(expr(
            "(2 * (p_cents * (n_idx - idx) + n_cents * (idx - p_idx)) " +
              "+ (n_idx - p_idx)) div (2 * (n_idx - p_idx))")))
      .select(col("symbol"), col("bucket"), col("cents"),
        col("a_cents").isNotNull.as("is_observed"))
      // Barrier before the presentation sort: the range partitioner's
      // SAMPLING pass otherwise re-executes the whole join+double-
      // window subtree to pick its bounds (measured: 0.98 s window
      // stage, 2.83 s with the terminal sort at sf0.1 — the delta is
      // the second evaluation). Checkpointing the narrow 4-column
      // result makes the sample read ~free and the sort local.
      .localCheckpoint(true)
    // sort on the TIMESTAMP, then format: the yyyy-MM-dd render is
    // monotonic in the bucket, so the order is identical and the
    // 1M-row sort runs on 8-byte keys instead of strings
    interp.orderBy("symbol", "bucket")
      .select(col("symbol"),
        date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket_ts"),
        col("cents"), col("is_observed"))
  }

  /** E16 — MULTI-TABLE POINT-IN-TIME FEATURE JOIN: each fact row
    * enriched with the LATEST at-or-before value from TWO feature
    * tables with independent update cadences — the feature-store
    * read that prevents training-serving skew (a model trained on
    * features the serving path couldn't have known is E13's
    * look-ahead bias at the feature level; every feature platform's
    * `get_historical_features` is this join). E1 composes twice, but
    * NOT as two joins: all three tables union into ONE stream with a
    * per-table value column, and a single symbol-keyed window carries
    * BOTH running IGNORE-NULLS lasts — one exchange total where the
    * naive two-ASOF plan pays two (the same union trick E1 itself
    * plays on one table, widened to n feature columns).
    *
    * Per fact row: each feature's value (picked raw — element-wise,
    * unrounded) and its exact µs age; a feature with no prior update
    * is NULL with NULL age (left semantics — facts never drop).
    * Quote-vs-fact ts ties resolve feature-first (kind ordering), so
    * an update stamped exactly at the fact ts is visible — E1's
    * inclusive rule. */
  def pointInTimeJoin(facts: DataFrame, featA: DataFrame,
                      featB: DataFrame): DataFrame = {
    def side(df: DataFrame, kind: Int, valCol: String,
             aName: String, bName: String) = df.select(
      col("symbol"), col("ts"), lit(kind).as("kind"),
      col("id"),
      (if (valCol == "a") col("v") else lit(null).cast("double")).as(aName),
      (if (valCol == "b") col("v") else lit(null).cast("double")).as(bName))
    val a = side(featA, 0, "a", "va", "vb")
    val b = side(featB, 0, "b", "va", "vb")
    val f = facts.select(col("symbol"), col("ts"), lit(1).as("kind"),
      col("id"), lit(null).cast("double").as("va"),
      lit(null).cast("double").as("vb"))
    val w = Window.partitionBy("symbol")
      .orderBy(col("ts"), col("kind"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a.unionByName(b).unionByName(f)
      .withColumn("a_val", last(col("va"), ignoreNulls = true).over(w))
      .withColumn("a_ts", last(when(col("va").isNotNull, col("ts")),
        ignoreNulls = true).over(w))
      .withColumn("b_val", last(col("vb"), ignoreNulls = true).over(w))
      .withColumn("b_ts", last(when(col("vb").isNotNull, col("ts")),
        ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("id").as("fact_id"), col("symbol"),
        col("a_val"),
        (unix_micros(col("ts")) - unix_micros(col("a_ts"))).as("a_age_us"),
        col("b_val"),
        (unix_micros(col("ts")) - unix_micros(col("b_ts"))).as("b_age_us"))
      .orderBy("fact_id")
  }

  /** E14 — COHORT RETENTION MATRIX over the event log: users grouped
    * by their first-seen calendar day (the cohort), then for each
    * (cohort day, days-since-cohort offset) the count of cohort
    * members active on that offset day — the retention triangle every
    * product-analytics deployment reads daily, and the temporal dual
    * of E9's funnel (E9 orders WITHIN a user's stream; this aligns
    * ACROSS users on relative time). Ref capability: the live
    * endpoint's per-user session monitoring (README §8.5) rolled up
    * to the population level.
    *
    * Shape: the fact collapses immediately to distinct (user, day) —
    * one exchange with map-side partial dedup; first-seen is a
    * per-user min on that deduped frame (same key — no second
    * exchange under subset-key clustering); the cohort frame is
    * |users| rows joined back BY USER KEY, and the final aggregate's
    * output is calendar² rows (bounded: a year of data is ≤ 365²
    * rows whatever the user count). Nothing is ever per-event past
    * the first aggregate — the 100 TB shape.
    *
    * Determinism: counts are exact int64 (the distinct frame makes
    * `count(*)` a distinct-user count with map-side partials —
    * no count_distinct shuffle-explosion); `retention` is ONE IEEE
    * division of exact ints (F58's rule), unrounded. */
  def cohortRetention(events: DataFrame): DataFrame = {
    // distinct (user, day): checkpointed once, read by both the
    // cohort min and the activity join
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .localCheckpoint(true)
    val cohorts = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    days.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      // sizes is calendar-bounded (one row per cohort day) — broadcast
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_date"),
        col("day_offset"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
      .orderBy("cohort_date", "day_offset")
  }

  /** E17 — TRAILING-INTERVAL COUNT JOIN (order velocity): for every
    * order, how many orders the SAME customer placed in the trailing
    * `windowDays`-day interval ENDING THE DAY BEFORE — the
    * velocity/fraud-screen shape ("3rd order in 90 days?") that every
    * event-stream risk system computes, and the one temporal-join
    * class the E-block lacked: a bounded-interval AGGREGATE join
    * (E1/E5 pick ONE row across streams, E2/E12 test containment,
    * D26's trailing windows are row-count frames; this aggregates a
    * VALUE-RANGE frame per row).
    *
    * Spelled as ONE per-customer RANGE window over integer
    * epoch-days — `RANGE BETWEEN w PRECEDING AND 1 PRECEDING` — so
    * same-day sibling orders are excluded symmetrically (strictly
    * earlier DAYS count; tie order can never matter) and the empty
    * frame is an exact 0, not NULL. One exchange on the customer
    * key; per-customer state is the order history inside one
    * window — bounded by the key's order count, the same contract
    * as every partitioned window in the D-block (a pathological
    * single-customer firehose is a skew problem H1's salting
    * addresses, not a plan problem). Counts exact int64. */
  def orderVelocity(orders: DataFrame, windowDays: Int = 90): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val w = Window.partitionBy("o_custkey").orderBy(col("day_i"))
      .rangeBetween(-windowDays, -1)
    orders.select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("day_i"))
      .withColumn("n_prior", count(lit(1)).over(w))
      .select("o_orderkey", "o_custkey", "o_day", "n_prior")
      .orderBy("o_orderkey")
  }

  /** E19 — EVENT-PATH CENSUS (consecutive-transition mining): the
    * count of every observed `prev_type → next_type` transition
    * across all users' event streams, plus each transition's share
    * of its source type's outgoing edges — the empirical Markov
    * transition table behind funnel DISCOVERY (E9/E15 MATCH a given
    * pattern; this one reports which patterns exist and how often —
    * what product analytics calls a path/Sankey census and
    * sessionized clickstream mining runs at web scale). Top-k edges
    * by count via the termSearch heap discipline.
    *
    * Shape: one user-keyed exchange carries the lag window; the
    * edge aggregate map-side combines (|edges| ≤ |event types|² —
    * alphabet-bounded, NOT data-bounded); the outgoing-mass
    * re-aggregate runs on that bounded frame. Ties in the per-user
    * order broken by event_id (total order — engine tie order can
    * never move an edge). Counts exact int64; `share` is one IEEE
    * division of exact ints, unrounded (§6). */
  def eventPaths(events: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val edges = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_edges"))
    val outMass = edges.groupBy("prev_type")
      .agg(sum(col("n_edges")).as("n_out"))
    edges.join(outMass, Seq("prev_type"))
      .withColumn("share",
        col("n_edges").cast("double") / col("n_out").cast("double"))
      .orderBy(col("n_edges").desc, col("prev_type"), col("next_type"))
      .limit(k)
      .withColumn("rnk", row_number().over(Window.orderBy(
        col("n_edges").desc, col("prev_type"), col("next_type"))))
      .select("rnk", "prev_type", "next_type", "n_edges", "n_out",
        "share")
      .orderBy("rnk")
  }

  /** E18 — INTERVAL-UNION COVERAGE (the gaps-and-islands AGGREGATE):
    * each order opens a half-open activity interval
    * `[orderdate, orderdate + windowDays)`; per customer, merge every
    * overlapping/touching run into maximal ISLANDS and report how
    * much of the customer's own [first, last] span those islands
    * actually cover — the canonical "total time under contract /
    * on-treatment / in-position" aggregate (the measure E8 computes
    * for ONE pair of sessions and E10 for a POINT grid, here as the
    * general overlapping-interval union). A union's island is
    * contiguous by construction — every member starts at-or-before
    * the running max end — so its length is exactly `max(end) −
    * min(start)`, and island detection is ONE strictly-preceding
    * running-max window (start > all previous ends ⇒ new island)
    * plus a running sum of starts: the D26 stretch-id discipline
    * lifted from points to intervals.
    *
    * Shape: one hash exchange on the customer key; both windows and
    * both aggregates reuse that partitioning — a single-shuffle plan
    * at any scale (islands are per-key sequential state, exactly what
    * a sort-within-partition window expresses; never a self-join).
    * Everything is exact int64 epoch-day arithmetic; `coverage` is
    * one IEEE division of exact ints, unrounded (§6). Tied
    * same-day orders carry identical (start, end), so the running
    * max and the island partition are permutation-invariant under
    * engine tie order. */
  def intervalCoverage(orders: DataFrame, windowDays: Int = 30): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val base = orders.select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("s"))
      .withColumn("e", col("s") + lit(windowDays))
    val wOrd = Window.partitionBy("o_custkey").orderBy("s")
    val marked = base
      .withColumn("pme",
        max("e").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("pme").isNull || col("s") > col("pme"), 1L).otherwise(0L))
      .withColumn("island",
        sum("ni").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val islands = marked.groupBy("o_custkey", "island")
      .agg(count(lit(1)).as("n_orders"),
        min("s").as("i_s"), max("e").as("i_e"))
    islands.groupBy("o_custkey")
      .agg(sum("n_orders").as("n_orders"),
        count(lit(1)).as("n_intervals"),
        sum((col("i_e") - col("i_s")).cast("long")).as("covered_days"),
        (max(col("i_e")) - min(col("i_s"))).cast("long").as("span_days"))
      .withColumn("coverage",
        col("covered_days").cast("double") / col("span_days").cast("double"))
      .orderBy("o_custkey")
  }
}
