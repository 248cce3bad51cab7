package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A25 — EXPERIMENT/RUN-TRACKING LINEAGE: the lakehouse analog of the
  * reference's MLflow phase tracker (ref: ML Model/Scripts/
  * mlflow_utils.py:13-115 — per-symbol experiments; one run per phase
  * (train/val/test) linked to a parent; params, metrics and model
  * artifacts logged per run; automate_pipeline.py drives one such
  * cycle per symbol per training day). The repo tracks DATA lineage
  * (A4b snapshots, F80 corpus deltas, F90 release manifests); this is
  * the MODEL-side registry that answers "which params produced the
  * artifact we're serving, and what did we know when it shipped".
  *
  * The registry TABLE is derived deterministically from the tick lake
  * so the driver's DuckDB oracle can re-derive it end-to-end: each
  * (symbol, trading day) is one training cycle emitting three phase
  * runs; the phase METRIC is computed over that phase's chronological
  * slice of the day's ticks (D7's `int(n·0.6)/int(n·0.2)` split — the
  * same arithmetic the reference's split uses), loss = mean |Δcents|
  * within the slice, held ppm-exact in int64 (`(Σ·10⁶) div n` — no
  * doubles anywhere in this surface). Run ids are pure functions of
  * (symbol, day index, phase), the parent id is the cycle's train
  * run, params (`lr_ppm`) pure functions of the day index, and the
  * artifact path is logged on the train run only (mlflow logs the
  * model once per cycle).
  *
  * Scale shape: two windows sharing the (symbol, day) exchange, one
  * grouped aggregate — registry size is |symbols|·|days|·3, metadata-
  * scale next to the tick fact. The as-of read is a pushed-down date
  * predicate (A4's snapshot semantics); best-run selection is a
  * per-symbol top-1 window over the REGISTRY (k-row frame), never the
  * ticks.
  */
object RunTracker {

  /** The per-tick phase-slice frame shared by [[runLog]] and
    * [[pipelineStatus]]: each (symbol, day)'s ticks ranked by
    * tick_id, split train/val/test by the D7 floor arithmetic, with
    * the within-slice |Δcents| carried. One (symbol, day) exchange
    * carries both windows and the lag. */
  private def phaseTicks(ticks: DataFrame): DataFrame = {
    val d0 = ticks.agg(min(to_date(col("ts"))).as("d0"))
    val e = ticks
      .withColumn("day", to_date(col("ts")))
      .withColumn("cents", expr("CAST(round(bid * 100.0, 0) AS BIGINT)"))
      .crossJoin(broadcast(d0))
      .withColumn("di", datediff(col("day"), col("d0")))
      .select("tick_id", "symbol", "day", "di", "cents", "ts")
    val wDay = Window.partitionBy("symbol", "day").orderBy("tick_id")
    e.withColumn("rn", row_number().over(wDay))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy("symbol", "day")))
      .withColumn("phase",
        when(col("rn") <= floor(col("cnt") * 0.6), "train")
          .when(col("rn") <= floor(col("cnt") * 0.6) +
            floor(col("cnt") * 0.2), "val")
          .otherwise("test"))
      .withColumn("d_cents", abs(col("cents") - lag(col("cents"), 1)
        .over(Window.partitionBy("symbol", "day", "phase")
          .orderBy("tick_id"))))
  }

  /** Materialize the run registry from the tick lake: one row per
    * (symbol, day, phase) with exact-int metrics/params. */
  def runLog(ticks: DataFrame): DataFrame = {
    phaseTicks(ticks).groupBy("symbol", "day", "di", "phase")
      .agg(count(col("d_cents")).as("n_diffs"),
        sum(col("d_cents")).as("sum_abs"))
      .withColumn("loss_ppm", expr(
        "CASE WHEN n_diffs > 0 THEN (sum_abs * 1000000) div n_diffs END"))
      .withColumn("phase_ord",
        when(col("phase") === "train", 0L)
          .when(col("phase") === "val", 1L).otherwise(2L))
      // symbol stride 10^7: di*3 + phase_ord stays below it for any
      // day index under ~3.3M days (9000 years of history); the old
      // 10^5 stride collided across symbols past di = 33,333,
      // silently corrupting parent links in long histories (r12
      // advisory). 1500 symbols × 10^7 ≪ int64 — no overflow risk.
      .withColumn("run_id",
        col("symbol") * 10000000L + col("di") * 3L + col("phase_ord"))
      .withColumn("parent_run_id",
        col("symbol") * 10000000L + col("di") * 3L)
      .withColumn("lr_ppm", expr("CAST(1000000 div (di + 10) AS BIGINT)"))
      .withColumn("artifact_path", when(col("phase") === "train",
        concat(lit("models/"), col("symbol").cast("string"),
          lit("/d"), col("di").cast("string"), lit(".pt"))))
      .select("run_id", "parent_run_id", "symbol", "day", "di", "phase",
        "lr_ppm", "n_diffs", "loss_ppm", "artifact_path")
  }

  /** The lineage read: as of `cutoff`, each symbol's run count, its
    * best validation run (min loss, run_id tiebreak), and — through
    * the parent link — the params and model artifact of the TRAIN run
    * that produced it. */
  def bestRunsAsOf(ticks: DataFrame, cutoff: String): DataFrame = {
    val asof = runLog(ticks).filter(col("day") <= lit(cutoff).cast("date"))
    val w = Window.partitionBy("symbol")
      .orderBy(col("loss_ppm").asc_nulls_last, col("run_id"))
    val bestVal = asof
      .filter(col("phase") === "val" && col("loss_ppm").isNotNull)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("symbol"), col("run_id").as("best_run_id"),
        col("loss_ppm").as("best_val_loss_ppm"), col("parent_run_id"))
    val train = asof.filter(col("phase") === "train")
      .select(col("run_id").as("parent_run_id"), col("lr_ppm"),
        col("artifact_path"))
    asof.groupBy("symbol").agg(count(lit(1)).as("n_runs"))
      .join(bestVal, Seq("symbol"), "left")
      .join(train, Seq("parent_run_id"), "left")
      .select("symbol", "n_runs", "best_run_id", "best_val_loss_ppm",
        "lr_ppm", "artifact_path")
      .orderBy("symbol")
  }

  /** A26 — PIPELINE PHASE-STATUS TABLE (ref: main.py:135-177 run_*
    * wrappers that mark each phase ok/error, main.py:408-442 the
    * /status endpoint's per-phase running/status block,
    * automate_pipeline.py:202-286 the completion monitor polling
    * those verdicts): the ops dashboard behind "which phase of which
    * symbol's cycle is done, when did it run, did it fail" — derived
    * DETERMINISTICALLY from the lake so the oracle re-derives it
    * end-to-end (the A25 discipline; the reference's in-memory
    * `pipeline_state` dict becomes a queryable table).
    *
    * One row per (symbol, trading day, phase):
    *  - train/val/test: the A25 registry's cycle slices — started/
    *    finished = the slice's first/last tick ts (second-truncated,
    *    the house cross-engine rule), status `ok` iff the phase
    *    METRIC exists (the slice produced ≥ 1 price diff — exactly
    *    the predicate under A25's nullable loss_ppm; a 1-tick slice
    *    is the deterministic analog of the reference's "No trained
    *    models found" error branch). Phases whose slice is EMPTY
    *    (e.g. a 1-tick day floors both train and val to zero rows)
    *    emit nothing — auditable absence.
    *  - live: the session-window monitor (main.py's 07:50/13:50
    *    windows) — started/finished bound the day's session ticks,
    *    status `error` iff any of the day's windows breaches the
    *    symbol's DEPLOYED threshold (D67's test-percentile qu — the
    *    same rule D83/G42 alert on), `ok` otherwise; untrained
    *    symbols (no threshold) never error (G42's conservatism).
    *    Days with no session ticks carry no live row (the monitor
    *    only runs inside the windows).
    *
    * Scale shape: metric rows ride ONE (symbol, day) exchange
    * (windows + lag + collapse); live rows ride the session-keyed
    * collapse plus the session-shared D66 slot chain (`cacheKey`) —
    * the threshold join is a |symbols|-row broadcast; output is
    * |symbols|·|days|·≤4 rows, metadata-scale. */
  def pipelineStatus(ticks: DataFrame, k: Int,
                     trainRatio: Double = 0.6, valRatio: Double = 0.2,
                     pct: Double = 0.99,
                     cacheKey: Option[String] = None): DataFrame = {
    val metric = phaseTicks(ticks).groupBy("symbol", "day", "phase")
      .agg(date_trunc("second", min(col("ts"))).as("started"),
        date_trunc("second", max(col("ts"))).as("finished"),
        count(lit(1)).as("n_ticks"),
        count(col("d_cents")).as("n_diffs"))
      .withColumn("status",
        when(col("n_diffs") > 0, "ok").otherwise("error"))
      // day as the yyyy-MM-dd STRING: parquet DATE cells and oracle
      // DATE cells stringify differently in the driver's comparator
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .select("symbol", "day", "phase", "started", "finished",
        "n_ticks", "status")
    val h = hour(col("ts")); val m = minute(col("ts"))
    val wname =
      when((h === TickOps.MorningH) && (m >= TickOps.FromMin), "morning")
        .when((h === TickOps.AfternoonH) && (m >= TickOps.FromMin),
          "afternoon")
    val liveBounds = ticks
      .withColumn("win", wname).filter(col("win").isNotNull)
      .withColumn("day", to_date(col("ts")))
      .groupBy("symbol", "day")
      .agg(date_trunc("second", min(col("ts"))).as("started"),
        date_trunc("second", max(col("ts"))).as("finished"),
        count(lit(1)).as("n_ticks"))
    val errs = Features.slotChain(ticks, k, trainRatio, valRatio,
      cacheKey).errs
    val thr = errs.filter(col("split") === "test")
      .groupBy("symbol")
      .agg(expr(s"percentile(u_err, $pct)").as("qu"))
    val breach = errs.join(broadcast(thr), Seq("symbol"), "left")
      .groupBy(col("symbol"), col("date"))
      .agg(max(when(col("qu").isNotNull &&
        col("u_err").cast("double") > col("qu"), 1).otherwise(0))
        .as("breached"))
    val live = liveBounds
      .withColumn("date", date_format(col("day"), "yyyy-MM-dd"))
      .join(breach, Seq("symbol", "date"), "left")
      .withColumn("status",
        when(col("breached") === 1, "error").otherwise("ok"))
      .select(col("symbol"), col("date").as("day"),
        lit("live").as("phase"), col("started"), col("finished"),
        col("n_ticks"), col("status"))
    metric.unionByName(live)
      .orderBy(col("symbol"), col("day"),
        when(col("phase") === "train", 0)
          .when(col("phase") === "val", 1)
          .when(col("phase") === "test", 2).otherwise(3))
  }
}
