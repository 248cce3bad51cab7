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

  /** Materialize the run registry from the tick lake: one row per
    * (symbol, day, phase) with exact-int metrics/params. */
  def runLog(ticks: DataFrame): DataFrame = {
    val d0 = ticks.agg(min(to_date(col("ts"))).as("d0"))
    val e = ticks
      .withColumn("day", to_date(col("ts")))
      .withColumn("cents", expr("CAST(round(bid * 100.0, 0) AS BIGINT)"))
      .crossJoin(broadcast(d0))
      .withColumn("di", datediff(col("day"), col("d0")))
      .select("tick_id", "symbol", "day", "di", "cents")
    val wDay = Window.partitionBy("symbol", "day").orderBy("tick_id")
    val ranked = e
      .withColumn("rn", row_number().over(wDay))
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
    ranked.groupBy("symbol", "day", "di", "phase")
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
}
