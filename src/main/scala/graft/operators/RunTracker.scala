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

  // ===== A28 — DVC-analog stage-lineage manifest ===================

  /** The pipeline's stage DAG, topologically ordered. `schema` has no
    * data dependency (params-only — a config stage); `evaluate`
    * depends on BOTH `train` and `features` (the diamond that makes
    * cone-invalidation non-trivial). */
  val LineageStages: Seq[String] =
    Seq("schema", "ingest", "clean", "features", "train", "evaluate")

  private val FpP = graft.functions.PortableText.P

  /** Params fingerprint: one multiplicative-hash step mod p (params
    * are small config longs, so the product stays far inside int64 —
    * DuckDB errors on BIGINT overflow, so this bound is load-bearing
    * for the oracle too). */
  def lineageParamsFp(param: Long): Long = {
    require(param >= 0 && param < 1000000000L,
      s"stage param out of the overflow-safe range [0, 1e9): $param")
    Math.floorMod(param * 2654435761L, FpP)
  }

  /** Stage OUTPUT fingerprint — the DVC cache key: input fp, the
    * stage's own data-content fp and its params fp folded mod p.
    * Any upstream change cascades here, which is exactly what makes
    * a params edit invalidate its downstream cone and nothing else.
    * All terms < p = 1e9+7, multipliers keep the fold < ~1e12. */
  def lineageOutFp(inputFp: Long, dataFp: Long, paramsFp: Long): Long =
    Math.floorMod(inputFp * 961L + dataFp * 31L + paramsFp, FpP)

  /** Per-manifest data-content fingerprints: (raw ticks, session
    * ticks, slot frame, train means, window errors) — each an
    * order-free sum of per-row hashes mod p (F90's content-checksum
    * device; equal fp ⇔ same row multiset). One tick scan covers
    * raw+clean; the rest ride the (shared) D66 slot chain. At true
    * scale the plain int64 sum becomes a modular partial-sum reduce
    * (F54's rule — sums stay exact here to ~9·10⁹ rows). */
  private def manifestDataFps(t: DataFrame, k: Int, trainRatio: Double,
                              valRatio: Double,
                              cacheKey: Option[String])
      : Map[String, Long] = {
    val p = lit(FpP)
    val h = hour(col("ts")); val m = minute(col("ts"))
    val insess =
      ((h === TickOps.MorningH) || (h === TickOps.AfternoonH)) &&
        (m >= TickOps.FromMin)
    val row = t
      .withColumn("cents", expr("CAST(round(bid * 100.0, 0) AS BIGINT)"))
      .withColumn("hh", pmod(col("tick_id") * 31 + col("cents"), p))
    val r0 = row.agg(
      coalesce(pmod(sum(col("hh")), p), lit(0L)).as("raw"),
      coalesce(pmod(sum(when(insess, col("hh"))), p), lit(0L))
        .as("clean")).head()
    val chain = Features.slotChain(t, k, trainRatio, valRatio, cacheKey)
    val sFp = chain.scaled.agg(coalesce(pmod(sum(pmod(
      col("symbol") * 8191 + col("i") * 127 + col("u"), p)), p),
      lit(0L))).head().getLong(0)
    val tFp = chain.scaled.filter(col("split") === "train")
      .groupBy("symbol", "i")
      .agg(sum(col("u")).as("su"), count(lit(1)).as("n_tr"))
      .agg(coalesce(pmod(sum(pmod(col("symbol") * 8191 +
        col("i") * 127 + col("su") * 31 + col("n_tr"), p)), p),
        lit(0L))).head().getLong(0)
    val eFp = chain.errs.agg(coalesce(pmod(sum(pmod(
      col("symbol") * 8191 + col("u_err"), p)), p), lit(0L)))
      .head().getLong(0)
    Map("schema" -> 0L, "ingest" -> r0.getLong(0),
      "clean" -> r0.getLong(1), "features" -> sFp,
      "train" -> tFp, "evaluate" -> eFp)
  }

  /** (input_fp, params_fp, output_fp) per stage, walking the DAG. */
  private def buildManifest(data: Map[String, Long],
                            params: Map[String, Long])
      : Map[String, (Long, Long, Long)] = {
    var out = Map.empty[String, (Long, Long, Long)]
    def o(s: String) = out(s)._3
    def add(s: String, in: Long): Unit = {
      val pf = lineageParamsFp(params(s))
      out += s -> ((in, pf, lineageOutFp(in, data(s), pf)))
    }
    add("schema", 0L)
    add("ingest", data("ingest"))
    add("clean", o("ingest"))
    add("features", o("clean"))
    add("train", o("features"))
    add("evaluate",
      Math.floorMod(o("train") * 31L + o("features"), FpP))
    out
  }

  /** A28 — DVC-ANALOG STAGE-LINEAGE MANIFEST (ref: README.md §"DVC
    * (Data Version Control)" — the reference versions its pipeline
    * with DVC, whose dvc.lock records per stage the checksums of
    * inputs, params and outputs and `dvc repro` recomputes a stage
    * iff a dependency checksum changed, invalidating exactly its
    * downstream cone): the same contract as a deterministic TABLE.
    * Stages = the reference's flow (schema config → CSV ingest →
    * session clean → window features → train → evaluate); per stage
    * the CURRENT manifest's (input_fp, params_fp, output_fp) next to
    * the PRIOR run's, and the verdict — `cache` iff both dependency
    * fingerprints are unchanged, else `reproduce`. F90's content-
    * checksum device supplies the data fps; the prior manifest is
    * the pipeline AS OF `cutoff` (A12's two-snapshot diff applied to
    * the whole DAG: the registry's prior run saw only the first
    * part of history). Output fps fold (input, data, params), so a
    * change at any stage cascades through every downstream input —
    * the cone rule is structural, not special-cased (spec: a params
    * edit at `train` flips train+evaluate to `reproduce` and leaves
    * the three upstream stages `cache`).
    *
    * Scale shape: five order-free content sums (one tick scan for
    * raw+clean, three slot-chain aggregates — the chain itself is
    * session-shared via `cacheKey`) per manifest; the DAG walk is a
    * driver fold over SIX scalars (A19's rule); output is 6 rows. */
  def stageLineage(ticks: DataFrame, k: Int, cutoff: String,
                   priorParams: Map[String, Long],
                   curParams: Map[String, Long],
                   trainRatio: Double = 0.6, valRatio: Double = 0.2,
                   cacheKey: Option[String] = None): DataFrame = {
    require(LineageStages.forall(priorParams.contains) &&
      LineageStages.forall(curParams.contains),
      s"params must cover all stages: $LineageStages")
    val ss = ticks.sparkSession
    val cur = buildManifest(
      manifestDataFps(ticks, k, trainRatio, valRatio, cacheKey),
      curParams)
    val prior = buildManifest(
      manifestDataFps(
        ticks.filter(to_date(col("ts")) <= lit(cutoff).cast("date")),
        k, trainRatio, valRatio,
        cacheKey.map(c => s"$c|asof=$cutoff")),
      priorParams)
    import ss.implicits._
    LineageStages.zipWithIndex.map { case (s, ord) =>
      val (in, pf, out) = cur(s)
      val (pin, ppf, _) = prior(s)
      val verdict =
        if (in == pin && pf == ppf) "cache" else "reproduce"
      (ord, s, in, pf, out, pin, ppf, verdict)
    }.toDF("stage_ord", "stage", "input_fp", "params_fp", "output_fp",
      "prior_input_fp", "prior_params_fp", "verdict")
      .orderBy("stage_ord")
  }
}
