package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lakehouse-maintenance analogs of the reference's Iceberg/Trino layer
  * and its driver-side quality scanner.
  */
object Lakehouse {

  /** A2 — data-quality scan. The reference loops over every parquet
    * file on the driver issuing one `count()` per column per file
    * (ref: `Data Preprocessing and Cleaning/spark_data_cleaner_script.py:18-63`)
    * — O(files × columns) Spark jobs. Here: ONE job, grouped
    * conditional aggregation; at 100 TB this is a single scan with
    * partial aggregation instead of thousands of jobs.
    */
  def qualityScan(df: DataFrame, groupCol: String, cols: Seq[String]): DataFrame = {
    val nullCounts = cols.map(c =>
      count(when(col(c).isNull, 1)).as(s"${c}_nulls"))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("total_rows"), nullCounts: _*)
      .orderBy(groupCol)
  }

  /** A3 — partition statistics: rows per year partition, the core
    * "what data do I have" check the reference runs through Trino
    * (ref: `Apache Iceberg/iceberg_time_travel.py:100-121`). On a real
    * deployment the table is partitioned by `year(ts)` (ref:
    * `metadata_layer.py:76-85`) and this reads only partition metadata.
    */
  def partitionStats(df: DataFrame, tsCol: String, valCol: String): DataFrame =
    df.groupBy(year(col(tsCol)).as("yr"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col(valCol)), 4).as("sum_val"))
      .orderBy("yr")

  /** A27 — PARTITION-SKEW REPORT: the layout-health check a catalog
    * runs before a 100 TB table hot-spots — per day partition the row
    * count, then one summary row: partition count, total, max/min,
    * `max_share_ppm = max·10⁶ div total` (how much of the table the
    * hottest partition holds vs the uniform 10⁶/n) and the exact-int
    * GINI of the partition sizes (`Σᵢⱼ|xᵢ−xⱼ| / (2·n·Σx)`, ppm) —
    * the one-number skew gauge that decides whether A22's compaction
    * / repartitioning is due. The pairwise Gini runs on the
    * PARTITION-COUNT frame (|days| rows — metadata-scale; the fact is
    * touched once by the count aggregate), every statistic pure
    * int64. */
  def partitionSkew(df: DataFrame, tsCol: String): DataFrame = {
    val counts = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the summary AND the pair grid
    val pairs = counts.select(col("n").as("a"))
      .crossJoin(counts.select(col("n").as("b")))
      .agg(sum(abs(col("a") - col("b"))).as("sad"))
    counts.agg(count(lit(1)).as("n_partitions"),
        sum(col("n")).as("total_rows"),
        max(col("n")).as("max_rows"), min(col("n")).as("min_rows"))
      .crossJoin(broadcast(pairs))
      .withColumn("max_share_ppm",
        expr("(max_rows * 1000000) div total_rows"))
      .withColumn("gini_ppm", expr(
        "(sad * 1000000) div (2 * n_partitions * total_rows)"))
      .select("n_partitions", "total_rows", "max_rows", "min_rows",
        "max_share_ppm", "gini_ppm")
  }

  /** A5 — semi-structured JSON extraction: pull typed fields out of a
    * JSON string column and aggregate — the lakehouse path for event
    * payloads (`events.props`). `get_json_object` is codegen'd; at
    * 100 TB prefer `from_json` with an explicit schema once the
    * payload shape is fixed, same plan shape. */
  def jsonExtractStats(events: DataFrame, jsonCol: String,
                       path: String, groupCol: String): DataFrame =
    events
      .withColumn("k", get_json_object(col(jsonCol), path).cast("int"))
      .groupBy(col(groupCol))
      .agg(count(col("k")).as("n_with_key"),
        round(avg(col("k")), 4).as("avg_k"),
        max(col("k")).as("max_k"))
      .orderBy(groupCol)

  /** A4 — snapshot/time-travel emulation: an append-only log is
    * filtered "as of" a cutoff and summarized — the semantics of
    * `FOR VERSION AS OF` row counting in the reference
    * (ref: `Apache Iceberg/iceberg_time_travel.py:43-66,100-121`)
    * without an Iceberg catalog. The cutoff predicate is pushed into
    * the scan (partition pruning on a partitioned table).
    */
  def snapshotAsOf(df: DataFrame, snapshotCol: Column, cutoff: Column,
                   groupCol: String): DataFrame =
    df.filter(snapshotCol <= cutoff)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(groupCol)

  /** A2b — exact NDV (distinct-count) profile: the cardinality stats a
    * catalog keeps per column. Exact `count(DISTINCT …)` here for
    * oracle parity; at 100 TB the same plan takes
    * `approx_count_distinct` (HLL) — one pass either way. */
  def ndvProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val ndvs = cols.map(c => countDistinct(col(c)).as(s"ndv_$c"))
    df.agg(count(lit(1)).as("total_rows"), ndvs: _*)
  }

  /** A4b — snapshot history: rows added per snapshot and the running
    * total, the information the reference prints per Iceberg snapshot
    * (`added-records` / `total-records`,
    * ref: `Apache Iceberg/iceberg_time_travel.py:43-97`). Snapshots
    * are emulated as fixed-size id ranges of the append log; one
    * groupBy + a window over the tiny snapshot table.
    */
  def snapshotHistory(df: DataFrame, idCol: String, rowsPerSnapshot: Long): DataFrame = {
    val snaps = df
      .groupBy(expr(s"$idCol div $rowsPerSnapshot").as("snapshot_id"))
      .agg(count(lit(1)).as("added"))
    snaps
      .withColumn("total", sum("added").over(
        org.apache.spark.sql.expressions.Window.orderBy("snapshot_id")
          .rowsBetween(Long.MinValue, 0)))
      .orderBy("snapshot_id")
  }

  /** A10 — snapshot ROLLBACK: restore the table to the state at
    * `targetSnapshot`. Iceberg's `rollback_to_snapshot` does not erase
    * history — it WRITES a new snapshot whose state equals the target's
    * (ref: `Apache Iceberg/iceberg_time_travel.py:209-225`, the
    * `CALL iceberg.system.rollback_to_snapshot` menu action). Mirrored
    * here on the append-log emulation:
    *   - live rows after rollback = rows in snapshots <= target
    *     ([[rollbackTo]] — the filter prunes like any as-of read);
    *   - the snapshot LOG gains one entry: a fresh id, operation
    *     `rollback`, zero added records, total = the target's total
    *     ([[rollbackHistory]]). Undoing a bad load is an O(metadata)
    *     pointer move, never a data rewrite — the property that makes
    *     rollback usable at 100 TB.
    */
  def rollbackTo(df: DataFrame, idCol: String, rowsPerSnapshot: Long,
                 targetSnapshot: Long): DataFrame =
    df.filter(expr(s"$idCol div $rowsPerSnapshot") <= targetSnapshot)

  /** The post-rollback snapshot log: every original append entry (the
    * history survives, exactly as Iceberg keeps rolled-back snapshots
    * queryable) plus the new `rollback` entry at head. A
    * `targetSnapshot` that never existed contributes NO rollback entry
    * (the inner select is empty) — callers that need Iceberg's loud
    * failure should check `snapshotHistory` first; as a lazy plan this
    * function cannot validate without running a job. */
  def rollbackHistory(df: DataFrame, idCol: String, rowsPerSnapshot: Long,
                      targetSnapshot: Long): DataFrame = {
    val appends = snapshotHistory(df, idCol, rowsPerSnapshot)
      .withColumn("operation", lit("append"))
    // The rollback entry's total is the target snapshot's running total.
    val targetTotal = appends
      .filter(col("snapshot_id") === targetSnapshot)
      .select(col("total"))
    val maxId = appends.select(max("snapshot_id").as("m"))
    val rollbackRow = targetTotal.crossJoin(maxId)
      .select((col("m") + 1).as("snapshot_id"), lit(0L).as("added"),
        col("total"), lit("rollback").as("operation"))
    appends.unionByName(rollbackRow).orderBy("snapshot_id")
  }

  /** A14 — snapshot RETENTION / EXPIRY report: Iceberg's
    * `expire_snapshots(retain_last => n)` on the append-log emulation.
    * Expiry removes old snapshots from METADATA — time travel to them
    * is gone — while their DATA lives on in every later snapshot
    * (append-only: the head state is untouched, so `added`/`total`
    * never change). The report is the full log with the verdict per
    * snapshot: `expired` for everything older than the `retainLast`
    * newest ids, `time_travelable` for the kept tail — the audit a
    * platform prints before garbage-collecting manifests. O(snapshot
    * count) on a real catalog; here one history aggregation plus a
    * one-row head broadcast. */
  def expireSnapshots(df: DataFrame, idCol: String, rowsPerSnapshot: Long,
                      retainLast: Int): DataFrame = {
    require(retainLast >= 1, s"retainLast must be >= 1: $retainLast")
    val log = snapshotHistory(df, idCol, rowsPerSnapshot)
    val head = log.agg(max("snapshot_id").as("head"))
    log.crossJoin(broadcast(head))
      .withColumn("expired",
        col("snapshot_id") <= col("head") - retainLast)
      .withColumn("time_travelable", !col("expired"))
      .select("snapshot_id", "added", "total", "expired",
        "time_travelable")
      .orderBy("snapshot_id")
  }

  /** A12 — snapshot DIFF: row counts at two snapshots plus the delta,
    * the reference's `diff_snapshots` menu action (ref: `Apache
    * Iceberg/iceberg_time_travel.py:184-207`, menu item 4). Counts use
    * as-of semantics (rows in snapshots <= id) so a snapshot id beyond
    * the current head compares against head rather than erroring —
    * the same convention as [[snapshotAsOf]] reads. ONE conditional-
    * aggregation scan produces both counts; at 100 TB this is pure
    * snapshot-metadata arithmetic on a real catalog (no data read at
    * all), and here it is a single pass with partial aggregation. */
  def diffSnapshots(df: DataFrame, idCol: String, rowsPerSnapshot: Long,
                    snapA: Long, snapB: Long): DataFrame = {
    val snap = expr(s"$idCol div $rowsPerSnapshot")
    df.agg(
        count(when(snap <= snapA, 1)).as("rows_a"),
        count(when(snap <= snapB, 1)).as("rows_b"))
      .select(
        lit(snapA).as("snap_a"), lit(snapB).as("snap_b"),
        col("rows_a"), col("rows_b"),
        (col("rows_b") - col("rows_a")).as("delta"))
  }

  /** A13 — partition stats AS OF a snapshot: per-partition row counts
    * at a historical snapshot, the reference's
    * `show_partitions(…, snapshot_id)` (ref: `Apache Iceberg/
    * iceberg_time_travel.py:99-135`). Pure composition of the as-of
    * read and the partition profile: the snapshot predicate is pushed
    * into the scan, then one grouped aggregate — on a `year(ts)`-
    * partitioned table this prunes to partition metadata. */
  def partitionsAsOf(df: DataFrame, idCol: String, rowsPerSnapshot: Long,
                     targetSnapshot: Long, tsCol: String, valCol: String): DataFrame =
    partitionStats(rollbackTo(df, idCol, rowsPerSnapshot, targetSnapshot),
      tsCol, valCol)

  /** A18 — DECLARATIVE CONSTRAINT AUDIT (the dbt-test / expectations
    * contract layer): each constraint is (name, violation-predicate
    * Column) and the report is one row per constraint — violation
    * count and pass flag — the artifact a write-audit-publish gate
    * reads before promoting a snapshot. ALL predicates evaluate in
    * ONE scan (a single aggregate of conditional sums — adding a
    * constraint adds a column, never a pass); the unpivot to rows is
    * a stack() over the 1-row aggregate, size |constraints|.
    * Referential checks (FK ⊆ PK) don't fit a row predicate — use
    * [[referentialViolations]] and UNION the reports. */
  def constraintAudit(df: DataFrame,
                      constraints: Seq[(String, Column)]): DataFrame = {
    val sums = constraints.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"v_$name")
    }
    val agg = df.agg(count(lit(1)).as("total_rows"), sums: _*)
    val stackArgs = constraints.map { case (name, _) =>
      s"'$name', v_$name"
    }.mkString(", ")
    agg.select(col("total_rows"),
      expr(s"stack(${constraints.size}, $stackArgs) AS (constraint_name, n_violations)"))
      .select(col("constraint_name"), col("n_violations"),
        col("total_rows"), (col("n_violations") === 0L).as("pass"))
      .orderBy("constraint_name")
  }

  /** A18b — referential-integrity half of the audit: count fact rows
    * whose key has NO match in the dimension (orphan FKs). Left-anti
    * join on the key — the dim side is pre-projected to its key
    * column, so the anti shuffle carries 8 bytes/row; at 100 TB this
    * is the same shape as C6. */
  def referentialViolations(fact: DataFrame, factKey: String,
                            dim: DataFrame, dimKey: String,
                            name: String): DataFrame = {
    val total = fact.agg(count(lit(1)).as("total_rows"))
    fact.select(col(factKey))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey),
        "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(total)
      .select(lit(name).as("constraint_name"), col("n_violations"),
        col("total_rows"), (col("n_violations") === 0L).as("pass"))
  }

  /** A19 — WRITE-AUDIT-PUBLISH gate: the commit protocol that makes
    * A18's audit load-bearing (Iceberg's WAP / `wap.branch` pattern,
    * dbt's test-before-swap): a staged batch is audited in ONE scan
    * ([[constraintAudit]]), and only a fully-green report lets the
    * batch join the published table — a red report leaves the
    * published table BIT-IDENTICAL and ships the violation report
    * instead of silently dropping rows (audit-don't-filter; the batch
    * is someone's bug report). The publish verdict is ONE bounded
    * driver-side action over the constraint-count-sized report — a
    * real commit IS a driver decision; the 100 TB scan happens once,
    * inside the audit aggregate.
    *
    * Returns (report with the `published` verdict column, the
    * resulting published table — `current ∪ staged` on green,
    * `current` unchanged on red). */
  def wapPublish(current: DataFrame, staged: DataFrame,
                 constraints: Seq[(String, Column)])
  : (DataFrame, DataFrame) = {
    // An empty gate has no defined verdict (bool_and over zero rows is
    // NULL, and constraintAudit's stack(0,...) can't even build the
    // report) — fail fast rather than publish-by-accident.
    require(constraints.nonEmpty, "wapPublish needs at least one constraint")
    val report = constraintAudit(staged, constraints).localCheckpoint(true)
    val ok = report.agg(expr("bool_and(pass)").as("ok"))
      .head().getBoolean(0)
    (report.withColumn("published", lit(ok)),
      if (ok) current.unionByName(staged) else current)
  }
}
