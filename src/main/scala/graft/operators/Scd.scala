package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history (SURVEY §2.A15) — the
  * lakehouse CDC pattern the reference's Iceberg layer implies but
  * never materializes (ref: `Apache Iceberg/iceberg_migration.py`
  * keeps only current-state gold tables; an SCD2 dimension is what a
  * MERGE-driven warehouse keeps instead): compact an append-only
  * event stream into per-key attribute VERSIONS with
  * `valid_from`/`valid_to`/`is_current`.
  *
  * Shape: one hash exchange on the dimension key; the change-point
  * lag, the version row_number and the valid_to lead all share that
  * partitioning and sort, and the change-point filter between them
  * preserves the sort order — Spark plans the whole compaction as a
  * single shuffle + one in-partition sort. At 100 TB this is the
  * only shape that works: per-key history is embarrassingly parallel
  * and nothing global is ever ordered.
  *
  * Engine-exactness (SURVEY §6): rows are ordered by
  * `(second-truncated ts, event_id)` — the raw `ts` is ns in DuckDB
  * and µs in Spark, so raw-ts ordering could disagree on sub-µs
  * neighbors; the truncated key is computed identically in both
  * engines and `event_id` makes the order total. Emitted timestamps
  * are second-truncated for the same reason.
  */
object Scd {

  /** A15 — SCD2 compaction of `events` into a value-tier dimension:
    * each user's tier (`low`/`mid`/`high` price band) over time,
    * one row per CHANGE with its validity interval. `valid_to` is
    * NULL on the open (current) version; `version` is 1-based per
    * user. Consecutive-equal tiers collapse into the earlier row —
    * the defining SCD2 compaction step. */
  /** A16 — CDC CHANGELOG APPLY: collapse an ordered upsert/delete
    * changelog into final table state — last writer wins per key, and
    * a key whose LAST operation is a delete vanishes (the MERGE
    * `WHEN MATCHED DELETE` / Debezium-apply semantics that complete
    * A8's insert/update-only upsert).
    *
    * Deliberately an AGGREGATE, not a window: `max_by(payload, seq)`
    * needs one shuffle with map-side partial aggregation and keeps
    * only one candidate row per key per partition in flight — the
    * compaction form that survives a 100 TB changelog, where a
    * per-key window sort would order every version just to discard
    * all but one. `seq` is unique by contract (event ids), so
    * `max_by` is deterministic; the payload value is a picked raw
    * double — element-wise, emitted unrounded (SURVEY §6). */
  def cdcApply(changes: DataFrame): DataFrame =
    changes
      .groupBy("key")
      .agg(
        max_by(col("op"), col("seq")).as("last_op"),
        max_by(col("value"), col("seq")).as("value"),
        count(lit(1)).as("n_changes"),
        max(col("seq")).as("last_seq"))
      .filter(col("last_op") =!= "D")
      .select("key", "value", "n_changes", "last_seq")
      .orderBy("key")

  def scd2History(events: DataFrame): DataFrame = {
    val tiered = events.select(
      col("user_id"),
      col("event_id"),
      date_trunc("second", col("ts")).as("ts_s"),
      when(col("value") < 25.0, "low")
        .when(col("value") < 75.0, "mid")
        .otherwise("high").as("tier"))
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    tiered
      .withColumn("prev_tier", lag(col("tier"), 1).over(w))
      .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col("ts_s"))
      .withColumn("valid_to", lead(col("ts_s"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "version", "tier", "valid_from", "valid_to",
        "is_current")
      .orderBy("user_id", "version")
  }

  /** E13 — BITEMPORAL AS-OF: "as the system KNEW at transaction time
    * Tx, what was each key's attribute at valid time Tv" — the
    * two-axis query that audit, restatement and backtest-honesty all
    * reduce to (a backtest reading TODAY'S corrected history for
    * YESTERDAY'S decision is look-ahead bias; this is the query that
    * cannot commit it). Transaction time is INGESTION order
    * (`event_id`, A4's append-log convention), valid time is the
    * event-time interval A15's compaction derives. Composition, not a
    * new engine: restrict the log to what had been ingested
    * (`event_id ≤ txCutoff` — pushed to the scan), rebuild the SCD2
    * history THE SYSTEM WOULD HAVE BUILT THEN, pick the version whose
    * [valid_from, valid_to) covers Tv. A late-arriving correction
    * ingested after Tx is invisible — re-running with a later cutoff
    * REVISES the answer, which is the semantics (spec'd both ways).
    * Keys whose first known version starts after Tv drop out. Same
    * one-exchange shape as A15. */
  def bitemporalAsOf(events: DataFrame, txCutoffId: Long,
                     validTs: String): DataFrame = {
    val tv = lit(validTs).cast("timestamp")
    scd2History(events.filter(col("event_id") <= txCutoffId))
      .filter(col("valid_from") <= tv &&
        (col("valid_to").isNull || col("valid_to") > tv))
      .orderBy("user_id")
  }

  /** E20 — BITEMPORAL RESTATEMENT DIFF: between two KNOWLEDGE times
    * Tx₁ < Tx₂, which keys' answer to the SAME valid-time question
    * changed — the restatement report every audited warehouse owes
    * its consumers ("what did we tell you then, what do we know now,
    * and where do they differ"), and the operational complement of
    * E13's single read (E13 answers one knowledge time; this diffs
    * two). Verdicts: `unchanged`, `restated` (a late-arriving
    * correction ingested in (Tx₁, Tx₂] revised the covering
    * version), `appeared` (the key's history now reaches back to Tv
    * — late arrivals EXTEND coverage backward). `retracted` is kept
    * for defensive completeness but is impossible on an append-only
    * log (adding events can never move a first version later) — the
    * spec asserts its absence.
    *
    * Shape: two E13 reads (each one user-keyed exchange over the
    * tx-pruned scan — the cutoff predicate pushes down) full-outer
    * joined on the key; the diff frame is |keys|-bounded. */
  def bitemporalRestatement(events: DataFrame, txEarly: Long,
                            txLate: Long, validTs: String): DataFrame = {
    require(txEarly < txLate,
      s"need txEarly < txLate: $txEarly, $txLate")
    val early = bitemporalAsOf(events, txEarly, validTs)
      .select(col("user_id"), col("tier").as("tier_early"))
    val late = bitemporalAsOf(events, txLate, validTs)
      .select(col("user_id"), col("tier").as("tier_late"))
    early.join(late, Seq("user_id"), "full_outer")
      .withColumn("verdict",
        when(col("tier_early").isNull, "appeared")
          .when(col("tier_late").isNull, "retracted")
          .when(col("tier_early") === col("tier_late"), "unchanged")
          .otherwise("restated"))
      .orderBy("user_id")
  }
}
