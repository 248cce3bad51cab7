package graft

import org.apache.spark.sql.functions._
import graft.operators.Lakehouse

/** Snapshot rollback semantics (ref: `Apache Iceberg/
  * iceberg_time_travel.py:209-225` — rollback_to_snapshot WRITES a new
  * snapshot; history survives).
  */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  // 10 snapshots of 1000 rows each (ids 0..9999).
  private def log = spark.range(10000L).select(
    $"id".as("event_id"),
    ($"id" % 7).cast("double").as("value"))

  test("rollbackTo restores the data state at the target snapshot") {
    val live = Lakehouse.rollbackTo(log, "event_id", 1000L, 3L)
    assert(live.count() == 4000L)
    assert(live.agg(max("event_id")).as[Long].head() == 3999L)
    // Rollback is a pure metadata filter: re-reading the full log is
    // unaffected (history is never erased).
    assert(log.count() == 10000L)
  }

  test("expireSnapshots flags everything older than the retained tail, " +
      "never touches added/total, and keeps the head travelable") {
    val rep = Lakehouse.expireSnapshots(log, "event_id", 1000L, 3)
      .as[(Long, Long, Long, Boolean, Boolean)].collect()
    assert(rep.map(_._1).toSeq == (0L to 9L))
    // history numbers identical to the un-expired log
    assert(rep.map(r => (r._2, r._3)).toSeq ==
      (1L to 10L).map(i => (1000L, i * 1000L)))
    // snapshots 0..6 expired, 7..9 retained (retain_last = 3)
    assert(rep.map(_._4).toSeq == (0L to 9L).map(_ <= 6L))
    assert(rep.forall(r => r._5 == !r._4))
  }

  test("rollbackHistory keeps every append and adds a head rollback " +
      "entry with the target's total") {
    val h = Lakehouse.rollbackHistory(log, "event_id", 1000L, 3L)
      .as[(Long, Long, Long, String)].collect()
    assert(h.length == 11)
    // Appends 0..9 intact, in order, totals running.
    val appends = h.filter(_._4 == "append")
    assert(appends.map(_._1).toSeq == (0L to 9L))
    assert(appends.map(_._3).toSeq == (1L to 10L).map(_ * 1000L))
    // Head entry: fresh id, zero added, total == snapshot 3's total.
    val head = h.last
    assert(head == ((10L, 0L, 4000L, "rollback")))
    // The rolled-back state and the as-of read agree (rollback points
    // HEAD at the target snapshot's files).
    assert(Lakehouse.rollbackTo(log, "event_id", 1000L, 3L).count() ==
      head._3)
  }

  test("wapPublish: a red audit leaves the published table untouched " +
      "and ships the report; a green audit appends the batch") {
    import org.apache.spark.sql.functions.col
    val current = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val badBatch = Seq((3L, -5.0), (4L, 40.0)).toDF("id", "v")
    val goodBatch = Seq((5L, 50.0), (6L, 60.0)).toDF("id", "v")
    val constraints = Seq(
      "v_nonnegative" -> (col("v") < 0.0),      // violation predicate
      "id_present" -> col("id").isNull)
    val (redReport, afterRed) =
      Lakehouse.wapPublish(current, badBatch, constraints)
    val red = redReport.collect()
    assert(red.forall(!_.getAs[Boolean]("published")))
    assert(red.find(_.getAs[String]("constraint_name") == "v_nonnegative")
      .get.getAs[Long]("n_violations") == 1L)
    assert(afterRed.collect().toSet == current.collect().toSet)
    val (greenReport, afterGreen) =
      Lakehouse.wapPublish(current, goodBatch, constraints)
    assert(greenReport.collect().forall(_.getAs[Boolean]("published")))
    assert(afterGreen.count() == 4L)
    assert(afterGreen.filter(col("id") === 5L).count() == 1L)
  }
}
