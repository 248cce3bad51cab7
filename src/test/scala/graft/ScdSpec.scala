package graft

import java.sql.Timestamp

import graft.operators.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Double)*) =
    rows.toSeq.map { case (id, u, ts, v) =>
      (id, u, Timestamp.valueOf(ts), "e", v, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")

  test("scd2History: consecutive-equal tiers collapse, intervals chain, " +
      "last version is open") {
    // user 1: low(10) low(20) mid(30) high(90) mid(50)
    //   → versions low[t1,t3) mid[t3,t4) high[t4,t5) mid[t5,∞)
    val out = Scd.scd2History(ev(
      (1L, 1L, "2024-01-01 00:00:01", 10.0),
      (2L, 1L, "2024-01-01 00:00:02", 20.0),
      (3L, 1L, "2024-01-01 00:00:03", 30.0),
      (4L, 1L, "2024-01-01 00:00:04", 90.0),
      (5L, 1L, "2024-01-01 00:00:05", 50.0)))
      .collect()
    assert(out.length == 4)
    val tiers = out.map(_.getAs[String]("tier")).toSeq
    assert(tiers == Seq("low", "mid", "high", "mid"))
    assert(out.map(_.getAs[Int]("version")).toSeq == Seq(1, 2, 3, 4))
    // interval chaining: each valid_to equals the next valid_from
    val froms = out.map(_.getAs[Timestamp]("valid_from"))
    val tos = out.map(_.getAs[Timestamp]("valid_to"))
    assert(tos.init.toSeq == froms.tail.toSeq)
    assert(tos.last == null && out.last.getAs[Boolean]("is_current"))
    assert(out.init.forall(!_.getAs[Boolean]("is_current")))
  }

  test("cdcApply: last writer wins, delete-tailed key vanishes, " +
      "delete-then-reinsert survives") {
    val changes = Seq(
      // key 1: U(v=1) U(v=2) → survives with v=2
      (1L, 1L, "U", 1.0), (2L, 1L, "U", 2.0),
      // key 2: U then D → gone
      (3L, 2L, "U", 5.0), (4L, 2L, "D", 0.0),
      // key 3: D then U (reinsert) → survives with v=7
      (5L, 3L, "D", 0.0), (6L, 3L, "U", 7.0))
      .toDF("seq", "key", "op", "value")
    val out = graft.operators.Scd.cdcApply(changes).collect()
    val byKey = out.map(r => r.getAs[Long]("key") -> r).toMap
    assert(byKey.keySet == Set(1L, 3L))
    assert(byKey(1L).getAs[Double]("value") == 2.0)
    assert(byKey(1L).getAs[Long]("n_changes") == 2L)
    assert(byKey(3L).getAs[Double]("value") == 7.0)
    assert(byKey(3L).getAs[Long]("last_seq") == 6L)
  }

  test("scd2History: single-tier user yields exactly one open version") {
    val out = Scd.scd2History(ev(
      (1L, 7L, "2024-01-01 00:00:01", 80.0),
      (2L, 7L, "2024-01-01 00:00:02", 99.0))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("tier") == "high")
    assert(out.head.getAs[Boolean]("is_current"))
  }

  test("scd2History: same-second events order by event_id") {
    // both events in the same second — event_id breaks the tie, so
    // the tier sequence is low(1) -> high(2), two versions
    val out = Scd.scd2History(ev(
      (2L, 3L, "2024-01-01 00:00:01", 90.0),
      (1L, 3L, "2024-01-01 00:00:01", 10.0))).collect()
    assert(out.map(_.getAs[String]("tier")).toSeq == Seq("low", "high"))
  }

  test("bitemporalAsOf: a late-arriving correction is invisible before " +
      "its ingestion — the same valid-time answer REVISES across tx " +
      "cutoffs") {
    // ingestion order: low@10:00 (id 1), high@12:00 (id 2), then a
    // LATE mid@11:00 (id 3). Asking "tier at 11:30"...
    val events = ev(
      (1L, 1L, "2024-01-01 10:00:00", 10.0),
      (2L, 1L, "2024-01-01 12:00:00", 80.0),
      (3L, 1L, "2024-01-01 11:00:00", 50.0))
    // ...as known after id 2: the 10:00 'low' still covers 11:30
    val before = Scd.bitemporalAsOf(events, 2L, "2024-01-01 11:30:00")
      .collect()
    assert(before.length == 1 && before.head.getAs[String]("tier") == "low")
    // ...as known after id 3: the correction splits the interval
    val after = Scd.bitemporalAsOf(events, 3L, "2024-01-01 11:30:00")
      .collect()
    assert(after.length == 1 && after.head.getAs[String]("tier") == "mid")
    assert(!after.head.getAs[Boolean]("is_current")) // high follows
    // a key whose first KNOWN version starts after Tv drops out
    assert(Scd.bitemporalAsOf(events, 2L, "2024-01-01 09:00:00")
      .collect().isEmpty)
  }

  test("bitemporalRestatement: restated / unchanged / appeared " +
      "verdicts between two knowledge times; retracted never occurs " +
      "on an append-only log") {
    // user 1: 'low' known early; a LATE correction (id 4, ts before
    // Tv) restates the covering version to 'mid'.
    // user 2: fully known early, untouched after → unchanged.
    // user 3: first event ingested after the early cutoff, with a
    // valid time before Tv → appeared.
    val events = ev(
      (1L, 1L, "2024-01-01 10:00:00", 10.0),
      (2L, 2L, "2024-01-01 10:00:00", 80.0),
      (4L, 1L, "2024-01-01 11:00:00", 50.0),
      (5L, 3L, "2024-01-01 10:30:00", 30.0))
    val out = Scd.bitemporalRestatement(events, 3L, 5L,
        "2024-01-01 11:30:00")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)),
          r.getString(3)))).toMap
    assert(out(1L) == ((Some("low"), Some("mid"), "restated")))
    assert(out(2L) == ((Some("high"), Some("high"), "unchanged")))
    assert(out(3L) == ((None, Some("mid"), "appeared")))
    assert(!out.values.exists(_._3 == "retracted"))
  }
}
