package graft

import java.sql.Timestamp
import graft.operators.RunTracker

/** Hand-derived lineage for the A25 run registry. */
class RunTrackerSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private def ticks(rows: (Long, Long, String, Double, Double)*) =
    rows.toSeq.map { case (id, sym, ts, b, a) => (id, sym, t(ts), b, a) }
      .toDF("tick_id", "symbol", "ts", "bid", "ask")

  test("runLog slices phases with the 60/20/20 arithmetic and prices " +
      "the val loss ppm-exact; bestRunsAsOf links the parent train " +
      "run's params and artifact, and the cutoff excludes later runs") {
    // symbol 5, 10 ticks/day: train = ranks 1-6, val = 7-8, test = 9-10.
    // Day 0 (01-10) val |dcents| = 500 -> loss 500e6 ppm;
    // day 1 (01-11) val |dcents| = 100 -> loss 100e6 ppm (the best);
    // day 15 (01-25) sits past the 01-20 cutoff and must not count.
    def day(d: String, di: Long, valJump: Double) =
      (1 to 10).map { i =>
        val bid = if (i == 8) 100.0 + valJump else 100.0
        (di * 100 + i, 5L, s"$d 10:00:${"%02d".format(i)}", bid, 9.9)
      }
    val rows = day("2024-01-10", 0, 5.0) ++ day("2024-01-11", 1, 1.0) ++
      day("2024-01-25", 15, 0.1)
    val log = RunTracker.runLog(ticks(rows: _*)).collect()
      .map(r => ((r.getAs[Long]("run_id")),
        (r.getAs[String]("phase"), r.getAs[Any]("loss_ppm"),
          r.getAs[String]("artifact_path")))).toMap
    assert(log.size == 9) // 3 days x 3 phases
    // day-0 val run: id 5*10^7 + 0*3 + 1; loss (500 * 1e6) / 1
    assert(log(50000001L) == (("val", 500000000L, null)))
    assert(log(50000004L) == (("val", 100000000L, null)))
    // train runs carry the artifact; val runs do not
    assert(log(50000000L)._3 == "models/5/d0.pt")
    val best = RunTracker.bestRunsAsOf(ticks(rows: _*), "2024-01-20")
      .collect()
    assert(best.length == 1)
    val r = best.head
    assert(r.getAs[Long]("n_runs") == 6L) // day 15 excluded
    assert(r.getAs[Long]("best_run_id") == 50000004L)
    assert(r.getAs[Long]("best_val_loss_ppm") == 100000000L)
    // parent train run d1: lr = 1000000 div 11, artifact models/5/d1.pt
    assert(r.getAs[Long]("lr_ppm") == 90909L)
    assert(r.getAs[String]("artifact_path") == "models/5/d1.pt")
  }

  test("pipelineStatus: metric phases carry the slice ts bounds and " +
      "ok/error from metric existence; the live row errors exactly " +
      "on a deployed-threshold breach day; 1-tick days emit only a " +
      "test-phase error row and no live row off-session") {
    val k = 4
    // 10 session days (morning windows, 4 ticks each at 07:51:0i);
    // day 10 spikes -> its window error dominates and breaches the
    // p99 test threshold (test windows = days 9-10)
    val sess = (1 to 10).flatMap { d =>
      (0 to 3).map { i =>
        val bid = if (d == 10 && i == 1) 5.00 else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid, 9.9)
      }
    }
    // a 1-tick midday day for symbol 2: n=1 -> the single tick lands
    // in the test slice (train/val floor to zero rows), no diff ->
    // error; no session ticks -> no live row
    val lone = Seq((999L, 2L, "2024-01-05 11:00:00", 3.00, 9.9))
    val out = RunTracker.pipelineStatus(ticks(sess ++ lone: _*), k)
      .collect()
      .map(r => (r.getAs[Long]("symbol"), r.getAs[String]("day"),
        r.getAs[String]("phase")) ->
        ((r.getAs[Timestamp]("started"), r.getAs[Timestamp]("finished"),
          r.getAs[Long]("n_ticks"), r.getAs[String]("status"))))
      .toMap
    // symbol 1, each day: train ranks 1-2, val floors to zero rows,
    // test ranks 3-4 -> 2 rows per day + 1 live row
    assert(out.size == 10 * 3 + 1)
    val d1train = out((1L, "2024-01-01", "train"))
    assert(d1train == ((t("2024-01-01 07:51:00"),
      t("2024-01-01 07:51:01"), 2L, "ok")))
    val d1test = out((1L, "2024-01-01", "test"))
    assert(d1test == ((t("2024-01-01 07:51:02"),
      t("2024-01-01 07:51:03"), 2L, "ok")))
    assert(!out.contains((1L, "2024-01-01", "val")))
    // live: only the spike day errors; its bounds span the session
    (1 to 9).foreach { d =>
      assert(out((1L, f"2024-01-$d%02d", "live"))._4 == "ok",
        s"day $d live should be ok")
    }
    assert(out((1L, "2024-01-10", "live")) ==
      ((t("2024-01-10 07:51:00"), t("2024-01-10 07:51:03"), 4L,
        "error")))
    // symbol 2's lone tick: one test-phase error row, nothing else
    assert(out((2L, "2024-01-05", "test")) ==
      ((t("2024-01-05 11:00:00"), t("2024-01-05 11:00:00"), 1L,
        "error")))
    assert(!out.keys.exists(key => key._1 == 2L && key._3 == "live"))
  }

  test("stageLineage: identical runs cache everywhere; a TRAIN params " +
      "edit invalidates exactly its downstream cone (train, evaluate) " +
      "and nothing upstream; an as-of data diff reproduces every " +
      "data-dependent stage while the params-only schema stage caches") {
    val k = 4
    val rows = (1 to 6).flatMap { d =>
      (0 to 3).map(i =>
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i",
          1.00 + i * 0.01 + d * 0.002, 9.9))
    }
    val df = ticks(rows: _*)
    val base = Map("schema" -> 1L, "ingest" -> 2L, "clean" -> 3L,
      "features" -> 4L, "train" -> 5L, "evaluate" -> 6L)
    def verdicts(cutoff: String, prior: Map[String, Long],
                 cur: Map[String, Long]): Map[String, String] =
      RunTracker.stageLineage(df, k, cutoff, prior, cur).collect()
        .map(r => r.getAs[String]("stage") ->
          r.getAs[String]("verdict")).toMap
    // same data (cutoff past the tape), same params -> all cache
    val allCache = verdicts("2024-12-31", base, base)
    assert(allCache.values.forall(_ == "cache"), s"$allCache")
    // train param edited -> ONLY train + evaluate reproduce
    val coneV = verdicts("2024-12-31", base, base + ("train" -> 50L))
    assert(coneV == Map("schema" -> "cache", "ingest" -> "cache",
      "clean" -> "cache", "features" -> "cache",
      "train" -> "reproduce", "evaluate" -> "reproduce"), s"$coneV")
    // data grew past the prior cutoff -> every data stage reproduces,
    // the params-only schema stage still caches
    val dataV = verdicts("2024-01-03", base, base)
    assert(dataV == Map("schema" -> "cache", "ingest" -> "reproduce",
      "clean" -> "reproduce", "features" -> "reproduce",
      "train" -> "reproduce", "evaluate" -> "reproduce"), s"$dataV")
  }
}
