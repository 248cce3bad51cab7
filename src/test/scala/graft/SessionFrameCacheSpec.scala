package graft

/** Contract tests for the cross-query session cache that backs the
  * F71/F74 pair census and the D66 slot chain. */
class SessionFrameCacheSpec extends SparkSpec {

  test("getOrBuild builds once per (session, key), serves the cached " +
      "value after, and distinct keys build independently") {
    var builds = 0
    def build(tag: String): String = { builds += 1; s"artifact-$tag" }
    val a1 = SessionFrameCache.getOrBuild(spark, "sfc-spec-a") {
      build("a")
    }
    val a2 = SessionFrameCache.getOrBuild(spark, "sfc-spec-a") {
      build("a-second-builder-must-not-run")
    }
    val b = SessionFrameCache.getOrBuild(spark, "sfc-spec-b") {
      build("b")
    }
    assert(a1 == "artifact-a" && a2 == "artifact-a")
    assert(b == "artifact-b")
    assert(builds == 2, s"expected 2 builds (a, b), got $builds")
  }

  test("concurrent callers of the SAME key serialize on one build; " +
      "callers of DIFFERENT keys run their builders without blocking " +
      "each other (the r13 bin-lock advice)") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    // builder for key-slow blocks until key-fast's builder has run —
    // under the old computeIfAbsent-held-bin-lock spelling this could
    // deadlock when the keys collide in the map; here it must pass
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val slow = scala.concurrent.Future {
        SessionFrameCache.getOrBuild(spark, "sfc-spec-slow") {
          assert(gate.await(20, java.util.concurrent.TimeUnit.SECONDS),
            "fast key's build never completed while slow held its memo")
          builds.incrementAndGet(); "slow"
        }
      }
      val fasts = (1 to 3).map { _ =>
        scala.concurrent.Future {
          SessionFrameCache.getOrBuild(spark, "sfc-spec-fast") {
            builds.incrementAndGet(); "fast"
          }
        }
      }
      fasts.foreach { f =>
        assert(scala.concurrent.Await.result(f,
          scala.concurrent.duration.Duration(20, "s")) == "fast")
      }
      gate.countDown()
      assert(scala.concurrent.Await.result(slow,
        scala.concurrent.duration.Duration(20, "s")) == "slow")
      // one build for fast (three racers serialized on the memo),
      // one for slow
      assert(builds.get() == 2, s"expected 2 builds, got ${builds.get()}")
    } finally pool.shutdown()
  }

  test("the D84/D85 fit is session-shared: gdValCurve after " +
      "gdAutoencoder with the same cacheKey fires strictly fewer " +
      "Spark jobs than an uncached fit — the training loop runs once") {
    import graft.operators.Features
    val rows = (1 to 10).flatMap { d =>
      (0 to 3).map { i =>
        val bid = if (d == 10 && i == 1) 5.00 else 1.00 + i * 0.01
        (d * 10L + i, 1L, f"2024-01-$d%02d 07:51:0$i", bid, 9.9)
      }
    }
    import spark.implicits._
    val ticks = rows.map { case (id, sym, ts, b, a) =>
      (id, sym, java.sql.Timestamp.valueOf(ts), b, a)
    }.toDF("tick_id", "symbol", "ts", "bid", "ask")
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    def countJobs(body: => Unit): Int = {
      counter.set(0)
      body
      // the listener bus is async — poll until the count is STABLE
      // (no new events for 500 ms, 20 s cap) instead of a fixed
      // sleep, which both wastes time and flakes under load
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      var last = -1
      while (last != counter.get() && System.nanoTime() < deadline) {
        last = counter.get()
        Thread.sleep(500)
      }
      counter.get()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // uncached: the val-curve call runs the full training loop
      val uncached = countJobs {
        Features.gdValCurve(ticks, 4, cacheKey = None).collect(); ()
      }
      // shared: train once under the key, then the curve reuses it
      Features.gdAutoencoder(ticks, 4,
        cacheKey = Some("gdfit-share-spec")).collect()
      val shared = countJobs {
        Features.gdValCurve(ticks, 4,
          cacheKey = Some("gdfit-share-spec")).collect(); ()
      }
      // an uncached 4-epoch fit fires >= 6 jobs (roster + 4 epoch
      // aggregates + final scoring/losses); the shared path only
      // materializes the tiny driver-row frame
      assert(uncached >= 6, s"uncached fit fired only $uncached jobs")
      assert(shared < uncached - 3,
        s"shared path fired $shared of $uncached jobs — fit not reused")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("CkptGc pins of a foreign (stopped) application are pruned by " +
      "sweep, and sweep never unpersists pinned frames of the live one") {
    import org.apache.spark.sql.functions._
    val before = CkptGc.snapshot(spark)
    val pinned = spark.range(100).select(col("id")).localCheckpoint(true)
    CkptGc.pinNewSince(spark, before)
    val mid = CkptGc.snapshot(spark)
    val victim = spark.range(50).select(col("id")).localCheckpoint(true)
    victim.count()
    CkptGc.sweep(spark, before) // sweeps victim, keeps pinned
    assert(pinned.count() == 100, "pinned checkpoint was swept")
    val after = CkptGc.snapshot(spark)
    assert(mid.diff(before).subsetOf(after),
      "pinned RDD ids missing after sweep")
    assert(!victim.queryExecution.toRdd.partitions.isEmpty)
  }
}
