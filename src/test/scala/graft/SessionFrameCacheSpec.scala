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
