package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** JVM-wide cache of expensive session-scoped artifacts (pinned
  * checkpoint frames and frame bundles shared ACROSS registry keys —
  * the F71/F74 candidate-pair census, the D66 slot chain's 11+
  * trading-layer consumers).
  *
  * Concurrency contract (r13 advice): the builder runs OUTSIDE the
  * ConcurrentHashMap bin lock — `computeIfAbsent` only installs a
  * cheap lazy holder, and the Spark jobs fire when the holder is
  * forced. Two threads racing the SAME key serialize on the holder
  * (one build, the loser reads the result); threads on DIFFERENT
  * keys — even hash-colliding ones — never block each other, and a
  * builder that itself consults the cache under another key cannot
  * deadlock.
  *
  * Lifecycle: entries of a stopped SparkSession are purged both
  * eagerly (a SparkListener registered per application fires on
  * context stop, which also releases the entry's [[CkptGc]] pins)
  * and lazily (a sweep at each access, covering listeners Spark
  * dropped during shutdown). A stopped session's localCheckpoint
  * blocks are unrecoverable, so a retained entry would leak the dead
  * session AND serve a frame that fails on next use.
  */
object SessionFrameCache {
  /** Lazy holder that DROPS its builder closure once forced: the
    * thunk captures the call site's scope (input DataFrames with full
    * logical plans, snapshot sets), which must not stay reachable
    * from this JVM-global map for the session lifetime (r14 review). */
  private final class Memo[T](@volatile private var build: () => T) {
    lazy val value: T = {
      val v = build()
      build = null
      v
    }
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Memo[AnyRef]]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Serve `key`'s artifact for this session, building it at most
    * once per (session, key). The artifact should pin any checkpoint
    * frames it carries via [[CkptGc.pinNewSince]]; pins are released
    * automatically when the session's context stops. */
  def getOrBuild[T <: AnyRef](ss: SparkSession, key: String)
                             (build: => T): T = {
    purgeStopped()
    hookPurge(ss)
    val memo = cache.computeIfAbsent((ss, key),
      _ => new Memo[AnyRef](() => build))
    memo.value.asInstanceOf[T]
  }

  private def purgeStopped(): Unit = {
    val it = cache.keySet.iterator()
    while (it.hasNext) {
      val sc = it.next()._1.sparkContext
      if (sc.isStopped) {
        // Mirror the application-end listener: a stopped session's
        // checkpoint pins must not outlive its cache entries (the
        // listener may never fire if Spark drops it at shutdown).
        try CkptGc.unpinApp(sc.applicationId)
        catch { case scala.util.control.NonFatal(_) => }
        it.remove()
      }
    }
  }

  private def hookPurge(ss: SparkSession): Unit = {
    val sc = ss.sparkContext
    val appId = sc.applicationId
    if (hooked.add(appId)) {
      try sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            e: SparkListenerApplicationEnd): Unit = {
          val it = cache.keySet.iterator()
          while (it.hasNext)
            if (it.next()._1.sparkContext.applicationId == appId)
              it.remove()
          CkptGc.unpinApp(appId)
          hooked.remove(appId)
        }
      }) catch {
        case scala.util.control.NonFatal(_) => hooked.remove(appId)
      }
    }
  }
}
