package graft.tools

import graft.{GraftSession, SparkEntry}

/** Diagnostic: isolate the CATALYST cost of every registry key —
  * DataFrame construction + analysis + optimization + physical
  * planning (`queryExecution.executedPlan`), with NO execution. The
  * bench's "compile" column bundles this with any jobs a builder runs
  * while constructing the frame; this tool separates the two (keys
  * whose builder runs jobs still pay them here — they are flagged by
  * comparing pass-1 vs pass-2, since builder jobs that are
  * session-memoized vanish on the repeat).
  *
  * Run: `sbt "runMain graft.tools.CompileProf [iters]"`.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  *   GRAFT_STACK_SAMPLE=<thread-substr> for the 10 ms frame histogram.
  */
object CompileProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = args.headOption.map(_.toInt).getOrElse(2)
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000L).write.format("noop").mode("overwrite").save()

    val samplePat = sys.env.get("GRAFT_STACK_SAMPLE")
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = samplePat.map { pat =>
      val t = new Thread(() => {
        while (sampling) {
          Thread.getAllStackTraces.forEach { (th, st) =>
            if (th.getName.toLowerCase.contains(pat.toLowerCase) &&
                st.nonEmpty) {
              val key = st.take(6).map(f =>
                s"${f.getClassName.split('.').last}.${f.getMethodName}")
                .mkString(" < ")
              hist.merge(key, 1, (a, b) => a + b)
            }
          }
          Thread.sleep(10)
        }
      })
      t.setDaemon(true); t.start(); t
    }

    val keys = SparkEntry.queries.keys.toSeq.sorted
    val times = Array.fill(iters)(0.0)
    val perKey = scala.collection.mutable.Map[String, Array[Double]]()
    for (it <- 0 until iters) {
      for (k <- keys) {
        val t0 = System.nanoTime()
        try {
          val df = SparkEntry.queries(k)(spark, sfDir)
          df.queryExecution.executedPlan
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[compileprof] $k FAILED: $e")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        times(it) += dt
        perKey.getOrElseUpdate(k, Array.fill(iters)(0.0))(it) = dt
      }
      println(f"[compileprof] pass $it total ${times(it)}%.1f s")
    }
    // slowest keys by last pass (memoized builder jobs amortized out)
    val last = perKey.toSeq.sortBy(-_._2.last)
    println("[compileprof] slowest 30 (last pass / first pass):")
    last.take(30).foreach { case (k, a) =>
      println(f"[compileprof]   $k%-28s ${a.last}%6.3f / ${a.head}%6.3f")
    }
    println(f"[compileprof] sum over keys, last pass: ${
      last.map(_._2.last).sum}%.1f s, first pass: ${last.map(_._2.head).sum}%.1f s")
    sampling = false
    sampler.foreach(_.join(500))
    if (samplePat.nonEmpty) {
      import scala.jdk.CollectionConverters._
      println("[compileprof] top frames:")
      hist.asScala.toSeq.sortBy(-_._2).take(40).foreach { case (k, n) =>
        println(f"[compileprof] $n%6d  $k")
      }
    }
    spark.stop()
  }
}
