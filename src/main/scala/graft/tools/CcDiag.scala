package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry}
import graft.operators.TextDedup
import graft.sources.Tables

/** Round-8 instrumentation for q_dedup_clusters' compile-dominated
  * profile (bench "compile" = the whole iterative CC loop, since the
  * rounds run while the DataFrame is being BUILT; exec is only the
  * final labeled dump). Prints the converged round count and the
  * wall time of each full query run, cold and warm, so the per-round
  * overhead (Catalyst re-analysis + one fused count job per round)
  * is attributable before attempting any shave.
  */
object CcDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    spark.range(1000L).write.format("noop").mode("overwrite").save()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc-diag] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    // Shared with q_dedup_clusters' registration — the diagnostic must
    // measure the exact pipeline the registry serves.
    val assignments = TextDedup.minhashBucketAssignments(docs)

    (1 to 3).foreach { i =>
      val (df, rounds) = time(s"run $i: build (all CC rounds)") {
        TextDedup.dedupClustersFromBucketsWithRounds(docs, assignments)
      }
      println(s"[cc-diag]   converged after $rounds rounds")
      time(s"run $i: exec (noop dump)") {
        df.write.format("noop").mode("overwrite").save()
      }
    }
    time("full query via SparkEntry") {
      SparkEntry.queries("q_dedup_clusters")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
