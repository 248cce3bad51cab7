package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry}
import graft.operators.Vectors
import graft.sources.Tables

/** Round-8 diagnosis main for `q_ann_ivf`'s exec cost (the r5/r6
  * verdicts' open question: exec ~2.7 s at sf0.1 was the largest
  * steady exec after decontaminate — is the per-centroid literal
  * VecDot column re-JITed per run, and is the broadcast probe side
  * re-evaluated?).
  *
  * Stages timed separately, each twice (cold then warm), so the
  * cold-JIT share is observable directly:
  *   A. centroid collect (DataFrame-build time — bench charges this
  *      to "compile")
  *   B. cell assignment alone (the dots array over ALL rows)
  *   C. full ivfKnn through the noop sink (what Bench times)
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.IvfDiag"
  *
  * FINDINGS (sf0.1 = 2,000 embeddings x dim 64, local[32], 2026-08-12,
  * uncontended):
  *   A1/A2 centroid collect     0.91 / 0.23 s   (cold / warm)
  *   B1/B2 cell assignment      0.29 / 0.11 s   (cold / warm same DF)
  *   B3 REBUILT fresh literals  0.13 s          (~= B2!)
  *   C1 full query cold         1.89 s
  *   C2/C3 prebuilt DF exec     0.48 / 0.42 s
  *   C4 rebuilt, as Bench sees  0.68 s
  * The data work is microscopic (2,000 rows x 8 centroid dots). Two
  * hypotheses from the r5 verdict are REFUTED by B3 ~= B2: the
  * typedlit centroid literals do NOT force a fresh janino compile per
  * rebuilt plan (generated code references literal arrays as object
  * refs, so the codegen cache hits), and the broadcast probe side is
  * built exactly once per run from a 10-row filter — no redundant
  * re-evaluation. The steady ~0.7 s Bench sees decomposes as ~0.25 s
  * Catalyst build/analyze/optimize of the multi-stage plan (C4 - C3)
  * + ~0.4 s fixed job machinery: centroid-collect job, broadcast
  * build, join stage, window/sort stages, each paying scheduler +
  * 32-task overhead on ~64 KB of data. The historical 2.7 s driver
  * reading = this floor under machine contention + cold JVM. Cost is
  * INHERENT to benching a tiny SF: at real scale the fixed ~0.7 s
  * amortizes over billions of rows and the per-row work (8 native
  * dots + 1 equality-join probe per vector) is the designed IVF
  * shape. No code change warranted — same verdict class as
  * q_dedup_clusters' compile-dominated profile.
  */
object IvfDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus)
    spark.range(1000L).write.format("noop").mode("overwrite").save()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivf-diag] $label%-38s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    println(s"[ivf-diag] rows=${emb.count()} sf=$sfDir")

    // A. centroid collect (what ivfKnn does at build time)
    (1 to 2).foreach { i =>
      time(s"A$i centroid collect (8)") {
        emb.filter(col("vec_id") < 8).orderBy("vec_id")
          .select("embedding").collect()
      }
    }

    // B. cell assignment alone — the full-table dots array
    graft.functions.VecDot.register(spark)
    val cents = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0))
    def cellDf() = {
      val dots = array(cents.map(c =>
        call_function("graft_vecdot", col("embedding"), typedlit(c))): _*)
      emb.withColumn("_dots", dots)
        .withColumn("cell",
          (array_position(col("_dots"), array_max(col("_dots"))) - 1)
            .cast("int"))
        .drop("_dots")
    }
    val cellOnce = cellDf()
    time("B1 cell assignment cold")(
      cellOnce.write.format("noop").mode("overwrite").save())
    time("B2 same DF warm")(
      cellOnce.write.format("noop").mode("overwrite").save())
    time("B3 REBUILT DF (fresh literals)")(
      cellDf().write.format("noop").mode("overwrite").save())

    // C. full query, as Bench runs it
    time("C1 full ivfKnn cold (build+exec)") {
      SparkEntry.queries("q_ann_ivf")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    val built = SparkEntry.queries("q_ann_ivf")(spark, sfDir)
    time("C2 prebuilt DF exec")(
      built.write.format("noop").mode("overwrite").save())
    time("C3 same DF re-exec (warm codegen)")(
      built.write.format("noop").mode("overwrite").save())
    time("C4 rebuilt, as Bench sees it") {
      SparkEntry.queries("q_ann_ivf")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
