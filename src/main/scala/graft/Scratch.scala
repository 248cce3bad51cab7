package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.TextDedup

/** Temporary perf probe for q_dedup_clusters phases — not part of the
  * library surface; deleted after measurement. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("32")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { trial =>
      println(s"--- trial $trial ---")
      val docs = Tables.documents(spark, d)
      val assignments = TextDedup.minHashBands(docs)
        .filter(col("band_hash").isNotNull)
        .withColumn("bkey", xxhash64(col("band"), col("band_hash")))
      val assign = time("assign-ckpt") {
        assignments.select(col("doc_id"), col("bkey")).localCheckpoint(true)
      }
      var labels = time("labels-init") {
        docs.select(col("doc_id"))
          .withColumn("lbl", col("doc_id")).localCheckpoint(true)
      }
      var converged = false
      var iter = 0
      while (!converged && iter < 20) {
        time(s"round-$iter") {
          val bucketMin = assign.join(labels, "doc_id")
            .groupBy("bkey").agg(min("lbl").as("blbl"))
          val docMin = assign.join(bucketMin, "bkey")
            .groupBy("doc_id").agg(min("blbl").as("nlbl"))
          val viaBucket = labels.join(docMin, Seq("doc_id"), "left")
            .select(col("doc_id"), col("lbl").as("prev_lbl"),
              least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
          val jump = viaBucket.as("x")
            .join(viaBucket.select(col("doc_id").as("j_id"), col("lbl").as("j_lbl")),
              col("x.lbl") === col("j_id"), "left")
            .select(col("x.doc_id").as("doc_id"), col("prev_lbl"),
              least(col("x.lbl"), coalesce(col("j_lbl"), col("x.lbl"))).as("lbl"))
            .localCheckpoint(eager = false)
          converged = jump.filter(col("lbl") =!= col("prev_lbl")).count() == 0L
          labels = jump.select("doc_id", "lbl")
          iter += 1
        }
      }
      time("final-count") {
        labels.select(col("doc_id"), col("lbl").as("cluster"))
          .withColumn("keep", col("doc_id") === col("cluster"))
          .orderBy("doc_id").count()
      }
    }
    spark.stop()
  }
}
