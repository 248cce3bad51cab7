package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: confirm the F47/F51/F48 top-k rewrite plans via
  * TakeOrderedAndProject with no global-sort WindowExec. */
object TopkAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q_cms_heavy_hitters", "q_pmi_pairs", "q_bpe_pairs")) {
      println(s"===== $q =====")
      val plan = graft.SparkEntry.queries(q)(spark, d)
        .queryExecution.executedPlan.toString
      println("TakeOrderedAndProject: " +
        "TakeOrderedAndProject".r.findAllIn(plan).length)
      plan.linesIterator.filter(_.contains("Window"))
        .foreach(l => println("  " + l.trim.take(140)))
    }
    spark.stop()
  }
}
