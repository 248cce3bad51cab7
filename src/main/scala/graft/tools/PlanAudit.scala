package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: physical-plan audit of selected registry queries —
  * exchange/broadcast counts, pushed filters, scan column pruning.
  * Run: `sbt "runMain graft.tools.PlanAudit"` (sf dir fixed at
  * sf0.01; local only, not part of any gate).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val targets = if (args.nonEmpty) args.toSeq
      else Seq("q_nation_volume", "q_value_share", "q_cms_heavy_hitters",
        "q_trailing_revenue", "q_idle_balance", "q_rolling_corr")
    for (q <- targets) {
      println(s"========== $q ==========")
      val df = graft.SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val nExch = "Exchange hashpartitioning".r.findAllIn(plan).length
      val nBc = "BroadcastExchange".r.findAllIn(plan).length
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).take(3).toList
      println(s"hash exchanges=$nExch broadcasts=$nBc")
      pushed.foreach(p => println("  " + p.take(120)))
      println(plan.linesIterator.filter(l => l.contains("Scan parquet"))
        .map(_.trim.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
