package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe tool: times the exact (D60) vs blocked (D65)
  * cointegration screens on an R×-symbol replica of the tick view
  * (each replica shifts user ids and perturbs prices by a
  * deterministic per-replica offset so closes differ across copies).
  *
  * `sbt "runMain graft.Probe <sfDir> <replicas>"` — prints one line
  * per screen with wall seconds and output rows. Used for the SURVEY
  * §7 scale points (quadratic-in-symbols vs banded-candidate growth).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val replicas = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val base = sources.Tables.ticks(spark, sfDir)
    val r = base.crossJoin(
        spark.range(replicas).toDF("rep"))
      .withColumn("symbol", col("symbol") + col("rep") * lit(1000000L))
      .withColumn("bid", col("bid") + col("rep").cast("double") * 0.37)
      .drop("rep")
      .localCheckpoint(true)
    println(s"replicated ticks: ${r.count()} rows, " +
      s"${r.select("symbol").distinct().count()} symbols")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s  $n%9d rows")
    }
    time("blocked (D65)") {
      operators.Microstructure.cointegrationScreenBlocked(r).count()
    }
    time("exact (D60)") {
      operators.Microstructure.cointegrationScreen(r).count()
    }
    spark.stop()
  }
}
