package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** SURVEY §5 "co-locate joins via bucketing" made verifiable: two
  * tables bucketed on the join key join WITHOUT a shuffle exchange,
  * while the same join on plain parquet shuffles both sides. At 100 TB
  * this is the difference between an idempotent scan-side merge and
  * re-shuffling the fact table on every join.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE final plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case _: ShuffleExchangeExec => 1 }.sum
  }

  test("bucketed tables join without a shuffle; plain parquet shuffles") {
    // default warehouse (cwd/spark-warehouse); tables dropped in finally
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    // plain (non-AQE) physical plans so ShuffleExchangeExec nodes are
    // directly visible to collect (AQE hides them inside query stages)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ticks = (1 to 1000).map(i => (i.toLong % 50, i.toLong, i * 1.0))
        .toDF("symbol", "tick_id", "bid")
      val stats = (0L until 50L).map(s => (s, s * 10.0)).toDF("symbol", "ref_price")

      graft.operators.Layout.bucketedWrite(ticks, "t_bucketed", "symbol", 8)
      graft.operators.Layout.bucketedWrite(stats, "s_bucketed", "symbol", 8)

      val bucketed = spark.table("t_bucketed")
        .join(spark.table("s_bucketed"), "symbol")
        .agg(sum(col("bid") * col("ref_price")).as("x"))
      val plain = ticks.join(stats, "symbol")
        .agg(sum(col("bid") * col("ref_price")).as("x"))

      val bucketedShuffles = countShuffles(bucketed)
      val plainShuffles = countShuffles(plain)
      // the join itself is shuffle-free on bucketed tables (only the
      // single-row final agg exchanges); plain join shuffles both sides
      assert(bucketedShuffles < plainShuffles,
        s"bucketed=$bucketedShuffles plain=$plainShuffles")
      // and results agree
      assert(bucketed.collect().head.getDouble(0) ==
        plain.collect().head.getDouble(0))
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_bucketed")
      spark.sql("DROP TABLE IF EXISTS s_bucketed")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("H12: a per-key WINDOW over a bucketed table needs NO " +
      "exchange — the bucket spec satisfies the window's required " +
      "distribution; plain parquet shuffles first") {
    // The D-block's whole window family (lags, running sums, ewma,
    // drawdown) requires ClusteredDistribution(symbol); a table
    // persisted bucketBy(symbol) already IS hash-partitioned on it,
    // so every later window pass skips the exchange entirely and
    // pays only the in-partition sort — at 100 TB the difference
    // between re-shuffling the tape per feature job and scanning it.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ticks = (1 to 1000).map(i => (i.toLong % 50, i.toLong, i * 1.0))
        .toDF("symbol", "tick_id", "bid")
      graft.operators.Layout.bucketedWrite(ticks, "t_bkt_w", "symbol", 8)
      def lagged(df: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("symbol").orderBy("tick_id")
        df.withColumn("prev", lag(col("bid"), 1).over(w))
          .filter(col("prev").isNotNull)
          .agg(sum(col("bid") - col("prev")).as("x"))
      }
      val onBucketed = lagged(spark.table("t_bkt_w"))
      val onPlain = lagged(ticks)
      val b = countShuffles(onBucketed)
      val p = countShuffles(onPlain)
      // bucketed: only the one-row final agg exchanges; plain adds
      // the window's hash exchange
      assert(b < p, s"bucketed=$b plain=$p")
      assert(onBucketed.collect().head.getDouble(0) ==
        onPlain.collect().head.getDouble(0))
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_bkt_w")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
