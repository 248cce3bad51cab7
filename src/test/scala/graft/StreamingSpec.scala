package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streaming
import graft.streaming.Streaming.Tick

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("downsample1s emits first bid per (symbol, second) inside session windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Tick]
    val q = Streaming.downsample1s(in.toDF())
      .writeStream.format("memory").queryName("ds1s")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData(
        Tick(1L, 1L, t("2024-01-01 07:55:01.100"), 10.0),
        Tick(2L, 1L, t("2024-01-01 07:55:01.900"), 99.0), // same second -> dropped
        Tick(3L, 1L, t("2024-01-01 09:00:00.000"), 50.0), // outside window
        Tick(5L, 2L, t("2024-01-01 13:55:00.000"), 77.0), // same ts as tick 4...
        Tick(4L, 2L, t("2024-01-01 13:55:00.000"), 20.0)) // ...lower id wins
      q.processAllAvailable()
      // batch-parity tie rule: lowest tick_id represents the second,
      // even for identical timestamps (tick 4 beats tick 5)
      val out = spark.sql("SELECT symbol, tick_id, bid, n_ticks FROM ds1s")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(out == Set((1L, 1L, 10.0, 2L), (2L, 4L, 20.0, 2L)))
    } finally q.stop()
  }

  test("stream-stream intervalJoin pairs trades with in-window quotes only") {
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[Tick]
    val quotes = MemoryStream[Tick]
    val q = Streaming.intervalJoin(trades.toDF(), quotes.toDF(), "1 minute")
      .writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append).start()
    try {
      quotes.addData(
        Tick(101L, 1L, t("2024-01-01 07:54:30"), 1.1), // in window
        Tick(102L, 1L, t("2024-01-01 07:53:00"), 1.0), // too old (>1m before)
        Tick(103L, 2L, t("2024-01-01 07:54:40"), 2.2), // other symbol
        Tick(104L, 1L, t("2024-01-01 07:55:30"), 1.2)) // after the trade
      trades.addData(Tick(1L, 1L, t("2024-01-01 07:55:00"), 10.0))
      q.processAllAvailable()
      val out = spark.sql("SELECT trade_id, quote_bid FROM ij")
        .as[(Long, Double)].collect().toSet
      assert(out == Set((1L, 1.1)))
    } finally q.stop()
  }

  test("anomalyFlags keeps per-symbol state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Tick]
    val q = Streaming.anomalyFlags(in.toDS(), 3.0)
      .writeStream.format("memory").queryName("flags")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((1 to 10).map(i =>
        Tick(i.toLong, 1L, t(f"2024-01-01 07:55:$i%02d"), 100.0 + (i % 3))): _*)
      q.processAllAvailable()
      in.addData(Tick(11L, 1L, t("2024-01-01 07:56:00"), 500.0)) // wild outlier
      q.processAllAvailable()
      val flagged = spark.sql("SELECT * FROM flags WHERE isAnomaly").count()
      assert(flagged == 1L)
      // state persisted: count reached 11 across two batches
      val maxN = spark.sql("SELECT max(n) FROM flags").as[Long].collect().head
      assert(maxN == 11L)
    } finally q.stop()
  }
}
