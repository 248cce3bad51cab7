package graft

import org.apache.spark.sql.functions._
import graft.operators.CatalogAudits
import graft.sources.Tables
import graft.streaming.StreamRegistry

/** The r15 driver-checkable audit keys: side-effectful A-section ops
  * (CatalogAudits) and the streaming drive protocol (StreamRegistry),
  * each cross-checked against a direct Spark derivation on the
  * smallest real corpus — the same equalities the DuckDB oracle
  * hashes at 3 SFs, proven here inside one engine so a failure
  * localizes to the audit machinery rather than cross-engine
  * spelling. */
class CatalogAuditsSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private val P = graft.functions.PortableText.P

  test("ingestRoundTrip: CSV write→read round-trips every symbol's " +
      "count, exact cents sums and ms-timestamp hash") {
    val audit = CatalogAudits.ingestRoundTrip(spark, d)
    val direct = Tables.ticks(spark, d)
      .filter(pmod(col("symbol"), lit(16L)) === 0)
      .groupBy(concat(lit("symbol="), col("symbol").cast("string"))
        .as("symbol"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(bid * 100.0, 0) AS BIGINT)"))
          .as("bid_cents"),
        sum(expr("CAST(round(ask * 10000.0, 0) AS BIGINT)"))
          .as("ask_e4"),
        sum(pmod(unix_millis(col("ts")), lit(P))).as("ts_fp"))
      .orderBy("symbol")
    assert(audit.collect().toSeq == direct.collect().toSeq)
  }

  test("compactionAudit: 3+3 appended files compact to exactly one " +
      "per year with rows and content fingerprint unchanged") {
    val rows = CatalogAudits.compactionAudit(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files_before") == 6L)
      assert(r.getAs[Long]("n_files_planned") == 1L)
      assert(r.getAs[Long]("n_files_after") == 1L)
    }
    val direct = Tables.events(spark, d)
      .groupBy(year(col("ts")).as("year"))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(pmod(col("event_id") * 31 +
          expr("CAST(round(value * 100.0, 0) AS BIGINT)"), lit(P))),
          lit(P)).as("fp"))
      .orderBy("year").collect()
    assert(rows.map(r => (r.getAs[Int]("year"), r.getAs[Long]("n_rows"),
      r.getAs[Long]("fp"))).toSeq ==
      direct.map(r => (r.getAs[Int]("year"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("fp"))).toSeq)
  }

  test("evolutionAudit: pre-evolution generations surface all-NULL " +
      "late columns; natural nulls ride through") {
    val rows = CatalogAudits.evolutionAudit(spark, d).collect()
      .map(r => r.getAs[Int]("gen") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_null_props"),
          r.getAs[Long]("n_null_event_type")))).toMap
    assert(rows.keySet == Set(0, 1, 2))
    val ev = Tables.events(spark, d)
    (0 to 2).foreach { g =>
      val slice = ev.filter(col("event_id") % 3 === g)
      val n = slice.count()
      val nullProps =
        if (g == 0) n else slice.filter(col("props").isNull).count()
      val nullType =
        if (g < 2) n else slice.filter(col("event_type").isNull).count()
      assert(rows(g) == ((n, nullProps, nullType)), s"gen $g")
    }
  }

  test("orphanAudit: 2 planted orphans swept, 4 live files and every " +
      "table row untouched, re-run idempotent") {
    val r = CatalogAudits.orphanAudit(spark, d).collect().head
    assert(r.getAs[Long]("n_files") == 6L)
    assert(r.getAs[Long]("n_referenced") == 4L)
    assert(r.getAs[Long]("n_orphans") == 2L)
    assert(r.getAs[Long]("n_deleted") == 2L)
    assert(r.getAs[Long]("n_orphans_after") == 0L)
    assert(r.getAs[Long]("n_rows_live") ==
      Tables.events(spark, d).filter(col("event_id") % 5 === 0).count())
  }

  test("storageProfileAudit: footer value counts equal the row count " +
      "for every flat column; footer null stats equal logical nulls") {
    val prof = CatalogAudits.storageProfileAudit(spark, d).collect()
      .map(r => r.getAs[String]("column") ->
        ((r.getAs[Long]("n_values"), r.getAs[Long]("n_nulls")))).toMap
    val ev = Tables.events(spark, d)
    val n = ev.count()
    assert(prof.keySet ==
      Set("event_id", "user_id", "event_type", "value", "props"))
    prof.foreach { case (c, (nv, nn)) =>
      assert(nv == n, s"$c values")
      assert(nn == ev.filter(col(c).isNull).count(), s"$c nulls")
    }
  }

  test("StreamRegistry drive protocol: the streamed Complete-mode " +
      "sink equals the batch run of the same plan, detached from the " +
      "memory sink (no temp view left behind)") {
    val before = spark.catalog.listTables().count()
    val streamed = StreamRegistry.streamOhlc(spark, d)
    val after = spark.catalog.listTables().count()
    assert(after == before, "memory-sink temp view leaked")
    val batch = graft.streaming.Streaming
      .ohlcBars(Tables.ticks(spark, d)
        .select("tick_id", "symbol", "ts", "bid"), "1 hour")
      .orderBy("symbol", "bucket_start")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("StreamRegistry sentinels close every tape session window: " +
      "the G40 sink covers exactly the batch chain's window set") {
    val streamed = StreamRegistry
      .streamAnomaly(spark, d, SparkEntry.tensorSlots,
        SparkEntry.reconFlagPct)
      .select("symbol", "date", "win").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val h = hour(col("ts")); val m = minute(col("ts"))
    val batchWins = Tables.ticks(spark, d)
      .filter((h === 7 || h === 13) && m >= 50)
      .select(col("symbol"),
        date_format(col("ts"), "yyyy-MM-dd").as("date"),
        when(h === 7, "morning").otherwise("afternoon").as("win"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(streamed == batchWins)
  }
}
