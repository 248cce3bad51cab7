package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-file chronological ordering — the distributed analog of the
  * reference's driver-side chain ordering, which reads first/last
  * timestamps out of every parquet footer with pyarrow one file at a
  * time and then chains files by nearest start/end (ref: `Data
  * Preprocessing and Cleaning/spark_session_window_tick_cleaner.py:44-88`).
  *
  * Here: ONE job over all files — `input_file_name()` + grouped
  * min/max (partial agg), then a rank over the per-file summary (tiny:
  * one row per file). At 100 TB the reference's loop is hours of
  * serial footer reads; this is a single scan, and with parquet
  * min/max statistics the scan itself prunes to footers.
  */
object FileOrder {

  /** One row per input file: tick count, ts range, and its
    * chronological position (`file_order`, 1-based by start ts). */
  def fileRanges(df: DataFrame, tsCol: String): DataFrame = {
    val ranges = df
      .select(input_file_name().as("file"), col(tsCol).as("ts"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_ticks"),
        min("ts").as("ts_min"), max("ts").as("ts_max"))
    ranges
      // global window BOUNDED by construction: the frame is the FILE
      // manifest (|files| rows), never ticks (the r12
      // WindowExec-warning audit pin)
      .withColumn("file_order",
        row_number().over(Window.orderBy(col("ts_min"), col("file"))))
      .orderBy("file_order")
  }

  /** Attach each row's file order — what the reference threads through
    * as a `file_order` literal column per loop iteration
    * (cleaner.py:119). Join key is the file name: one row per file on
    * the build side, broadcast-sized by construction. */
  def withFileOrder(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("file", input_file_name())
      .join(broadcast(fileRanges(df, tsCol).select("file", "file_order")), "file")
      .drop("file")
}
