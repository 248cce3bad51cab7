package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A1 — CSV→Parquet tick ingest, the Spark re-expression of the
  * reference's converter (ref: `Data Preprocessing and
  * Cleaning/spark_csv_parquet_converter_ver_1.py:61-80`): explicit
  * schema (never `inferSchema` — a full extra pass at 100 TB), Volume
  * dropped at scan time (column pruning reaches the reader), timestamp
  * parsed from the Dukascopy format `yyyyMMdd HH:mm:ss.SSS`
  * (ref: `spark_session_window_tick_cleaner.py:136`).
  *
  * Unlike the reference, which walks directories on the driver and
  * converts one folder per loop iteration (converter:85-87), this
  * reads a whole tree in one job and writes partitioned by
  * (symbol, year) — the layout the reference's Iceberg gold tables
  * use (ref: `metadata_layer.py:76-85`), so downstream year/symbol
  * predicates prune partitions at 100 TB.
  */
object CsvTickIngest {

  val rawSchema: StructType = StructType(Seq(
    StructField("DateTime", StringType),
    StructField("Bid", DoubleType),
    StructField("Ask", DoubleType),
    StructField("Volume", DoubleType)))

  /** Read raw tick CSVs (one job for any number of files). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(rawSchema)
      .csv(path)
      .select(
        to_timestamp(col("DateTime"), "yyyyMMdd HH:mm:ss.SSS").as("ts"),
        col("Bid").as("bid"),
        col("Ask").as("ask"),
        regexp_extract(input_file_name(), "([^/]+)/[^/]+$", 1).as("symbol"))

  /** Write the normalized gold layout, partitioned for pruning. */
  def write(df: DataFrame, outPath: String, blockSizeBytes: Long = 512L << 20): Unit =
    df.withColumn("year", year(col("ts")))
      .write.mode("overwrite")
      .partitionBy("symbol", "year")
      .option("compression", "snappy")
      .option("parquet.block.size", blockSizeBytes)
      .parquet(outPath)
}
