package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the F12b media-summary fixture
  * ([[graft.operators.Multimodal.mediaSummaryFixture]]): prints the
  * operator's actual (feature, n_rows, sum_q) rows as Scala source.
  * Run after ANY change to the synthetic generator or codec math, and
  * re-derive the audio anchors in MediaSummarySpec by hand before
  * pasting — the fixture is a spec, not a snapshot.
  *
  * Usage: sbt "runMain graft.tools.MediaFixture"
  */
object MediaFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.Multimodal.mediaSummary(spark, 300)
      .collect()
      .foreach(r => println(
        s"""    ("${r.getString(0)}", ${r.getLong(1)}L, ${r.getLong(2)}L),"""))
    spark.stop()
  }
}
