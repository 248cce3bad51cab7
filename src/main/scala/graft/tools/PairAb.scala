package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.TextDedup
import graft.functions.PortableText._

/** Diagnostic: A/B the two candidate-pair spellings at sf0.1 —
  * bands→join→DISTINCT vs first-matching-band filter — bare (pair
  * count only) AND through the full candidatePairStats-shaped
  * pipeline (attach token arrays + exact intersect + aggregate), so
  * a strategy flip in the attach joins is visible.
  * Run: `sbt "runMain graft.tools.PairAb"`
  */
object PairAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.PolyHash.register(spark)
    graft.functions.MinHashes.register(spark)
    graft.functions.SortedCommon.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs
      .withColumn("th", expr(tokenHashes))
      .withColumn("ths", expr("array_sort(array_distinct(th))"))
      .withColumn("mh", expr(minHashes))
      .select("doc_id", "th", "ths", "mh")
      .localCheckpoint(true)
    def bandsOf(b: DataFrame) = b
      .withColumn("band", explode(sequence(lit(0), lit(Bands - 1))))
      .withColumn("band_hash",
        expr(s"(element_at(mh, 2*band + 1) * 31 + element_at(mh, 2*band + 2)) % $P"))
      .filter(col("band_hash").isNotNull)
      .select("doc_id", "band", "band_hash")
    def distinctPairs() = TextDedup.candidatePairs(bandsOf(base))
    def firstMatchPairs() = TextDedup.candidatePairsFromSigs(
      base.select("doc_id", "mh"))
    def attach(pairs: DataFrame): DataFrame = {
      val pa = base.select(col("doc_id").as("doc_a"), col("ths").as("ths_a"))
      val pb = base.select(col("doc_id").as("doc_b"), col("ths").as("ths_b"))
      pairs.join(pa, "doc_a").join(pb, "doc_b")
        .withColumn("n_common", expr("graft_sorted_ncommon(ths_a, ths_b)"))
        .groupBy().agg(count(lit(1)), sum("n_common"))
    }
    def time(label: String, f: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f()
      val n = df.collect().map(_.toString).mkString
      println(f"[ab] $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s  $n")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        val plan = df.queryExecution.executedPlan.toString
        println(s"[plan] $label:")
        plan.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") ||
            l.contains("HashAggregate") || l.contains("Sort "))
          .foreach(l => println("    " + l.trim.take(140)))
      }
    }
    for (_ <- 1 to 2) {
      time("bare-distinct", () => distinctPairs().groupBy().agg(count(lit(1))))
      time("bare-firstmatch", () => firstMatchPairs().groupBy().agg(count(lit(1))))
      time("full-distinct", () => attach(distinctPairs()))
      time("full-firstmatch", () => attach(firstMatchPairs()))
    }
    spark.stop()
  }
}
