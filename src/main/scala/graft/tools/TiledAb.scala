package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.TextDedup
import graft.functions.PortableText._

/** Round-14 diagnostic: A/B the dedup band join's two scale regimes
  * on a WORST-CASE hot bucket — N identical texts, so every
  * (band, band_hash) bucket holds the whole corpus and the pair join
  * computes Bands·N² joined rows before the first-match filter.
  *
  * The regime the H9 tiled layout targets is the CLUSTER one: the
  * bands frame too big to broadcast, the join a sort-merge on
  * (band, band_hash), one reducer per bucket. Locally that regime is
  * forced with autoBroadcastJoinThreshold = -1; the broadcast case
  * is also timed for completeness (there the probe-side round-robin
  * already spreads the work, which is why the switch only flips
  * PAST the bucket threshold).
  *
  * Run: `sbt "runMain graft.tools.TiledAb"`
  * (env: SPARK_GRAFT_HOT_N docs, default 1500; SPARK_GRAFT_CPUS)
  * Results recorded in SURVEY §5 (round-14 regime paragraph).
  */
object TiledAb {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_HOT_N", "1500").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.PolyHash.register(spark)
    graft.functions.MinHashes.register(spark)
    val sigs = spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        lit("the quick brown fox jumps over the lazy dog again and " +
          "again building one maximally hot band bucket").as("text"))
      .withColumn("th", expr(tokenHashes))
      .withColumn("mh", expr(minHashes))
      .select("doc_id", "mh")
      .localCheckpoint(true)
    val expected = n.toLong * (n - 1) / 2
    def run(label: String, thr: Long, broadcastOff: Boolean): Unit = {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      if (broadcastOff)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val t0 = System.nanoTime()
        val c = TextDedup.candidatePairsFromSigs(sigs, thr, tiles = 16)
          .groupBy().agg(count(lit(1))).collect().head.getLong(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[tiled-ab] $label%-34s $secs%7.2f s  pairs=$c")
        require(c == expected, s"$label: $c pairs, expected $expected")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    println(s"[tiled-ab] hot bucket: $n identical docs, " +
      s"${Bands}·n² = ${Bands.toLong * n * n} joined rows, " +
      s"$expected true pairs")
    run("broadcast regime (local default)", Long.MaxValue,
      broadcastOff = false)
    run("broadcast spelling, SMJ forced", Long.MaxValue,
      broadcastOff = true)
    run("tiled regime, SMJ forced", 0L, broadcastOff = true)
    spark.stop()
  }
}
