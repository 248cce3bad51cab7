package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: stage-by-stage wall decomposition of the banded
  * candidate-pair family (the bench's head queries) — which of band
  * join / distinct / array attach / exact intersect actually costs.
  * Run: `sbt "runMain graft.tools.PairProfile [sfDir]"`; local only,
  * not part of any gate.
  */
object PairProfile {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.PortableText._
    graft.functions.PolyHash.register(spark)
    graft.functions.MinHashes.register(spark)
    graft.functions.SortedCommon.register(spark)
    val docs = graft.sources.Tables.documents(spark, d)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = docs
      .withColumn("th", expr(tokenHashes))
      .withColumn("ths", expr("array_sort(th)"))
      .withColumn("mh", expr(minHashes))
      .select("doc_id", "th", "ths", "mh")
    time("base (tokenize+minhash)") { base.write.format("noop").mode("overwrite").save() }
    val baseC = base.localCheckpoint(true)

    val bands = baseC
      .withColumn("band", explode(sequence(lit(0), lit(Bands - 1))))
      .withColumn("band_hash",
        expr(s"(element_at(mh, 2*band + 1) * 31 + element_at(mh, 2*band + 2)) % $P"))
      .filter(col("band_hash").isNotNull)
      .select("doc_id", "band", "band_hash")
    val a = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"))
    val raw = a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    time("band join (raw matches)") { raw.write.format("noop").mode("overwrite").save() }
    val pairs = raw.distinct()
    time("+ distinct") { pairs.write.format("noop").mode("overwrite").save() }
    val pairsC = pairs.localCheckpoint(true)

    val pa = baseC.select(col("doc_id").as("doc_a"), col("ths").as("ths_a"))
    val pb = baseC.select(col("doc_id").as("doc_b"), col("ths").as("ths_b"))
    val attached = pairsC.join(pa, "doc_a").join(pb, "doc_b")
    time("+ attach arrays (2 joins)") {
      attached.select("doc_a", "doc_b").write.format("noop").mode("overwrite").save()
    }
    time("+ native intersect count") {
      attached
        .withColumn("n_common", expr("graft_sorted_ncommon(ths_a, ths_b)"))
        .select("doc_a", "doc_b", "n_common")
        .write.format("noop").mode("overwrite").save()
    }
    time("+ array_intersect (old)") {
      attached
        .withColumn("n_common", expr("size(array_intersect(ths_a, ths_b))"))
        .select("doc_a", "doc_b", "n_common")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
