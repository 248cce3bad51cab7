package graft

import graft.operators.Multimodal

/** F12b — the hashable media-summary oracle (VERDICT r9 #1).
  *
  * The fixture ([[Multimodal.mediaSummaryFixture]]) is a SPEC, not a
  * snapshot: this suite (a) re-derives the whole audio block and the
  * video frame-count block from first principles — plain Scala over
  * the generator's documented formulas, no codec classes — and
  * (b) pins the operator's full output to the fixture, which the
  * DuckDB oracle interpolates verbatim. A generator or codec change
  * that shifts any number fails here BEFORE the driver gate does.
  */
class MediaSummarySpec extends SparkSpec {

  private val n = 300
  // Seq[(String, Long, Long)] → Map(feature -> (n_rows, sum_q))
  private def fx: Map[String, (Long, Long)] =
    Multimodal.mediaSummaryFixture.map { case (f, nr, sq) => f -> (nr, sq) }.toMap

  test("audio anchors re-derived from first principles match the fixture") {
    // Generator (Multimodal.syntheticRealMedia): id % 3 == 2 → audio,
    // len = 64 + (id % 32) samples of a ±1000 square wave flipping
    // every 4 samples ((i/4) parity).
    val audioIds = (0 until n).filter(_ % 3 == 2)
    assert(audioIds.size == 100)
    // rms: every sample is ±1000 ⇒ sqrt(mean(10⁶)) = 1000 EXACTLY
    // (integer-valued double, no rounding) ⇒ value_q = 10⁹ per row.
    val rmsSum = audioIds.map(_ => 1000L * 1000000L).sum
    assert(fx("rms") == (100L, rmsSum))
    assert(rmsSum == 100000000000L)
    // zero crossings: sign flips at i = 4, 8, … < len ⇒ ⌊(len−1)/4⌋.
    val zcSum = audioIds.map { id =>
      val len = 64 + (id % 32)
      ((len - 1) / 4).toLong * 1000000L
    }.sum
    assert(fx("zero_crossings") == (100L, zcSum))
    assert(zcSum == 1916000000L)
  }

  test("video n_frames anchor re-derived from first principles") {
    // id % 3 == 0 → video with nf = 4 + (id % 5) frames.
    val nfSum = (0 until n).filter(_ % 3 == 0)
      .map(id => (4L + (id % 5)) * 1000000L).sum
    assert(fx("n_frames") == (100L, nfSum))
    assert(nfSum == 600000000L)
  }

  test("mediaSummary reproduces the spec fixture bit-for-bit") {
    val got = Multimodal.mediaSummary(spark, n).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Multimodal.mediaSummaryFixture,
      s"operator/fixture drift:\n got=$got\n fix=${Multimodal.mediaSummaryFixture}")
  }

  test("summary aggregates exactly the q_media_features long frame") {
    import org.apache.spark.sql.functions._
    val fromLong = Multimodal.featuresLong(spark, n)
      .withColumn("value_q", round(col("value") * 1000000.0, 0).cast("long"))
      .groupBy("feature")
      .agg(count(lit(1)).as("n_rows"), sum("value_q").as("sum_q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(fromLong == Multimodal.mediaSummaryFixture)
    // and the long frame itself still carries the 700-row rows-check
    assert(Multimodal.featuresLong(spark, n).count() == 700L)
  }

  test("featuresQuantized agrees cell-for-cell with the formulas-only " +
      "re-derivation the q_media_features oracle interpolates") {
    val viaCodecs = Multimodal.featuresQuantized(spark, n).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val viaFormulas = SparkEntry.mediaFixture(n)
    assert(viaCodecs.size == 700 && viaCodecs == viaFormulas,
      "codec-path / formula-path drift: " +
        viaCodecs.zip(viaFormulas).filter(p => p._1 != p._2).take(3))
  }
}
