package graft

import graft.operators.{Curation, RichCorpus, TextDedup, Vectors}
import org.apache.spark.sql.functions._

/** The rich-corpus generator's planted structure, pinned (r15 verdict
  * #1): the audits it feeds must stay NON-degenerate — boilerplate in
  * the realistic band, similarity graded by source distance, Fisher
  * separability above the verdict's 0.5 bar. Driver-scale numbers are
  * recorded in SURVEY §7n; this spec pins the same properties on a
  * small deterministic base so a generator regression fails fast. */
class RichCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def base(nDocs: Int, nSrc: Int) =
    (0 until nDocs).map { i =>
      (i.toLong, "x", "en", s"src${i % nSrc}", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("text structure: 8 lines, planted boilerplate in the 5-15% band") {
    val docs = RichCorpus.docs(base(400, 10)).cache()
    val lines = docs.select(size(split(col("text"), "\n")).as("nl"))
      .agg(min("nl"), max("nl")).head()
    assert(lines.getInt(0) == 8 && lines.getInt(1) == 8)
    val rep = Curation.boilerplateReport(docs, "\n", 30)
    val shares = rep.select("boiler_share").as[Double].collect()
    assert(shares.forall(s => s >= 0.05 && s <= 0.20),
      s"boiler shares outside the realistic band: ${shares.toSeq}")
    // the flagged lines are EXACTLY the planted boilers: distinct
    // flagged-line count per source is at most the boiler-pool size
    val flagged = rep.select("n_boiler_lines").as[Long].collect()
    assert(flagged.forall(n => n >= 1 && n <= RichCorpus.boilers.size),
      s"flagged counts: ${flagged.toSeq}")
    docs.unpersist()
    ()
  }

  test("source similarity grades by source distance (quote-pool overlap)") {
    val docs = RichCorpus.docs(base(600, 6))
    val sim = TextDedup.sourceSimilarity(docs, 16)
      .select(col("source_a"), col("source_b"), col("exact_jaccard"))
      .collect()
      .map(r => (r.getString(0).drop(3).toInt, r.getString(1).drop(3).toInt,
        r.getDouble(2)))
    def meanAt(d: Int) = {
      val xs = sim.collect { case (a, b, j) if math.abs(a - b) == d => j }
      xs.sum / xs.length
    }
    assert(meanAt(1) > meanAt(5),
      s"adjacent sources must overlap more than distant: " +
        s"${meanAt(1)} vs ${meanAt(5)}")
  }

  test("tier mix grades the per-source sweep curves") {
    val docs = RichCorpus.docs(base(800, 8))
    // every 4th source is tier-biased LOW -> at a mid cut its kept
    // share must sit below the unbiased sources'
    val sweep = graft.operators.CorpusPipeline
      .thresholdSweep(docs, Seq(60L))
      .select(col("source"), col("kept_share_bp"))
      .collect().map(r => (r.getString(0).drop(3).toInt, r.getLong(1)))
    val low = sweep.collect { case (s, k) if s % 4 == 3 => k }
    val rest = sweep.collect { case (s, k) if s % 4 != 3 => k }
    assert(low.max < rest.map(_.toDouble).sum / rest.length,
      s"low-biased sources must keep less at the mid cut: " +
        s"low=${low.toSeq} rest=${rest.toSeq}")
  }

  test("dup families: planted Jaccard tracks keep/(16-keep) and the " +
      "LSH catch rate rises with it (the S-curve has both tails)") {
    val b = base(800, 8)
    val rep = graft.operators.TextDedup
      .plantedDupRecall(RichCorpus.dupDocs(b), RichCorpus.dupPairs(b))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rep.map(_._1).toSeq == (2L to 7L),
      s"all six keep levels must be planted: ${rep.map(_._1).toSeq}")
    rep.foreach { case (keep, _, _, _, j) =>
      val expect = keep.toDouble / (16 - keep)
      // word-id collisions add ~4% one-sided noise
      assert(math.abs(j - expect) < 0.06,
        s"keep=$keep: measured J $j vs constructed $expect")
    }
    // monotone-ish S-curve: the top level is caught far more often
    // than the bottom, and the ends sit on the right sides of 50%
    val byKeep = rep.map(r => r._1 -> r._4).toMap
    assert(byKeep(7L) > 8000, s"J=0.78 pairs must be caught: $byKeep")
    assert(byKeep(2L) < 5000, s"J=0.14 pairs must mostly escape: $byKeep")
  }

  test("G7b: the streaming dup-spectrum dominates the batch S-curve " +
      "per keep level (flagged ⊇ LSH-caught) and keeps both tails") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
    val batch = TextDedup
      .plantedDupRecall(RichCorpus.dupDocs(docs), RichCorpus.dupPairs(docs))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val stream = graft.streaming.StreamRegistry
      .streamDupSpectrum(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(stream.keySet == batch.keySet,
      s"keep levels differ: ${stream.keySet} vs ${batch.keySet}")
    stream.foreach { case (keep, (nPlanted, nFlagged, _)) =>
      val (bPlanted, bCaught) = batch(keep)
      assert(nPlanted == bPlanted, s"keep=$keep planted counts differ")
      // an LSH-caught pair's parent claimed the shared bucket before
      // the child arrived, so the child is flagged: flagged ⊇ caught
      assert(nFlagged >= bCaught,
        s"keep=$keep: stream flagged $nFlagged < batch caught $bCaught")
    }
    val bp = stream.map { case (k, (_, _, fbp)) => k -> fbp }
    assert(bp(7L) > 8000, s"J=0.78 children must be flagged: $bp")
    assert(bp(2L) < 6000, s"J=0.14 children must mostly pass: $bp")
  }

  test("planted sqrt impact law: the fitted exponent recovers ~0.5") {
    // synthetic events base: 4 symbols x 250 fills, k cycling 1..99
    val base = java.sql.Timestamp.valueOf("2024-01-02 08:00:00")
    val ev = (0 until 1000).map { i =>
      (i.toLong,
        new java.sql.Timestamp(base.getTime + (i / 4) * 60000L),
        (i % 4).toLong, "fill", 100.0,
        s"""{"k": ${i % 99 + 1}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val fit = graft.operators.Microstructure
      .impactExponent(RichCorpus.eventsImpact(ev), fillEvery = 1)
      .select("impact_exp").as[Double].collect()
    assert(fit.nonEmpty && fit.forall(e => e > 0.3 && e < 0.7),
      s"planted sqrt law must fit near 0.5: ${fit.toSeq}")
  }

  test("planted labels are Fisher-separable (> 0.5 on every dimension)") {
    // deterministic noise base: 64 dims of small hash-derived floats
    val emb = (0 until 300).map { v =>
      (v.toLong,
        Array.tabulate(64)(i =>
          (((v * 64 + i) * 2654435761L % 1000000007L % 401) - 200)
            .toFloat / 1600.0f),
        v % 10)
    }.toDF("vec_id", "embedding", "label")
    val fisher = Vectors.labelSeparability(RichCorpus.embeddings(emb))
      .select("fisher").as[Double].collect()
    assert(fisher.forall(_ > 0.5),
      s"fisher floor ${fisher.min} must exceed the 0.5 separability bar")
  }
}
