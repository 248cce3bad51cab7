package graft

import graft.operators.{CorpusPipeline, LangModel, Vectors}

/** Hand-computed oracles for the F35–F38 model-based quality ops. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("unigramSurprisal: repeated-token doc scores below a rare-token doc") {
    // corpus: "a a a b" → freq(a)=3 freq(b)=1, N=4
    // doc 1 = "a a a": avg(-ln(3/4)) = ln(4/3)
    // doc 2 = "b":     -ln(1/4) = ln 4
    val out = LangModel.unigramSurprisal(docs((1L, "a a a"), (2L, "b")))
      .collect()
    val s1 = out(0).getAs[Double]("avg_surprisal")
    val s2 = out(1).getAs[Double]("avg_surprisal")
    assert(math.abs(s1 - math.rint(math.log(4.0 / 3) * 1e4) / 1e4) < 1e-9)
    assert(math.abs(s2 - math.rint(math.log(4.0) * 1e4) / 1e4) < 1e-9)
    assert(out(0).getAs[Long]("n_tokens") == 3L)
  }

  test("unigramSurprisal: empty doc keeps its row with zero tokens") {
    val out = LangModel.unigramSurprisal(docs((1L, "x"), (2L, "")))
      .collect()
    assert(out.length == 2)
    assert(out(1).getAs[Long]("n_tokens") == 0L)
    assert(out(1).isNullAt(out(1).fieldIndex("avg_surprisal")))
  }

  test("vocabCoverage: top-V cut breaks the boundary tie by token, " +
      "OOV rate is exact-int division, empty doc keeps its row") {
    // freqs: a=3, b=1, c=1 → top-2 vocab = {a, b} (tie b/c broken
    // by token asc). doc 1 all in-vocab; doc 2 has OOV 'c'.
    val out = LangModel.vocabCoverage(
      docs((1L, "a a b"), (2L, "a c"), (3L, "")), 2).collect()
    assert(out(0).getAs[Long]("n_tokens") == 3L)
    assert(out(0).getAs[Long]("n_oov") == 0L)
    assert(out(0).getAs[Double]("oov_rate") == 0.0)
    assert(out(1).getAs[Long]("n_oov") == 1L)
    assert(out(1).getAs[Double]("oov_rate") == 0.5)
    assert(out(2).getAs[Long]("n_tokens") == 0L)
    assert(out(2).isNullAt(out(2).fieldIndex("oov_rate")))
  }

  test("bigramSurprisal: conditional probabilities, hand-computed") {
    // corpus bigrams: doc1 "a b a b" → (a b),(b a),(a b); doc2 "a c"
    // c2: (a b)=2, (b a)=1, (a c)=1; c_head: a=3, b=1
    // doc1: avg(−ln(2/3), −ln(1/1), −ln(2/3)) = 2·ln(1.5)/3
    // doc2: −ln(1/3) = ln 3
    val out = LangModel.bigramSurprisal(docs((1L, "a b a b"), (2L, "a c")))
      .collect()
    val s1 = out(0).getAs[Double]("avg_cond_surprisal")
    val s2 = out(1).getAs[Double]("avg_cond_surprisal")
    assert(out(0).getAs[Long]("n_bigrams") == 3L)
    assert(math.abs(s1 -
      math.rint(2.0 * math.log(1.5) / 3 * 1e4) / 1e4) < 1e-9)
    assert(math.abs(s2 - math.rint(math.log(3.0) * 1e4) / 1e4) < 1e-9)
  }

  test("bigram LM family tokenizes the corpus exactly once " +
      "(plan-asserted: scoring rides the checkpointed tf frame)") {
    // r15 verdict #5: the pre-r16 shape re-ran graft_wordgrams for
    // the score join (two corpus tokenize passes). Now the explode
    // collapses straight into a checkpointed (doc_id, bigram, tf)
    // frame, so the FINAL executed plan must contain no tokenizer
    // call at all — every downstream consumer reads the checkpoint.
    // (The old shape fails this: its final plan carried the
    // generator for the per-doc score branch.)
    val d = docs((1L, "a b a b"), (2L, "a c"))
    Seq(LangModel.bigramSurprisal(d),
        LangModel.knSurprisal(d, 0.75)).foreach { out =>
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("graft_wordgrams"),
        "final plan re-tokenizes the corpus:\n" + plan.take(2000))
    }
  }

  test("bigramSurprisal: sub-2-token doc keeps its row with zero bigrams") {
    val out = LangModel.bigramSurprisal(docs((1L, "a b"), (2L, "x")))
      .collect()
    assert(out(1).getAs[Long]("n_bigrams") == 0L)
    assert(out(1).isNullAt(out(1).fieldIndex("avg_cond_surprisal")))
  }

  test("charEntropy: uniform string hits ln(n), constant string hits 0, " +
      "empty is NULL") {
    val out = LangModel.charEntropy(docs(
      (1L, "abcd"), (2L, "aaaa"), (3L, ""))).collect()
    assert(math.abs(out(0).getAs[Double]("entropy") - math.log(4.0)) < 1e-12)
    assert(out(0).getAs[Int]("n_distinct_cp") == 4)
    assert(out(1).getAs[Double]("entropy") == 0.0)
    assert(out(2).isNullAt(out(2).fieldIndex("entropy")))
  }

  test("charEntropy: skewed distribution, hand-computed nats") {
    // "aab": H = ln(3) - (2·ln2 + 1·ln1)/3
    val out = LangModel.charEntropy(docs((1L, "aab"))).collect().head
    val expected = math.log(3.0) - 2.0 * math.log(2.0) / 3.0
    assert(math.abs(out.getAs[Double]("entropy") - expected) < 1e-12)
  }

  test("mixtureSample: sqrt-temperature allocation, hand-checked targets") {
    // sources: A=16 docs, B=4 docs, budget 6.
    // sq_A=4e6, sq_B=2e6, z=6e6 → tgt_A=min(16, 6·4e6 div 6e6)=4,
    // tgt_B=min(4, 6·2e6 div 6e6)=2 — small source keeps a 2/6 share
    // (proportional-to-n would give it 6·4/20 = 1).
    val rows = (1 to 16).map(i => (i.toLong, s"t$i", "en", "A", 2L)) ++
      (17 to 20).map(i => (i.toLong, s"t$i", "en", "B", 2L))
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPipeline.mixtureSample(df, 6L).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    assert(bySource("A").length == 4 && bySource("B").length == 2)
    assert(bySource("A").forall(_.getAs[Long]("tgt") == 4L))
    assert(out.forall(r => r.getAs[Int]("rnk") <= r.getAs[Long]("tgt")))
  }

  test("mixtureSample: tiny source is capped at its own size") {
    val rows = (1 to 100).map(i => (i.toLong, "t", "en", "big", 1L)) ++
      Seq((101L, "t", "en", "tiny", 1L))
    val out = CorpusPipeline.mixtureSample(
      rows.toDF("doc_id", "text", "lang", "source", "n_chars"), 50L)
      .collect()
    val tiny = out.filter(_.getAs[String]("source") == "tiny")
    assert(tiny.length == 1) // min(1, share) = 1, never over its size
  }

  test("knnDensity: the far-out vector ranks most isolated") {
    // 5 near-identical vectors + 1 orthogonal outlier (vec 0 must be
    // among targets: nTargets covers all ids here)
    val dim = 4
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val rows = Seq(
      (0L, v(0, 0, 0, 1), 0),  // outlier: orthogonal to the cluster
      (1L, v(1, 0.01, 0, 0), 0), (2L, v(1, 0.02, 0, 0), 0),
      (3L, v(1, 0.03, 0, 0), 0), (4L, v(1, 0.04, 0, 0), 0),
      (5L, v(1, 0.05, 0, 0), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Vectors.knnDensity(df, 6, 3, dim).collect()
    val byId = out.map(r => r.getAs[Long]("target_id") -> r).toMap
    assert(byId(0L).getAs[Int]("out_rank") == 1) // lowest density
    assert(byId(0L).getAs[Double]("density") <
      byId(1L).getAs[Double]("density"))
    assert(out.forall(_.getAs[Long]("n_neighbors") == 3L))
  }

  test("centroidDrift: a label aligned with the global mean scores " +
      "cosine ~1, an orthogonal label scores ~0") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    // label 0 dominates the global centroid along dim 0; label 1 is
    // orthogonal along dim 1.
    val rows = Seq(
      (0L, v(1, 0, 0, 0), 0), (1L, v(1, 0, 0, 0), 0),
      (2L, v(1, 0, 0, 0), 0), (3L, v(1, 0, 0, 0), 0),
      (4L, v(0, 1, 0, 0), 1))
    val out = Vectors.centroidDrift(
      rows.toDF("vec_id", "embedding", "label"), 4).collect()
    val byLabel = out.map(r => r.getAs[Int]("label") -> r).toMap
    assert(byLabel(0).getAs[Long]("n_vectors") == 4L)
    assert(byLabel(0).getAs[Double]("cos_to_global") > 0.95)
    assert(byLabel(1).getAs[Double]("cos_to_global") < 0.3)
    assert(math.abs(byLabel(0).getAs[Double]("centroid_norm") - 1.0) < 1e-6)
  }

  test("importanceWeights: target-exclusive tokens score the size " +
      "ratio over their frequency, absent-from-target tokens zero") {
    // corpus: target doc "x x" (src T), other doc "y y" (src W)
    // N_all=4, N_target=2 → C = (4·10000) div 2 = 20000
    // token x: tf_all=2 tf_target=2 → w = (2·20000) div 2 = 20000
    // token y: tf_target=0 → w = 0
    val df = Seq(
      (1L, "x x", "en", "T", 3L),
      (2L, "y y", "en", "W", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = LangModel.importanceWeights(df, "T")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "T", 2L, 40000L, 20000.0),
      (2L, "W", 2L, 0L, 0.0)))
  }

  test("knSurprisal: hand-built interpolated-KN probabilities; " +
      "empty doc keeps its row with NULL score") {
    // corpus bigrams: "a b"×2 (doc 1), "b a"×1 (doc 1), "a c"×1
    // (doc 2) → B = 3 types; heads: a(c=3, n1=2), b(c=1, n1=1);
    // continuations: a,b,c each follow exactly 1 distinct head.
    val out = LangModel.knSurprisal(
      docs((1L, "a b a b"), (2L, "a c"), (3L, "")), 0.75).collect()
    def r4(x: Double) = math.rint(x * 10000) / 10000
    val pAB = (2.0 - 0.75 + 0.75 * 2.0 * (1.0 / 3.0)) / 3.0
    val pBA = (1.0 - 0.75 + 0.75 * 1.0 * (1.0 / 3.0)) / 1.0
    val pAC = (1.0 - 0.75 + 0.75 * 2.0 * (1.0 / 3.0)) / 3.0
    assert(out(0).getAs[Long]("n_bigrams") == 3L)
    assert(out(0).getAs[Double]("avg_kn_surprisal") ==
      r4((-math.log(pAB) * 2 - math.log(pBA)) / 3.0))
    assert(out(1).getAs[Long]("n_bigrams") == 1L)
    assert(out(1).getAs[Double]("avg_kn_surprisal") == r4(-math.log(pAC)))
    assert(out(2).getAs[Long]("n_bigrams") == 0L)
    assert(out(2).isNullAt(out(2).fieldIndex("avg_kn_surprisal")))
    // KN sanity: the smoothed conditional masses of head 'a' sum < 1.
    assert(pAB + pAC < 1.0)
  }

  test("nbQualityClassifier: disjoint-vocabulary corpus distills the " +
      "rule exactly; empty doc scores the bare prior") {
    // "good" docs: 20 stopword tokens → rule-pos; their vocabulary
    // ('the') is exclusive to the positive class, so the learned
    // log-odds are strongly positive. "junk" docs: 2 non-stop tokens
    // → rule-neg, exclusively negative vocabulary. The empty doc is
    // rule-neg and scores margin = the bare prior
    // ln(2+1) − ln(3+1) = −0.2877 → pred neg.
    val good = ("the " * 20).trim
    val rows = Seq(
      (1L, good, "en", "good", 80L),
      (2L, good, "en", "good", 80L),
      (3L, "zz yy", "en", "junk", 5L),
      (4L, "zz yy", "en", "junk", 5L),
      (5L, "", "en", "empty", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = LangModel.nbQualityClassifier(rows, minTok = 20,
        minStopPct = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    val g = out("good")
    assert((g._1, g._2, g._3, g._4, g._5) == ((2L, 2L, 2L, 2L, 1.0)))
    assert(g._6 > 0, "positive-vocabulary margin must be positive")
    val j = out("junk")
    assert((j._1, j._2, j._3, j._4, j._5) == ((2L, 0L, 0L, 2L, 1.0)))
    assert(j._6 < 0, "negative-vocabulary margin must be negative")
    val e = out("empty")
    assert((e._1, e._2, e._3, e._4, e._5, e._6) ==
      ((1L, 0L, 0L, 1L, 1.0, -0.2877)),
      "token-less doc must score the prior, not drop")
  }
}
