package graft

import graft.operators.CorpusPipeline
import org.apache.spark.sql.functions.col

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docsFrom(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source")

  test("qualityFilter assigns the first failing drop reason, else keeps") {
    val long = "the quick brown fox jumps over a lazy dog and then runs " +
      "through green fields of tall grass to find cool water near bridges"
    val docs = docsFrom(
      1L -> long,                       // kept: 24 distinct tokens, stopworded
      2L -> "too few tokens here",      // short
      3L -> ("spam " * 30).trim,        // repetitive (1 distinct / 30 tokens)
      4L -> (1 to 25).mkString(" "))    // low_stop (25 numeric tokens)
    val out = CorpusPipeline.qualityFilter(docs)
      .select("doc_id", "keep", "drop_reason")
      .as[(Long, Boolean, Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, true, None),
      (2L, false, Some("short")),
      (3L, false, Some("repetitive")),
      (4L, false, Some("low_stop"))))
  }

  test("qualityFilter: short wins over repetitive when both fail") {
    val docs = docsFrom(1L -> "x x x") // 3 tokens, rep_ratio 2/3 > 0.65
    val reason = CorpusPipeline.qualityFilter(docs)
      .select("drop_reason").as[String].collect().head
    assert(reason == "short")
  }

  test("hashSplit is a pure function of doc_id: growing the corpus " +
      "never reassigns existing docs, and the carve is ~80/10/10") {
    val small = CorpusPipeline.hashSplit(docsFrom(
      (0L until 100L).map(i => i -> s"doc $i"): _*))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val grown = CorpusPipeline.hashSplit(docsFrom(
      (0L until 1000L).map(i => i -> s"doc $i"): _*))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, sp) => grown(id) == sp })
    val dist = grown.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(dist("train") > 700 && dist("train") < 900, dist)
    assert(dist("val") > 50 && dist("val") < 160, dist)
    assert(dist("test") > 50 && dist("test") < 160, dist)
    assert(dist.values.sum == 1000)
  }

  test("capPerSource keeps at most cap docs per source in hash order, " +
      "stable under corpus growth of other sources") {
    val docs = (0L until 40L).map(i =>
      (i, s"doc number $i", if (i < 30) "big" else "small"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source")
    val out = CorpusPipeline.capPerSource(docs, 5)
      .select("doc_id", "source").as[(Long, String)].collect().toSeq
    val bySource = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySource == Map("big" -> 5, "small" -> 5))
    // growing an unrelated source never changes another source's picks
    val grown = docs.unionByName(
      (100L until 140L).map(i => (i, s"new $i", "en", "huge"))
        .toDF("doc_id", "text", "lang", "source"))
    val bigBefore = out.filter(_._2 == "big").map(_._1).toSet
    val bigAfter = CorpusPipeline.capPerSource(grown, 5)
      .select("doc_id", "source").as[(Long, String)].collect()
      .filter(_._2 == "big").map(_._1).toSet
    assert(bigAfter == bigBefore)
  }

  test("degenerate docs: empty/whitespace text is dropped as short, " +
      "never duplicated, and absent from saliency") {
    val docs = docsFrom(
      0L -> "",                      // empty: zero tokens
      50L -> "   ",                  // whitespace only: zero tokens
      1L -> ("the quick brown fox jumps over a lazy dog and then runs " +
        "through green fields of tall grass to find cool water"))
    val qf = CorpusPipeline.qualityFilter(docs)
      .select("doc_id", "keep", "drop_reason")
      .as[(Long, Boolean, Option[String])].collect()
      .map { case (id, k, r) => id -> ((k, r)) }.toMap
    assert(qf(0L) == ((false, Some("short"))))
    assert(qf(50L) == ((false, Some("short"))))
    assert(qf(1L)._1)
    // token-less docs carry no minhash bands: always kept, never
    // co-clustered with each other (the ADVICE null-band trap)
    val greedy = operators.TextDedup.greedyNearDup(docs)
      .as[(Long, Boolean)].collect().toMap
    assert(greedy == Map(0L -> false, 50L -> false, 1L -> false))
    // zero grams -> heldout docs still reported clean (0 and 50 are
    // the holdout ids under mod 50)
    val deco = CorpusPipeline.decontaminate(docs)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(deco == Seq((0L, 0L, false), (50L, 0L, false)))
    // no tokens -> no saliency rows, not a crash
    assert(operators.TextDedup.termSaliency(docs, 3)
      .filter(col("doc_id").isin(0L, 50L)).count() == 0L)
  }

  test("decontaminate flags held-out docs sharing a 5-gram with train, " +
      "and still reports gram-less held-out docs") {
    val leaked = "alpha bravo charlie delta echo foxtrot"
    val docs = docsFrom(
      0L -> s"intro words then $leaked trailing tail",  // held-out, leaked
      1L -> s"train copy holds $leaked inside body",    // train source
      50L -> "totally unique held out document phrasing here", // clean
      100L -> "tiny doc",                               // held-out, <5 tokens
      2L -> "unrelated training document with other words entirely")
    val out = CorpusPipeline.decontaminate(docs)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(0L, 50L, 100L))
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    // "alpha..foxtrot" spans 6 tokens -> 2 shared 5-grams
    assert(byId(0L) == ((2L, true)))
    assert(byId(50L) == ((0L, false)))
    assert(byId(100L) == ((0L, false)))
  }

  test("sourceDrift: exact-int TV distance over the bucket universe, " +
      "one-sided buckets count full mass") {
    def toks(k: Int) = ("t " * k).trim
    // A: lengths 1,1,17 → buckets {0:2, 1:1}, N=3
    // B: lengths 1,33   → buckets {0:1, 2:1}, N=2
    // TV = (|2·2−1·3| + |1·2−0| + |0−1·3|) / (2·3·2) = 6/12 = 0.5
    val docs = Seq(
      (1L, toks(1), "A"), (2L, toks(1), "A"), (3L, toks(17), "A"),
      (4L, toks(1), "B"), (5L, toks(33), "B"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source")
    val out = CorpusPipeline.sourceDrift(docs, 16).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("src_a") == "A" && r.getAs[String]("src_b") == "B")
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("tv_dist") == 0.5)
  }

  test("contaminationScore grades the overlap fraction; clean and " +
      "gram-less held-out docs keep rows with NULL/zero frac") {
    val leaked = "alpha bravo charlie delta echo foxtrot"
    val docs = docsFrom(
      0L -> s"intro words then $leaked trailing tail",  // 11 tokens → 7 distinct 5-grams, 2 leaked
      1L -> s"train copy holds $leaked inside body",
      50L -> "totally unique held out document phrasing here", // 3 grams, 0 hit
      100L -> "tiny doc",
      2L -> "unrelated training document with other words entirely")
    val out = CorpusPipeline.contaminationScore(docs).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 50L, 100L))
    val r0 = out(0)
    assert(r0.getAs[Long]("n_grams") == 7L)
    assert(r0.getAs[Long]("n_overlap") == 2L)
    assert(r0.getAs[Double]("overlap_frac") == 2.0 / 7.0)
    assert(out(1).getAs[Double]("overlap_frac") == 0.0)
    assert(out(2).getAs[Long]("n_grams") == 0L)
    assert(out(2).isNullAt(out(2).fieldIndex("overlap_frac")))
  }

  test("tokenBudgetPerSource keeps the hash-ordered prefix whose " +
      "running token total fits the budget; the crossing doc is " +
      "dropped and growth only swaps by hash rank") {
    import graft.functions.PortableText
    val P = PortableText.P
    def refOrder(id: Long): Long = ((id % P) + P) % P * 2654435761L % P
    def mk(ids: Seq[Long]) = docsFrom(ids.map(i =>
      i -> ("t " * (i % 5 + 1).toInt).trim): _*) // 1..5 tokens each
    val ids = (0L until 30L)
    val out = CorpusPipeline.tokenBudgetPerSource(mk(ids), budget = 20L)
      .select("doc_id", "n_tokens", "cum_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    // reference: walk ids in (hash, id) order and CUT at the first
    // doc that crosses the budget (prefix-cut, not greedy refill)
    var total = 0L
    val expected = ids.sortBy(i => (refOrder(i), i)).iterator.map { i =>
      val n = i % 5 + 1; total += n; (i, total)
    }.takeWhile(_._2 <= 20L).toMap
    assert(out.map(_._1).toSet == expected.keySet)
    out.foreach { case (id, n, cum) =>
      assert(n == id % 5 + 1)
      assert(cum == expected(id), s"id=$id")
    }
    assert(out.map(_._3).max <= 20L)
    // growing the corpus: kept set re-derived from the SAME hash walk
    val grownIds = ids ++ (100L until 110L)
    val grownOut = CorpusPipeline
      .tokenBudgetPerSource(mk(grownIds), budget = 20L)
      .select("doc_id").as[Long].collect().toSet
    var gTotal = 0L
    val gExpected = grownIds.sortBy(i => (refOrder(i), i)).iterator.map { i =>
      gTotal += i % 5 + 1; (i, gTotal)
    }.takeWhile(_._2 <= 20L).map(_._1).toSet
    assert(grownOut == gExpected)
  }

  test("packSequences lays docs head-to-tail per shard: offsets are " +
      "a gap-free prefix sum, bins span exactly the occupied windows, " +
      "empty docs occupy nothing") {
    val docs = docsFrom(
      (0L to 40L).map(i =>
        i -> (if (i % 7 == 0) "" else ("w " * (i % 11 + 1).toInt).trim)): _*)
    val ctx = 8
    val out = CorpusPipeline.packSequences(docs, ctxLen = ctx, nShards = 3)
      .select("doc_id", "shard", "n_tokens", "tok_start", "bin_first", "bin_last")
      .as[(Long, Int, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(out.map(_._1) == (0L to 40L))
    // Every doc in exactly one shard; shard is the multiplicative hash
    assert(out.forall(r => r._2 >= 0 && r._2 < 3))
    out.groupBy(_._2).foreach { case (_, rows) =>
      // within a shard (pack order = doc_id): gap-free prefix sum
      val inOrder = rows.sortBy(_._1)
      val starts = inOrder.scanLeft(0L)(_ + _._3).init
      assert(inOrder.map(_._4) == starts)
      inOrder.foreach { case (_, _, n, start, binF, binL) =>
        if (n == 0) assert(binF.isEmpty && binL.isEmpty)
        else {
          // bins = the ctx-windows the doc's [start, start+n) span hits
          assert(binF.contains(start / ctx))
          assert(binL.contains((start + n - 1) / ctx))
        }
      }
    }
    // all 41 docs accounted for, shards non-trivial (hash spreads them)
    assert(out.groupBy(_._2).size == 3)
  }

  test("curriculumPhases tiers by stop ratio: cleanest docs phase 1, " +
      "empty docs sink to the last phase, phases partition the corpus") {
    val docs = docsFrom(
      ((1L to 20L).map(i => i ->
        (Seq.fill(i.toInt)("the") ++ Seq.fill(20 - i.toInt)("zz"))
          .mkString(" ")) :+ (21L -> "")): _*)
    val out = CorpusPipeline.curriculumPhases(docs, 4)
      .as[(Long, Int, Option[Double], Int)].collect().toSeq
    val byId = out.map(r => r._1 -> r._4).toMap
    // doc 20 (all stopwords) must be top tier, doc 1 (1/20) bottom tier
    assert(byId(20L) == 1)
    assert(byId(1L) == 4)
    // empty doc: NULL score → last phase
    assert(out.find(_._1 == 21L).exists(r => r._3.isEmpty && r._4 == 4))
    // monotone: higher stop ratio never gets a later phase
    val ranked = out.filter(_._3.isDefined).sortBy(-_._3.get)
    assert(ranked.sliding(2).forall {
      case Seq(a, b) => a._4 <= b._4
      case _         => true
    })
    assert(out.map(_._4).distinct.sorted == Seq(1, 2, 3, 4))
  }

  test("lengthHistogram buckets by len div width with exact cumulative " +
      "shares; empty docs land in bucket 0") {
    val docs = docsFrom(
      1L -> "",                            // 0 tokens  → bucket 0
      2L -> "a b c",                       // 3 tokens  → bucket 0
      3L -> (("w " * 64).trim),            // 64 tokens → bucket 1
      4L -> (("w " * 70).trim),            // 70 tokens → bucket 1
      5L -> (("w " * 130).trim))           // 130 tokens→ bucket 2
    val out = CorpusPipeline.lengthHistogram(docs, 64)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 3L, 2L, 0.4),
      (1L, 2L, 134L, 4L, 0.8),
      (2L, 1L, 130L, 5L, 1.0)))
  }

  test("stratifiedSplit carves floor(n*pct/100) of EVERY source into " +
      "test; growing another source never reassigns this one") {
    def corpus(extra: Int) =
      ((0L until 30L).map(i => (i, s"doc $i", "big")) ++
        (100L until 110L).map(i => (i, s"doc $i", "small")) ++
        (200L until (200L + extra)).map(i => (i, s"doc $i", "other")))
        .toDF("doc_id", "text", "source")
        .selectExpr("doc_id", "text", "'en' AS lang", "source")
    val base = CorpusPipeline.stratifiedSplit(corpus(0), 10)
      .select("doc_id", "source", "split")
      .as[(Long, String, String)].collect().toSeq
    val bySource = base.groupBy(_._2)
    assert(bySource("big").count(_._3 == "test") == 3)   // 30 * 10%
    assert(bySource("small").count(_._3 == "test") == 1) // 10 * 10%
    // stability: adding a third source changes nothing for the others
    val grown = CorpusPipeline.stratifiedSplit(corpus(7), 10)
      .select("doc_id", "source", "split")
      .as[(Long, String, String)].collect().toSeq
    assert(grown.filter(_._2 != "other").toSet == base.toSet)
    assert(grown.count(r => r._2 == "other" && r._3 == "test") == 0) // 7<10
  }

  test("bloomPrefilter: exact verdict matches decontaminate (no false " +
      "negatives), candidates bound overlaps, flags consistent") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"tok$i")
    val docs0 = docsFrom((0L until 60L).map { i =>
      // every 4th doc reuses one template → guaranteed shared 3-grams
      val words =
        if (i % 4 == 0) Seq("alpha", "beta", "gamma", "delta", "eps")
        else (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size)))
      i -> words.mkString(" ")
    }: _*)
    val bloom = CorpusPipeline.bloomPrefilter(docs0, n = 3, holdoutMod = 5)
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().toSeq
    val exact = CorpusPipeline.decontaminate(docs0, n = 3, holdoutMod = 5)
      .select("doc_id", "n_overlap", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(bloom.nonEmpty)
    bloom.foreach { case (id, nGrams, nCand, nOv, nFp, cont, bloomCont) =>
      // the exact stage on candidates reproduces full decontamination
      assert((nOv, cont) == exact(id), s"doc $id")
      assert(nCand >= nOv && nCand <= nGrams, s"doc $id")
      assert(nFp == nCand - nOv, s"doc $id")
      assert(!cont || bloomCont, s"doc $id: exact hit must be a candidate")
    }
    // the template family must actually contaminate (test is live)
    assert(bloom.exists(_._6))
  }

  test("chunkDocuments: stride-placed windows cover every token, " +
      "consecutive chunks share the overlap, tail chunk is short, " +
      "empty docs emit nothing") {
    val words = (1 to 10).map(i => s"w$i")
    val docs = docsFrom(
      1L -> words.mkString(" "), // 10 tokens
      2L -> "",                  // zero tokens → no chunks
      3L -> "solo")              // single short chunk
    val out = CorpusPipeline.chunkDocuments(docs, chunkTokens = 4, overlap = 1)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().toSeq
    // doc 1: starts 0,3,6,9 (stride 3) → [1..4],[4..7],[7..10],[10]
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3) == Seq(4, 4, 4, 1))
    assert(d1.map(_._4) == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10"))
    // overlap: each full chunk's last token opens the next chunk
    d1.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4.split(' ').last == b._4.split(' ').head)
    }
    // reassembly: dropping each later chunk's first `overlap` tokens
    // reconstructs the original token stream exactly
    val rebuilt = d1.head._4.split(' ').toSeq ++
      d1.tail.flatMap(_._4.split(' ').drop(1))
    assert(rebuilt == words)
    assert(out.count(_._1 == 2L) == 0)
    assert(out.filter(_._1 == 3L).map(_._4) == Seq("solo"))
  }

  test("tokenizerFertility: exact basis-point fertility per group, " +
      "both tokenizations counted, div truncates") {
    val docs = Seq(
      // "ab cd" → 5 chars, 2 ws tokens, 2 bpe tokens
      (1L, "ab cd", "en", "s1"),
      // "a,b" → 3 chars, 1 ws token, 3 bpe tokens (a / , / b)
      (2L, "a,b", "en", "s1"),
      (3L, "xyz", "fr", "s2")) // 3 chars, 1 ws, 1 bpe
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusPipeline.tokenizerFertility(docs).collect()
    val g1 = out.find(r => r.getAs[String]("lang") == "en").get
    assert(g1.getAs[Long]("chars_total") == 8L)
    assert(g1.getAs[Long]("ws_tokens_total") == 3L)
    assert(g1.getAs[Long]("bpe_tokens_total") == 5L)
    assert(g1.getAs[Long]("ws_fertility_bp") == 3L * 10000 / 8)  // 3750
    assert(g1.getAs[Long]("bpe_fertility_bp") == 5L * 10000 / 8) // 6250
    assert(g1.getAs[Double]("chars_per_bpe_token") == 8.0 / 5.0)
    val g2 = out.find(r => r.getAs[String]("lang") == "fr").get
    assert(g2.getAs[Long]("ws_fertility_bp") == 3333L)
  }

  test("thresholdSweep: per-(source, cut) survivor counts and exact " +
      "basis-point shares") {
    // source s1: docs with 2, 3, 5 tokens; s2: one 4-token doc.
    val docs = Seq(
      (1L, "a b", "s1"), (2L, "a b c", "s1"), (3L, "a b c d e", "s1"),
      (4L, "a b c d", "s2"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source")
    val out = CorpusPipeline.thresholdSweep(docs, Seq(3L, 5L)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("min_tokens")) ->
        (r.getAs[Long]("n_docs_kept"), r.getAs[Long]("tokens_kept"),
          r.getAs[Long]("kept_share_bp"))).toMap
    assert(out(("s1", 3L)) == ((2L, 8L, 6666L)))
    assert(out(("s1", 5L)) == ((1L, 5L, 3333L)))
    assert(out(("s2", 3L)) == ((1L, 4L, 10000L)))
    assert(out(("s2", 5L)) == ((0L, 0L, 0L)))
  }

  test("lengthBucketAudit: ladder assigns the smallest covering width, " +
      "over-long docs truncate to the last width, waste is exact") {
    // token counts: 2 → bucket 4; 4 → bucket 4; 5 → bucket 8;
    // 11 → capped at 8 → bucket 8 (zero pad).
    val docs = docsFrom(
      1L -> "a b",
      2L -> "a b c d",
      3L -> "a b c d e",
      4L -> ("t " * 11).trim)
    val out = CorpusPipeline.lengthBucketAudit(docs, Seq(4, 8)).collect()
    assert(out.length == 2)
    val b4 = out(0)
    assert(b4.getAs[Int]("bucket_len") == 4)
    assert(b4.getAs[Long]("n_docs") == 2L &&
      b4.getAs[Long]("sum_tokens") == 6L)
    assert(b4.getAs[Long]("pad_slots") == 2L)
    assert(b4.getAs[Double]("waste_share") == 2.0 / 8.0)
    assert(b4.getAs[Long]("flat_pad_slots") == 10L)
    assert(b4.getAs[Double]("flat_waste_share") == 10.0 / 16.0)
    val b8 = out(1)
    assert(b8.getAs[Int]("bucket_len") == 8)
    // counts 5 + capped 8 = 13 tokens in 16 slots.
    assert(b8.getAs[Long]("n_docs") == 2L &&
      b8.getAs[Long]("sum_tokens") == 13L)
    assert(b8.getAs[Long]("pad_slots") == 3L)
    assert(b8.getAs[Double]("waste_share") == 3.0 / 16.0)
    assert(b8.getAs[Long]("flat_pad_slots") == 3L)
    assert(b8.getAs[Double]("flat_waste_share") == 3.0 / 16.0)
  }

  // ---------- F83 classifierCalibration ----------

  test("classifierCalibration: floor-binned margins (zero-aligned), " +
      "per-bin agreement re-derived from the scalar building blocks") {
    def weight(tok: String): Long = {
      val b = graft.functions.PolyHash.hash(tok) % 1024
      (b * 37 + 11) % 21 - 10
    }
    val long = "the quick brown fox jumps over a lazy dog and then " +
      "runs far away to the old barn of the tall hill"  // 21 tokens: keep
    val docs = docsFrom(
      1L -> long,
      2L -> "short stuff",
      3L -> "",
      4L -> (long + " extra trailing words here"))
    val expected = Seq(1L -> long, 2L -> "short stuff", 3L -> "",
      4L -> (long + " extra trailing words here")).map { case (id, txt) =>
      val toks = txt.split(" ").filter(_.nonEmpty)
      val margin = toks.map(weight).sum
      val label = margin >= 0
      val keep = toks.length >= 20 // rep/stop rules don't fire here
      val bin = math.max(-3L, math.min(3L,
        math.floor(margin.toDouble / 40.0).toLong))
      (bin, label, keep)
    }
    val want = expected.groupBy(_._1).map { case (bin, rs) =>
      (bin, rs.size.toLong, rs.count(_._2).toLong, rs.count(_._3).toLong,
        rs.count(r => r._2 == r._3).toLong)
    }.toSeq.sortBy(_._1)
    val out = CorpusPipeline.classifierCalibration(docs)
      .select("bin", "n_docs", "n_clf_keep", "n_rule_keep", "n_agree")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == want)
  }

  // ---------- F103 classifierAuc ----------

  test("classifierAuc equals the brute-force pair count over the " +
      "actual (margin, keep) pairs; an all-one-class source is NULL") {
    val long = "the quick brown fox jumps over a lazy dog and then " +
      "runs far away to the old barn of the tall hill"  // 21 tokens: keep
    val docs = docsFrom(
      1L -> long,                                  // keep
      2L -> (long + " extra trailing words here"), // keep
      3L -> "short stuff",                         // drop (short)
      4L -> "tiny",                                // drop (short)
      5L -> (long + " more of the filler prose"))  // keep
    // ground truth: collect the op's own inputs and count pairs
    val margins = CorpusPipeline.classifierScore(docs)
      .select("doc_id", "margin").as[(Long, Long)].collect().toMap
    val keeps = CorpusPipeline.qualityFilter(docs)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val pos = margins.keys.filter(keeps).map(margins).toSeq
    val neg = margins.keys.filterNot(keeps).map(margins).toSeq
    val nConc = pos.map(p => neg.count(_ < p).toLong).sum
    val nTied = pos.map(p => neg.count(_ == p).toLong).sum
    val wantAuc = BigDecimal((2 * nConc + nTied).toDouble
      / (2.0 * pos.size * neg.size)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = CorpusPipeline.classifierAuc(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_pos") == pos.size.toLong)
    assert(r.getAs[Long]("n_neg") == neg.size.toLong)
    assert(r.getAs[Long]("n_conc") == nConc)
    assert(r.getAs[Long]("n_tied") == nTied)
    assert(math.abs(r.getAs[Double]("auc") - wantAuc) < 1e-9,
      s"auc ${r.getAs[Double]("auc")} want $wantAuc (conc=$nConc " +
        s"tied=$nTied)")
    // degenerate: every doc keeps -> no negative class -> NULL auc
    val oneClass = CorpusPipeline.classifierAuc(docsFrom(
      1L -> long, 2L -> (long + " more of the filler prose")))
      .collect().head
    assert(oneClass.isNullAt(oneClass.fieldIndex("auc")))
  }

  // ---------- F105 decontaminationSweep ----------

  test("decontaminationSweep: a 6-token shared span flags the " +
      "held-out doc at n <= 5 but not at n = 7; overlap fraction " +
      "decreases with n") {
    val span = "alpha bravo charlie delta echo foxtrot" // 6 tokens
    val docs = Seq(
      (0L, span + " zulu yankee xray walrus victor"),  // held out (0%50)
      (1L, "prefix words here " + span + " suffix tail"),
      (2L, "unrelated training content entirely different tokens"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source")
    val out = CorpusPipeline.decontaminationSweep(docs, Seq(2, 3, 5, 7))
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(2L, 3L, 5L, 7L))
    out.foreach { r => assert(r._2 == 1L, s"one held-out doc: $r") }
    val flagged = out.map(r => r._1 -> r._3).toMap
    assert(flagged(2L) == 1L && flagged(3L) == 1L && flagged(5L) == 1L)
    assert(flagged(7L) == 0L, "no 7-gram survives a 6-token span")
    // the overlap fraction shrinks as n grows: 5 shared bigrams of
    // 10, 4 shared trigrams of 9, 2 shared 5-grams of 7, 0 of 5
    val fracs = out.map(r => r._1 -> r._5).toMap
    assert(fracs(2L) > fracs(3L) && fracs(3L) > fracs(5L)
      && fracs(5L) > fracs(7L))
    assert(fracs(7L) == 0.0)
    assert(fracs(2L) == 0.5, s"5 of 10 bigrams shared: ${fracs(2L)}")
  }

  test("decontaminationSweep is deterministic under the concurrent " +
      "per-width gram materialization (r17 optimization: the eager " +
      "checkpoints run from a thread pool)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def run() = CorpusPipeline.decontaminationSweep(docs)
      .collect().map(_.toSeq).toSeq
    assert(run() == run(),
      "concurrent gram checkpoints must not change the sweep")
  }

  // ---------- F104 mixtureTemperatureCurve ----------

  test("mixtureTemperatureCurve: T=1 is natural token share, lower T " +
      "flattens toward uniform (small sources gain, big ones lose), " +
      "weights sum to ~1 per temperature") {
    val docs = Seq(
      (1L, ("w " * 90).trim, "en", "big"),
      (2L, ("w " * 10).trim, "en", "small"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusPipeline.mixtureTemperatureCurve(docs)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out.length == 8)
    val byT = out.groupBy(_._1)
    byT.values.foreach { rows =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5, s"sum: $rows")
    }
    def w(t: Long, src: String): Double =
      byT(t).find(_._2 == src).get._4
    // T=1: natural shares 0.9 / 0.1
    assert(math.abs(w(4, "big") - 0.9) < 1e-6)
    assert(math.abs(w(4, "small") - 0.1) < 1e-6)
    // monotone flattening: the small source's weight rises as T drops
    assert(w(3, "small") > w(4, "small"))
    assert(w(2, "small") > w(3, "small"))
    assert(w(1, "small") > w(2, "small"))
    // hand value at T=1/2: sqrt(90)/(sqrt(90)+sqrt(10)), through the
    // operator's own quantization
    val (s90, s10) = (math.floor(math.sqrt(90.0) * 1e6 + 0.5),
      math.floor(math.sqrt(10.0) * 1e6 + 0.5))
    val want = BigDecimal(s10 / (s90 + s10)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(w(2, "small") - want) < 1e-9)
  }

  // ---------- F81 curationAttribution ----------

  test("curationAttribution: the 2x2 quality x dup matrix per source " +
      "with every cell populated") {
    val long = "the quick brown fox jumps over a lazy dog and then " +
      "runs far away to the old barn of the tall hill"  // 21 tokens
    val docs = Seq(
      (1L, long, "en", "A"),          // clean
      (2L, long, "en", "A"),          // exact dup of 1 → dup_only
      (3L, "too short here", "en", "A"), // quality_only
      (4L, "x y z", "en", "B"),       // quality_only (first of the pair)
      (5L, "x y z", "en", "B"))       // both: short AND a later dup
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusPipeline.curationAttribution(docs)
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(out == Seq(
      ("A", 3L, 1L, 1L, 1L, 0L, 1.0 / 3.0),
      ("B", 2L, 0L, 1L, 0L, 1L, 0.0)))
  }

  // ---------- F80 corpusDelta ----------

  test("corpusDelta classifies added/removed/changed/unchanged by " +
      "content fingerprint and attributes to the new side's source") {
    val oldSnap = Seq(
      (2L, "x", "en", "A"), (4L, "y", "en", "A"), (6L, "z", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
    val newSnap = Seq(
      (2L, "x", "en", "A"),   // unchanged
      (4L, "y2", "en", "A"),  // changed content
      (8L, "w", "en", "B"))   // added
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusPipeline.corpusDelta(oldSnap, newSnap)
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(out == Seq(
      ("A", 0L, 0L, 1L, 1L, 2L, 0.5),
      ("B", 1L, 1L, 0L, 0L, 2L, 1.0))) // doc 6 removed, doc 8 added
  }

  // ---------- F77 hashedTfVectors ----------

  test("hashedTfVectors: exact bucket counts, zero vector for empty " +
      "docs, profile scalars re-derive from the vector") {
    val dim = 4
    def bucket(tok: String): Int =
      (graft.functions.PolyHash.hash(tok) % dim).toInt
    val docs = docsFrom(1L -> "x y x", 2L -> "")
    val vecs = CorpusPipeline.hashedTfVectors(docs, dim)
      .as[(Long, Seq[Long])].collect().toMap
    val expected = Array.fill(dim)(0L)
    expected(bucket("x")) += 2L; expected(bucket("y")) += 1L
    assert(vecs(1L) == expected.toSeq)
    assert(vecs(2L) == Seq.fill(dim)(0L))
    val prof = CorpusPipeline.textEmbedProfile(docs, dim)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val chk = expected.zipWithIndex.map { case (c, j) => (j + 1) * c * c }.sum
    assert(prof(1L) == (1L, 3L, expected.count(_ > 0).toLong, chk,
      math.sqrt(expected.map(c => c * c).sum.toDouble)))
    assert(prof(2L) == (2L, 0L, 0L, 0L, 0.0))
  }

  test("hashedTfVectors composes with the ANN family: identical docs " +
      "are each other's top cosine neighbor") {
    val docs = docsFrom(
      0L -> "alpha beta gamma",
      1L -> "alpha beta gamma",          // identical to doc 0
      2L -> "delta epsilon zeta eta")
    val emb = CorpusPipeline.hashedTfVectors(docs, 8)
      .selectExpr("doc_id AS vec_id",
        "transform(vec, x -> CAST(x AS FLOAT)) AS embedding")
    val top = graft.operators.Vectors.bruteForceKnn(emb, 3, 1, 8)
      .as[(Long, Long, Int, Double)].collect()
      .map(r => r._1 -> (r._2, r._4)).toMap
    assert(top(0L) == ((1L, 1.0)) && top(1L) == ((0L, 1.0)))
    assert(top(2L)._2 < 1.0)
  }

  // ---------- F76 ksDrift ----------

  test("ksDrift: sup of the exact one-vs-rest CDF gap with its " +
      "location; lens absent from a source still enter its CDF") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // source A lens [2, 2, 4]; source B lens [4, 6]:
    //   len 2: F_A = 2/3, F_B = 0   → gap 2/3  (the sup, both sides)
    //   len 4: F_A = 1,   F_B = 1/2 → gap 1/2
    //   len 6: 1 vs 1               → gap 0
    val docs = Seq(
      (1L, words(2), "en", "A"), (2L, words(2), "en", "A"),
      (3L, words(4), "en", "A"),
      (4L, words(4), "en", "B"), (5L, words(6), "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusPipeline.ksDrift(docs)
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("A", 3L, 2L, 2.0 / 3.0, 2L),
      ("B", 2L, 3L, 2.0 / 3.0, 2L)))
  }

  // ---------- F75 waterfillAllocation ----------

  test("waterfillAllocation: level funds small sources fully, caps the " +
      "large one, reports the floor remainder as slack; over-budget " +
      "gives NULL level and surplus slack") {
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    // per-source avail: a=10, b=25, c=70 → total 105
    val docs = Seq(
      (1L, words("a", 10), "en", "srcA"),
      (2L, words("b", 25), "en", "srcB"),
      (3L, words("c", 70), "en", "srcC"))
      .toDF("doc_id", "text", "lang", "source")
    // pct 41 → budget 105·41 div 100 = 43; band at srcB (j=2):
    // 43−10 = 33 ≤ 25·2 → λ = 33 div 2 = 16; alloc 10+16+16 = 42,
    // slack 1 (the floor remainder is REPORTED, not re-spread).
    val out = CorpusPipeline.waterfillAllocation(docs, 41)
      .as[(String, Long, Long, Boolean, Option[Long], Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      ("srcA", 10L, 10L, true, Some(16L), 43L, 1L),
      ("srcB", 25L, 16L, false, Some(16L), 43L, 1L),
      ("srcC", 70L, 16L, false, Some(16L), 43L, 1L)))
    // pct 120 → budget 126 > corpus: no band, NULL level, surplus 21.
    val over = CorpusPipeline.waterfillAllocation(docs, 120)
      .as[(String, Long, Long, Boolean, Option[Long], Long, Long)]
      .collect().toSeq
    assert(over == Seq(
      ("srcA", 10L, 10L, true, None, 126L, 21L),
      ("srcB", 25L, 25L, true, None, 126L, 21L),
      ("srcC", 70L, 70L, true, None, 126L, 21L)))
  }

  // ---------- F73 classifierScore ----------

  test("classifierScore: margins are the exact sum of bucket weights, " +
      "repeated tokens count per occurrence, empty docs keep zero") {
    // nBuckets = 7 forces collisions; weights re-derived here from the
    // same PolyHash + formula the operator uses.
    def weight(tok: String): Long = {
      val b = graft.functions.PolyHash.hash(tok) % 7
      (b * 37 + 11) % 21 - 10
    }
    val docs = docsFrom(
      1L -> "good text here",
      2L -> "",                 // zero tokens
      3L -> "good good")        // occurrence-weighted, not distinct
    val out = CorpusPipeline.classifierScore(docs, nBuckets = 7)
      .as[(Long, Long, Long, Option[Double], Boolean)].collect().toSeq
    val m1 = weight("good") + weight("text") + weight("here")
    val m3 = 2 * weight("good")
    assert(out == Seq(
      (1L, 3L, m1, Some(m1.toDouble / 3.0), m1 >= 0),
      (2L, 0L, 0L, None, true),
      (3L, 2L, m3, Some(m3.toDouble / 2.0), m3 >= 0)))
  }

  private def srcDocs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "source")

  test("splitNameJvm/hashOrderJvm equal the Column spellings on a " +
      "grid including negative and multi-billion ids") {
    import graft.operators.CorpusPipeline
    val ids = Seq(-5000000000L, -1L, 0L, 1L, 99L, 1000000006L,
      1000000007L, 3500000001L, 5000000000L) ++
      (1L to 50L).map(_ * 987654321L)
    val fromCol = ids.toDF("doc_id")
      .selectExpr("doc_id", "'x' AS text", "'en' AS lang", "'s' AS source")
    val colSplit = CorpusPipeline.hashSplit(fromCol)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    ids.foreach { id =>
      assert(CorpusPipeline.splitNameJvm(id) == colSplit(id), s"id=$id")
    }
  }

  test("releaseManifest: checksum is order/partition-free, content-" +
      "sensitive, and counts reconcile with the split carve") {
    import graft.operators.CorpusPipeline
    val rows = (1L to 40L).map(i => (i, s"doc number $i words"))
    val base = CorpusPipeline.releaseManifest(docsFrom(rows: _*))
      .collect().map(r => (r.getAs[String]("split"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("content_checksum"))).toSeq
    assert(base.map(_._2).sum == 40L)
    assert(base.map(_._3).sum == 40L * 4)
    // same docs, shuffled arrival order + different partitioning ⇒
    // identical manifest (the multiset attestation property)
    val shuffled = CorpusPipeline.releaseManifest(
      docsFrom(rows.reverse: _*).repartition(7))
      .collect().map(r => (r.getAs[String]("split"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("content_checksum"))).toSeq
    assert(shuffled == base)
    // one changed character in one doc ⇒ that split's checksum moves
    val tampered = CorpusPipeline.releaseManifest(docsFrom(
      (rows.init :+ (40L, "doc number 40 wordz")): _*))
      .collect().map(r => (r.getAs[String]("split"),
        r.getAs[Long]("content_checksum"))).toMap
    val baseMap = base.map(r => r._1 -> r._4).toMap
    assert(tampered != baseMap)
    assert((tampered.keySet == baseMap.keySet) &&
      tampered.count { case (k, v) => baseMap(k) != v } == 1)
  }

  test("sourceKl: hand-computed KL against the corpus unigram mix; " +
      "identical-mix sources report 0") {
    // A: [x, x, y], B: [x, y, y, y] ⇒ N=7, c_x=3, c_y=4
    // KL_A = 2/3·ln(2·7/(3·3)) + 1/3·ln(1·7/(3·4))
    // KL_B = 1/4·ln(1·7/(4·3)) + 3/4·ln(3·7/(4·4))
    val out = CorpusPipeline.sourceKl(srcDocs(
      (1L, "A", "x x y"), (2L, "B", "x y y y")))
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_terms"),
        r.getAs[Double]("kl"))).toSeq
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val klA = 2.0 / 3 * math.log(14.0 / 9) + 1.0 / 3 * math.log(7.0 / 12)
    val klB = 1.0 / 4 * math.log(7.0 / 12) + 3.0 / 4 * math.log(21.0 / 16)
    assert(out == Seq(("A", 3L, 2L, r4(klA)), ("B", 4L, 2L, r4(klB))))
    // two sources with the SAME unigram mix sit exactly at the
    // corpus marginal ⇒ every ln term is ln(1) = 0
    val same = CorpusPipeline.sourceKl(srcDocs(
      (1L, "A", "x y"), (2L, "B", "x y")))
      .collect().map(_.getAs[Double]("kl"))
    assert(same.toSeq == Seq(0.0, 0.0))
  }

  test("lexicalDiversity: exact counts, ratios, and per-doc TTR mean; " +
      "zero-token docs drop from the doc-grain mean") {
    // source A: docs "a a b" (ttr 2/3) and "c" (ttr 1), plus an
    // empty doc (no tokens — excluded from mean_doc_ttr)
    // ⇒ n_tokens 4, types {a:2, b:1, c:1} ⇒ n_types 3, hapax {b, c}
    val out = CorpusPipeline.lexicalDiversity(srcDocs(
      (1L, "A", "a a b"), (2L, "A", "c"), (3L, "A", ""),
      (4L, "B", "z z")))
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Long]("n_hapax"), r.getAs[Double]("type_token_ratio"),
        r.getAs[Double]("hapax_share"), r.getAs[Double]("mean_doc_ttr")))
      .toSeq
    assert(out == Seq(
      ("A", 4L, 3L, 2L, 0.75, 2.0 / 3.0, 0.8333),
      ("B", 2L, 1L, 0L, 0.5, 0.0, 0.5)))
  }

  test("heldOutPerplexity: trains ONLY on the train split, scores " +
      "ONLY the val split, Laplace mass for OOV tokens; test-split " +
      "docs never scored") {
    def key(i: Long) = CorpusPipeline.hashOrderJvm(i) % 100
    val trainId = (1L to 500L).find(key(_) < 80).get
    val valId = (1L to 500L).find(i => key(i) >= 80 && key(i) < 90).get
    val testId = (1L to 500L).find(key(_) >= 90).get
    // train corpus: "a a b" → c(a)=2, c(b)=1, N=3, V=2
    // val doc "a c": nll(a) = −(ln 3 − ln 5), nll(c OOV) = −(ln 1 − ln 5)
    val df = docsFrom((trainId, "a a b"), (valId, "a c"),
      (testId, "zzz"))
    val out = CorpusPipeline.heldOutPerplexity(df).collect()
    assert(out.length == 1 && out.head.getLong(0) == valId,
      "only the val split is scored")
    assert(out.head.getLong(1) == 2L && out.head.getLong(2) == 1L)
    val expect = math.rint(
      ((-(math.log(3.0) - math.log(5.0))) +
        (-(math.log(1.0) - math.log(5.0)))) / 2 * 1e4) / 1e4
    assert(math.abs(out.head.getDouble(3) - expect) < 1e-9)
  }

  test("weightedSample: exactly k per source, zero-token docs " +
      "excluded, es_key replays the hash formula bit-exactly (an " +
      "auditable draw, not a seedless one)") {
    val rows = (1L to 30L).map(i =>
        (i, ("w " * i.toInt).trim, "en", if (i <= 15) "a" else "b")) ++
      Seq((31L, "", "en", "a")) // zero tokens → excluded
    val df = rows.toDF("doc_id", "text", "lang", "source")
    val out = CorpusPipeline.weightedSample(df, 5).collect()
    val bySrc = out.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(bySrc("a") == 5 && bySrc("b") == 5)
    assert(!out.exists(_.getLong(2) == 31L))
    // replay: es_key(doc) == ln((h+1)/(P+1)) / n_tokens exactly
    val p = graft.functions.PortableText.P
    out.foreach { r =>
      val h = CorpusPipeline.hashOrderJvm(r.getLong(2))
      val expect = math.log((h + 1).toDouble / (p + 1).toDouble) /
        r.getLong(3).toDouble
      assert(r.getDouble(4) == expect, s"doc ${r.getLong(2)}")
    }
    // determinism: a second run returns the identical sample
    val again = CorpusPipeline.weightedSample(df, 5).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
