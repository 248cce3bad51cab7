package graft

import graft.operators.{Curation, Vectors}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---------- F22 lineDedup ----------

  private def docsFrom(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("lineDedup drops lines above the df threshold, keeps order, " +
      "and reports empty docs") {
    val banner = "accept cookies to continue"
    val docs = docsFrom(
      1L -> s"$banner\nunique first line\nsecond line",
      2L -> s"$banner\nanother doc body",
      3L -> s"$banner\nthird body\nthird tail",
      4L -> "")
    // banner df=3 of 4 docs -> 75% > 50% -> dropped everywhere
    val out = Curation.lineDedup(docs, "\n", 50)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, "unique first line\nsecond line"),
      (2L, 2L, 1L, "another doc body"),
      (3L, 3L, 2L, "third body\nthird tail"),
      (4L, 0L, 0L, "")))
  }

  test("lineDedup: a line in exactly half the docs is KEPT (<=), and " +
      "within-doc repeats count once toward df but are kept in place") {
    val docs = docsFrom(
      1L -> "half\nhalf\nown",   // 'half' twice in doc 1: df still 2
      2L -> "half\nother",
      3L -> "solo three",
      4L -> "solo four")
    // 'half' df=2 of 4 -> 2*100 <= 4*50 -> kept; both copies survive
    val out = Curation.lineDedup(docs, "\n", 50)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out.head == (1L, 3L, 3L, "half\nhalf\nown"))
    assert(out(1) == (2L, 2L, 2L, "half\nother"))
  }

  test("lineDedup treats the delimiter literally (regex metachar safe)") {
    val docs = docsFrom(1L -> "a.b", 2L -> "a.c")
    // delim '.' must split into lines a|b, not regex-any-char
    val out = Curation.lineDedup(docs, ".", 50)
      .as[(Long, Long, Long, String)].collect().toSeq
    // 'a' df=2 of 2 -> 100% > 50% dropped; b and c kept
    assert(out == Seq((1L, 2L, 1L, "b"), (2L, 2L, 1L, "c")))
  }

  // ---------- F23 piiScrub ----------

  test("piiScrub redacts emails, IPs and phones with independent counts") {
    val docs = docsFrom(
      1L -> "contact john.doe@example.com or jane_x@sub.domain.org today",
      2L -> "server 192.168.0.1 and 10.0.255.99 port open",
      3L -> "call 555-1234 then 555-0000",
      4L -> "no pii in this document at all")
    val out = Curation.piiScrub(docs)
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2, 0, 0, "contact <EMAIL> or <EMAIL> today"),
      (2L, 0, 2, 0, "server <IP> and <IP> port open"),
      (3L, 0, 0, 2, "call <PHONE> then <PHONE>"),
      (4L, 0, 0, 0, "no pii in this document at all")))
  }

  test("piiScrub: word boundaries stop partial matches") {
    val docs = docsFrom(
      1L -> "version v1.2.3.4x is not an ip",  // trailing x kills \b
      2L -> "item 1234-5678 is not a phone")   // 4-3 grouping mismatch
    val out = Curation.piiScrub(docs)
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out(0)._3 == 0 && out(0)._5.contains("v1.2.3.4x"))
    assert(out(1)._4 == 0 && out(1)._5.contains("1234-5678"))
  }

  // ---------- F79 boilerplateReport ----------

  test("boilerplateReport: within-source df threshold flags the " +
      "shared footer, the df>=2 guard spares single-doc sources, " +
      "line-less sources report NULL share") {
    val docs = Seq(
      (1L, "FOOTER\ncontent one", "en", "A"),
      (2L, "FOOTER\ncontent two", "en", "A"),
      (3L, "unique text", "en", "A"),
      (4L, "FOOTER\nFOOTER\nsolo", "en", "B"), // df=1 (one doc) → spared
      (5L, "", "en", "C"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Curation.boilerplateReport(docs, "\n", 30)
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    assert(out == Seq(
      // FOOTER: df 2 of 3 docs (67% ≥ 30%) → boiler; 2 of 5
      // occurrences are boilerplate
      ("A", 3L, 4L, 1L, 5L, 2L, Some(0.4)),
      // same-line repetition inside ONE doc is df=1 → not boilerplate
      ("B", 1L, 2L, 0L, 3L, 0L, Some(0.0)),
      ("C", 1L, 0L, 0L, 0L, 0L, None)))
  }

  // ---------- F24 kmeansAssign ----------

  private def embFrom(rows: (Long, Array[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("kmeansAssign separates well-separated groups and is " +
      "deterministic across runs") {
    // vec 0 seeds cluster 0 (low region), vec 1 seeds cluster 1 (high).
    val rows = Seq(
      0L -> Array(0.0f, 0.1f, 0.0f, 0.1f),
      1L -> Array(9.0f, 9.1f, 9.0f, 9.1f),
      2L -> Array(0.2f, 0.0f, 0.1f, 0.0f),
      3L -> Array(8.9f, 9.0f, 9.2f, 9.0f),
      4L -> Array(0.1f, 0.2f, 0.2f, 0.1f),
      5L -> Array(9.1f, 8.8f, 9.0f, 9.3f))
    val run1 = Vectors.kmeansAssign(embFrom(rows: _*), k = 2, iters = 3,
      scale = 32, dim = 4).as[(Long, Int, Double)].collect().toSeq
    val run2 = Vectors.kmeansAssign(embFrom(rows: _*), k = 2, iters = 3,
      scale = 32, dim = 4).as[(Long, Int, Double)].collect().toSeq
    assert(run1 == run2)
    assert(run1.map(r => r._1 -> r._2).toMap ==
      Map(0L -> 0, 2L -> 0, 4L -> 0, 1L -> 1, 3L -> 1, 5L -> 1))
    assert(run1.forall(_._3 >= 0.0))
  }

  test("kmeansAssign: an emptied cluster keeps its centroid (duplicate " +
      "init vectors tie to the lower cluster)") {
    // vec 2 duplicates vec 0, so cluster 2 loses every member in round
    // 1 (ties go to cluster 0) — the update must not divide by zero or
    // drop the centroid.
    val rows = Seq(
      0L -> Array(1.0f, 1.0f),
      1L -> Array(5.0f, 5.0f),
      2L -> Array(1.0f, 1.0f),
      3L -> Array(5.1f, 4.9f))
    val out = Vectors.kmeansAssign(embFrom(rows: _*), k = 3, iters = 2,
      scale = 32, dim = 2).as[(Long, Int, Double)].collect().toSeq
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map(0L -> 0, 2L -> 0, 1L -> 1, 3L -> 1))
  }

  test("clusterAudit aggregates the assignment: sizes partition the " +
      "corpus, rep is the lowest member id, stats are consistent") {
    val rows = Seq(
      0L -> Array(0.0f, 0.1f, 0.0f, 0.1f),
      1L -> Array(9.0f, 9.1f, 9.0f, 9.1f),
      2L -> Array(0.2f, 0.0f, 0.1f, 0.0f),
      3L -> Array(8.9f, 9.0f, 9.2f, 9.0f),
      4L -> Array(0.1f, 0.2f, 0.2f, 0.1f),
      5L -> Array(9.1f, 8.8f, 9.0f, 9.3f))
    val asg = Vectors.kmeansAssign(embFrom(rows: _*), k = 2, iters = 3,
      scale = 32, dim = 4).as[(Long, Int, Double)].collect().toSeq
    val audit = Vectors.clusterAudit(embFrom(rows: _*), k = 2, iters = 3,
      scale = 32, dim = 4)
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    assert(audit.map(_._1) == Seq(0, 1))
    assert(audit.map(_._2).sum == rows.size)
    audit.foreach { case (c, n, rep, sse, mean, mx) =>
      val members = asg.filter(_._2 == c)
      assert(n == members.size)
      assert(rep == members.map(_._1).min)
      assert(math.abs(sse - members.map(_._3).sum) < 1e-3)
      assert(mx == members.map(_._3).max)
      assert(mean <= mx && mean >= 0)
    }
  }

  test("kmeansAssign requires init ids 0..k-1") {
    val rows = Seq(5L -> Array(1.0f, 2.0f))
    val e = intercept[IllegalArgumentException] {
      Vectors.kmeansAssign(embFrom(rows: _*), k = 2, iters = 1,
        scale = 32, dim = 2)
    }
    assert(e.getMessage.contains("init"))
  }

  // ---------- F82 labelSeparability ----------

  test("labelSeparability: law-of-total-variance decomposition on " +
      "exact quantized sums — the separating dimension scores high, " +
      "the overlapping one low") {
    // dim 0: label 0 → {0, 1}, label 1 → {4, 5}: total var 4.25,
    // within 0.25 → Fisher 16. dim 1: {5, 7} vs {6, 8}: total 1.25,
    // within 1 → Fisher 0.25.
    val emb = Seq(
      (0, Array(0.0f, 5.0f)), (0, Array(1.0f, 7.0f)),
      (1, Array(4.0f, 6.0f)), (1, Array(5.0f, 8.0f)))
      .toDF("label", "embedding")
    val out = Vectors.labelSeparability(emb, dim = 2)
      .as[(Int, Long, Double, Double, Option[Double])].collect().toSeq
    assert(out == Seq(
      (0, 4L, 4.25, 0.25, Some(16.0)),
      (1, 4L, 1.25, 1.0, Some(0.25))))
  }

  // ---------- F72 semanticDedup ----------

  test("semanticDedup drops the higher id of a near-parallel " +
      "within-cluster pair, keeps dissimilar mates, never drops a " +
      "zero vector") {
    val rows = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f, 0.0f),   // seeds cluster 0
      1L -> Array(0.0f, 9.0f, 9.0f, 0.0f),   // seeds cluster 1
      2L -> Array(2.0f, 0.0f, 0.0f, 0.01f),  // ∥ vec 0 → dropped
      3L -> Array(0.0f, 8.5f, 9.2f, 0.0f),   // ≈∥ vec 1 → dropped
      4L -> Array(0.0f, 0.0f, 0.0f, 1.0f),   // ⊥ cluster-0 mates → kept
      6L -> Array(0.0f, 0.0f, 0.0f, 0.0f))   // zero norm → NULL cs, kept
    val out = Vectors.semanticDedup(embFrom(rows: _*), tau = 0.9, k = 2,
      iters = 2, scale = 32, dim = 4)
      .as[(Long, Int, Long, Option[Double], Boolean)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L, 6L))
    // verdicts: exactly the two near-parallel higher ids drop
    assert(out.filter(_._5).map(_._1) == Seq(2L, 3L))
    assert(byId(2L)._3 == 1L && byId(3L)._3 == 1L)
    assert(byId(2L)._4.get > 0.99 && byId(3L)._4.get > 0.99)
    // lowest id of each cluster has no lower-id mate → NULL max_sim
    assert(byId(0L)._4.isEmpty && byId(1L)._4.isEmpty)
    // orthogonal mate: pairs exist but none qualify
    assert(byId(4L)._3 == 0L && byId(4L)._4.get < 0.1)
    // zero vector: every cosine NULL-guarded, never flagged
    assert(byId(6L)._3 == 0L && byId(6L)._4.isEmpty && !byId(6L)._5)
  }

  // ---------- F9c repeatedSpans ----------

  test("repeatedSpans scores looped passages that token-level " +
      "repetition misses") {
    val passage = "alpha beta gamma delta"
    val looped = (Seq.fill(5)(passage)).mkString(" ")   // 20 tokens, 4 distinct
    val varied = "one two three four five six seven eight nine ten"
    val docs = Seq(1L -> looped, 2L -> varied, 3L -> "too short")
      .toDF("doc_id", "text")
    val out = graft.operators.TextDedup.repeatedSpans(docs, 3)
      .as[(Long, Int, Int, Option[Double])].collect().toSeq
    // looped: 18 grams, only 4 distinct (the cycle's rotations)
    assert(out(0)._2 == 18 && out(0)._3 == 14)
    assert(out(0)._4.get > 0.7)
    // varied: 8 grams, all distinct
    assert(out(1) == ((2L, 8, 0, Some(0.0))))
    // 2 tokens -> no 3-grams -> NULL ratio
    assert(out(2) == ((3L, 0, 0, None)))
  }

  // ---------- F24b clusterBalancedSample ----------

  test("clusterBalancedSample caps each cluster and agrees with the " +
      "assignment it samples from") {
    val rows = Seq(
      0L -> Array(0.0f, 0.1f, 0.0f, 0.1f),
      1L -> Array(9.0f, 9.1f, 9.0f, 9.1f),
      2L -> Array(0.2f, 0.0f, 0.1f, 0.0f),
      3L -> Array(8.9f, 9.0f, 9.2f, 9.0f),
      4L -> Array(0.1f, 0.2f, 0.2f, 0.1f),
      5L -> Array(9.1f, 8.8f, 9.0f, 9.3f),
      6L -> Array(0.0f, 0.3f, 0.1f, 0.2f))
    val asg = Vectors.kmeansAssign(embFrom(rows: _*), k = 2, iters = 2,
      scale = 32, dim = 4).select("vec_id", "cluster")
      .as[(Long, Int)].collect().toMap
    val capped = Vectors.clusterBalancedSample(embFrom(rows: _*), cap = 2,
      k = 2, iters = 2, scale = 32, dim = 4)
      .as[(Long, Int, Int)].collect().toSeq
    val perCluster = capped.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perCluster.values.forall(_ <= 2), perCluster)
    assert(perCluster == Map(0 -> 2, 1 -> 2))  // 4 low / 3 high, both capped
    assert(capped.forall(r => asg(r._1) == r._2))
    assert(capped.forall(r => r._3 >= 1 && r._3 <= 2))
  }

  // ---------- F17b semDecontaminate ----------

  test("semDecontaminate flags held-out vectors with a near-duplicate " +
      "on the training side, reports clean ones with NULL max_cos") {
    // holdoutMod=2: even ids held out, odd ids train. vec 1 is vec 0
    // scaled 2x (same direction -> same bucket, cos 1); vec 2 points
    // the opposite way — complementary LSH bucket, no train neighbor.
    // Components chosen so no hyperplane dot is exactly zero (a zero
    // dot puts a vector and its scaled twin on different sides).
    val rows = Seq(
      0L -> Array(0.3f, 1.0f, 0.7f, 0.2f),
      1L -> Array(0.6f, 2.0f, 1.4f, 0.4f),
      2L -> Array(-0.3f, -1.0f, -0.7f, -0.2f),
      3L -> Array(0.3f, 1.0f, 0.7f, 0.25f))
    val out = Vectors.semDecontaminate(embFrom(rows: _*), minCos = 0.5,
      holdoutMod = 2, nPlanes = 8, dim = 4)
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(0L, 2L))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(0L)._4 && m(0L)._2 >= 1 && m(0L)._3.get > 0.99)
    assert(m(2L) == ((2L, 0L, None, false)))
  }

  // ---------- F27 pqEncode ----------

  test("pqEncode: codebook vectors code to themselves, the query's ADC " +
      "to itself is zero, and a code made of codebook subvectors has " +
      "ADC == exact distance") {
    val rows = Seq(
      0L -> Array(0.0f, 0.0f, 5.0f, 5.0f),
      1L -> Array(9.0f, 9.0f, 1.0f, 1.0f),
      2L -> Array(0.1f, -0.1f, 1.2f, 0.9f)) // sub0 near vec0, sub1 near vec1
    val out = Vectors.pqEncode(embFrom(rows: _*), nSub = 2, subDim = 2,
      k = 2, queryId = 0L)
      .as[(Long, String, Double, Double)].collect()
    val m = out.map(r => r._1 -> r).toMap
    assert(m(0L)._2 == "0,0" && m(1L)._2 == "1,1")
    assert(m(0L)._3 == 0.0 && m(0L)._4 == 0.0)
    assert(m(2L)._2 == "0,1")
    // vec1's subvectors ARE its codebook entries, so the asymmetric
    // distance is the true distance
    assert(m(1L)._3 == m(1L)._4)
    assert(out.forall(_._3 >= 0.0))
  }

  test("pqEncode codes match a pure-Scala left-to-right reference on " +
      "random vectors (native graft_pqcodes parity)") {
    val rnd = new scala.util.Random(11)
    val nSub = 4; val subDim = 4; val k = 8
    val rows = (0L until 60L).map(i =>
      i -> Array.fill(nSub * subDim)((rnd.nextFloat() - 0.5f) * 3f))
    val byId = rows.toMap
    def expectedCodes(v: Array[Float]): Seq[Int] =
      (0 until nSub).map { s =>
        val scores = (0 until k).map { j =>
          val c = byId(j.toLong).slice(s * subDim, (s + 1) * subDim)
          var cc = 0.0; var dot = 0.0
          for (i <- 0 until subDim) {
            cc += c(i).toDouble * c(i).toDouble
            dot += v(s * subDim + i).toDouble * c(i).toDouble
          }
          cc - 2.0 * dot
        }
        scores.indexOf(scores.min)
      }
    val out = Vectors.pqEncode(embFrom(rows: _*), nSub, subDim, k, 0L)
      .as[(Long, String, Double, Double)].collect()
    out.foreach { r =>
      assert(r._2 == expectedCodes(byId(r._1)).mkString(","), s"vec ${r._1}")
    }
  }

  test("pqEncode requires the codebook ids and the query id") {
    val rows = Seq(0L -> Array(1.0f, 2.0f))
    val e1 = intercept[IllegalArgumentException] {
      Vectors.pqEncode(embFrom(rows: _*), nSub = 1, subDim = 2, k = 2)
    }
    assert(e1.getMessage.contains("codebook"))
    val e2 = intercept[IllegalArgumentException] {
      Vectors.pqEncode(embFrom(rows: _*), nSub = 1, subDim = 2, k = 1,
        queryId = 7L)
    }
    assert(e2.getMessage.contains("query"))
  }

  // ---------- randomized invariants (fixed seed) ----------

  test("kmeansAssign is invariant under physical row order (the " +
      "quantized update sums are reduction-order-free)") {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 120L).map(i =>
      i -> Array.fill(8)((rnd.nextFloat() - 0.5f) * 4f))
    val a = Vectors.kmeansAssign(embFrom(rows: _*), k = 4, iters = 3,
      scale = 32, dim = 8).as[(Long, Int, Double)].collect().toSeq
    val b = Vectors.kmeansAssign(
      embFrom(rnd.shuffle(rows): _*).repartition(7), k = 4, iters = 3,
      scale = 32, dim = 8).as[(Long, Int, Double)].collect().toSeq
    assert(a == b)
  }

  test("quantizeInt8 reconstruction error stays under half a code " +
      "step on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 100L).map(i =>
      i -> Array.fill(6)((rnd.nextFloat() - 0.5f) * 10f))
    val perDim = (0 until 6).map(d => rows.map(_._2(d)))
    val maxStep = perDim.map(v => (v.max - v.min) / 255.0).max
    val out = Vectors.quantizeInt8(embFrom(rows: _*), dim = 6)
      .as[(Long, Long, Double, Double)].collect()
    // rounded-to-6-decimals output vs the exact bound: allow 1e-6
    assert(out.forall(_._3 <= maxStep / 2 + 1e-6))
    assert(out.forall(r => r._4 <= r._3))
  }

  // ---------- F25 quantizeInt8 ----------

  test("quantizeInt8 codes by corpus min/max, zero-codes constant " +
      "dims, and bounds reconstruction error by half a step") {
    val rows = Seq(
      0L -> Array(0.0f, 5.0f),
      1L -> Array(1.0f, 5.0f),
      2L -> Array(0.5f, 5.0f))
    val out = Vectors.quantizeInt8(embFrom(rows: _*), dim = 2)
      .as[(Long, Long, Double, Double)].collect().toSeq
    // dim0 range [0,1]: codes 0 / 255 / 128; dim1 constant -> 0.
    assert(out.map(r => r._1 -> r._2) == Seq(0L -> 0L, 1L -> 255L, 2L -> 128L))
    // exact endpoints reconstruct exactly; the midpoint's error is
    // |0.5 - 128/255| ~ 0.00196, under half a step (1/255/2 + eps)
    assert(out(0)._3 == 0.0 && out(1)._3 == 0.0)
    // max_err is emitted rounded to 6 decimals — allow that last-digit
    // round-up past the exact half-step bound
    assert(out(2)._3 > 0.0 && out(2)._3 <= 0.5 / 255 + 1e-6)
    assert(out.forall(r => r._4 <= r._3))
  }

  test("kAnonymityAudit: classes form on the generalized tuple, " +
      "at_risk flags exactly the sub-k classes, bucket edges split") {
    import graft.operators.Curation
    // n_chars drives the bucket: width 10 ⇒ 9 and 10 land in
    // different classes even with identical (source, lang)
    val docs = Seq(
      (1L, "s1", "en", 9), (2L, "s1", "en", 5),   // bucket 0: 2 docs
      (3L, "s1", "en", 10),                       // bucket 1: 1 doc
      (4L, "s2", "de", 15), (5L, "s2", "de", 12)) // bucket 1: 2 docs
      .toDF("doc_id", "source", "lang", "n_chars")
    val out = Curation.kAnonymityAudit(docs, k = 2, sizeBucket = 10)
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("s1", "en", 0L, 2L, false),
      ("s1", "en", 1L, 1L, true),
      ("s2", "de", 1L, 2L, false)))
  }
}
