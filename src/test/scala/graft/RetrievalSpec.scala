package graft

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docsFrom(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source")

  // N=3: df(apple)=1 → w=3000, df(banana)=2 → w=1500.
  private val corpus = docsFrom(
    1L -> "apple banana apple",
    2L -> "banana cherry",
    3L -> "durian")

  test("termSearch ranks by quantized tf-idf: rare terms outweigh " +
      "common, zero-hit docs excluded, missing query terms inert") {
    val out = Retrieval.termSearch(corpus, "apple banana nosuchterm", k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1, 1L, 2L, 2 * 3000L + 1 * 1500L), // tf(apple)=2, tf(banana)=1
      (2, 2L, 1L, 1500L)))                // doc 3 never appears
  }

  test("termSearch tie-breaks equal scores by doc_id and honors k") {
    val tied = docsFrom(
      5L -> "kiwi mango",
      2L -> "kiwi mango",
      9L -> "kiwi")
    val out = Retrieval.termSearch(tied, "kiwi mango", k = 2)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((1, 2L), (2, 5L)))
  }

  test("bm25Search length-normalizes: with equal tf the shorter doc " +
      "outranks the longer; tf saturates instead of growing linearly; " +
      "zero-hit docs excluded") {
    // doc 1 short, doc 2 long pad, both tf(kiwi)=1; doc 3 tf(kiwi)=3
    val corpus3 = docsFrom(
      1L -> "kiwi mango",
      2L -> ("kiwi " + Seq.fill(38)("pad").mkString(" ")),
      3L -> "kiwi kiwi kiwi pear")
    val out = Retrieval.bm25Search(corpus3, "kiwi", k = 10)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(3L, 1L, 2L),
      s"high-tf first, then shorter of the tf-1 pair: $out")
    val scores = out.map(r => r._2 -> r._5).toMap
    // replica of the operator's arithmetic (w = (3*1000) div 3 = 1000)
    def s(tf: Long, dl: Long, avg: Double): Long =
      math.floor(1000.0 * (tf * (1.2 + 1.0))
        / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avg)))).toLong
    val avg = (2.0 + 39.0 + 4.0) / 3.0
    assert(scores(1L) == s(1, 2, avg))
    assert(scores(2L) == s(1, 39, avg))
    assert(scores(3L) == s(3, 4, avg))
    // saturation: tf=3 scores < 3x the tf=1 score at comparable dl
    assert(scores(3L) < 3 * scores(1L))
    assert(out.forall(_._2 != 4L))
  }

  test("hybridSearch re-ranks lexical candidates by cosine to the " +
      "query vector; embedding-less candidates sink to the bottom") {
    // all three docs hit 'kiwi'; doc 3 has no embedding row
    val docs0 = docsFrom(
      0L -> "kiwi query anchor",
      1L -> "kiwi something",
      2L -> "kiwi other",
      3L -> "kiwi embeddingless")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),         // the query vector
      (1L, Array(0.2f, 0.9f, 0.0f, 0.0f)),          // low cos to q
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)))          // high cos to q
      .toDF("vec_id", "embedding")
    val out = Retrieval.hybridSearch(docs0, emb, "kiwi", qVec = 0L,
      kCand = 4, k = 4)
      .select("rnk", "doc_id", "cos_sim")
      .as[(Int, Long, Option[Double])].collect().toSeq
    // doc 0 is the query itself (cos 1); doc 2 beats doc 1 on cosine
    // even though term ranks were id-ordered; doc 3 (no embedding) last
    assert(out.map(_._2) == Seq(0L, 2L, 1L, 3L))
    assert(out.head._3.contains(1.0))
    assert(out.last._3.isEmpty)
  }

  test("rankingAudit: idf reordering vs raw-hit ideal gives the " +
      "hand-built NDCG < 1; zero-hit queries emit no row") {
    // N=4; df(rare)=1 → w=4000; df(common)=3 → w=1333.
    // scores: d1=4000 (rel 1), d2=3999 (rel 3), d3=d4=1333 (rel 1)
    // score order: d1, d2, … — ideal order: d2, d1, ….
    val c4 = docsFrom(
      1L -> "rare",
      2L -> "common common common",
      3L -> "common",
      4L -> "common x")
    val out = Retrieval.rankingAudit(c4, Seq("rare common", "zzz qqq"),
      k = 2).collect()
    assert(out.length == 1)
    val r = out(0)
    def r4(x: Double) = math.rint(x * 10000) / 10000
    val ln2 = 0.6931471805599453
    val dcg = r4(1.0 * ln2 / math.log(2.0) + 3.0 * ln2 / math.log(3.0))
    val idcg = r4(3.0 * ln2 / math.log(2.0) + 1.0 * ln2 / math.log(3.0))
    assert(r.getAs[Int]("query_id") == 0)
    assert(r.getAs[Long]("n_cand") == 4L && r.getAs[Long]("n_ranked") == 2L)
    assert(r.getAs[Double]("dcg") == dcg)
    assert(r.getAs[Double]("idcg") == idcg)
    assert(r.getAs[Double]("ndcg") == r4(dcg / idcg))
    assert(r.getAs[Double]("ndcg") < 1.0)
  }

  test("termSearch repeated query tokens count once (distinct terms)") {
    val a = Retrieval.termSearch(corpus, "apple apple banana", k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val b = Retrieval.termSearch(corpus, "apple banana", k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(a == b)
  }
}
