package graft

import java.sql.Timestamp
import graft.operators.Vectors
import graft.streaming.Streaming
import graft.streaming.Streaming.Tick
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class IvfWatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("ivfKnn searches only the query's cell and ranks exact matches first") {
    // two well-separated clusters; centroids = first 2 vectors
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),  // centroid A
      (1L, Array(0.0f, 1.0f, 0.0f), 0),  // centroid B
      (2L, Array(0.9f, 0.1f, 0.0f), 0),  // near A
      (3L, Array(0.1f, 0.9f, 0.0f), 0),  // near B
      (4L, Array(0.95f, 0.05f, 0.0f), 0) // near A
    ).toDF("vec_id", "embedding", "label")
    val out = Vectors.ivfKnn(emb, nQueries = 1, k = 3, nCentroids = 2, dim = 3)
      .select("query_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect()
    // query 0 lives in cell A: its candidates are {2, 4}; 3 and the
    // other-cell centroid 1 must not appear
    val neighbors = out.map(_._2).toSet
    assert(neighbors == Set(2L, 4L))
    // nearest (4: cos≈0.9986) ranks before 2
    assert(out.sortBy(_._3).map(_._2).toSeq == Seq(4L, 2L))
  }

  test("ivfPqSearch: candidates come from the query's cell only and a " +
      "codebook-exact duplicate ranks first with ADC distance 0") {
    // 64-dim, two orthogonal clusters around e0 (ids even) and e1
    // (ids odd). vec_ids 0..15 double as the PQ codebook and 0..7 as
    // the IVF centroids; vec 20 is an exact copy of vec 0 (a codebook
    // entry), so its codes reproduce vec 0 exactly and ADC(0, 20) = 0.
    def v(axis: Int, eps: Float): Array[Float] =
      Array.tabulate(64)(i => (if (i == axis) 1.0f else 0.0f) +
        (if (i == 32 + axis) eps else 0.0f))
    // even ids: e0 + growing eps (they argmax to the largest-eps even
    // centroid, leaving query 0 alone with its exact dup); odd ids:
    // exactly e1 (all tie to centroid 1 — one shared cell for query 1)
    val rows = (0 until 20).map { id =>
      (id.toLong, v(id % 2, if (id % 2 == 0) 0.01f * (id / 2) else 0.0f), 0)
    } :+ ((20L, v(0, 0.0f), 0))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Vectors.ivfPqSearch(emb, nQueries = 2, k = 3)
      .collect()
    val q0 = out.filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rnk"))
    assert(q0.head.getAs[Long]("neighbor_id") == 20L)
    assert(q0.head.getAs[Double]("adc_dist") == 0.0)
    // cell purity: every neighbor of query 0 (e0 cluster) is even or
    // the dup 20; query 1's neighbors are all odd
    assert(q0.forall(r => r.getAs[Long]("neighbor_id") % 2 == 0))
    val q1 = out.filter(_.getAs[Long]("query_id") == 1L)
    assert(q1.nonEmpty && q1.forall(r =>
      r.getAs[Long]("neighbor_id") % 2 == 1))
  }

  test("ivfKnn recall vs brute force is perfect when clusters are separated") {
    val emb = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      (i.toLong, Array(base(0) + i * 0.001f, base(1) + i * 0.0005f), 0)
    }.toDF("vec_id", "embedding", "label")
    val ivf = Vectors.ivfKnn(emb, 2, 3, 2, dim = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = Vectors.bruteForceKnn(emb, 2, 3, dim = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf == bf) // same-cluster neighbors dominate -> full recall
  }

  test("annRecall reports the cross-cell miss the IVF index makes and " +
      "full recall where cells align") {
    // centroids = vecs 0 and 1. Vec 3 sits in cell 1 (dot c1 > dot c0)
    // but is query 0's 2nd-best neighbor by cosine → IVF (nProbe=1)
    // misses it: recall@2 = 0.5 for both queries, with n_approx = 1
    // exposing cell starvation (each cell holds 1 non-query candidate).
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),    // centroid/query A
      (1L, Array(0.0f, 1.0f), 0),    // centroid/query B
      (2L, Array(0.9f, 0.1f), 0),    // cell 0
      (3L, Array(0.7f, 0.72f), 0))   // cell 1, still close to A
      .toDF("vec_id", "embedding", "label")
    val out = Vectors.annRecall(emb, 2, 2, 2, dim = 2)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 1L, 1L, 0.5),
      (1L, 2L, 1L, 1L, 0.5)))
    // separated clusters → recall 1.0 everywhere
    val sep = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      (i.toLong, Array(base(0) + i * 0.001f, base(1) + i * 0.0005f), 0)
    }.toDF("vec_id", "embedding", "label")
    val r = Vectors.annRecall(sep, 2, 3, 2, dim = 2)
      .select("recall").as[Double].collect().toSeq
    assert(r == Seq(1.0, 1.0))
  }

  test("annRecallTrained: kmeans cells beat the first-k convention " +
      "when the convention's dot boundary cuts through a cluster") {
    // Geometry: a tight cluster A around e0 holds ids 0, 1 (the
    // convention centroids AND the kmeans init) plus ids 12..15; a
    // second cluster B sits at 45° with members jittered to BOTH
    // sides of the a=b line. The convention quantizer's decision
    // boundary between c0=(1,0) and c1=(.98,.02) is exactly a=b — it
    // SPLITS cluster B, so the boundary-hugging query 2 loses its
    // across-the-line exact neighbors (recall 1/3). Two Lloyd rounds
    // from the same init separate A from B cleanly (round 1 drags c1
    // into the B mass, round 2 reassigns all of A to c0), so every
    // query probes its true cluster: recall 1.0 on all three.
    def bvec(deltaDeg: Double): Array[Float] = {
      val th = math.toRadians(45.0 + deltaDeg)
      Array(math.cos(th).toFloat, math.sin(th).toFloat)
    }
    val deltas = Seq(-0.1, 0.15, -0.3, 0.35, -0.5, 0.55, -0.7, 0.75,
      -0.9, 0.95)
    val emb = (Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.98f, 0.02f), 0)) ++
      deltas.zipWithIndex.map { case (d, i) => ((i + 2).toLong, bvec(d), 0) } ++
      Seq(
        (12L, Array(0.97f, 0.01f), 0),
        (13L, Array(0.99f, 0.03f), 0),
        (14L, Array(0.96f, 0.02f), 0),
        (15L, Array(1.0f, 0.04f), 0)))
      .toDF("vec_id", "embedding", "label")
    def mean(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.select("recall").as[Double].collect()
      r.sum / r.length
    }
    val conv = mean(Vectors.annRecall(emb, 3, 3, 2, dim = 2))
    // nProbe = 1 isolates the TRAINED-CENTROID effect (same candidate
    // budget as the convention index — no multi-probe help).
    val trained = mean(
      Vectors.annRecallTrained(emb, 3, 3, 2, nProbe = 1, dim = 2))
    assert(trained >= conv,
      s"trained quantizer must not lose to the convention: $trained < $conv")
    assert(trained == 1.0 && conv < 1.0,
      s"corpus failed to exercise the convention's split: " +
        s"trained=$trained conv=$conv")
    // registry config (nProbe = 2): multi-probe can only widen the
    // candidate set — recall stays at least the nProbe=1 value.
    val multi = mean(Vectors.annRecallTrained(emb, 3, 3, 2, dim = 2))
    assert(multi >= trained)
  }

  test("ivfPqTrained beats the convention IVF-PQ on the split-cluster " +
      "geometry, and ivfKnnServed replays ivfKnnTrained exactly") {
    // The F7c corpus: cluster A near e0 (ids 0, 1, 12..15), cluster B
    // at 45° with members on BOTH sides of the a=b line (ids 2..11).
    // The convention coarse quantizer's c0/c1 boundary is exactly
    // a=b, splitting B — query 2 (a B member) loses its
    // across-the-line exact-L2 neighbors. Trained cells separate
    // A from B, so every query's true L2 top-k sits in its home
    // cell; with kCode == corpus size the PQ codebook is
    // near-identity (each code trains onto its own point), so ADC
    // ordering matches exact L2 and trained recall is 1.0.
    def bvec(deltaDeg: Double): Array[Float] = {
      val th = math.toRadians(45.0 + deltaDeg)
      Array(math.cos(th).toFloat, math.sin(th).toFloat)
    }
    val deltas = Seq(-0.1, 0.15, -0.3, 0.35, -0.5, 0.55, -0.7, 0.75,
      -0.9, 0.95)
    val emb = (Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.98f, 0.02f), 0)) ++
      deltas.zipWithIndex.map { case (d, i) => ((i + 2).toLong, bvec(d), 0) } ++
      Seq(
        (12L, Array(0.97f, 0.01f), 0),
        (13L, Array(0.99f, 0.03f), 0),
        (14L, Array(0.96f, 0.02f), 0),
        (15L, Array(1.0f, 0.04f), 0)))
      .toDF("vec_id", "embedding", "label")
    def mean(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.select("recall").as[Double].collect()
      r.sum / r.length
    }
    // scale = 4096: the B members are ~0.2° apart (~3.5e-3 in
    // coordinates), so the training grid must resolve well below
    // that for the near-identity codebook to preserve L2 order.
    val trained = mean(Vectors.ivfPqRecallOf(emb, 3, 3, 2,
      Vectors.ivfPqTrained(emb, 3, 3, nCentroids = 2, nSub = 1,
        subDim = 2, kCode = 16, nProbe = 1, scale = 4096, dim = 2)))
    val conv = mean(Vectors.ivfPqRecallOf(emb, 3, 3, 2,
      Vectors.ivfPqSearch(emb, 3, 3, nCentroids = 2, nSub = 1,
        subDim = 2, kCode = 16)))
    assert(trained >= conv,
      s"trained IVF-PQ must not lose to the convention: $trained < $conv")
    assert(trained == 1.0 && conv < 1.0,
      s"corpus failed to exercise the convention's split: " +
        s"trained=$trained conv=$conv")
    // F7d: the served read path replays the trained search row for
    // row when handed the same trained centroids.
    val embD = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Vectors.trainedCentroids(embD, 8, 2, 32)
    val servedRows = Vectors.ivfKnnServed(embD, cents, 10, 5, 2)
      .collect().map(_.toSeq).toSeq
    val trainedRows = Vectors.ivfKnnTrained(embD, 10, 5, 8, 2)
      .collect().map(_.toSeq).toSeq
    assert(servedRows == trainedRows)
  }

  test("trained IVF-PQ recall >= the convention codebook's on the " +
      "driver corpus (the F39b certification, sf0.001 twin of the " +
      "x3-SF check recorded in SURVEY §7)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def mean(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.select("recall").as[Double].collect()
      r.sum / r.length
    }
    val trained = mean(Vectors.ivfPqRecallTrained(emb, 10, 5))
    val conv = mean(Vectors.ivfPqRecallOf(emb, 10, 5, 64,
      Vectors.ivfPqSearch(emb, 10, 5)))
    assert(trained >= conv,
      s"trained IVF-PQ must not lose to the convention: $trained < $conv")
  }

  test("ivfPqTrained is deterministic under the concurrent per-subspace " +
      "codebook training (r17 optimization: the nSub Lloyd loops run " +
      "from a thread pool — results must be invocation-invariant)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Vectors.ivfPqTrained(emb, 10, 5).collect().map(_.toSeq).toSeq
    val b = Vectors.ivfPqTrained(emb, 10, 5).collect().map(_.toSeq).toSeq
    assert(a == b, "concurrent codebook training must be deterministic")
  }

  test("streaming downsampler drops late data past the watermark (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val in = MemoryStream[Tick]
    val q = Streaming.downsample1s(in.toDF(), watermark = "5 seconds")
      .writeStream.format("memory").queryName("wm")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Tick(1L, 1L, t("2024-01-01 07:55:01.0"), 10.0))
      q.processAllAvailable()
      // advance event time far beyond 07:55:01 + watermark
      in.addData(Tick(2L, 1L, t("2024-01-01 07:59:00.0"), 30.0))
      q.processAllAvailable()
      // late tick for the long-closed 07:55:01 window
      in.addData(Tick(3L, 1L, t("2024-01-01 07:55:01.5"), 99.0))
      q.processAllAvailable()
      in.addData(Tick(4L, 1L, t("2024-01-01 07:59:59.0"), 40.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT ts_s, bid FROM wm")
        .as[(Timestamp, Double)].collect().toMap
      // the 07:55:01 window emitted its ORIGINAL first bid; the late
      // 99.0 tick never re-opened it
      assert(rows(t("2024-01-01 07:55:01.0")) == 10.0)
      assert(!rows.values.toSet.contains(99.0))
    } finally q.stop()
  }

  test("gramMatrix: upper-triangle second moments, products exact " +
      "float->double, n carried per cell") {
    // vectors (1,2), (3,4): G = [[10, 14], [14, 20]]
    val emb = Seq(
      (0L, Array(1.0f, 2.0f), 0),
      (1L, Array(3.0f, 4.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Vectors.gramMatrix(emb, dim = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 0L, 2L, 10.0), (0L, 1L, 2L, 14.0),
      (1L, 1L, 2L, 20.0)))
  }

  test("pcaPower: recovers a planted 2-component spectrum — " +
      "loadings, eigenvalues, explained shares, canonical sign") {
    // x = t·(0.6, 0.8, 0, 0) + q·(0, 0, 1, 0) with t ⊥ q ⊥ 1:
    // sample covariance has exact eigenpairs λ1 = Σt²/(n−1) = 20/9,
    // v1 = (0.6, 0.8, 0, 0) and λ2 = Σq²/(n−1) = 8/9, v2 = e3.
    val t = Seq(-2.0, -1.0, 0.0, 1.0, 2.0, -2.0, -1.0, 0.0, 1.0, 2.0)
    val q = Seq(1.0, -1.0, -1.0, 1.0, 0.0, 1.0, -1.0, -1.0, 1.0, 0.0)
    val emb = t.zip(q).zipWithIndex.map { case ((ti, qi), id) =>
      (id.toLong,
        Array((0.6 * ti).toFloat, (0.8 * ti).toFloat, qi.toFloat, 0.0f), 0)
    }.toDF("vec_id", "embedding", "label")
    val out = Vectors.pcaPower(emb, nComp = 2, iters = 60, dim = 4)
      .as[(Long, Long, Double, Double, Double)].collect()
    val c0 = out.filter(_._1 == 0L).sortBy(_._2)
    val c1 = out.filter(_._1 == 1L).sortBy(_._2)
    def close(a: Double, b: Double, tol: Double = 1e-3) =
      math.abs(a - b) <= tol
    // comp 0: direction (0.6, 0.8, 0, 0), sign canonical (0.8 > 0)
    assert(close(c0(0)._3, 0.6) && close(c0(1)._3, 0.8))
    assert(close(c0(2)._3, 0.0) && close(c0(3)._3, 0.0))
    assert(close(c0.head._4, 20.0 / 9))
    // comp 1: e3, positive after canonicalization
    assert(close(c1(2)._3, 1.0))
    assert(close(c1(0)._3, 0.0) && close(c1(1)._3, 0.0))
    assert(close(c1.head._4, 8.0 / 9))
    // explained shares: λ / trace = Σ dim variances = 28/9
    val tr = 28.0 / 9
    assert(close(c0.head._5, (20.0 / 9) / tr))
    assert(close(c1.head._5, (8.0 / 9) / tr))
    // loadings orthonormal across the two components
    val dot01 = c0.map(_._3).zip(c1.map(_._3)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot01) < 1e-3)
  }

  test("pcaProject: scores recover the planted coefficients (pc0 = t, " +
      "pc1 = q on the unit-basis construction)") {
    val t = Seq(-2.0, -1.0, 0.0, 1.0, 2.0, -2.0, -1.0, 0.0, 1.0, 2.0)
    val q = Seq(1.0, -1.0, -1.0, 1.0, 0.0, 1.0, -1.0, -1.0, 1.0, 0.0)
    val emb = t.zip(q).zipWithIndex.map { case ((ti, qi), id) =>
      (id.toLong,
        Array((0.6 * ti).toFloat, (0.8 * ti).toFloat, qi.toFloat, 0.0f), 0)
    }.toDF("vec_id", "embedding", "label")
    val out = Vectors.pcaProject(emb, nComp = 2, iters = 60, dim = 4)
      .as[(Long, Int, Double, Double)].collect().sortBy(_._1)
    out.zipWithIndex.foreach { case ((_, _, pc0, pc1), i) =>
      assert(math.abs(pc0 - t(i)) < 1e-3, s"pc0($i): $pc0 vs ${t(i)}")
      assert(math.abs(pc1 - q(i)) < 1e-3, s"pc1($i): $pc1 vs ${q(i)}")
    }
  }

  test("matryoshkaRecall: a prefix-dominant decoy flips the truncated " +
      "top-1; the full-prefix row recalls exactly 1.0") {
    // query v0 = e1. v1 = (.5,.5,0,0): cos .707 at BOTH prefixes.
    // v2 = (1,0,5,0): cos 1.0 on the 2-prefix, .196 at full dim.
    // Full top-1 = v1; 2-prefix top-1 = v2 -> 0 hits at m=2, 1 at m=4.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.5f, 0.5f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 5.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val m = Vectors.matryoshkaRecall(emb, 1, 1, Seq(2, 4), 4)
      .collect().map(r => r.getAs[Long]("prefix_dim") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm")))).toMap
    assert(m == Map(2L -> ((0L, 0L)), 4L -> ((1L, 1000000L))))
  }

  test("reconAnomaly: collinear rows score zero error and no flags") {
    // x = c + t·v — all variance lives in the single component, so
    // the reconstruction residual is 0 (within 1e-6 quantization).
    val v = Array(1.0, 2.0, 3.0, 4.0)
    val emb = (1 to 30).map { t =>
      (t.toLong, v.map(x => (10.0 + t * x).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val out = Vectors.reconAnomaly(emb, nComp = 1, iters = 60, dim = 4)
      .select("err", "is_anomaly").as[(Double, Boolean)].collect()
    assert(out.length == 30)
    out.foreach { case (err, flag) => assert(err == 0.0 && !flag) }
  }

  test("reconAnomaly: an off-subspace outlier carries the error mass " +
      "and is the only p99 flag") {
    // 40 rows on the line c + t·v, one row offset 50·w with w ⊥ v:
    // only the outlier's residual survives projection on the top
    // component; p99 of 41 errors interpolates between the largest
    // line error and the outlier, so exactly the outlier flags.
    val v = Array(1.0, 2.0, 3.0, 4.0)
    val w = Array(2.0, -1.0, 0.0, 0.0) // v . w = 0
    val line = (1 to 40).map { t =>
      (t.toLong, v.map(x => (10.0 + t * x).toFloat), 0)
    }
    val outlier =
      (99L, v.indices.map(i => (10.0 + 20 * v(i) + 50 * w(i)).toFloat)
        .toArray, 1)
    val emb = (line :+ outlier).toDF("vec_id", "embedding", "label")
    val out = Vectors.reconAnomaly(emb, nComp = 1, iters = 60, dim = 4)
      .select("vec_id", "err", "is_anomaly")
      .as[(Long, Double, Boolean)].collect()
    val flagged = out.filter(_._3)
    assert(flagged.map(_._1).toSeq == Seq(99L))
    val outErr = out.find(_._1 == 99L).get._2
    val maxLine = out.filter(_._1 != 99L).map(_._2).max
    assert(outErr > 100 * maxLine,
      s"outlier err $outErr should dominate line max $maxLine")
  }
}
