package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PolyHash
import graft.functions.PortableText._

/** Text-analysis and deduplication operators over the `documents`
  * table — the LLM-training-data extensions (SURVEY §2.F). The
  * reference pipeline feeds an ML model from cleaned gold data; these
  * are the operators the same lakehouse needs when the payload is
  * text corpora instead of ticks.
  *
  * Scale notes: every sketch (minhash band, simhash, fingerprint) is a
  * narrow per-row projection (codegen'd HOFs, no shuffle); candidate
  * generation is an equality join on the bucket key — the LSH
  * formulation that replaces O(n²) comparison with shuffle-by-bucket.
  * Pairwise scoring only ever runs inside a bucket.
  */
object TextDedup {

  /** F1 — exact dedup by content hash; canonical row = lowest doc_id.
    * groupBy on the hash would lose the per-doc rows; a window min
    * keeps the full set with a `keep` marker (one shuffle by hash). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("h")
    docs
      .withColumn("h", md5(col("text").cast("binary")))
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
      .select("doc_id", "h", "keep")
      .orderBy("doc_id")
  }

  /** F1b — cross-source DUPLICATION MATRIX: for every source pair,
    * how many identical-text doc pairs exist across them (and, on the
    * diagonal, within them) — the report a corpus curator reads to
    * decide which crawls/dumps mirror each other before picking F18
    * caps or F21 budgets. Never a doc×doc comparison: per-(fingerprint,
    * source) COUNTS aggregate first (one shuffle; hot template texts
    * collapse map-side), the pair join then runs on those counts keyed
    * by fingerprint — per fingerprint at most |sources| rows — and
    * cross pairs are `cnt_a·cnt_b`, diagonal pairs `C(cnt,2)`, both
    * exact ints. Rows appear only for pairs with ≥ 1 duplicate pair;
    * `n_shared_fps` counts the distinct duplicated texts behind them.
    */
  def dupMatrix(docs: DataFrame): DataFrame = {
    PolyHash.register(docs.sparkSession)
    val c = docs
      .select(col("source"), expr(docFingerprint).as("fp"))
      .groupBy("fp", "source").agg(count(lit(1)).as("cnt"))
    val a = c.select(col("fp"), col("source").as("source_a"),
      col("cnt").as("cnt_a"))
    val b = c.select(col("fp"), col("source").as("source_b"),
      col("cnt").as("cnt_b"))
    val cross = a.join(b, Seq("fp"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(sum(col("cnt_a") * col("cnt_b")).as("n_dup_pairs"),
        count(lit(1)).as("n_shared_fps"))
    val intra = c.filter(col("cnt") >= 2)
      .groupBy(col("source").as("source_a"))
      .agg(sum(expr("cnt * (cnt - 1) div 2")).as("n_dup_pairs"),
        count(lit(1)).as("n_shared_fps"))
      .withColumn("source_b", col("source_a"))
    cross.select("source_a", "source_b", "n_dup_pairs", "n_shared_fps")
      .unionByName(
        intra.select("source_a", "source_b", "n_dup_pairs", "n_shared_fps"))
      .orderBy("source_a", "source_b")
  }

  /** F69 — NEAR-DUP LEAKAGE MATRIX: F1b's cross-source audit at
    * MINHASH granularity — candidate near-dup pairs (the F2 band
    * join, never doc×doc) rolled up by unordered source pair, the
    * screen that tells WHICH feeds leak near-copies into each other
    * (exact fingerprints catch verbatim mirrors; band candidates also
    * catch the templated/lightly-edited mass that F1b is blind to).
    * `n_pairs` counts distinct candidate pairs, `n_docs` the distinct
    * documents behind them (how concentrated the leak is),
    * `cross_source` flags the off-diagonal — the contamination rows
    * a mixture designer acts on.
    *
    * Shape: bands → bucket equi-join → distinct pairs (all F2's
    * exact-int spelling, one shared discipline), two doc-keyed joins
    * attach sources, then ONE aggregate over the 2-rows-per-pair
    * explode computes pair AND distinct-doc counts together —
    * `count div 2` is exact because every pair contributes exactly
    * two doc rows (no checkpoint, no second pass over the pair
    * frame). All counts exact int64. */
  def nearDupLeakage(docs: DataFrame): DataFrame = {
    PolyHash.register(docs.sparkSession)
    graft.functions.MinHashes.register(docs.sparkSession)
    // first-match band join ([[candidatePairsFromSigs]]) — the pair
    // set is identical to the old bands→join→DISTINCT plan but the
    // candidate-sized dedup shuffle is gone
    val sigs = docs
      .withColumn("th", expr(tokenHashes))
      .withColumn("mh", expr(minHashes))
      .select("doc_id", "mh")
    val src = docs.select(col("doc_id"), col("source"))
    candidatePairsFromSigs(sigs)
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("src_b")), "doc_b")
      .withColumn("source_a", least(col("src_a"), col("src_b")))
      .withColumn("source_b", greatest(col("src_a"), col("src_b")))
      .select(col("source_a"), col("source_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .groupBy("source_a", "source_b")
      .agg(expr("count(1) div 2").as("n_pairs"),
        countDistinct(col("doc")).as("n_docs"))
      .withColumn("cross_source", col("source_a") =!= col("source_b"))
      .orderBy("source_a", "source_b")
  }

  /** F70 — SOURCE-SIMILARITY MATRIX: pairwise Jaccard of each
    * source's DISTINCT word-trigram set, estimated by a k-minhash
    * signature AND computed exactly, with the estimation error beside
    * them — F41's est-vs-exact audit lifted from document pairs to
    * the SOURCE level (the mixture-design question: which feeds are
    * stylistic near-clones of each other, and can the cheap sketch be
    * trusted to say so). At 100 TB the exact path is the luxury — the
    * k·|sources| signature table is what a production pipeline keeps;
    * this operator is where its error gets calibrated. Word BIGRAMS
    * are the shingle (probed: char trigrams saturate on the shared
    * synthetic charset — every pair exactly 1.0, vacuous — while
    * bigram sets spread J = 0.54..0.70 across source pairs).
    *
    * Shapes: the distinct (source, gram-hash) frame checkpoints ONCE
    * and feeds sizes, signatures and the intersection join. The
    * k-explode multiplies that BOUNDED frame (sources × charset³ at
    * worst), never the corpus; signatures reduce in one (source, j)
    * aggregate (min of exact ints — the F2 affine family a=2j+3,
    * b=5j+7); the exact intersection is a gram-hash-keyed equi-join
    * (F4's inverted index at source granularity — never source×source
    * array algebra). All counts exact int64; the two Jaccards and the
    * error are unrounded IEEE divisions/differences of exact ints. */
  def sourceSimilarity(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    graft.functions.WordGrams.register(docs.sparkSession)
    PolyHash.register(docs.sparkSession)
    val sg = docs
      .select(col("source"),
        explode(expr(s"graft_wordgrams($tokens, 3)")).as("gram"))
      .distinct()
      .select(col("source"), expr("graft_polyhash(gram)").as("h"))
      .localCheckpoint(true)
    val sizes = sg.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val sigs = sg
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("v", expr(s"((2*j + 3) * h + 5*j + 7) % $P"))
      .groupBy("source", "j").agg(min(col("v")).as("mh"))
    val estPairs = sigs
      .select(col("j"), col("mh"), col("source").as("source_a"))
      .join(sigs.select(col("j"), col("mh").as("mh_b"),
        col("source").as("source_b")), Seq("j"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(sum(when(col("mh") === col("mh_b"), 1L).otherwise(0L))
        .as("n_match"))
    val inter = sg
      .select(col("h"), col("source").as("source_a"))
      .join(sg.select(col("h"), col("source").as("source_b")), Seq("h"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_inter"))
    estPairs
      .join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .join(sizes.select(col("source").as("source_a"),
        col("n_grams").as("n_gram_a")), "source_a")
      .join(sizes.select(col("source").as("source_b"),
        col("n_grams").as("n_gram_b")), "source_b")
      .withColumn("est_jaccard",
        col("n_match").cast("double") / lit(k).cast("double"))
      .withColumn("exact_jaccard",
        col("n_inter").cast("double") /
          (col("n_gram_a") + col("n_gram_b") - col("n_inter"))
            .cast("double"))
      .withColumn("err", col("est_jaccard") - col("exact_jaccard"))
      .select(col("source_a"), col("source_b"), col("n_gram_a"),
        col("n_gram_b"), col("n_inter"), col("n_match"),
        col("est_jaccard"), col("exact_jaccard"), col("err"))
      .orderBy("source_a", "source_b")
  }

  /** F2 — MinHash LSH band assignment: shingle→minhash→band. Docs
    * sharing a (band, band_hash) bucket are near-dup candidates; the
    * join stage is `candidatePairs`. */
  def minHashBands(docs: DataFrame): DataFrame =
    minHashBands(docs, ordered = true)

  /** `ordered = false` skips the presentation sort — consumers that
    * immediately shuffle (bucket joins) or materialize an unordered
    * edge list (CC) must not pay a range-partitioner sampling job plus
    * a full sort for row order nothing depends on. (Catalyst's
    * EliminateSorts removes the sort under joins/aggregations, but NOT
    * under a terminal checkpoint/write.) */
  def minHashBands(docs: DataFrame, ordered: Boolean): DataFrame = {
    PolyHash.register(docs.sparkSession)
    graft.functions.MinHashes.register(docs.sparkSession)
    val bands = docs
      .withColumn("th", expr(tokenHashes))
      .withColumn("mh", expr(minHashes))
      .withColumn("band", explode(sequence(lit(0), lit(Bands - 1))))
      .withColumn("band_hash",
        expr(s"(element_at(mh, 2*band + 1) * 31 + element_at(mh, 2*band + 2)) % $P"))
      .select("doc_id", "band", "band_hash")
    if (ordered) bands.orderBy("doc_id", "band") else bands
  }

  /** F2e — PLANTED-DUP LSH CALIBRATION (r15 verdict #1's dup leg):
    * recall-by-similarity over a corpus with KNOWN dup pairs — per
    * planted overlap level, how many pairs the production
    * MinHashK=8/Bands=4 index actually catches, beside the measured
    * exact Jaccard. This is the S-curve every LSH deployment is
    * parameterized against (P(caught) = 1−(1−J^r)^b), finally
    * measured on ground truth instead of inferred: the
    * [[graft.operators.RichCorpus.dupDocs]] corpus plants pairs at
    * J = keep/(16−keep) ∈ {0.14 … 0.78}, straddling the band
    * threshold, where the base corpus's template dups saturate every
    * bucket.
    *
    * Shape: ONE tokenize into a checkpointed hash frame feeding the
    * signature bands AND the exact-overlap join; the planted pair
    * frame is a bounded fraction of docs and every join after it is
    * pair-keyed — linear in pairs, never all-pairs. Counts exact
    * int64; catch_bp integer bps; per-pair Jaccard ONE IEEE division
    * of exact ints, mean round(4) (aggregate rule). */
  def plantedDupRecall(docs: DataFrame, pairs: DataFrame): DataFrame = {
    PolyHash.register(docs.sparkSession)
    graft.functions.MinHashes.register(docs.sparkSession)
    val th = docs.select(col("doc_id"), expr(tokenHashes).as("th"))
      .localCheckpoint(true)
    val bands = th.withColumn("mh", expr(minHashes))
      .withColumn("band", explode(sequence(lit(0), lit(Bands - 1))))
      .withColumn("band_hash",
        expr(s"(element_at(mh, 2*band + 1) * 31 + element_at(mh, 2*band + 2)) % $P"))
      .select("doc_id", "band", "band_hash")
    val p = pairs.localCheckpoint(true)
    val caught = p
      .join(bands.select(col("doc_id").as("doc_a"), col("band"),
        col("band_hash").as("ha")), "doc_a")
      .join(bands.select(col("doc_id").as("doc_b"), col("band"),
        col("band_hash").as("hb")), Seq("doc_b", "band"))
      .filter(col("ha") === col("hb"))
      .select("doc_a", "doc_b").distinct()
      .withColumn("caught", lit(1L))
    val toks = th.select(col("doc_id"), explode(col("th")).as("h"))
      .distinct()
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = p
      .join(toks.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("h")),
        Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    p
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        "doc_b")
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(caught, Seq("doc_a", "doc_b"), "left")
      .withColumn("jac",
        coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L)))
            .cast("double"))
      .groupBy("keep")
      .agg(count(lit(1)).as("n_planted"),
        sum(coalesce(col("caught"), lit(0L))).as("n_caught"),
        round(avg(col("jac")), 4).as("mean_exact_j"))
      .withColumn("catch_bp", expr("(n_caught * 10000) DIV n_planted"))
      .select("keep", "n_planted", "n_caught", "catch_bp", "mean_exact_j")
      .orderBy("keep")
  }

  /** F2c — one-pass greedy near-dup filter: a document is a duplicate
    * iff ANY of its LSH band buckets already contains an earlier
    * document (doc_id = arrival order). This is the ingest-time dedup
    * a training pipeline runs when it cannot afford full clustering —
    * transitive through dropped docs (their bands still claim their
    * buckets), and only one bucket-min aggregation plus one bucket
    * join: two shuffles total, no iteration, so it holds at any scale
    * where [[dedupClustersFromBuckets]]'s rounds would dominate.
    * Token-less docs have no bands and are always kept. Streaming
    * twin: [[graft.streaming.Streaming.nearDupBandFlags]] — verdicts
    * are identical PROVIDED docs arrive in doc_id order across
    * micro-batches (doc_id IS the arrival sequence number here; under
    * out-of-order replay the stream keeps the first arrival where
    * this batch pass keeps the min doc_id). */
  def greedyNearDup(docs: DataFrame): DataFrame = {
    // Materialize the sketch once: the assignment frame feeds both the
    // bucket-min aggregation and the verdict join, and without a
    // barrier the per-doc tokenize+polyhash+minhash projection — the
    // dominant cost at scale — would be evaluated twice (the two
    // exchange subtrees differ, so ReusedExchange cannot collapse
    // them). Same discipline as [[dedupClustersFromBuckets]].
    val assign = minHashBands(docs, ordered = false)
      .filter(col("band_hash").isNotNull)
      .localCheckpoint(true)
    val bucketFirst = assign.groupBy("band", "band_hash")
      .agg(min("doc_id").as("first_doc"))
    val verdict = assign.join(bucketFirst, Seq("band", "band_hash"))
      .groupBy("doc_id")
      .agg(expr("bool_or(first_doc < doc_id)").as("dup"))
    docs.select(col("doc_id"))
      .join(verdict, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dup"), lit(false)).as("is_duplicate"))
      .orderBy("doc_id")
  }

  /** F2d — INCREMENTAL (delta) near-dup: dedup an incoming batch
    * against an already-curated corpus WITHOUT re-adjudicating the
    * corpus's own members — the shape a production ingest actually
    * runs (the curated side's band sketch would be a stored index; in
    * this one-plan form it is derived in the same job). An incoming
    * doc is a duplicate iff any of its LSH band buckets holds (a) ANY
    * existing-corpus doc — blame `existing` — or (b) an earlier
    * incoming doc (`batch`; [[greedyNearDup]]'s rule, transitive
    * through dropped docs, with the whole existing corpus pinned
    * "earlier than everything"). Existing docs are never re-flagged;
    * token-less incoming docs have no bands and are kept
    * (`dup_source` NULL). Two shuffles (bucket agg + verdict join),
    * no iteration — the bucket aggregation sees existing∪incoming but
    * the verdict join carries only incoming rows.
    * `incrementalNearDup(∅, docs)` ≡ `greedyNearDup(docs)` (spec'd).
    */
  def incrementalNearDup(existing: DataFrame, incoming: DataFrame)
      : DataFrame = {
    val exBands = minHashBands(existing, ordered = false)
      .filter(col("band_hash").isNotNull)
      .select(col("band"), col("band_hash"),
        lit(true).as("is_existing"), col("doc_id"))
    // Incoming bands feed both the bucket aggregation and the verdict
    // join — checkpoint so the sketch projection runs once (same
    // barrier discipline as greedyNearDup).
    val inBands = minHashBands(incoming, ordered = false)
      .filter(col("band_hash").isNotNull)
      .select(col("band"), col("band_hash"),
        lit(false).as("is_existing"), col("doc_id"))
      .localCheckpoint(true)
    incrementalVerdicts(exBands.union(inBands),
      incoming.select(col("doc_id")))
  }

  /** F2d, single-corpus form: when existing and incoming are a
    * PREDICATE SPLIT of one table (the registry's `doc_id % 5` split,
    * or any ingest where the delta rides the same store), the two-
    * frame API pays the dominant tokenize→polyhash→minhash projection
    * TWICE — once per side. This variant computes the band sketch in
    * ONE corpus scan, checkpoints it, and derives both sides by
    * flagging rows with `existingPred` (evaluated over the band
    * frame's `doc_id`). Verdicts are bit-identical to
    * `incrementalNearDup(docs.where(pred), docs.where(!pred))`
    * (spec'd — minhashes are per-row, so splitting before or after
    * the sketch cannot differ). Halves the 100 TB pass count AND the
    * Catalyst tree (one sketch subtree, not two). */
  def incrementalNearDupSplit(docs: DataFrame, existingPred: Column)
      : DataFrame = {
    val bands = minHashBands(docs, ordered = false)
      .filter(col("band_hash").isNotNull)
      .localCheckpoint(true)
    incrementalVerdicts(
      bands.select(col("band"), col("band_hash"),
        existingPred.as("is_existing"), col("doc_id")),
      docs.where(!existingPred).select(col("doc_id")))
  }

  /** Shared F2d verdict tail: bucket aggregation over flagged bands,
    * verdict join carrying only incoming rows, token-less restore. */
  private def incrementalVerdicts(flagged: DataFrame,
                                  incomingIds: DataFrame): DataFrame = {
    val buckets = flagged
      .groupBy("band", "band_hash")
      .agg(max(when(col("is_existing"), 1).otherwise(0)).as("has_existing"),
        min(when(!col("is_existing"), col("doc_id"))).as("first_incoming"))
    val verdict = flagged.filter(!col("is_existing"))
      .join(buckets, Seq("band", "band_hash"))
      .groupBy("doc_id")
      .agg(expr("bool_or(has_existing = 1)").as("dup_ex"),
        expr("bool_or(first_incoming < doc_id)").as("dup_batch"))
    incomingIds
      .join(verdict, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dup_ex") || col("dup_batch"), lit(false))
          .as("is_duplicate"),
        when(col("dup_ex"), "existing").when(col("dup_batch"), "batch")
          .as("dup_source"))
      .orderBy("doc_id")
  }

  /** F31 — dedup SURVIVORSHIP report: what the greedy near-dup pass
    * costs each source, in documents and in token mass — the
    * before/after audit a curator reads next to the F1b duplication
    * matrix (which sources lose how much of their contribution once
    * dedup runs; a source that loses 80% of its tokens was mostly
    * mirror content). Composes [[greedyNearDup]]'s verdicts with a
    * narrow per-doc token count and one groupBy(source); drop ratios
    * are exact-int divisions (unrounded, SURVEY §6). */
  def dedupSurvivorship(docs: DataFrame): DataFrame = {
    val verdicts = greedyNearDup(docs).select("doc_id", "is_duplicate")
    docs.select(col("doc_id"), col("source"),
        expr(s"size($tokens)").cast("bigint").as("n_tokens"))
      .join(verdicts, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_duplicate"), 1L).otherwise(0L)).as("n_dropped"),
        sum("n_tokens").as("tokens_total"),
        sum(when(col("is_duplicate"), col("n_tokens")).otherwise(0L))
          .as("tokens_dropped"))
      .withColumn("doc_drop_ratio",
        col("n_dropped").cast("double") / col("n_docs"))
      .withColumn("token_drop_ratio",
        when(col("tokens_total") > 0,
          col("tokens_dropped").cast("double") / col("tokens_total")))
      .orderBy("source")
  }

  /** F2b — LSH candidate pairs: equality self-join on the band bucket,
    * deduplicated across bands. Shuffles by (band, band_hash) — never
    * a cross product. */
  def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // no terminal sort: the only consumer (candidatePairStats)
    // filters + joins + re-aggregates, and a global orderBy here
    // costs a range-partitioner SAMPLING pass that re-executes the
    // whole band join (the interp_grid double-evaluation trap) plus
    // a full sort of the multi-million-row pair frame
  }

  /** [[candidatePairs]] without the pair DISTINCT: each candidate
    * pair is emitted ONLY at its FIRST matching band — both sides of
    * the band join carry the full minhash signature (k = 8 longs on
    * a frame whose pre-join size is |docs|·Bands — trivial), and a
    * generated, fully-codegen'd conjunction re-derives the earlier
    * bands' hashes from the two signatures and keeps the row iff
    * none matched. Exactly one surviving row per distinct candidate
    * pair (its minimal matching band), so the output SET is
    * identical to `candidatePairs(minHashBands(...))` — spec-proven
    * — while the multi-million-row exact-dedup SHUFFLE disappears
    * (the wave-6 PairProfile measured that distinct at 10.6 s of
    * the ~13 s family queries at sf0.1: THE dominant stage; here it
    * becomes a per-row filter of ≤ Bands−1 integer hashes over
    * already-loaded arrays, no exchange). At 100 TB the distinct was
    * the one shuffle whose volume is the CANDIDATE count rather than
    * the corpus size — the scale-hostile term — and it is gone.
    *
    * Input: (doc_id, mh) signature rows (token-less docs carry NULL
    * minhash components and drop with their NULL band hashes, same
    * as the banded path).
    *
    * SCALE-REGIME SWITCH (r13 verdict "what's wrong #3" — previously
    * a comment, now data-driven): one cheap bucket-census aggregate
    * measures the largest (band, band_hash) bucket before the pair
    * join. Below `hotBucketThreshold` the simple band equi-join runs
    * (locally the build side broadcasts and the round-robin probe
    * spread is enough). Above it — the 100 TB regime where one
    * 10⁵-doc bucket would put 10¹⁰ fused per-pair comparisons on ONE
    * reducer — the join switches to the H9 triangular-tiled self-join
    * layout ([[Skew.tiledSelfPairs]]'s construction with the minhash
    * signatures riding along), which decomposes each bucket's pair
    * space across `tiles·(tiles+1)/2` reducers. Both paths emit the
    * IDENTICAL first-match pair set (spec-proven both sides of the
    * threshold).
    *
    * RESOURCE NOTE (not just plan construction): calling this
    * eagerly materializes a |docs|·Bands sketch frame via
    * `localCheckpoint` (it feeds the bucket census and both join
    * roles), and below `Long.MaxValue` thresholds runs the census
    * job at call time. The checkpoint's blocks live until swept:
    * run each consuming query inside a [[graft.CkptGc]]
    * snapshot/sweep pair (as Bench/Verify/Sf1Smoke do), or call
    * `CkptGc.sweep` yourself in a long-lived session — otherwise
    * the frame leaks per call. */
  def candidatePairsFromSigs(sigs: DataFrame,
                             hotBucketThreshold: Long =
                               HotBucketThreshold,
                             tiles: Int = HotBucketTiles): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1: $tiles")
    def bh(m: String, j: Int) =
      s"(element_at($m, ${2 * j + 1}) * 31 + element_at($m, ${2 * j + 2})) % $P"
    // Materialization barrier (r14 review): the bands frame feeds
    // the bucket census AND both pair-join roles — without it the
    // per-doc tokenize/polyhash/minhash projection upstream of an
    // UN-checkpointed `sigs` (nearDupLeakage, lshRecall) would run
    // three times. The frame is |docs|·Bands narrow sketch rows;
    // lifecycle follows the engine-wide checkpoint discipline — the
    // runner (Bench/Verify/Sf1Smoke) sweeps it via CkptGc after the
    // consuming query; long-lived library sessions should do the
    // same (CkptGc.snapshot/sweep around each query).
    val bands = sigs
      .withColumn("band", explode(sequence(lit(0), lit(Bands - 1))))
      .withColumn("band_hash",
        expr(s"(element_at(mh, 2*band + 1) * 31 + element_at(mh, 2*band + 2)) % $P"))
      .filter(col("band_hash").isNotNull)
      .localCheckpoint(true)
    // "no earlier band matched", unrolled over the constant band
    // count so the whole predicate stays inside whole-stage codegen
    // (an exists() HOF would interpret its lambda per row; band-0
    // rows short-circuit every clause via band <= j). Symmetric in
    // (mh_a, mh_b), so it is valid BEFORE the tiled path's
    // least/greatest normalization too.
    val noEarlier = (0 until Bands - 1).map { j =>
      s"(band <= $j OR ${bh("mh_a", j)} != ${bh("mh_b", j)})"
    }.mkString(" AND ")
    // the bucket census: one aggregate over the checkpointed sketch
    // frame — corpus-linear, and the ONLY way to pick the join
    // layout from the data instead of a comment. Short-circuited
    // when the threshold says the regime can never flip (r14 review:
    // plan construction should not fire a job it cannot use).
    val hot = hotBucketThreshold < Long.MaxValue && {
      val censusTop = bands.groupBy("band", "band_hash")
        .agg(count(lit(1)).as("n")).agg(max(col("n"))).head()
      !censusTop.isNullAt(0) && censusTop.getLong(0) > hotBucketThreshold
    }
    if (!hot) {
      // The build side broadcasts, so the probe side may be
      // partitioned ANY way — round-robin it across the full task
      // count so a hot bucket's probe rows (and the quadratic join
      // output + downstream per-pair work that FUSES into this
      // stage) spread evenly instead of landing in whichever
      // partition held the bucket (measured: the fused ncommon scan
      // ran single-task on the 3847-doc hot bucket without this — a
      // 5 s straggler at sf0.1). Explicit numPartitions: AQE does
      // not coalesce user-numbered repartitions, and the shuffled
      // frame is |docs|·Bands sketch rows — corpus-linear, never
      // candidate-sized.
      val nPart = sigs.sparkSession.conf.get(
        "spark.sql.shuffle.partitions").toInt
      val a = bands.select(col("band"), col("band_hash"),
        col("doc_id").as("doc_a"), col("mh").as("mh_a"))
        .repartition(nPart)
      val b = bands.select(col("band"), col("band_hash"),
        col("doc_id").as("doc_b"), col("mh").as("mh_b"))
      a.join(b, Seq("band", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .filter(expr(noEarlier))
        .select("doc_a", "doc_b")
    } else {
      // H9's fragment-replicate layout with the signatures carried:
      // LEFT role replicates to tiles (chunk, j ≥ chunk), RIGHT to
      // (i ≤ chunk, chunk); every cross-chunk pair meets in exactly
      // its (min, max) tile (role order forced by the chunks — the
      // smaller-chunk doc may land on EITHER side, hence
      // least/greatest at the end, never a doc_a < doc_b filter,
      // which would drop half the cross-chunk pairs), same-chunk
      // pairs meet on the diagonal where the id order filter
      // removes self-pairs and mirrors.
      val chunk = pmod(xxhash64(col("doc_id")), lit(tiles.toLong))
      val lhs = bands
        .withColumn("_i", chunk)
        .withColumn("_j",
          explode(sequence(col("_i"), lit(tiles.toLong - 1))))
        .select(col("band"), col("band_hash"), col("_i"), col("_j"),
          col("doc_id").as("doc_a"), col("mh").as("mh_a"))
      val rhs = bands
        .withColumn("_j", chunk)
        .withColumn("_i", explode(sequence(lit(0L), col("_j"))))
        .select(col("band"), col("band_hash"), col("_i"), col("_j"),
          col("doc_id").as("doc_b"), col("mh").as("mh_b"))
      lhs.join(rhs, Seq("band", "band_hash", "_i", "_j"))
        .filter(col("_i") =!= col("_j") || col("doc_a") < col("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
        .filter(expr(noEarlier))
        .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"))
    }
  }

  /** [[candidatePairsFromSigs]]' regime threshold: buckets at or
    * below this run the broadcast band join; larger ones switch to
    * the tiled layout. 50k docs ⇒ ~1.25·10⁹ fused per-pair
    * comparisons in one bucket — past what one reducer should own. */
  val HotBucketThreshold = 50000L
  /** Tiles for the hot regime: a 10⁵-doc bucket splits into
    * 16·17/2 = 136 triangular tiles (~10⁷ comparisons each). */
  val HotBucketTiles = 16

  /** F41 — DEDUP-PAIR AUDIT: for every LSH candidate pair, the EXACT
    * distinct-token Jaccard next to the MinHash sketch's estimate
    * (component agreement / K) and their absolute error — the
    * precision audit that answers "is the sketch lying at our band
    * settings" with numbers instead of folklore (the measured
    * est-vs-exact discipline F25/F27 apply to quantizers, applied to
    * the dedup sketch itself).
    *
    * Scale shape: candidates come from the band-bucket equi-join
    * (F2b — never all-pairs); the exact intersection then runs ONLY
    * on flagged pairs, each a JVM set-intersect of two distinct-hash
    * arrays carried through hash joins on the pair ids. The sketch
    * projection materializes once (the greedyNearDup barrier
    * discipline). All emitted ratios are exact-int divisions and a
    * subtraction of identical doubles — unrounded (SURVEY §6).
    *
    * `samplePct` deterministically hash-samples the PAIR list before
    * the exact intersections: the candidate set is O(Σ cluster²) on a
    * dup-heavy corpus (7.7M pairs at sf0.1 here), and an audit needs
    * an unbiased sample, not the census — the multiplicative hash of
    * the pair key keeps the sample reproducible and engine-portable. */
  /** Shared F41/F71 stage: banded candidate pairs (optionally
    * hash-sampled) joined back to both docs' token-hash sets and
    * minhash signatures, with the exact intersection/union counts —
    * ONE spelling of "candidate pair with exact overlap" for the
    * audit and the threshold curve. */
  private def candidatePairStats(docs: DataFrame, samplePct: Int)
      : DataFrame = {
    PolyHash.register(docs.sparkSession)
    graft.functions.MinHashes.register(docs.sparkSession)
    graft.functions.SortedCommon.register(docs.sparkSession)
    // ths: th deduped + ascending-sorted ONCE here (n log n per doc)
    // so the pair stage's |A∩B| is the allocation-free native
    // two-pointer walk instead of a per-pair hash set (measured the
    // array_intersect spelling at ~15-19 s/query on the sf0.1
    // candidate frame). array_distinct is explicit even though
    // tokens are distinct: HASHES mod p are not guaranteed distinct,
    // and both |A∩B| (set-semantic graft_sorted_ncommon) and the
    // size() terms of n_union must count distinct VALUES to match
    // the list_distinct-wrapped oracle under a collision.
    val base = docs
      .withColumn("th", expr(tokenHashes))
      .withColumn("ths", expr("array_sort(array_distinct(th))"))
      .withColumn("mh", expr(minHashes))
      .select("doc_id", "th", "ths", "mh")
      .localCheckpoint(true)
    // first-match band join (no pair-distinct shuffle); the sample
    // filter runs per pair, identical to the distinct-then-sample
    // plan because the pair SET is identical
    val pairs = candidatePairsFromSigs(base.select("doc_id", "mh"))
      .filter(pmod(CorpusPipeline.hashOrder(
        col("doc_a") * 31 + col("doc_b")), lit(100)) < samplePct)
    val pa = base.select(col("doc_id").as("doc_a"), col("ths").as("ths_a"),
      col("mh").as("mh_a"))
    val pb = base.select(col("doc_id").as("doc_b"), col("ths").as("ths_b"),
      col("mh").as("mh_b"))
    pairs.join(pa, "doc_a").join(pb, "doc_b")
      .withColumn("n_common",
        expr("graft_sorted_ncommon(ths_a, ths_b)").cast("int"))
      .withColumn("n_union",
        expr("size(ths_a) + size(ths_b)") - col("n_common"))
  }

  /** Session-shared FULL-CENSUS pair stats — (doc_b, n_common,
    * n_union) for every banded candidate pair — computed ONCE per
    * (session, corpus key) and served from a pinned localCheckpoint
    * thereafter. F71 (threshold curve) and F74 (LSH planner) both
    * consume the full census; round 12 measured them rebuilding it
    * independently at 18.6 s + 13.3 s in the same bench session. The
    * values are IDENTICAL to the per-call spelling (same
    * [[candidatePairStats]] plan) — only the redundant recompute is
    * gone. Intermediates (the signature-frame checkpoint inside
    * candidatePairStats) are swept once the census materializes; the
    * census frame itself is pinned against [[CkptGc]]'s per-query
    * sweep because it must outlive the query that built it. Caching,
    * stopped-session purge and build-outside-lock concurrency all
    * live in [[graft.SessionFrameCache]] (r13 advice: the build used
    * to run Spark jobs inside a ConcurrentHashMap bin lock). */
  def pairCensus(docs: DataFrame, cacheKey: String): DataFrame =
    graft.SessionFrameCache.getOrBuild(
      docs.sparkSession, s"pairCensus|$cacheKey") {
      val ss = docs.sparkSession
      val before = graft.CkptGc.snapshot(ss)
      val stats = candidatePairStats(docs, 100)
        .select("doc_b", "n_common", "n_union")
      val mid = graft.CkptGc.snapshot(ss)
      val out = stats.localCheckpoint(true)
      graft.CkptGc.pinNewSince(ss, mid)   // pin the census itself
      graft.CkptGc.sweep(ss, before)      // drop the sig-frame ckpt
      out
    }

  def dedupAudit(docs: DataFrame, samplePct: Int = 100): DataFrame = {
    candidatePairStats(docs, samplePct)
      .withColumn("jaccard",
        col("n_common").cast("double") / col("n_union"))
      .withColumn("mh_agree",
        expr("size(filter(zip_with(mh_a, mh_b, (p, q) -> p = q), x -> x))"))
      .withColumn("mh_est",
        col("mh_agree").cast("double") / lit(graft.functions.PortableText.MinHashK))
      .withColumn("abs_err", abs(col("mh_est") - col("jaccard")))
      .select("doc_a", "doc_b", "n_common", "n_union", "jaccard",
        "mh_agree", "mh_est", "abs_err")
      .orderBy("doc_a", "doc_b")
  }

  /** F85 — DEDUP RECALL BENCHMARK with PLANTED mutations: ground
    * truth by construction (F78's media trick applied to TEXT) — a
    * deterministic sample of documents is mutated at a ladder of
    * severities (drop every k-th token ⇒ a known token-set overlap
    * of (k−1)/k against the original), the banded detector runs on
    * originals ∪ mutants, and the report is RECALL per severity: did
    * the bands find each planted (original, mutant) pair. This is
    * F74's S-curve measured EMPIRICALLY instead of computed — the
    * two must agree in shape, and together they are the evidence a
    * dedup deployment shows for "our banding catches J ≥ 0.8".
    *
    * Determinism: the mutation is pure token-index arithmetic both
    * engines spell identically (Spark's 0-based filter lambda vs
    * DuckDB's 1-based — aligned by construction); recall detection
    * is a left join of the CONSTRUCTED pair list against the band
    * candidates (never the quadratic pair space); sampling keeps the
    * benchmark corpus tiny (a pair's detection probability depends
    * only on its own signatures, not corpus size, so sampled recall
    * IS recall). Counts exact int64; recall and the expected overlap
    * (k−1)/k are ONE IEEE division each, unrounded. */
  def dedupRecallBench(docs: DataFrame, severities: Seq[Int],
                       sampleMod: Int = 20): DataFrame = {
    require(severities.nonEmpty && severities.forall(_ >= 2),
      s"severities must be >= 2: $severities")
    val ss = docs.sparkSession
    import ss.implicits._
    PolyHash.register(ss)
    graft.functions.MinHashes.register(ss)
    val base = docs
      .filter(pmod(col("doc_id"), lit(sampleMod)) === 0)
      .select("doc_id", "text", "lang", "source")
      .localCheckpoint(true)
    // Mutant ids live at doc_id + k·10⁷ — ground truth by
    // construction ONLY while the id bands cannot overlap. A corpus
    // with doc_id ≥ 10⁷ would silently alias mutants onto real docs
    // (or onto another severity's band) and BOTH engines would
    // compute the same wrong recall, so the gate could never catch
    // it — fail fast instead. One tiny agg on the checkpointed
    // sample (already materialized).
    val idBounds = base.agg(min(col("doc_id")), max(col("doc_id"))).head()
    require(!idBounds.isNullAt(0) && idBounds.getLong(0) >= 0L &&
      idBounds.getLong(1) < 10000000L,
      s"dedupRecallBench: sampled doc_id range [${idBounds.get(0)}, " +
        s"${idBounds.get(1)}] must sit in [0, 10^7) so mutant ids " +
        "(doc_id + k*10^7) cannot collide with real docs or other " +
        "severities")
    val mutants = severities.map { k =>
      base.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        expr(s"array_join(filter($tokens, (t, i) -> (i + 1) % $k != 0), ' ')")
          .as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _)
    val pairs = candidatePairsFromSigs(
      base.unionByName(mutants)
        .withColumn("th", expr(tokenHashes))
        .withColumn("mh", expr(minHashes))
        .select("doc_id", "mh"))
      .withColumn("_hit", lit(1))
    val planted = severities.toDF("severity")
      .crossJoin(base.select(col("doc_id").as("doc_a")))
      .withColumn("doc_b", col("doc_a") + col("severity") * lit(10000000L))
    planted
      .join(pairs, Seq("doc_a", "doc_b"), "left")
      .groupBy("severity")
      .agg(count(lit(1)).as("n_planted"),
        count(col("_hit")).as("n_detected"))
      .withColumn("recall",
        col("n_detected").cast("double") / col("n_planted").cast("double"))
      .withColumn("kept_share",
        (col("severity") - 1).cast("double") / col("severity").cast("double"))
      .orderBy("severity")
  }

  /** F71 — DEDUP-THRESHOLD CALIBRATION CURVE: for each candidate
    * Jaccard cutoff (in TENTHS), how many candidate pairs qualify and
    * how many documents the pairwise drop-the-higher-id rule would
    * remove — the "which threshold do we ship" curve every dedup
    * rollout reads before committing (F55 sweeps length cutoffs; this
    * sweeps SIMILARITY). The comparison `J ≥ t/10` is spelled as the
    * EXACT-int cross-multiplication `10·n_common ≥ t·n_union` (B12's
    * rule) — membership can never drift on a float boundary, which
    * matters precisely here because every row IS a boundary test.
    *
    * Shape: [[candidatePairStats]]'s banded pairs (full population —
    * the curve is the decision artifact, not a sample) collapse to
    * each pair's LARGEST qualifying tenth t = (10·n_common) div
    * n_union, then the whole curve reads off two ≤11-row broadcast
    * histograms — pair counts by t, dropped-doc counts by each doc's
    * max t — as suffix sums over the threshold list (a pair
    * qualifies at every tenth ≤ its max). No ×|thresholds| pair
    * explode, no per-threshold countDistinct expand; corpus size a
    * 1-row broadcast; thresholds with zero qualifying pairs keep
    * their row via the left join. Drop share in exact int64 bps. */
  def dedupThresholdCurve(docs: DataFrame, tenths: Seq[Int],
                          census: Option[DataFrame] = None): DataFrame = {
    require(tenths.nonEmpty && tenths.forall(t => t >= 0 && t <= 10),
      s"tenths must be in 0..10: $tenths")
    val ss = docs.sparkSession
    import ss.implicits._
    val thr = broadcast(tenths.toDF("thr_tenths"))
    // Each pair's LARGEST qualifying tenth is the exact-int floor
    // t = (10·n_common) div n_union (non-negative, so Spark-truncate
    // == DuckDB-floor), because 10·nc ≥ t·nu ⟺ t ≤ (10·nc) div nu.
    // The whole curve then reads off two ≤11-row histograms — pair
    // counts by t, dropped-doc counts by each doc's MAX t — instead
    // of a ×|thresholds| pair explode + a per-threshold
    // countDistinct expand (measured: the explode spelling put 38M
    // rows + a 77M-row expand through the aggregate at sf0.1).
    // `census`: a prebuilt [[pairCensus]] frame — already
    // checkpointed, so the derived 2-consumer projection reads the
    // in-memory blocks instead of re-running the banded census.
    val tp = census.getOrElse(candidatePairStats(docs, 100))
      .select(col("doc_b"),
        expr("(10 * n_common) div n_union").as("t_pair"))
    val stats = if (census.isDefined) tp else tp.localCheckpoint(true)
    val pairHist = broadcast(stats.groupBy("t_pair")
      .agg(count(lit(1)).as("c_pairs")))
    val docHist = broadcast(stats.groupBy("doc_b")
      .agg(max(col("t_pair")).as("t_doc"))
      .groupBy("t_doc").agg(count(lit(1)).as("c_docs")))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    // suffix sums over the tiny histograms via a threshold cross join
    val perThr = thr
      .join(pairHist, col("t_pair") >= col("thr_tenths"), "left")
      .groupBy("thr_tenths").agg(sum(col("c_pairs")).as("n_pairs"))
      .join(thr.join(docHist, col("t_doc") >= col("thr_tenths"), "left")
        .groupBy("thr_tenths").agg(sum(col("c_docs")).as("n_docs_dropped")),
        Seq("thr_tenths"))
    perThr
      .crossJoin(broadcast(total))
      .select(col("thr_tenths"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_dropped"), lit(0L)).as("n_docs_dropped"),
        expr("(coalesce(n_docs_dropped, 0L) * 10000) div n_docs")
          .as("drop_share_bp"))
      .orderBy("thr_tenths")
  }

  /** The LSH S-curve detection probability 1 − (1 − J^r)^b as a SQL
    * expression over a column named `jacc` — integer exponents spelled
    * as LEFT-ASSOCIATIVE repeated multiplication so both engines run
    * the SAME IEEE op sequence (libm `pow` is NOT cross-engine
    * reproducible; a product chain is). ONE spelling interpolated into
    * both the Spark plan and the DuckDB oracle (the ticksSql
    * discipline). */
  private[graft] def detectProbExpr(b: Int, r: Int): String = {
    require(b >= 1 && r >= 1, s"LSH config needs b,r >= 1: ($b, $r)")
    val jr = Seq.fill(r)("jacc").mkString(" * ")
    val miss = Seq.fill(b)(s"(1.0 - ($jr))").mkString(" * ")
    s"(1.0 - $miss)"
  }

  /** F74 — LSH PARAMETER PLANNER (the S-curve calibration artifact):
    * for each candidate (bands × rows-per-band) signature layout, the
    * expected near-dup detection the banding would achieve on THIS
    * corpus — 1 − (1 − J^r)^b evaluated at every candidate pair's
    * EXACT Jaccard, split into wanted (J ≥ 0.5) vs unwanted mass.
    * F71 sweeps the VERDICT threshold for one fixed banding; this
    * sweeps the BANDING itself — recall on true near-dups vs
    * candidate leakage per config is the "which (b, r) do we ship"
    * decision table (Leskovec et al., MMDS ch. 3).
    *
    * Population: the banded candidate pairs with exact Jaccard
    * ([[candidatePairStats]] — the same bounded frame F41/F71 audit;
    * all-pairs J is quadratic and never materialized, so the curve
    * calibrates RELATIVE detection over the recall-biased candidate
    * population — stated on the artifact, standard practice at scale).
    *
    * Determinism: J is ONE IEEE division of exact ints; the S-curve
    * runs the [[detectProbExpr]] product chain (no libm pow); per-pair
    * probabilities quantize ppm-HALF_UP into int64 BEFORE the
    * order-free sums (the F12b discipline); wanted tests the exact-int
    * cross-multiplication 2·n_common ≥ n_union; `mean_det` divides
    * exact ints in one fixed left-assoc chain. */
  def lshPlanner(docs: DataFrame, configs: Seq[(Int, Int)],
                 census: Option[DataFrame] = None): DataFrame = {
    require(configs.nonEmpty, "lshPlanner: need at least one (b, r)")
    // COLLAPSE-BEFORE-CHAIN (r13 verdict perf item: the planner math
    // itself was the cost — |pairs|·|configs| product-chain
    // evaluations, 7.7M·16 at sf0.1): every per-pair quantity here —
    // J, the S-curve p, its ppm quantization, the wanted flag — is a
    // pure function of (n_common, n_union), so the census first
    // collapses to its DISTINCT (n_common, n_union) groups with
    // counts (hundreds of rows: both ints are bounded by per-doc
    // token counts; one map-side-combined aggregate over the pinned
    // census) and the 16 chains evaluate once per GROUP, weighted by
    // the group count. Identical IEEE inputs ⇒ identical p_q per
    // group ⇒ every output sum is bit-identical to the per-pair
    // spelling (Σ_pairs p_q = Σ_groups n_g·p_q exactly — int64
    // arithmetic; n_g·p_q ≤ 10⁶·|pairs| keeps far inside int64). */
    val grouped = census.getOrElse(candidatePairStats(docs, 100))
      .groupBy("n_common", "n_union")
      .agg(count(lit(1)).as("n_g"))
      .withColumn("jacc",
        col("n_common").cast("double") / col("n_union").cast("double"))
    val cfgExprs = configs.map { case (b, r) =>
      s"$b, $r, ${detectProbExpr(b, r)}"
    }.mkString(", ")
    grouped
      .selectExpr("n_common", "n_union", "n_g",
        s"stack(${configs.size}, $cfgExprs) AS (n_bands, rows_per_band, p)")
      .withColumn("p_q", expr("CAST(round(p * 1000000.0, 0) AS BIGINT)"))
      .withColumn("wanted", expr("2 * n_common >= n_union"))
      .groupBy("n_bands", "rows_per_band")
      .agg(sum("n_g").as("n_pairs"),
        sum(col("p_q") * col("n_g")).as("det_ppm"),
        sum(when(col("wanted"), col("n_g")).otherwise(lit(0L)))
          .as("n_wanted"),
        sum(when(col("wanted"), col("p_q") * col("n_g"))
          .otherwise(lit(0L))).as("det_wanted_ppm"),
        sum(when(!col("wanted"), col("p_q") * col("n_g"))
          .otherwise(lit(0L))).as("det_unwanted_ppm"))
      .withColumn("mean_det",
        expr("CAST(det_ppm AS DOUBLE) / 1000000.0 / n_pairs"))
      .orderBy("rows_per_band", "n_bands")
  }

  /** F3 — SimHash signature per document ([[PortableText.SimHashBits]]
    * bits). */
  def simHashSig(docs: DataFrame): DataFrame = {
    PolyHash.register(docs.sparkSession)
    graft.functions.SimHash64.register(docs.sparkSession)
    docs
      .withColumn("th", expr(tokenHashes))
      .withColumn("simhash", expr(simHash))
      .select("doc_id", "simhash")
      .orderBy("doc_id")
  }

  /** F3b — simhash near-dups: pairs within `maxHamming` bits, found by
    * PIGEONHOLE multi-band bucketing. The signature is split into
    * `maxHamming + 1` disjoint bit bands; two sigs within `maxHamming`
    * differing bits MUST agree exactly on at least one band, so the
    * union of per-band equality joins has recall 1 — unlike the round-1
    * top-byte bucket, which both missed pairs and concentrated the
    * corpus into 256 buckets. Candidate volume per band is bounded by
    * the 2^(bits/bands) band-value space (256 values at 32/4; a 64-bit
    * production sig gives 65536 — same code, wider constant). The
    * exact hamming check runs only on candidates.
    */
  def simHashPairs(sigs: DataFrame, maxHamming: Int,
                   bits: Int = SimHashBits): DataFrame = {
    val bands = maxHamming + 1
    val bandWidth = (bits + bands - 1) / bands
    require(bits > maxHamming, s"maxHamming $maxHamming too large for $bits-bit sigs")
    // INTERLEAVED band assignment: band j gathers bit positions
    // j, j+bands, j+2·bands, … Contiguous slices would be wrong here:
    // simhash entropy concentrates in the low bits (token-hash votes),
    // so a contiguous high half is near-constant across a real corpus
    // and its band collapses into one mega-bucket (measured: one value
    // held 57% of sf0.1 docs — 4M candidate pairs from a single key).
    // Interleaving spreads every band across the full entropy range;
    // the bands still PARTITION bit positions, so the pigeonhole
    // recall-1 guarantee is untouched. Positions past `bits` shift to
    // zero and contribute nothing.
    val gather = (0 until bandWidth)
      .map(k => expr(s"((simhash >> (band + $k * $bands)) & 1) << $k"))
      .reduceLeft(_ + _)
    // Materialization barrier: without it, projection collapse inlines
    // the full simhash HOF into BOTH self-join sides and the
    // downstream hamming/filter expressions, re-evaluating the
    // signature far beyond once per doc (measured 12.4 s vs 2.0 s at
    // sf0.1). The sig table is tiny — one narrow row per doc — so an
    // eager local materialization costs nothing at any scale relative
    // to the pair join it feeds.
    val banded = sigs.select(col("doc_id"), col("simhash"))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_bits", gather)
      .localCheckpoint(true)
    val a = banded.select(col("band"), col("band_bits"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("band_bits"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    // First-matching-band dedup: a pair that agrees on several bands
    // would surface once per band; instead of a distinct() exchange
    // over the (result-sized) pair set, keep the emission from band j
    // only when every band k < j DIFFERS — a constant-mask test on
    // sh_a^sh_b (band k's bit positions are k, k+bands, …). Each true
    // pair then appears exactly once and the pipeline has no
    // pair-keyed shuffle at all.
    val bandMask: Int => Long = k =>
      (0 until bandWidth).foldLeft(0L) { (acc, m) =>
        val pos = k + m * bands
        if (pos < bits) acc | (1L << pos) else acc
      }
    val firstMatchingBand = (0 until bands).map { j =>
      (0 until j).foldLeft(col("band") === j) { (acc, k) =>
        acc && (expr(s"(sh_a ^ sh_b) & ${bandMask(k)}L") =!= lit(0L))
      }
    }.reduce(_ || _)
    a.join(b, Seq("band", "band_bits"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxHamming && firstMatchingBand)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** F4 — character-3-gram Jaccard similarity between documents of the
    * same (lang, source) bucket, sampled to every 5th doc, with a
    * document-frequency cap on the inverted index.
    *
    * Grams present in more than `maxDf` documents of a bucket are
    * dropped before the pair join: a stop-gram shared by k docs
    * otherwise yields k² join rows from that single key — quadratic at
    * corpus scale — while contributing almost nothing to Jaccard
    * precision (standard LSH/dedup practice). The reported score is
    * therefore a LOWER BOUND on true Jaccard: the intersection counts
    * only capped grams, the denominators |A|,|B| stay full. True
    * near-dups share their low-df grams too, so they still score high.
    */
  def ngramJaccard(docs: DataFrame, minJaccard: Double,
                   maxDf: Int = 20): DataFrame = {
    graft.functions.CharGrams.register(docs.sparkSession)
    // Inverted-index formulation: |A∩B| comes from a gram-equality
    // self-join (shuffle by gram, partial-agg counts) instead of
    // per-pair array unions — pairs with zero shared grams never
    // materialize, and no array ever crosses the pair loop. This is
    // the only shape that survives a corpus where the pair space is
    // quadratic; the per-pair array-union version it replaces was 5×
    // slower already at sf0.1.
    // Materialization barrier, as in simHashPairs/greedyNearDup:
    // g feeds the counts frame (joined twice, as |A| and |B|) AND the
    // inverted index — without the checkpoint each consumer re-runs
    // the scan plus the per-doc gram extraction, paying the dominant
    // sketch cost up to 4×.
    val g = docs
      .filter(col("doc_id") % 5 === 0)
      .withColumn("grams", expr(grams3))
      .select(col("doc_id"), col("lang"), col("source"), col("grams"),
        size(col("grams")).as("n"))
      .localCheckpoint(true)
    val counts = g.select("doc_id", "n")
    // join key = 64-bit hash of (bucket, gram): the shuffle carries one
    // bigint instead of three strings (engine-local detail — the gram
    // SETS are unchanged, so results match the oracle's array algebra)
    val inv = g
      .select(col("doc_id"), col("lang"), col("source"),
        explode(col("grams")).as("gram"))
      .select(col("doc_id"),
        xxhash64(col("lang"), col("source"), col("gram")).as("gkey"))
    // df cap via a window over the same gkey partitioning the pair
    // join needs — the exchange is planned once, no extra shuffle.
    val capped = inv
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gkey")))
      .filter(col("df") <= maxDf)
      .drop("df")
    val a = capped.select(col("gkey"), col("doc_id").as("doc_a"))
    val b = capped.select(col("gkey"), col("doc_id").as("doc_b"))
    val inter = a.join(b, Seq("gkey"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    // counts grows with the corpus - unbounded, so no broadcast hint
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** F45 — ASYMMETRIC CONTAINMENT pairs: C(A→B) = |A∩B| / |A| over
    * char-3-gram sets — the "is document A substantially INSIDE
    * document B" relation (quotation, boilerplate inclusion, a short
    * doc embedded in a long aggregate page). Jaccard (F4) misses
    * exactly these: a 100-gram doc fully contained in a 10,000-gram
    * doc has Jaccard ≈ 0.01 but containment 1.0 — and containment-
    * pruning subset docs is standard corpus practice alongside
    * near-dup removal.
    *
    * Same scale shape as F4's inverted index (the only shape that
    * survives a quadratic pair space): gram-keyed equi-join computes
    * |A∩B| without materializing non-overlapping pairs, df-capped so
    * a stop-gram shared by k docs can't mint k² rows. ORDERED pairs
    * (a≠b, both directions) since containment is asymmetric; the
    * score divides exact int64 counts — one IEEE division, unrounded.
    * Reported score is a LOWER bound (intersection counts capped
    * grams only, |A| stays full) — true containments survive because
    * their low-df grams dominate. */
  def containmentPairs(docs: DataFrame, minContainment: Double,
                       maxDf: Int = 20): DataFrame = {
    graft.functions.CharGrams.register(docs.sparkSession)
    val g = docs
      .filter(col("doc_id") % 5 === 0)
      .withColumn("grams", expr(grams3))
      .select(col("doc_id"), col("lang"), col("source"),
        col("grams"), size(col("grams")).cast("long").as("n"))
      .localCheckpoint(true)
    val counts = g.select("doc_id", "n")
    val inv = g
      .select(col("doc_id"), col("lang"), col("source"),
        explode(col("grams")).as("gram"))
      .select(col("doc_id"),
        xxhash64(col("lang"), col("source"), col("gram")).as("gkey"))
    val capped = inv
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gkey")))
      .filter(col("df") <= maxDf)
      .drop("df")
    val a = capped.select(col("gkey"), col("doc_id").as("doc_a"))
    val b = capped.select(col("gkey"), col("doc_id").as("doc_b"))
    val inter = a.join(b, Seq("gkey"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), "doc_a")
      .withColumn("containment",
        col("inter").cast("double") / col("na").cast("double"))
      .filter(col("containment") >= minContainment)
      .select("doc_a", "doc_b", "inter", "na", "containment")
      .orderBy("doc_a", "doc_b")
  }

  /** F13 — dedup CLUSTERING: connected components over a near-dup
    * candidate pair graph, canonical representative = the component's
    * minimum doc_id. This is the step after every pair generator
    * ([[candidatePairs]], [[simHashPairs]], [[ngramJaccard]]) in a real
    * training-data pipeline: "keep one document per duplicate cluster".
    *
    * Iterative min-label propagation to FIXPOINT: each round, every
    * node takes the min of its own label and its neighbors' labels —
    * one shuffle join per round, converging in O(graph diameter)
    * rounds (near-dup clusters are shallow: dups of a common template
    * sit 1-2 hops apart). The driver loop is control flow only; data
    * never leaves the cluster. `localCheckpoint` truncates the lineage
    * each round so plan size stays constant. This is the standard
    * large-graph CC shape (GraphX/GraphFrames run the same joins).
    *
    * Unclustered docs (no candidate pair) are their own cluster.
    */
  /** F91 — QUALITY-AWARE CANONICAL SELECTION: which copy of each
    * near-dup cluster SURVIVES. F13's drop-the-label-min rule keeps
    * whichever member happens to carry the smallest id — fine for
    * counting, wrong for curation: the member worth keeping is the
    * most complete one (truncated mirrors, stripped boilerplate
    * copies, and partial re-crawls all lose tokens relative to the
    * original — "keep the longest" is the standard canonicalization
    * heuristic, and any other scalar quality score drops into the
    * same argmax). Canonical = max token count, ties to the SMALLEST
    * doc_id — spelled as the collision-free two-phase max-then-min
    * (a struct/arg_max spelling has engine-specific tie behavior;
    * two grouped aggregates have none).
    *
    * Shape: the F13 bipartite CC (pair graph never materialized)
    * plus one narrow per-doc token count, then two |clusters|-sized
    * aggregates and a broadcast-scale join back. The cluster frame
    * checkpoints once — it feeds the max phase, the tie phase, and
    * the final projection. */
  def canonicalSelection(docs: DataFrame): DataFrame = {
    val j = dedupClustersFromBuckets(docs, minhashBucketAssignments(docs))
      .select("doc_id", "cluster")
      .join(docs.select(col("doc_id"),
        expr(s"size($tokens)").cast("long").as("n_tokens")), "doc_id")
      .localCheckpoint(true)
    val mt = j.groupBy("cluster").agg(max(col("n_tokens")).as("_mt"))
    val canon = j.join(mt, "cluster")
      .filter(col("n_tokens") === col("_mt"))
      .groupBy("cluster").agg(min(col("doc_id")).as("canonical_id"))
    j.join(canon, "cluster")
      .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
      .select("doc_id", "cluster", "n_tokens", "canonical_id",
        "is_canonical")
      .orderBy("doc_id")
  }

  def dedupClusters(docs: DataFrame, pairs: DataFrame,
                    maxIter: Int = 20): DataFrame = {
    // Symmetric edge list; every doc is a node (isolated docs too).
    // Materialized ONCE — otherwise every iteration re-executes the
    // whole pair-generation lineage (an ngramJaccard input would
    // re-run its inverted-index join per round).
    val edges = pairs.select(col("doc_a"), col("doc_b"))
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint(true)
    var labels = docs.select(col("doc_id"))
      .withColumn("lbl", col("doc_id")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("doc_b") === labels("doc_id"))
        .groupBy(edges("doc_a").as("nid"))
        .agg(min("lbl").as("nbr_lbl"))
      val viaEdge = labels.join(nbrMin, labels("doc_id") === col("nid"), "left")
        .select(col("doc_id"), col("lbl").as("prev_lbl"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
      // Pointer jumping from round 2, as in [[dedupClustersFromBuckets]]:
      // shallow graphs converge before it can help and skip its
      // self-join + plan compile; deep graphs keep O(log diameter).
      val next = (if (iter < 2) viaEdge
        else viaEdge.as("x")
          .join(viaEdge.select(col("doc_id").as("j_id"), col("lbl").as("j_lbl")),
            col("x.lbl") === col("j_id"), "left")
          .select(col("x.doc_id").as("doc_id"), col("prev_lbl"),
            least(col("x.lbl"), coalesce(col("j_lbl"), col("x.lbl"))).as("lbl")))
        .localCheckpoint(eager = false)
      // One job per round: the lazy checkpoint materializes inside the
      // convergence count (see [[dedupClustersFromBuckets]]).
      converged = next.filter(col("lbl") =!= col("prev_lbl")).count() == 0L
      labels = next.select("doc_id", "lbl")
      iter += 1
    }
    // Partial labels are WRONG answers (one true component with several
    // keep=true representatives) — refuse to return them silently.
    if (!converged) throw new IllegalStateException(
      s"dedupClusters did not converge in $maxIter rounds; " +
        "raise maxIter (rounds needed ~ log2 of the component diameter)")
    labels
      .select(col("doc_id"), col("lbl").as("cluster"))
      .withColumn("keep", col("doc_id") === col("cluster"))
      .orderBy("doc_id")
  }

  /** The doc→bucket assignment feed for [[dedupClustersFromBuckets]]
    * exactly as `q_dedup_clusters` registers it: unordered minhash
    * bands, NULL band_hash dropped (token-less docs must stay
    * ISOLATED — xxhash64 skips null args, so without the filter every
    * empty doc would collapse onto xxhash64(band) and co-cluster),
    * bucket key = xxhash64(band, band_hash). ONE definition shared by
    * the registry and the diagnostics (CcDiag) so a measurement can
    * never silently drift from the measured query. */
  def minhashBucketAssignments(docs: DataFrame): DataFrame =
    minHashBands(docs, ordered = false)
      .filter(col("band_hash").isNotNull)
      .withColumn("bkey", xxhash64(col("band"), col("band_hash")))

  /** F13b — dedup clustering WITHOUT materializing the pair graph:
    * min-label propagation over the doc↔bucket BIPARTITE graph. Two
    * docs are connected iff they share an LSH bucket, so the
    * components equal [[dedupClusters]] over [[candidatePairs]] — but
    * the bipartite edge list is |docs|·bands rows (linear) where the
    * pair graph is quadratic in bucket size (measured at sf0.1: the
    * pair-graph version took 63 s against millions of candidate
    * edges; this one runs in seconds over 20k assignment rows). Each
    * round is two small shuffles (doc→bucket min, bucket→doc min);
    * convergence in O(diameter) rounds, diameter counted in bipartite
    * hops.
    */
  def dedupClustersFromBuckets(docs: DataFrame, assignments: DataFrame,
                               maxIter: Int = 20): DataFrame =
    dedupClustersFromBucketsWithRounds(docs, assignments, maxIter)._1

  /** [[dedupClustersFromBuckets]] plus the number of propagation
    * rounds run to reach the fixpoint — observable so a spec can
    * assert the O(log diameter) pointer-jumping bound on adversarial
    * (long-chain) graphs. */
  def dedupClustersFromBucketsWithRounds(
      docs: DataFrame, assignments: DataFrame,
      maxIter: Int = 20): (DataFrame, Int) = {
    // Job-count discipline: the wall time of an iterative kernel on a
    // contended cluster is driven by driver-coordinated barriers and
    // plan-compile overhead, not data volume. Four choices below keep
    // them minimal (a fused two-hop+jump round was tried and measured
    // SLOWER cold — the deeper plan's AQE/codegen cost exceeded the
    // barrier savings — so rounds stay shallow):
    //  (1) labels start as the IDENTITY projection — a trivial plan
    //      that is NOT checkpointed: round 0 reads it straight from
    //      the (pruned) source scan instead of paying a dedicated
    //      materialization job. Every round then has the same plan
    //      shape, so whole-stage codegen compiles the round ONCE and
    //      every later round hits the janino cache.
    //  (2) the convergence probe is FUSED into the round's
    //      materialization: the lazy localCheckpoint persists the
    //      round's labels the first time they are computed, and that
    //      first compute is the changed-label count — one job per
    //      round, not a materialize + isEmpty pair.
    //  (3) pointer jumping (union-find path halving) engages only from
    //      round 2: near-dup corpora are template-shaped (diameter 1-2)
    //      and converge before the jump can help, so the common case
    //      never pays the self-join's exchanges OR its whole-stage
    //      compile. Deep graphs hit round 2 and get the O(log
    //      diameter) bound unchanged (spec'd on a diameter-512 chain).
    //  (4) AQE stays ON: its runtime coalescing and broadcast
    //      conversion are what keep the tiny label/bucket shuffles
    //      cheap (measured: forcing static 32-partition exchanges more
    //      than doubled round time).
    // REJECTED shave (round 8, measured): restricting the iteration
    // to docs in ≥2-doc buckets (bucket-size window filter on the
    // checkpoint, anti-join the isolated docs back after the loop)
    // was ~25% SLOWER end-to-end at sf0.1 — the window adds a shuffle
    // to the checkpoint job and the union/anti-join taxes exec, while
    // the template-heavy corpus leaves the "connected" subgraph
    // nearly as large as the corpus, so the per-round shuffles shrink
    // by nothing. Revisit only with evidence of a low-dup-rate corpus
    // where the subgraph is a small fraction.
    val assign = assignments.select(col("doc_id"), col("bkey"))
      .localCheckpoint(true)
    var labels = docs.select(col("doc_id"))
      .withColumn("lbl", col("doc_id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val bucketMin = assign.join(labels, "doc_id")
        .groupBy("bkey").agg(min("lbl").as("blbl"))
      val docMin = assign.join(bucketMin, "bkey")
        .groupBy("doc_id").agg(min("blbl").as("nlbl"))
      val viaBucket = labels.join(docMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lbl").as("prev_lbl"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      // Jump: adopt the label of one's label — shrinks chains
      // exponentially. viaBucket feeds both self-join sides, but its
      // exchanges are planned once and reused (ReusedExchange).
      val next = (if (iter < 2) viaBucket
        else viaBucket.as("x")
          .join(viaBucket.select(col("doc_id").as("j_id"), col("lbl").as("j_lbl")),
            col("x.lbl") === col("j_id"), "left")
          .select(col("x.doc_id").as("doc_id"), col("prev_lbl"),
            least(col("x.lbl"), coalesce(col("j_lbl"), col("x.lbl"))).as("lbl")))
        .localCheckpoint(eager = false)
      // Labels only ever decrease, so round-stability (zero changed
      // labels vs the previous round) is the fixpoint. Round 0 is
      // normally not probed: any corpus with one shared bucket changes
      // a label in round 0, so its count job is a wasted barrier —
      // skipping it lets round 1's count materialize rounds 0 AND 1
      // in a single job (the lazy checkpoints chain). A corpus with
      // no duplicates at all pays one extra (tiny) round instead. The
      // skip never applies to the LAST allowed round (maxIter = 1
      // would otherwise throw "did not converge" on an already-
      // converged corpus).
      converged = (iter > 0 || iter == maxIter - 1) &&
        next.filter(col("lbl") =!= col("prev_lbl")).count() == 0L
      labels = next.select("doc_id", "lbl")
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"dedupClustersFromBuckets did not converge in $maxIter rounds; " +
        "raise maxIter (rounds needed ~ log2 of the component diameter)")
    (labels
      .select(col("doc_id"), col("lbl").as("cluster"))
      .withColumn("keep", col("doc_id") === col("cluster"))
      .orderBy("doc_id"), iter)
  }

  /** F8 — language-ID by marker-word voting (n-gram heuristic family):
    * count hits from per-language stopword lists, predict the argmax
    * with a fixed tie-break order. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  def langId(docs: DataFrame): DataFrame = {
    val hitCols = langMarkers.map { case (l, ws) =>
      expr(wordHits(ws)).as(s"hits_$l")
    }
    // argmax with first-wins tie-break, derived from langMarkers so the
    // language set lives in exactly one place
    val langs = langMarkers.map(_._1)
    val predicted = langs.init.zipWithIndex.foldRight(
      lit(langs.last): org.apache.spark.sql.Column) { case ((l, i), rest) =>
      val beatsRest = langs.drop(i + 1)
        .map(o => col(s"hits_$l") >= col(s"hits_$o")).reduce(_ && _)
      when(beatsRest, l).otherwise(rest)
    }
    docs
      .select(Seq(col("doc_id"), col("lang")) ++ hitCols: _*)
      .withColumn("predicted", predicted)
      .orderBy("doc_id")
  }

  /** F56 — LANGUAGE CONFUSION MATRIX: declared `lang` label vs F8's
    * detected language, as (declared, predicted) pair counts with the
    * per-declared-label agreement share — the metadata-trust audit
    * every multilingual corpus needs before `lang` drives a mix or a
    * filter (a declared label that disagrees with detection at 40% is
    * not a label, it is noise; F52's mix weights would inherit it).
    * Built ON [[langId]] (one definition of the detector), collapsed
    * by one (declared, predicted) aggregate — |langs|² rows. The
    * agreement share joins back on the declared-label marginal via
    * its own grouping key (F35's join-back rule); exact int64 counts,
    * share exact bps (F52's quantization). */
  def langConfusion(docs: DataFrame): DataFrame = {
    val cells = langId(docs)
      .groupBy(col("lang").as("declared"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(true)
    val marginals = cells.groupBy("declared")
      .agg(sum("n_docs").as("n_declared"))
    cells.join(marginals, Seq("declared"))
      .withColumn("cell_share_bp",
        expr("(n_docs * 10000) DIV n_declared"))
      .withColumn("agree", col("declared") === col("predicted"))
      .select("declared", "predicted", "n_docs", "n_declared",
        "cell_share_bp", "agree")
      .orderBy("declared", "predicted")
  }

  /** F9 — document quality scoring: length, punctuation ratio,
    * stopword ratio, mean word length — the classic pre-training
    * corpus filters (all narrow, codegen'd). */
  def qualityScore(docs: DataFrame, stopwords: Seq[String]): DataFrame = {
    // Zero-length guards: Spark 4 defaults to ANSI mode, where x/0
    // THROWS — an empty or whitespace-only document must yield NULL
    // ratios, not kill the scan.
    val nTok = expr(s"size($tokens)")
    docs.select(
      col("doc_id"),
      length(col("text")).as("len"),
      nTok.as("n_tokens"),
      when(length(col("text")) > 0,
        expr("regexp_count(text, '[.,!?;]')").cast("double")
          .divide(length(col("text")))).as("punct_ratio"),
      when(nTok > 0,
        expr(wordHits(stopwords)).cast("double").divide(nTok))
        .as("stop_ratio"),
      when(nTok > 0,
        expr(s"aggregate(transform($tokens, t -> length(t)), 0, (a, b) -> a + b)")
          .cast("double").divide(nTok)).as("mean_word_len"))
      .orderBy("doc_id")
  }

  /** F10 — token counting: whitespace tokens + a BPE-ish regex count
    * (letter runs / digit runs / single punctuation as one token). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr(s"size($tokens)").as("n_ws_tokens"),
      expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')").as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** F9b — repetition profile: duplicate-token ratio per document
    * (Gopher-style repetition filter). Distinct/total are exact ints →
    * the ratio is unrounded (SURVEY §6). */
  def repetitionProfile(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr(s"size($tokens)").as("n_tokens"),
      expr(s"size(array_distinct($tokens))").as("n_distinct"))
      // ANSI-mode guard: x/0 throws in Spark 4; empty docs score NULL
      .withColumn("rep_ratio",
        when(col("n_tokens") > 0,
          lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")))
      .orderBy("doc_id")

  /** F9c — repeated-SPAN profile: the Gopher-family "fraction of
    * duplicate word n-grams" rule, which catches looped PASSAGES that
    * token-level repetition ([[repetitionProfile]]) misses — a doc
    * cycling a 20-word paragraph has near-zero duplicate-token signal
    * but a dup_ratio near 1 here. `n_dup_grams` counts every repeated
    * occurrence (total − distinct); the ratio is one exact-int
    * division, unrounded (SURVEY §6), NULL for docs shorter than `n`
    * tokens. Narrow one-pass over the native `graft_wordgrams`
    * expression — no shuffle, no explode. */
  def repeatedSpans(docs: DataFrame, n: Int = 3): DataFrame = {
    graft.functions.WordGrams.register(docs.sparkSession)
    docs.select(
      col("doc_id"),
      expr(s"size(graft_wordgrams($tokens, $n))").as("n_grams"),
      expr(s"size(graft_wordgrams($tokens, $n)) - " +
        s"size(array_distinct(graft_wordgrams($tokens, $n)))").as("n_dup_grams"))
      .withColumn("dup_ratio",
        when(col("n_grams") > 0,
          col("n_dup_grams").cast("double") / col("n_grams")))
      .orderBy("doc_id")
  }

  /** F10b — corpus token frequency: global top-k tokens (Zipf
    * profile). Explode + groupBy: partial aggregation makes the
    * shuffle carry one row per distinct token per partition, not one
    * per occurrence. */
  def tokenFrequency(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(explode(expr(tokens)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)

  /** F98 — HEAPS'-LAW VOCABULARY-GROWTH FIT: how fast does the
    * vocabulary grow as the corpus grows — `V(N) ≈ K·N^β` fitted as
    * an ln–ln OLS over B corpus PREFIXES — the dataset-sizing law
    * that prices "how many new tokens does the next shard buy"
    * (tokenizer vocab budgeting, dedup-saturation forecasting; the
    * GROWTH companion to F57's static Zipf fit, and the two
    * exponents are theoretically linked). Prefixes are doc_id RANGE
    * buckets (the corpus's ingestion order; equal-mass only for
    * dense ids — stated, and irrelevant to the fit, which consumes
    * the exact (N, V) points wherever they sit). A token's first
    * appearance pins it to ONE bucket (min doc_id), so cumulative
    * vocabulary is a suffix-free cumulative histogram — never a
    * distinct-count per prefix (B distinct scans would be the naive
    * spelling; this is one).
    *
    * Shape: one token explode → (token, min doc_id) aggregate + one
    * per-doc token count — the only corpus-sized work; everything
    * after runs on B-row frames (the bounded-window exemption).
    * Engine-exactness: bucket ids exact integer division (both
    * engines truncate non-negative); cumulative counts exact int64;
    * the ln–ln sums are ROUNDED 4 before the closed form (the F57
    * discipline — downstream arithmetic is then deterministic
    * regardless of engine sum order); slope/intercept/r2 round(4).
    * Empty-prefix points (zero tokens) drop before the logs. */
  def heapsFit(docs: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need >= 2 prefix points: $buckets")
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    val bkt = s"CAST(doc_id * $buckets DIV (mx + 1) AS INT)"
    val perDoc = docs
      .select(col("doc_id"), expr(s"size($tokens)").as("n_tok"))
      .crossJoin(broadcast(mx))
      .groupBy(expr(bkt).as("b"))
      .agg(sum(col("n_tok")).as("toks"))
    val firstB = docs
      .select(col("doc_id"), explode(expr(tokens)).as("token"))
      .groupBy("token").agg(min(col("doc_id")).as("doc_id"))
      .crossJoin(broadcast(mx))
      .groupBy(expr(bkt).as("b"))
      .agg(count(lit(1)).as("vocab"))
    // global window BOUNDED by construction: the frame is the
    // Heaps-fit BUCKET grid (<= log2(max token count) rows), never
    // documents (the r12 WindowExec-warning audit pin)
    val wB = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, 0)
    val pts = perDoc.join(firstB, Seq("b"), "full_outer")
      .select(col("b"), coalesce(col("toks"), lit(0L)).as("toks"),
        coalesce(col("vocab"), lit(0L)).as("vocab"))
      .withColumn("cum_toks", sum(col("toks")).over(wB))
      .withColumn("cum_vocab", sum(col("vocab")).over(wB))
      .filter(col("cum_toks") > 0 && col("cum_vocab") > 0)
      .withColumn("x", log(col("cum_toks").cast("double")))
      .withColumn("y", log(col("cum_vocab").cast("double")))
    val sums = pts.agg(count(lit(1)).as("n_points"),
      round(sum(col("x")), 4).as("sx"),
      round(sum(col("y")), 4).as("sy"),
      round(sum(col("x") * col("x")), 4).as("sxx"),
      round(sum(col("x") * col("y")), 4).as("sxy"),
      round(sum(col("y") * col("y")), 4).as("syy"))
    sums
      .withColumn("_cov",
        col("n_points") * col("sxy") - col("sx") * col("sy"))
      .withColumn("_vx",
        col("n_points") * col("sxx") - col("sx") * col("sx"))
      .withColumn("_vy",
        col("n_points") * col("syy") - col("sy") * col("sy"))
      .withColumn("heaps_beta",
        when(col("_vx") > 0, round(col("_cov") / col("_vx"), 4)))
      .withColumn("ln_k",
        when(col("_vx") > 0, round(
          (col("sy") - (col("_cov") / col("_vx")) * col("sx")) /
            col("n_points"), 4)))
      .withColumn("r2",
        when(col("_vx") > 0 && col("_vy") > 0, round(
          (col("_cov") * col("_cov")) / (col("_vx") * col("_vy")), 4)))
      .select("n_points", "heaps_beta", "ln_k", "r2")
  }

  /** F95 — DUPLICATION-GRAPH SOURCE CENTRALITY (weighted PageRank):
    * the link-analysis representative — nodes are SOURCES, a
    * directed edge (s → t) weighs how many identical-content doc
    * pairs the two feeds share (F1b's cross-source dup matrix as a
    * graph), and `iters` damped PageRank rounds score each source's
    * centrality IN THE COPYING NETWORK: mirror hubs and scraped-feed
    * clusters rank high, original feeds low — the curation signal
    * for "which source is everyone else copying" that pairwise dup
    * counts can't see (centrality is transitive; a matrix cell
    * isn't). Dangling sources (no outgoing duplication) keep the
    * teleport mass only — the standard simplified variant, stated.
    *
    * Shape: the corpus-sized work is ONE fingerprint collapse
    * (per-(fp, source) multiplicities); the edge frame is
    * |sources|²-bounded and every PageRank round runs on it (the
    * F13/F59 bounded-cascade discipline, localCheckpoint per round;
    * |nodes| is a bounded driver count, the A19 rule). At 100 TB the
    * cost is the one fingerprint aggregate every dedup pass already
    * pays.
    *
    * Engine-exactness: weights exact int64 (multiplicity products);
    * every per-round double — teleport `(1.0 − d)/N`, edge share
    * `w/outw`, damped sum — is ONE interpolated spelling shared with
    * the oracle's GENERATED round cascade (the bpeCascadeSql rule:
    * same loop count by construction); final score round(4). */
  def sourceCentrality(docs: DataFrame, iters: Int = 10,
                       damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"need at least one round: $iters")
    import graft.functions.PortableText.docFingerprint
    graft.functions.PolyHash.register(docs.sparkSession)
    val perSrcFp = docs
      .select(col("source"), expr(docFingerprint).as("fp"))
      .groupBy("fp", "source").agg(count(lit(1)).as("n"))
    val e = perSrcFp.as("a")
      .join(perSrcFp.select(col("fp"), col("source").as("dst"),
        col("n").as("m")), Seq("fp"))
      .filter(col("source") =!= col("dst"))
      .groupBy(col("source").as("src"), col("dst"))
      .agg(sum(col("n") * col("m")).as("w"))
      .localCheckpoint(true)
    val nodes = docs.select("source").distinct().localCheckpoint(true)
    val nN = nodes.count()
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
      .localCheckpoint(true)
    var pr = nodes.withColumn("pr", expr(s"1.0 / $nN"))
    for (_ <- 1 to iters) {
      val contrib = e.join(outw, Seq("src"))
        .join(pr.select(col("source").as("src"), col("pr")), Seq("src"))
        .groupBy(col("dst").as("source"))
        .agg(sum(expr("pr * (CAST(w AS DOUBLE) / CAST(outw AS DOUBLE))"))
          .as("inflow"))
      pr = nodes.join(contrib, Seq("source"), "left")
        .withColumn("pr", expr(
          s"(1.0 - $damping) / $nN + $damping * coalesce(inflow, 0.0)"))
        .select("source", "pr")
        .localCheckpoint(true)
    }
    pr.select(col("source"), round(col("pr"), 4).as("pagerank"))
      .orderBy("source")
  }

  /** F94 — INCREMENTAL VOCABULARY MAINTENANCE (mergeable-statistics
    * release update): the corpus's token-frequency table for release
    * N+1 produced by MERGING release N's persisted stats with the
    * delta batch's stats — `counts_{N+1} = counts_N ⊎ counts_Δ`
    * (union + token-keyed sum) — never by rescanning release N:
    * the property every 100 TB statistics pipeline lives on (a
    * release rescan is a cluster-day; a merge is delta-sized plus a
    * vocab-sized aggregate). Token counts are the archetype; the
    * same algebra carries every sum/count/HLL/CMS artifact in the
    * F-block (F14b's HLL max-merge, F47's CMS cell-sum are its
    * sketch-side siblings).
    *
    * The oracle PROVES merge-equals-recompute: the Spark side builds
    * the answer as two scans (base ≤ splitId < delta) merged; the
    * DuckDB dual recomputes all three columns from the full corpus
    * in one pass — a hash match IS the algebraic identity, checked
    * at every gate SF. Top-k selected per the termSearch heap
    * discipline (never a global rank window); counts exact int64. */
  def incrementalVocab(docs: DataFrame, splitId: Long, k: Int): DataFrame = {
    def stats(part: DataFrame) = part
      .select(explode(expr(tokens)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val base = stats(docs.filter(col("doc_id") <= splitId))
      .withColumnRenamed("cnt", "base_cnt")
    val delta = stats(docs.filter(col("doc_id") > splitId))
      .withColumnRenamed("cnt", "delta_cnt")
    base.join(delta, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("base_cnt"), lit(0L)).as("base_cnt"),
        coalesce(col("delta_cnt"), lit(0L)).as("delta_cnt"))
      .withColumn("total_cnt", col("base_cnt") + col("delta_cnt"))
      .orderBy(col("total_cnt").desc, col("token")).limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("total_cnt").desc, col("token"))))
      .select("rnk", "token", "base_cnt", "delta_cnt", "total_cnt")
      .orderBy("rnk")
  }

  /** F54 — TOKEN CONCENTRATION profile: how head-heavy is the corpus
    * vocabulary — the top-k occurrence share and the Herfindahl
    * index of the token distribution (the two scalars that flag a
    * boilerplate-flooded or near-single-template corpus long before
    * eyeballing a Zipf plot; a natural-language corpus has HHI ~1e-3,
    * a log-spam corpus ~1e-1). Share is exact int64 basis points —
    * `(Σ top-k freq · 10⁴) div N` (F52's quantization). The HHI
    * numerator `Σ f²` stays exact int64 (safe to ~3·10⁹ total
    * occurrences; at 100 TB swap the f² sum to a DOUBLE aggregate —
    * documented, not silently done); the index itself is `Σf² / N²`
    * with N² formed in ONE IEEE multiply of the same exact int — two
    * IEEE ops on identical inputs, bit-identical across engines.
    * Top-k selection is total-ordered (freq desc, token) so ties are
    * engine-stable. Shape: one explode+agg whose shuffle carries
    * distinct tokens (map-side partials), then a vocab-sized sort for
    * the k head rows and two 1-row aggregates. */
  def tokenConcentration(docs: DataFrame, k: Int): DataFrame = {
    val freqs = docs
      .select(explode(expr(tokens)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)
    val totals = freqs.agg(
      sum("freq").as("n_occurrences"),
      count(lit(1)).as("n_vocab"),
      sum(col("freq") * col("freq")).as("sum_f2"))
    val head = freqs
      .orderBy(col("freq").desc, col("token"))
      .limit(k)
      .agg(sum("freq").as("topk_occ"))
    totals.crossJoin(head)
      .withColumn("topk_share_bp",
        when(col("n_occurrences") > 0,
          expr("(topk_occ * 10000) DIV n_occurrences")))
      .withColumn("hhi",
        when(col("n_occurrences") > 0,
          col("sum_f2").cast("double") /
            (col("n_occurrences").cast("double")
              * col("n_occurrences").cast("double"))))
      .select("n_occurrences", "n_vocab", "topk_occ", "topk_share_bp",
        "sum_f2", "hhi")
  }

  /** F30 — BOILERPLATE-SHARE profile: per document, how many of its
    * DISTINCT word `n`-grams occur in at least one other document, and
    * the resulting shared fraction — the per-doc "how templated is
    * this text" signal that sits between F9's intra-doc repetition
    * rules and F22's corpus-level line dedup (a doc can be internally
    * clean yet wholly assembled from corpus boilerplate; this is the
    * number that catches it). Shape: per-doc DISTINCT grams (partial
    * agg collapses template grams), gram df, join back keyed on the
    * gram, one per-doc count — never doc×doc. The ratio is one IEEE
    * division of exact counts (unrounded, SURVEY §6); gram-less docs
    * report zero counts with NULL ratio. */
  def boilerplateShare(docs: DataFrame, n: Int = 3): DataFrame = {
    graft.functions.WordGrams.register(docs.sparkSession)
    val grams = docs.select(col("doc_id"),
        explode(expr(s"graft_wordgrams($tokens, $n)")).as("gram"))
      .distinct()
    val dfreq = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    val per = grams.join(dfreq, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("shared_ratio",
        when(col("n_grams") > 0,
          col("n_shared").cast("double") / col("n_grams")))
      .orderBy("doc_id")
  }

  /** F62 — CROSS-DOC DUPLICATED SPANS: per document, the MAXIMAL
    * stretches of ≥ `w` consecutive tokens that also occur verbatim
    * in at least one OTHER document — the exact-substring dedup
    * signal ("Deduplicating Training Data Makes Language Models
    * Better", Lee et al. 2022) at token-gram granularity, the
    * memorization-risk screen between F30's per-doc boilerplate ratio
    * (which spans are shared) and F22's line dedup (which only sees
    * newline-delimited units). Pipeline: positional w-gram PolyHash
    * per doc → cross-doc df on the HASH (count-distinct docs) →
    * duplicated positions joined back → adjacent/overlapping starts
    * (gap ≤ w) merged into maximal spans via gap-clustering (E3's
    * sessionize discipline on token positions). Per doc: span count,
    * covered tokens (disjoint by construction), longest span, and
    * the covered share (one IEEE division of exact ints, unrounded).
    *
    * Probabilistic like the rest of the sketch family: grams join on
    * the 10⁹+7 PolyHash, so a hash collision can mark a span shared —
    * both engines share the spelling (and the false-positive), and at
    * 100 TB the hash join is the difference between shuffling 8-token
    * strings and shuffling int64s. Shape: gram frame → map-side df
    * agg → equi-join back (F4's inverted-index discipline, never
    * doc×doc) → one per-doc window + two bounded aggregates. */
  /** F62/F64 shared stage: the (doc_id, p) positions whose w-gram
    * hash occurs in ≥ 2 documents — one spelling of the positional
    * hash + df + join-back, so the span REPORT (F62) and the span
    * EXCISION (F64) cannot disagree on what counts as duplicated. */
  private def dupGramStarts(docs: DataFrame, w: Int): DataFrame = {
    PolyHash.register(docs.sparkSession)
    graft.functions.WordGrams.register(docs.sparkSession)
    val grams = docs.select(col("doc_id"),
        posexplode(expr(s"transform(graft_wordgrams($tokens, $w), " +
          "g -> graft_polyhash(g))")).as(Seq("p", "h")))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("h"))
    val dup = grams.groupBy("h")
      .agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select("h")
    grams.join(dup, "h").select("doc_id", "p")
  }

  def dupSpans(docs: DataFrame, w: Int = 8): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("p")
    val spans = dupGramStarts(docs, w)
      .withColumn("prev", lag(col("p"), 1).over(byDoc))
      .withColumn("ns",
        when(col("prev").isNull || col("p") - col("prev") > w, 1L)
          .otherwise(0L))
      .withColumn("cl",
        sum("ns").over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "cl")
      .agg((max("p") - min("p") + lit(w.toLong)).as("span_tokens"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum("span_tokens").as("covered_tokens"),
        max("span_tokens").as("max_span_tokens"))
    docs
      .select(col("doc_id"),
        expr(s"size($tokens)").cast("bigint").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"))
      .withColumn("dup_share",
        when(col("n_tokens") > 0,
          col("covered_tokens").cast("double") /
            col("n_tokens").cast("double")).otherwise(lit(0.0)))
      .orderBy("doc_id")
  }

  /** F64 — DUPLICATED-SPAN EXCISION: the dedup ACTION on F62's
    * signal — rewrite each document with every cross-doc duplicated
    * span (tokens covered by any shared w-gram) removed, keeping the
    * novel remainder. This is the Lee-et-al substring-dedup transform
    * a training-corpus pipeline actually applies (drop the memorized
    * boilerplate, keep the document), where F1/F13 drop whole docs.
    *
    * Coverage without an interval join: duplicated gram STARTS
    * (shared stage with F62 — one spelling) are UNIONED into the
    * token-position stream and a single per-doc running-max window
    * computes the furthest covered position (`max(p + w − 1)` over
    * starts at-or-before the token, starts ordered BEFORE the token
    * at the same position); a token is kept iff the running cover
    * end is absent or short. One window pass over tokens+starts —
    * never tokens × spans. The cleaned text is the kept tokens
    * re-joined in position order (single-space canon — tokens never
    * contain spaces, the F59 invariant); exact counts beside it;
    * removed share is one IEEE division of exact ints (§6). */
  def dupSpanExcise(docs: DataFrame, w: Int = 8): DataFrame = {
    val toks = docs.select(col("doc_id"),
        posexplode(expr(tokens)).as(Seq("pos", "token")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("token"), lit(0).as("is_start"),
        lit(null).cast("long").as("cover_end"))
    val starts = dupGramStarts(docs, w)
      .select(col("doc_id"), col("p").as("pos"),
        lit(null).cast("string").as("token"), lit(1).as("is_start"),
        (col("p") + lit(w.toLong - 1L)).as("cover_end"))
    val win = Window.partitionBy("doc_id")
      .orderBy(col("pos"), col("is_start").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = toks.unionByName(starts)
      .withColumn("run_end", max(col("cover_end")).over(win))
      .filter(col("is_start") === 0)
      .withColumn("kept",
        col("run_end").isNull || col("run_end") < col("pos"))
    val per = marked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN kept THEN " +
            "struct(pos, token) END)), s -> s.token)"), " ")
          .as("cleaned_text"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
      .withColumn("n_removed", col("n_tokens") - col("n_kept"))
      .withColumn("removed_share",
        when(col("n_tokens") > 0,
          (col("n_tokens") - col("n_kept")).cast("double") /
            col("n_tokens").cast("double")))
      .select("doc_id", "n_tokens", "n_kept", "n_removed",
        "removed_share", "cleaned_text")
      .orderBy("doc_id")
  }

  /** F14b — ENGINE-EXACT HyperLogLog NDV over word `n`-grams: the
    * approximate-distinct sketch a 100 TB profile runs instead of an
    * exact distinct (F14's ApproxPathSpec measures Spark's own
    * approx_count_distinct; this is the PORTABLE twin whose every
    * intermediate — registers, scaled denominator, estimate — the
    * DuckDB oracle replays bit-for-bit). Per gram: affine rehash
    * u = (3h+7) mod P of the PolyHash, register = u mod 32, and
    * rho = 1 + leading zeros of the remaining 25-bit suffix computed
    * by a pure-integer bit scan (NO log2/libm — rho is a first-set-bit
    * fold, exact in both engines; suffix 0 → rho = 26). Register
    * maxima flow through ONE map-side-combined 32-group aggregation —
    * max is idempotent, so no distinct pass is needed and re-ingesting
    * a gram is free (the HLL property that makes it mergeable across
    * 100 TB partitions). The harmonic denominator Σ 2^(26−M_r) is kept
    * SCALED by 2^26 so it is a sum of exact integers ≤ 32·2^26 — no
    * floating sum, no register order dependence; the single double
    * division `α₃₂·m²·2^26 / sum_scaled` is spelled identically in
    * both engines (est UNROUNDED per SURVEY §6). `rel_err` against the
    * exact NDV is part of the report, as in F14's error-bound specs;
    * the small-range linear-counting correction is deliberately NOT
    * applied (it needs libm ln) — `n_zero_registers` is emitted so a
    * consumer can apply it. */
  /** The F14b sketch-cell derivation — gram hash → affine re-hash →
    * (register, rank) — spelled ONCE for the batch estimator and the
    * G31 streaming monitor (the G23 rule: the per-row cell math is
    * shared; only the merge differs between batch max-agg and keyed
    * state). */
  private[graft] val HllRegs = 32
  private[graft] val hllAffineExpr = s"(3 * h + 7) % $P"
  private[graft] val hllRegExpr = s"u % $HllRegs"
  private[graft] val hllRestExpr = s"u div $HllRegs"
  private[graft] val hllRhoExpr: String =
    """aggregate(sequence(1, 25), 26L, (acc, j) ->
      |  if(acc = 26L and shiftright(rest, 25 - j) % 2 = 1,
      |     cast(j as bigint), acc))""".stripMargin
  /** (source, reg, rho) per gram occurrence — the shared front half
    * of the F14b pipeline; consumers merge registers their own way. */
  private[graft] def hllCells(docs: DataFrame, n: Int): DataFrame = {
    PolyHash.register(docs.sparkSession)
    graft.functions.WordGrams.register(docs.sparkSession)
    docs.select(col("source"),
        explode(expr(s"graft_wordgrams($tokens, $n)")).as("gram"))
      .select(col("source"), expr("graft_polyhash(gram)").as("h"))
      .withColumn("u", expr(hllAffineExpr))
      .withColumn("reg", expr(hllRegExpr))
      .withColumn("rest", expr(hllRestExpr))
      .withColumn("rho", expr(hllRhoExpr))
      .select("source", "reg", "rho")
  }

  /** `audit = true` (the registry/oracle setting) additionally prices
    * the EXACT gram NDV and its `rel_err` — a verification aid whose
    * `countDistinct` shuffles the full gram stream. `audit = false`
    * is the production path at scale: one linear gram scan into the
    * 32-register max-aggregate, NO distinct exchange anywhere in the
    * plan (spec-proven), `exact_ndv`/`rel_err` emitted as typed
    * NULLs so the report schema is identical either way. */
  def hllNdv(docs: DataFrame, n: Int = 2,
             audit: Boolean = true): DataFrame = {
    PolyHash.register(docs.sparkSession)
    graft.functions.WordGrams.register(docs.sparkSession)
    val grams = docs.select(
      explode(expr(s"graft_wordgrams($tokens, $n)")).as("gram"))
    val per = grams
      .select(expr("graft_polyhash(gram)").as("h"))
      .withColumn("u", expr(hllAffineExpr))
      .withColumn("reg", expr(hllRegExpr))
      .withColumn("rest", expr(hllRestExpr))
      .withColumn("rho", expr(hllRhoExpr))
    val regs = per.groupBy("reg").agg(max("rho").as("m_reg"))
    val allRegs = docs.sparkSession.range(32).toDF("reg")
      .join(regs, Seq("reg"), "left")
      .withColumn("m_reg", coalesce(col("m_reg"), lit(0L)))
    val summary = allRegs.agg(
      count(lit(1)).as("m"),
      sum(when(col("m_reg") === 0, 1L).otherwise(0L))
        .as("n_zero_registers"),
      sum(expr("shiftleft(1L, cast(26 - m_reg as int))")).as("sum_scaled"))
    val withExact =
      if (audit)
        summary.crossJoin(
          grams.agg(countDistinct("gram").as("exact_ndv")))
      else summary.withColumn("exact_ndv", lit(null).cast("long"))
    withExact
      .withColumn("est_ndv", expr(
        "cast(0.697 as double) * 1024 * 67108864 / cast(sum_scaled as double)"))
      .withColumn("rel_err", expr(
        "CASE WHEN exact_ndv > 0 THEN (est_ndv - exact_ndv) / exact_ndv END"))
      .select("m", "n_zero_registers", "sum_scaled", "est_ndv",
        "exact_ndv", "rel_err")
  }

  /** F51 — TOKEN CO-OCCURRENCE / quantized-PMI pairs: which token
    * pairs co-occur in documents far beyond chance — collocation
    * mining (phrase discovery, topic seeds) over the corpus. Score is
    * PMI's ratio in exact basis points instead of its log:
    * `score_bp = (c_ab · n_docs · 10⁴) div (c_a · c_b)` — >10⁴ ⇔
    * positive PMI, monotone with it, and pure int64 (the F46
    * quantization discipline; no libm, no smoothing).
    *
    * Scale shape: the pair join is keyed on DOC_ID, so its output is
    * Σ_docs k_d² with k_d = distinct tokens per doc — bounded by
    * document LENGTH, linear in corpus size (unlike F4's gram-keyed
    * join, which the df cap protects from quadratic bucket blowup).
    * The df cap here is a QUALITY knob, not a scale guard: it drops
    * ubiquitous stop-tokens whose PMI ≈ 0 by construction before
    * they dominate the pair stream. Doc-level DISTINCT tokens
    * (presence, not tf); marginals from the same frame pre-join.
    * Top-k by (score desc, pair) total order. The score uses F46's
    * overflow-safe two-step spelling — `C = (n_docs·10⁴) div c_b`
    * then `(c_ab·C) div c_a` — because the naive triple product
    * overflows int64 already at ~10⁹-doc corpora; two-step keeps
    * every intermediate ≤ n_docs·10⁴ (c_ab ≤ c_b). */
  def pmiPairs(docs: DataFrame, maxDf: Int = 50, k: Int = 20,
               minPairCount: Long = 3L): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(expr(tokens)).as("token"))
      .distinct()
      .localCheckpoint(true)
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val dfreq = toks.groupBy("token").agg(count(lit(1)).as("c"))
    val capped = toks.join(dfreq.filter(col("c") <= maxDf), "token")
    val a = capped.select(col("doc_id"), col("token").as("tok_a"),
      col("c").as("c_a"))
    val b = capped.select(col("doc_id"), col("token").as("tok_b"),
      col("c").as("c_b"))
    a.join(b, Seq("doc_id"))
      .filter(col("tok_a") < col("tok_b"))
      .groupBy("tok_a", "tok_b", "c_a", "c_b")
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPairCount)
      .crossJoin(broadcast(nDocs))
      .withColumn("score_bp",
        expr("(c_ab * ((n_docs * 10000) DIV c_b)) DIV c_a"))
      // Top-k via TakeOrderedAndProject (per-partition heaps) — the
      // co-occurrence pair frame is Σ per-doc k_d², far larger than
      // the vocabulary, so a global rank window over it would funnel
      // everything through one partition (termSearch discipline).
      .orderBy(col("score_bp").desc, col("tok_a"), col("tok_b")).limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score_bp").desc, col("tok_a"), col("tok_b"))))
      .select("rnk", "tok_a", "tok_b", "c_a", "c_b", "c_ab", "score_bp")
      .orderBy("rnk")
  }

  /** F50 — DEDUP CLUSTER-SIZE PROFILE: the size distribution of
    * near-dup clusters (how much of the corpus sits in 2-dup pairs
    * vs 1000-copy template families) plus the doc mass per size —
    * the report that decides whether dedup should drop-all-but-one
    * (long tail of small clusters) or needs template-aware handling
    * (few massive clusters). Two further aggregates on the F13
    * output's cluster key: sizes (|docs|-keyed) then the
    * size-histogram (≤ |distinct sizes| rows) — both map-side
    * combined; everything exact int64. */
  def clusterSizeProfile(clusters: DataFrame): DataFrame =
    clusters
      .groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
      .select("cluster_size", "n_clusters", "n_docs")
      .orderBy("cluster_size")

  /** F47 — COUNT-MIN SKETCH heavy hitters with an exact audit: the
    * mergeable frequency sketch a 100 TB token profile maintains
    * instead of an exact vocabulary count (4×1024 int64 cells per
    * partition, counts ADD across partitions/streams — the property
    * that lets a fleet of executors or days of stream micro-batches
    * merge by summation). Engine-exact by construction: row hashes
    * are the minhash affine family over the portable PolyHash —
    * `cell_j = ((2j+3)·h + 5j+7) mod P mod 1024` — so both engines
    * build the IDENTICAL sketch, and `est = min_j sketch[j][cell_j]`
    * reproduces bit-for-bit. The report emits the top-k tokens by
    * estimate with their exact counts beside (est ≥ exact is the CMS
    * one-sided guarantee — spec'd), the F41 audit discipline applied
    * to a frequency sketch.
    *
    * Scale shape: ONE occurrence-keyed aggregate builds the sketch
    * (4 rows per token occurrence collapse in map-side partials to
    * ≤4096 cells per partition), one vocab aggregate for the exact
    * side; the probe joins the 4096-row sketch BROADCAST. */
  /** The F47 sketch-cell frame on its own: token occurrences hashed
    * into the 4×1024 CMS grid and counted. Factored out so the G23
    * streaming twin maintains the IDENTICAL cells as a live
    * aggregation (counts add across micro-batches exactly as they add
    * across partitions — the mergeability that makes a CMS a CMS). */
  def cmsCells(tokenOcc: DataFrame): DataFrame =
    tokenOcc
      .select(explode(expr(s"transform(sequence(0, 3), j -> " +
        s"struct(j AS rw, ((2*j+3)*h + 5*j+7) % $P % 1024 AS cell))"))
        .as("rc"))
      .select(col("rc.rw").as("rw"), col("rc.cell").as("cell"))
      .groupBy("rw", "cell").agg(count(lit(1)).as("cnt"))

  def cmsHeavyHitters(docs: DataFrame, k: Int = 20): DataFrame = {
    PolyHash.register(docs.sparkSession)
    val occ = docs.select(explode(expr(tokens)).as("token"))
      .withColumn("h", expr("graft_polyhash(token)"))
      .localCheckpoint(true)
    val cells = cmsCells(occ)
    val exact = occ.groupBy("token", "h")
      .agg(count(lit(1)).as("exact_cnt"))
    val probes = exact
      .select(col("token"), col("exact_cnt"),
        explode(expr(s"transform(sequence(0, 3), j -> " +
          s"struct(j AS rw, ((2*j+3)*h + 5*j+7) % $P % 1024 AS cell))"))
          .as("rc"))
      .select(col("token"), col("exact_cnt"),
        col("rc.rw").as("rw"), col("rc.cell").as("cell"))
    probes
      .join(broadcast(cells), Seq("rw", "cell"))
      .groupBy("token", "exact_cnt")
      .agg(min("cnt").as("est_cnt"))
      .withColumn("overcount", col("est_cnt") - col("exact_cnt"))
      // Top-k via TakeOrderedAndProject — the probe frame is the full
      // vocabulary (10⁸–10⁹ rows at 100 TB); a global rank window
      // would push it through ONE partition. Heap-select the k rows
      // first, then rank the k-row frame (termSearch discipline).
      .orderBy(col("est_cnt").desc, col("token")).limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("est_cnt").desc, col("token"))))
      .select("rnk", "token", "est_cnt", "exact_cnt", "overcount")
      .orderBy("rnk")
  }

  /** F48 — BPE MERGE-PAIR statistics: the inner loop of byte-pair-
    * encoding tokenizer training — for every adjacent symbol pair in
    * the corpus, its total occurrence count `Σ_words freq(word) ·
    * occurrences_in_word(pair)`; the argmax is the next merge rule.
    * Run over the VOCABULARY, not the corpus: one token-keyed
    * aggregate collapses the 100 TB text to (word, freq) — the shape
    * every real BPE trainer (SentencePiece, HF tokenizers) uses —
    * then the char-pair explode touches each distinct word once,
    * weighted by its count. Pairs with multiplicity (substring scan,
    * NOT the distinct gram set — 'aaa' contributes 'aa' twice); all
    * counts exact int64; top-k by (count desc, pair asc) — a total
    * order both engines share. */
  def bpePairStats(docs: DataFrame, k: Int = 20): DataFrame = {
    val vocab = docs.select(explode(expr(tokens)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    vocab
      // 1-char words have no pair; Spark's sequence(1, 0) would count
      // DOWN rather than produce an empty list — filter, don't rely.
      .filter(length(col("word")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum("freq").as("pair_cnt"))
      // Top-k via TakeOrderedAndProject — the distinct-pair frame is
      // charset²-bounded (small for ASCII, NOT for CJK corpora), so
      // the heap-select shape is the safe spelling here too.
      .orderBy(col("pair_cnt").desc, col("pair")).limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("pair_cnt").desc, col("pair"))))
      .select("rnk", "pair", "pair_cnt")
      .orderBy("rnk")
  }

  /** F57 — ZIPF-LAW FIT over the token frequency spectrum: OLS of
    * ln(count) on ln(rank) across the top-`k` tokens — the corpus-
    * health profile a curation pipeline reads before trusting token
    * statistics (natural text sits near slope −1; templated or
    * machine-generated dumps bend the spectrum, and a drifting slope
    * across snapshots flags a contaminated crawl). One explode +
    * token-keyed aggregate (map-side combined) collapses the corpus
    * to its vocabulary; the top-k selection is TakeOrderedAndProject
    * (F47's heap discipline — never a global rank window); the OLS
    * runs on the k-row frame.
    *
    * Engine-exactness: ln inputs are IDENTICAL exact ints (counts and
    * ranks) on both engines, the five OLS sums are `round(sum(·),4)`
    * aggregates (D25's ln-input discipline), and slope/intercept/r²
    * derive from the ROUNDED sums with identically-spelled IEEE
    * expressions. In the float-sensitive sweep set. */
  def zipfFit(docs: DataFrame, k: Int = 100): DataFrame = {
    require(k >= 2, s"need k >= 2 tokens to fit a line: $k")
    val top = docs.select(explode(expr(tokens)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
    val sums = top
      .withColumn("x", log(col("rnk").cast("double")))
      .withColumn("y", log(col("cnt").cast("double")))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum(col("x")), 4).as("sx"),
        round(sum(col("y")), 4).as("sy"),
        round(sum(col("x") * col("x")), 4).as("sxx"),
        round(sum(col("x") * col("y")), 4).as("sxy"),
        round(sum(col("y") * col("y")), 4).as("syy"))
    sums
      .withColumn("_cov", col("n_tokens") * col("sxy") - col("sx") * col("sy"))
      .withColumn("_vx", col("n_tokens") * col("sxx") - col("sx") * col("sx"))
      .withColumn("_vy", col("n_tokens") * col("syy") - col("sy") * col("sy"))
      .withColumn("slope",
        when(col("_vx") > 0, round(col("_cov") / col("_vx"), 4)))
      .withColumn("intercept",
        when(col("_vx") > 0, round(
          (col("sy") - (col("_cov") / col("_vx")) * col("sx")) /
            col("n_tokens"), 4)))
      .withColumn("r2",
        when(col("_vx") > 0 && col("_vy") > 0, round(
          (col("_cov") * col("_cov")) / (col("_vx") * col("_vy")), 4)))
      .select("n_tokens", "slope", "intercept", "r2")
  }

  /** F59 — BPE TOKENIZER TRAINING LOOP: F48 computed ONE round's
    * merge-pair statistics; this runs the actual trainer — `nMerges`
    * rounds of (count adjacent symbol pairs over the weighted
    * vocabulary → take the argmax pair → merge every non-overlapping
    * occurrence left-to-right), emitting the ordered MERGE TABLE
    * (merge_idx, pair, pair_cnt at selection time): the artifact a
    * real BPE trainer (SentencePiece, HF tokenizers) produces.
    *
    * Scale shape: the corpus collapses ONCE to the (word, freq)
    * vocabulary (F48's move — the 100 TB text never re-scans); every
    * round then runs one vocab-sized pair aggregate (map-side
    * combined), ONE argmax row collected (a bounded driver action —
    * the merge decision IS a driver decision, like A19's publish
    * verdict), and one narrow re-segmentation pass over the
    * checkpointed vocab frame. Iteration cost is rounds × vocab, the
    * same cascade discipline as F13's CC rounds.
    *
    * Engine-exactness: the re-segmentation is a LEFT-TO-RIGHT STRING
    * FOLD spelled identically on both engines (Spark `aggregate`,
    * DuckDB `list_reduce` — both seed with the first symbol): the
    * accumulator ends with ` pa` exactly when its LAST symbol is pa
    * (symbols never contain spaces), so `acc || pb` completes the
    * merged symbol in place — no sentinel tricks, no regex, and
    * "aaa" under (a,a) merges to "aa a" (non-overlapping
    * left-to-right, the HF rule). The winner rides a broadcast
    * COLUMN (never an interpolated literal — corpus tokens may
    * contain quote characters); argmax total order (cnt DESC, pair)
    * over exact int64 counts. */
  /** The F59 training loop's shared core: runs `nMerges` adaptive
    * rounds over the (word, freq) vocabulary and returns both the
    * ordered merge decisions and the FINAL segmented vocab — so the
    * trainer (F59) and the encoder (F63) cannot drift on the loop. */
  private def bpeCore(docs: DataFrame, nMerges: Int,
      trackMass: Boolean = false)
      : (Seq[(Int, String, Long)], DataFrame, Seq[Long]) = {
    require(nMerges >= 1, s"need at least one merge round: $nMerges")
    var seg = docs.select(explode(expr(tokens)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(expr("array_join(transform(sequence(1, length(word)), " +
        "i -> substring(word, i, 1)), ' ')").as("seg"), col("freq"))
      .localCheckpoint(true)
    // Corpus BPE-token mass of the current segmentation — Σ freq ·
    // |symbols|; one vocab-sized aggregate per round, only when the
    // F93 curve asks for it (the trainer/encoder pay nothing).
    def massOf(f: DataFrame): Long =
      f.agg(sum(expr("freq * size(split(seg, ' '))")))
        .collect()(0).getLong(0)
    val masses = scala.collection.mutable.ArrayBuffer.empty[Long]
    if (trackMass) masses += massOf(seg)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    for (r <- 1 to nMerges) {
      val top = seg
        .withColumn("tok", split(col("seg"), " "))
        // 1-symbol segs have no pair; Spark's sequence(1, 0) counts
        // DOWN rather than yielding empty — filter (F48's rule).
        .filter(size(col("tok")) >= 2)
        .select(explode(expr("transform(sequence(1, size(tok) - 1), " +
          "i -> concat(element_at(tok, i), ' ', element_at(tok, i + 1)))"))
          .as("pair"), col("freq"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .withColumn("pa", expr("split_part(pair, ' ', 1)"))
        .withColumn("pb", expr("split_part(pair, ' ', 2)"))
        .localCheckpoint(true)
      val w = top.select("pair", "cnt").collect()
      require(w.nonEmpty,
        s"bpeTrain: vocabulary exhausted before merge round $r")
      merges += ((r, w(0).getString(0), w(0).getLong(1)))
      seg = seg
        .crossJoin(broadcast(top.select("pa", "pb")))
        .withColumn("tok", split(col("seg"), " "))
        .select(expr("aggregate(slice(tok, 2, size(tok) - 1), " +
          "element_at(tok, 1), (acc, t) -> " +
          "CASE WHEN (acc = pa OR endswith(acc, concat(' ', pa))) " +
          "AND t = pb THEN concat(acc, t) " +
          "ELSE concat(acc, ' ', t) END)").as("seg"), col("freq"))
        .localCheckpoint(true)
      if (trackMass) masses += massOf(seg)
    }
    (merges.toSeq, seg, masses.toSeq)
  }

  def bpeTrain(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeCore(docs, nMerges)._1.toDF("merge_idx", "pair", "pair_cnt")
      .orderBy("merge_idx")
  }

  /** F93 — BPE COMPRESSION CURVE (the vocab-size ROI the trainer's
    * stopping rule reads): corpus BPE-token mass after EACH merge
    * rung, 0 (character baseline) through `nMerges` — the
    * tokens-per-merge diminishing-returns curve that decides how big
    * a vocabulary is worth training (SentencePiece's vocab-size
    * sweep, priced without re-encoding: the mass falls out of the
    * SAME training cascade F59 already runs, one extra vocab-sized
    * aggregate per rung). `tokens_saved` is the rung's marginal win;
    * `compression` the cumulative chars-per-token ratio vs the
    * character baseline. Note saved ≤ the rung's selected pair_cnt:
    * overlapping occurrences ("aaa" under (a,a)) merge
    * non-overlapping left-to-right, so the CURVE, not the pair
    * count, is the truthful ROI.
    *
    * Shape: the F59 cascade (vocab-sized rounds, driver argmax) plus
    * one Σ freq·|symbols| aggregate per rung — each a bounded driver
    * action on the checkpointed vocab frame; the resulting
    * (nMerges+1)-row frame is driver-built like the trainer's merge
    * table. Engine-exactness: masses are exact int64; `compression`
    * is one IEEE division of exact ints, round(4). */
  def bpeCompressionCurve(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val masses = bpeCore(docs, nMerges, trackMass = true)._3
    val rows = masses.zipWithIndex.map { case (m, i) =>
      (i.toLong, m, if (i == 0) 0L else masses(i - 1) - m)
    }
    rows.toDF("merge_idx", "corpus_tokens", "tokens_saved")
      .withColumn("compression",
        round(lit(masses.head).cast("double") /
          col("corpus_tokens").cast("double"), 4))
      .orderBy("merge_idx")
  }

  /** F63 — BPE ENCODE with the F59-trained tokenizer: the apply step
    * that closes the tokenizer loop (train F59 → encode F63 → the
    * corpus-level fertility F53 now has a doc-level, trained-merge
    * twin). The final segmented vocabulary IS the tokenizer — a word
    * maps to its segmentation's symbol count — so encoding is one
    * vocab-keyed equi-join (symbols never re-derived per document;
    * the un-spaced segmentation reconstructs the word EXACTLY because
    * symbols never contain spaces, the F59 invariant). Per doc:
    * word count, BPE token count, char count, fertility
    * (tokens/word) and compression (chars/token) — both single IEEE
    * divisions of exact ints, unrounded (§6). Token-less docs report
    * zeros with NULL ratios. Shape: the training cascade (vocab-sized
    * rounds, A19 driver argmax) + ONE corpus-sized explode joined to
    * the vocab frame — at 100 TB the join key is the word, the vocab
    * side is |V| rows. */
  def bpeEncode(docs: DataFrame, nMerges: Int): DataFrame = {
    val (_, seg, _) = bpeCore(docs, nMerges)
    val vocab = seg.select(
      expr("replace(seg, ' ', '')").as("word"),
      expr("size(split(seg, ' '))").cast("bigint").as("n_sym"))
    val per = docs.select(col("doc_id"), explode(expr(tokens)).as("word"))
      .join(vocab, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_sym").as("n_bpe_tokens"),
        sum(length(col("word")).cast("bigint")).as("n_chars"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          col("n_bpe_tokens").cast("double") /
            col("n_words").cast("double")))
      .withColumn("chars_per_token",
        when(col("n_bpe_tokens") > 0,
          col("n_chars").cast("double") /
            col("n_bpe_tokens").cast("double")))
      .orderBy("doc_id")
  }

  /** F10c — per-document term saliency: top-k tokens ranked by tf/df
    * (term frequency over corpus document frequency) — the keyword
    * extraction a curation pipeline runs to label corpus slices. The
    * score is a single IEEE division of two exact counts, so ranking
    * and values are bit-identical across engines without rounding
    * (unlike log-based idf, where libm differences could flip a tie).
    * Shape: explode → partial-agg (doc,token) tf → token df → join
    * keyed on token → per-doc window top-k. The df frame is one row
    * per distinct token; hot template tokens collapse in the partial
    * aggregation, never travelling once per occurrence. */
  def termSaliency(docs: DataFrame, k: Int): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(expr(tokens)).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token"))
    tf.join(dfreq, "token")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("doc_id", "token", "tf", "df", "score", "rnk")
      .orderBy("doc_id", "rnk")
  }

  /** F11 — whole-document polynomial fingerprint (rolling hash). */
  def fingerprint(docs: DataFrame): DataFrame = {
    PolyHash.register(docs.sparkSession)
    docs.select(col("doc_id"), expr(docFingerprint).as("fp"))
      .orderBy("doc_id")
  }

  /** F11b — WINNOWING fingerprint selection (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003): per document, hash every char `k`-gram by position,
    * slide a window of `w` consecutive gram hashes, and in each window
    * select the RIGHTMOST minimal hash; the distinct selected
    * (position, hash) pairs are the document's fingerprints. The local
    * selection guarantees any shared substring of ≥ w+k−1 chars yields
    * at least one shared fingerprint HASH across documents, at ~2/(w+1)
    * the density of the full gram set — the plagiarism/overlap index a
    * corpus platform stores instead of every gram. Whole pass is
    * per-document array arithmetic (no explode, no shuffle): grams →
    * sentinel-seeded left fold per window (h ≤ acc.h keeps the LATER
    * position, the rightmost-min tiebreak) → distinct → one-pass
    * count+sum fold. `fp_sum` is a sum of exact ints (order-free);
    * docs shorter than `k` report all-zero counts. Docs with
    * 0 < n_grams < w are treated as one window (the whole gram list).
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 5, w: Int = 8)
      : DataFrame = {
    require(k > 0 && w > 0, s"k and w must be positive: $k, $w")
    graft.functions.Winnow.register(docs.sparkSession)
    // One narrow pass over the native [[graft.functions.Winnow]]
    // expression (rolling gram hash + monotonic-deque window minimum,
    // O(n) per doc). A fingerprint is the single bigint h·2^21 + p
    // (hash < 2^30 from PolyHash's mod-P, position < 2^21), which
    // keeps the DuckDB dual in flat-bigint list arithmetic (its
    // list_distinct can't take structs): the oracle re-derives the
    // same profile with a sentinel-seeded fold per window whose
    // replace-on-≤ keeps the LATER position — the rightmost-min
    // winnowing tiebreak. The equivalent Spark HOF spelling (slice +
    // aggregate per window) measured ~13 s at sf0.1; the native
    // expression is the same class of rewrite as WordGrams/PqCodes.
    docs
      .select(col("doc_id"),
        expr(s"graft_winnow(text, $k, $w)").as("wn"))
      .select(col("doc_id"),
        expr("wn[0]").as("n_grams"),
        expr("wn[1]").as("n_windows"),
        expr("wn[2]").as("n_fingerprints"),
        expr("wn[3]").as("fp_sum"))
      .orderBy("doc_id")
  }

  /** F102 — CONTENT-DEFINED CHUNKING profile (Gear-family CDC): the
    * variable-size chunk decomposition behind storage-level dedup and
    * incremental corpus sync — boundaries fall where a 32-cp rolling
    * hash hits a mask, so an EDIT moves only the chunks within ~32
    * code points of it while every later chunk survives
    * byte-identical (fixed-size chunking reshuffles everything after
    * the edit; spec proves the stability property directly). Chunks
    * come from the native [[graft.functions.CdcChunks]] expression
    * (O(n) rolling pass; key = chunk polyhash·2^21 + length), the
    * same build-contract path (b) as Winnow/WordGrams.
    *
    * The profile aggregates per SOURCE: docs chunked, chunk count,
    * mean chunk length, and the duplicated-chunk share — chunk
    * INSTANCES whose content hash appears in ≥ 2 distinct docs
    * corpus-wide (hash equality as content proxy, the F11
    * fingerprint-family convention). That share is the headline a
    * storage planner reads: how much of the corpus a chunk store
    * dedups away WITHOUT near-dup semantics.
    *
    * Scale shape: one narrow scan + explode to (doc, chunk) rows
    * (bounded by corpus chars / 2^maskBits), ONE hash-keyed
    * aggregate for the multi-doc census, one broadcast-joined
    * source collapse. Docs with empty text contribute no chunks
    * (and drop from n_docs — the chunked-doc count). */
  def cdcChunks(docs: DataFrame, maskBits: Int = 6): DataFrame = {
    require(maskBits >= 1 && maskBits <= 30,
      s"maskBits must be in [1, 30]: $maskBits")
    graft.functions.CdcChunks.register(docs.sparkSession)
    // chunk rows: the explode is the only corpus-sized frame; it is
    // derived once and checkpointed for the census + the collapse
    val chunks = docs
      .select(col("source"), col("doc_id"),
        explode(expr(s"graft_cdc(text, $maskBits)")).as("key"))
      .select(col("source"), col("doc_id"),
        expr("key div 2097152").as("h"),
        expr("key % 2097152").as("len"))
      .localCheckpoint(true)
    // content hashes living in >= 2 distinct docs (corpus-wide)
    val multi = chunks.groupBy("h")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).select(col("h"), lit(1L).as("is_dup"))
    chunks.join(multi, Seq("h"), "left")
      .groupBy("source")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_chunks"),
        // explicit exact-sum/count (both ints) rather than engine
        // avg(), so the double division has one spelling per engine
        round(sum("len").cast("double")
          / count(lit(1)).cast("double"), 4).as("avg_chunk_len"),
        coalesce(sum("is_dup"), lit(0L)).as("n_dup_chunks"))
      .withColumn("dup_share",
        round(col("n_dup_chunks").cast("double")
          / col("n_chunks").cast("double"), 4))
      .orderBy("source")
  }
}
