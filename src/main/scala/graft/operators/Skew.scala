package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §5). AQE's skew-join handles most
  * cases at runtime; explicit salting remains the tool when one join
  * key dominates so heavily that even split shuffle blocks hot-spot a
  * single executor (the classic "one symbol is 40% of the tape"
  * tick-data shape).
  */
object Skew {

  /** Salted equi-join: the fact side derives a deterministic salt from
    * `saltSource` (any well-distributed column — tick_id, event_id),
    * the dimension side is exploded ×`salts`. The hot key's rows now
    * land on `salts` reducers instead of one. Result set is identical
    * to the plain join (verified in the spec); cost is |dim|·salts,
    * which is why `dim` must be the small side.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(salts.toLong)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** H9 — TRIANGULAR-TILED SELF-PAIR-JOIN: unordered within-bucket
    * pairs `{a, b}` (a < b) from a bucketed frame, with each bucket's
    * quadratic pair space decomposed into `tiles·(tiles+1)/2`
    * triangular tiles so a HOT bucket's pairs land on many reducers
    * instead of one. H1's salting fixes a hot FACT-DIM key; this is
    * the self-join analog the minhash band join needs at 100 TB —
    * there the bands frame is too big to broadcast, the pair join
    * shuffles on (band, band_hash), and one 10⁵-doc bucket becomes
    * one reducer computing 10¹⁰ pairs. Since r14 this layout is
    * WIRED into `TextDedup.candidatePairsFromSigs` behind a measured
    * bucket-size threshold (one census aggregate picks the regime);
    * below the threshold the broadcast band join stays, because the
    * probe-side explosion already spreads locally (SURVEY §5).
    *
    * Construction: each row gets a deterministic chunk
    * `xxhash64(id) mod tiles`; the LEFT role replicates to tiles
    * (chunk, j ≥ chunk), the RIGHT role to (i ≤ chunk, chunk); the
    * equi-join on (bucket key, i, j) meets every cross-chunk pair in
    * EXACTLY its (min, max) tile and same-chunk pairs in the
    * diagonal, where `id_a < id_b` removes self-pairs and mirror
    * duplicates; off-diagonal pairs normalize by least/greatest.
    * Per-row replication ≤ tiles (the classic fragment-replicate /
    * "one-bucket theta-join" layout, Okcan & Riedewald 2011). Output
    * equals the naive bucket self-join EXACTLY (spec'd), with a
    * DISTINCT for rows sharing several buckets left to the caller,
    * same as the naive form.
    *
    * `TextDedup.candidatePairsFromSigs`' hot-bucket branch carries
    * this SAME construction inline with the minhash signatures riding
    * along (payload columns would have to swap with the least/
    * greatest id normalization, so the twin stays explicit); the two
    * spellings are pinned against drift by independent equivalence
    * specs — tiled == naive here, tiled-band == broadcast-band in
    * TextDedupSpec. */
  def tiledSelfPairs(items: DataFrame, bucketCols: Seq[String],
                     idCol: String, tiles: Int): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1: $tiles")
    val chunk = pmod(xxhash64(col(idCol)), lit(tiles.toLong))
    val lhs = items
      .withColumn("_i", chunk)
      .withColumn("_j", explode(sequence(col("_i"), lit(tiles.toLong - 1))))
      .select(bucketCols.map(col) ++
        Seq(col("_i"), col("_j"), col(idCol).as("_id_a")): _*)
    val rhs = items
      .withColumn("_j", chunk)
      .withColumn("_i", explode(sequence(lit(0L), col("_j"))))
      .select(bucketCols.map(col) ++
        Seq(col("_i"), col("_j"), col(idCol).as("_id_b")): _*)
    lhs.join(rhs, bucketCols ++ Seq("_i", "_j"))
      // diagonal: order the pair; off-diagonal: chunks differ, so the
      // mirror never meets — normalize instead of filter
      .filter(col("_i") =!= col("_j") || col("_id_a") < col("_id_b"))
      .select(bucketCols.map(col) ++ Seq(
        least(col("_id_a"), col("_id_b")).as("id_a"),
        greatest(col("_id_a"), col("_id_b")).as("id_b")): _*)
  }
}
