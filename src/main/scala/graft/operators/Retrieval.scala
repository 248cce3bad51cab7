package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableText.tokens

/** Corpus retrieval (SURVEY §2.F28) — the search half of a training-data
  * platform: given a bag-of-words query, rank documents by a
  * tf·idf-family relevance score over an inverted-index plan shape.
  *
  * The score is QUANTIZED so it is engine-exact (SURVEY §6): each
  * query term's weight is `floor(N·scale / df)` — a linear-idf variant
  * with the division snapped to an integer grid — and a document's
  * score is `Σ tf·weight`, a sum of exact integers (reduction-order
  * free, so the DuckDB oracle replays it bit-for-bit). The usual
  * `log(N/df)` damping is deliberately traded for integer exactness;
  * at scale=1000 the ranking preserves idf monotonicity (rarer term →
  * strictly larger weight for df halving) while every engine computes
  * the identical longs.
  *
  * Scale shape (the inverted-index discipline): explode tokens, then
  * filter to the query's terms BEFORE any aggregation — the tf and df
  * aggregates only ever see rows for the |q| query terms, never the
  * full vocabulary. Both aggregates get map-side partial aggregation;
  * the final top-k is `orderBy(...).limit(k)` which Spark plans as
  * TakeOrderedAndProject (per-partition heaps + one k-row merge on the
  * driver), never a global sort or single-partition window. Documents
  * with zero query-term hits never enter the ranking.
  *
  * ref: the reference exposes its gold tables to ad-hoc Trino SQL
  * (README §7.3); free-text relevance search is that interface's
  * missing text twin, mandated by the LLM-pipeline extension scope.
  */
object Retrieval {

  /** F28 — top-k documents for a whitespace-tokenized query.
    * Output: `rnk` (1-based, ties broken by doc_id), `doc_id`,
    * `n_hit_terms` (distinct query terms present), `score`. */
  def termSearch(docs: DataFrame, query: String, k: Int = 10,
                 scale: Long = 1000L): DataFrame = {
    val qTerms = query.split(' ').filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "query must contain at least one token")
    require(k > 0 && scale > 0, s"k and scale must be positive: $k, $scale")
    // Materialized once: tf feeds BOTH the df aggregate and the score
    // join, and without the barrier each consumer re-runs the corpus
    // scan + explode (the plan showed two Generate+Scan subtrees).
    // The tf frame is tiny — only docs containing a query term, ≤ |q|
    // rows per doc — so the barrier costs nothing while halving the
    // 100 TB scans. Same discipline as greedyNearDup's sketch.
    val tf = docs
      .select(col("doc_id"), explode(expr(tokens)).as("token"))
      .filter(col("token").isin(qTerms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(total))
      .withColumn("w", expr(s"(n_docs * $scale) div df"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_terms"),
        sum(expr("tf * w")).as("score"))
    // k-row result: the rank window runs on ≤ k rows post-limit.
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select("rnk", "doc_id", "n_hit_terms", "score")
      .orderBy("rnk")
  }
}
