package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic REALISTIC-STRUCTURE corpus derived from the driver's
  * template `documents`/`embeddings` tables (r15 verdict #1).
  *
  * The driver's synthetic corpus is word soup from one template
  * distribution, which makes several curation audits vacuous by their
  * own §2 admission: F79 flags ~97% of lines as boilerplate, F82
  * reports labels indistinguishable from noise, F55's sweep curves
  * are flat. The testdata itself is driver-owned (read-only), so this
  * module re-derives a rich corpus IN the engine from the base
  * tables, with one integer-arithmetic spelling evaluated identically
  * by Spark and DuckDB (the [[graft.functions.PortableText]]
  * discipline lifted from hashes to whole documents) — the oracle
  * prices the rich corpus exactly like any other derived frame.
  *
  * Planted structure, per document (all decisions are mod-P affine
  * hashes of doc_id — deterministic, corpus-size-free):
  *  - 8 newline-joined lines; each line is boilerplate (12%: one of
  *    two fixed strings shared corpus-wide — realistic df, so F79's
  *    dfPct=30 gate flags them and ONLY them), a "quote" (28%: a
  *    6-word sentence from a per-source pool of 60, pools OVERLAPPING
  *    by source distance — the controlled cross-source similarity
  *    spectrum F70 measures), or unique content (60%).
  *  - quality TIERS (0 long / 1 mid / 2 short content lines), tier
  *    mix biased LOW for every 4th source — the graded per-source
  *    sweep curves F55 needs.
  *  - two latent REGISTERS ('wa'/'wb' vocabulary prefixes) and
  *    per-source vocabulary ranges overlapping by source distance.
  *  - content lines of tiers 0-1 carry stopwords every 4th slot
  *    (multi-register structure for the quality/LM family).
  *
  * [[embeddings]] plants LABEL SEPARABILITY: dimension i gains an
  * exact +0.375 offset for vectors of label i mod 10 (float-cast of
  * an exact double sum — bit-identical in both engines), sized so
  * per-dim Fisher lands ≈0.8 (>0.5) over the base σ≈0.126 noise.
  */
object RichCorpus {
  private val P = graft.functions.PortableText.P
  private val A = 2654435761L

  /** The two corpus-wide boilerplate strings (df ≈ 39% of docs per
    * source at 12% line rate — above F79's dfPct=30 gate; the 12%
    * occurrence share is the realistic 5-15% band). */
  val boilers: Seq[String] = Seq(
    "please subscribe to our newsletter for daily updates",
    "all rights reserved click accept to continue")

  /** Dialect seams between the two engines; everything else is one
    * spelling. */
  private case class Dialect(
      seqTrans: (String, String, String) => String, // (nExpr, var, body)
      arrJoin: (String, String) => String,
      listExtract: (String, String) => String,      // 1-based
      strCast: String => String,
      structLit: String => String)                  // hb expr -> {j, hb}

  private val spark = Dialect(
    (n, v, b) => s"transform(sequence(0, ($n) - 1), $v -> $b)",
    (a, sep) => s"array_join($a, $sep)",
    (a, i) => s"element_at($a, CAST($i AS INT))",
    x => s"CAST($x AS STRING)",
    hb => s"named_struct('j', j, 'hb', $hb)")

  private val duck = Dialect(
    (n, v, b) => s"list_transform(range(0, $n), $v -> $b)",
    (a, sep) => s"array_to_string($a, $sep)",
    (a, i) => s"list_extract($a, CAST($i AS INT))",
    x => s"CAST($x AS VARCHAR)",
    hb => s"{j: j, hb: $hb}")

  private def arrayLit(d: Dialect, items: Seq[String]): String =
    if (d eq spark) items.map(s => s"'$s'").mkString("array(", ", ", ")")
    else items.map(s => s"'$s'").mkString("[", ", ", "]")

  /** The text expression over helper columns `_sidx`, `_tier`,
    * `_reg` (computed by [[docs]] / the duck CTE below). */
  private def textExpr(d: Dialect): String = {
    val hb = s"(((doc_id * 31 + j) % $P) * $A) % $P"
    val structs = d.seqTrans("8", "j", d.structLit(hb))
    val stopList = arrayLit(d, Seq("the", "a", "of", "and", "to"))
    val contentWord =
      s"""CASE WHEN _tier < 2 AND w % 4 = 3
        | THEN ${d.listExtract(stopList, "(s.hb + w) % 5 + 1")}
        | ELSE concat(_reg, ${d.strCast(
            s"((((s.hb + w * 97) % $P) * $A) % $P) % 600 + _sidx * 40")})
        | END""".stripMargin.replaceAll("\n", "")
    val nw = "4 + (2 - _tier) * 4 + (s.j % 3)"
    val content = d.arrJoin(d.seqTrans(nw, "w", contentWord), "' '")
    val quoteWord = s"concat('wq', ${d.strCast(
      s"((_sidx * 10 + s.hb % 60) * 131 + w * 17) % 9973")})"
    val quote = d.arrJoin(d.seqTrans("6", "w", quoteWord), "' '")
    val boilerList = arrayLit(d, boilers)
    val line =
      s"""CASE WHEN s.hb % 100 < 12
        | THEN ${d.listExtract(boilerList, "s.hb % 2 + 1")}
        | WHEN s.hb % 100 < 40 THEN $quote
        | ELSE $content END""".stripMargin.replaceAll("\n", "")
    // lines iterate the STRUCT array (one hb spelling per line)
    val lines =
      if (d eq spark) s"transform($structs, s -> $line)"
      else s"list_transform($structs, s -> $line)"
    d.arrJoin(lines, "chr(10)")
  }

  private def sidxExpr(d: Dialect): String =
    if (d eq spark) "CAST(substring(source, 4, 10) AS BIGINT)"
    else "CAST(substr(source, 4) AS BIGINT)"
  private def h3Expr: String = s"(((doc_id * 3 + 2) % $P) * $A) % $P"
  private def regExpr: String =
    s"CASE WHEN (((doc_id * 3 + 1) % $P) * $A) % $P % 2 = 0" +
      " THEN 'wa' ELSE 'wb' END"
  private def tierExpr: String =
    "least(2, _h3 % 3 + (CASE WHEN _sidx % 4 = 3 THEN 1 ELSE 0 END))"

  /** The rich documents frame: same schema as the base table
    * (doc_id, text, lang, source, n_chars), text rebuilt per the
    * class doc. One narrow projection — no shuffle, no collect. */
  def docs(base: DataFrame): DataFrame =
    base.select(col("doc_id"), col("lang"), col("source"),
        expr(sidxExpr(spark)).as("_sidx"),
        expr(h3Expr).as("_h3"),
        expr(regExpr).as("_reg"))
      .withColumn("_tier", expr(tierExpr))
      .withColumn("text", expr(textExpr(spark)))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))

  /** DuckDB CTE chain ending in `richdocs` — the oracle's dual of
    * [[docs]], one spelling per seam. Prepend inside WITH. */
  val duckDocsCtes: String =
    s"""richprep AS (SELECT doc_id, lang, source,
      |    ${sidxExpr(duck)} AS _sidx,
      |    $h3Expr AS _h3,
      |    $regExpr AS _reg
      |  FROM documents),
      |richprep2 AS (SELECT *, $tierExpr AS _tier FROM richprep),
      |richdocs0 AS (SELECT doc_id, ${textExpr(duck)} AS text, lang,
      |    source FROM richprep2),
      |richdocs AS (SELECT doc_id, text, lang, source,
      |    CAST(length(text) AS BIGINT) AS n_chars FROM richdocs0)"""
      .stripMargin

  // ---------- controlled-Jaccard dup families ----------

  /** Per-doc dup-family columns: every non-multiple-of-8 doc becomes
    * a CHILD of parent = doc_id − doc_id%8 with probability 30%,
    * keeping its parent's first `keep` ∈ 2..7 lines verbatim — so
    * the (parent, child) token-set Jaccard is keep/(16−keep) BY
    * CONSTRUCTION: {2/14, 3/13, 4/12, 5/11, 6/10, 7/9} ≈ {0.143,
    * 0.231, 0.333, 0.455, 0.600, 0.778} — a spectrum straddling the
    * MinHashK=8/Bands=4 LSH S-curve. §7n's MEASURED values sit a few
    * hundredths BELOW the upper fractions ({…, 0.44, 0.58, 0.75})
    * because cross-family word collisions (~4% per pair, see
    * [[dupTextExpr]]) inflate the union — the construction gives the
    * ideal J, the measurement prices the collision noise. */
  private val childExpr: String =
    s"CASE WHEN (((doc_id * 5 + 4) % $P) * $A) % $P % 100 < 30" +
      " AND doc_id % 8 != 0 THEN 1 ELSE 0 END"
  private val keepExpr: String =
    s"2 + (((doc_id * 11 + 5) % $P) * $A) % $P % 6"
  private val parentExpr: String = "doc_id - doc_id % 8"

  /** Dup-family text: 8 lines × 8 words; line j of a child with
    * j < keep is seeded by the PARENT id (identical string), else by
    * the doc's own id. Word ids are mod-P affine hashes into a 99991
    * vocabulary — cross-family collisions are ~4% noise per pair. */
  private def dupTextExpr(d: Dialect): String = {
    val eff = "(CASE WHEN _child = 1 AND j < _keep THEN _parent" +
      " ELSE doc_id END)"
    val hl = s"((($eff * 8 + j) % $P) * $A) % $P"
    val structs = d.seqTrans("8", "j", d.structLit(hl))
    val word =
      s"concat('wd', ${d.strCast(
        s"((((s.hb + w * 131) % $P) * $A) % $P) % 99991")})"
    val line = d.arrJoin(d.seqTrans("8", "w", word), "' '")
    val lines =
      if (d eq spark) s"transform($structs, s -> $line)"
      else s"list_transform($structs, s -> $line)"
    d.arrJoin(lines, "chr(10)")
  }

  /** The dup-family corpus: same schema as the base table. */
  def dupDocs(base: DataFrame): DataFrame =
    base.select(col("doc_id"), col("lang"), col("source"),
        expr(childExpr).as("_child"),
        expr(keepExpr).as("_keep"),
        expr(parentExpr).as("_parent"))
      .withColumn("text", expr(dupTextExpr(spark)))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))

  /** The planted (parent, child, keep) pair frame — children only;
    * parents are multiples of 8, present by construction in the
    * contiguous driver id space (and within each +5e9 replica
    * block). */
  def dupPairs(base: DataFrame): DataFrame =
    base.select(col("doc_id"),
        expr(childExpr).as("_child"),
        expr(keepExpr).as("_keep"),
        expr(parentExpr).as("_parent"))
      .filter(col("_child") === 1)
      .select(col("_parent").as("doc_a"), col("doc_id").as("doc_b"),
        col("_keep").cast("long").as("keep"))

  /** DuckDB CTE chain ending in `richdup` + `richdup_pairs`. */
  val duckDupCtes: String =
    s"""richdupprep AS (SELECT doc_id, lang, source,
      |    $childExpr AS _child,
      |    $keepExpr AS _keep,
      |    $parentExpr AS _parent
      |  FROM documents),
      |richdup AS (SELECT doc_id, ${dupTextExpr(duck)} AS text, lang,
      |    source FROM richdupprep),
      |richdup_pairs AS (SELECT _parent AS doc_a, doc_id AS doc_b,
      |    CAST(_keep AS BIGINT) AS keep
      |  FROM richdupprep WHERE _child = 1)""".stripMargin

  /** Planted-IMPACT events (r15 "what's wrong" #3, the D55 leg):
    * the base corpus's value column is impact-free noise, so D55's
    * log-log fill regression is uninformative-by-construction. This
    * derivation rebuilds `value` with a square-root price-impact law
    * — cents = 10000 + sign·round(6·√k) + noise(−3..3) where k is
    * the fill size already in props — so |slip| ≈ 6·√k and the
    * fitted exponent lands near the 0.5 the construction plants.
    * All decisions are mod-P affine hashes of event_id; √ of an
    * exact integer is correctly rounded in BOTH engines (the §6
    * sqrt-ladder rule), and round() never sees an exact half
    * (6·√k = m+0.5 would need 144 | (2m+1)² — impossible), so the
    * cents are engine-identical. Every other column rides through
    * untouched. */
  private def impactCentsExpr(jsonK: String): String =
    s"""10000
      | + (CASE WHEN (((event_id * 7 + 3) % $P) * $A) % $P % 2 = 0
      |    THEN 1 ELSE -1 END)
      |   * CAST(round(6.0 * sqrt(CAST($jsonK AS DOUBLE)), 0) AS BIGINT)
      | + (((event_id * 7 + 3) % $P) * $A) % $P % 7 - 3"""
      .stripMargin.replaceAll("\n", "")

  /** All fills collapse onto ONE trading day (2024-01-02 UTC,
    * event_id-spread seconds): D55 normalizes slippage against the
    * (symbol, DAY) VWAP, and the base corpus leaves ~2.5 fills per
    * (symbol, day) — at that density the two-fill algebra makes
    * |slip_i| ∝ k_other and the fitted slope comes out NEGATIVE
    * regardless of the planted law (measured: median −0.31). One day
    * per symbol gives ~66 fills per normalization group at sf0.1 —
    * the planted 0.5 is recovered (median 0.52, range 0.08–1.23,
    * fillEvery=1). */
  private val impactTsExpr: String =
    "(1704153600 + event_id % 80000) * 1000000"

  /** Spark side of the planted-impact events frame. */
  def eventsImpact(base: DataFrame): DataFrame = {
    val k = "coalesce(CAST(get_json_object(props, '$.k') AS BIGINT), 0)"
    base
      .withColumn("ts", expr(s"timestamp_micros($impactTsExpr)"))
      .withColumn("value",
        expr(s"CAST(${impactCentsExpr(k)} AS DOUBLE) / 100.0"))
  }

  /** DuckDB CTE ending in `richimpact` — dual of [[eventsImpact]].
    * (Oracle-side JSON spelling matches q_impact_exponent's.) */
  val duckImpactCte: String = {
    val k = "coalesce(CAST(props->>'$.k' AS BIGINT), 0)"
    s"""richimpact AS (SELECT event_id,
      |    make_timestamp($impactTsExpr) AS ts, user_id, event_type,
      |    CAST(${impactCentsExpr(k)} AS DOUBLE) / 100.0 AS value,
      |    props
      |  FROM events)""".stripMargin
  }

  /** Planted-label embeddings: dimension i gains exactly +0.375 for
    * label = i mod 10 (double add of exactly-representable values,
    * float-cast — bit-identical in both engines). */
  def embeddings(base: DataFrame): DataFrame =
    base.select(col("vec_id"),
      expr("""transform(sequence(0, 63), i ->
        |  CAST(CAST(element_at(embedding, CAST(i + 1 AS INT)) AS DOUBLE)
        |    + CASE WHEN i % 10 = label THEN CAST(0.375 AS DOUBLE)
        |           ELSE CAST(0.0 AS DOUBLE) END AS FLOAT))"""
        .stripMargin).as("embedding"),
      col("label"))

  /** DuckDB CTE ending in `richemb` — dual of [[embeddings]]. */
  val duckEmbCte: String =
    """richemb AS (SELECT vec_id,
      |    list_transform(range(0, 64), i ->
      |      CAST(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
      |        + CASE WHEN i % 10 = label THEN CAST(0.375 AS DOUBLE)
      |               ELSE CAST(0.0 AS DOUBLE) END AS FLOAT)) AS embedding,
      |    label
      |  FROM embeddings)""".stripMargin
}
