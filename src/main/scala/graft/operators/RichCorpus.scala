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
