package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation text transforms (SURVEY §2.F22–F23): line-level
  * boilerplate removal and PII scrubbing — the two REWRITE passes a
  * pre-training pipeline runs between quality filtering and
  * tokenization (the F15/F16 stages decide which docs survive; these
  * decide which BYTES of a surviving doc do).
  *
  * Both are engine-portable: the line splitter is a literal-delimiter
  * split mirrored by the oracle's `string_split`, and the PII regexes
  * use only syntax Java regex and RE2 interpret identically.
  */
object Curation {

  /** F22 — line-level boilerplate dedup (the CCNet/RefinedWeb pass):
    * a "line" that appears in more than `maxDfPct` percent of all
    * documents is boilerplate (headers, footers, cookie banners) and
    * is dropped from EVERY document; surviving lines are reassembled
    * in their original order. Per-doc `n_lines`/`n_kept` form the
    * curation audit trail.
    *
    * The keep rule is exact integer arithmetic (`df·100 ≤ n_docs·pct`)
    * so the threshold never hits a float boundary cross-engine.
    * Duplicate lines WITHIN one doc count once toward df (distinct
    * doc-per-line) but are each kept/dropped in place on reassembly.
    * Docs whose text is empty (or all-boilerplate) come back with
    * `clean_text = ''`, never dropped from the report.
    *
    * Scale shape: explode lines → distinct(line, doc) with partial
    * aggregation collapsing within-doc repeats before the shuffle →
    * df join keyed on the line → one groupBy(doc_id) reassembly.
    * Never doc×doc; the df table shuffles by line exactly like F17's
    * gram join. The corpus row count is a one-row broadcast.
    *
    * `delim` is treated as a LITERAL delimiter (regex-quoted for
    * Spark's regex `split`, matching the oracle's literal
    * `string_split`).
    */
  def lineDedup(docs: DataFrame, delim: String = "\n",
                maxDfPct: Int = 50): DataFrame = {
    val lines = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), Pattern.quote(delim))))
      .withColumnRenamed("col", "line")
      .filter(col("line") =!= "")
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val lineDf = lines.select("line", "doc_id").distinct()
      .groupBy("line").agg(count(lit(1)).as("df"))
    val flagged = lines.join(lineDf, "line")
      .crossJoin(broadcast(nDocs))
      .withColumn("kept", col("df") * 100 <= col("n_docs") * maxDfPct)
    // collect_list drops the NULLs the un-kept lines map to;
    // array_sort on (pos, line) structs restores original order.
    val agg = flagged.groupBy("doc_id").agg(
      count(lit(1)).as("n_lines"),
      count(when(col("kept"), lit(1))).as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line")),
        delim).as("clean_text"))
    docs.select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** PII patterns — restricted to syntax Java regex (Spark) and RE2
    * (DuckDB) evaluate identically: character classes, bounded
    * repetition, ASCII `\b`. No lookarounds (RE2 has none), no
    * backreferences. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** F23 — PII scrub: redact emails, IPv4 addresses, and short phone
    * numbers with typed placeholders, and count each category — the
    * compliance pass every publishable training corpus runs.
    *
    * Counts are taken on the ORIGINAL text per category independently;
    * replacement is sequential (email → ip → phone), so a fragment
    * matching two categories (an IPv4 inside an email's domain) is
    * redacted by the earlier pattern and counted by both — the counts
    * audit exposure, the rewrite guarantees removal.
    *
    * Purely narrow (per-row regex state machines, no shuffle): the
    * 100 TB shape is a map over the corpus, exactly what codegen'd
    * `regexp_replace`/`regexp_extract_all` give us. Patterns are
    * Column literals, never SQL-string-interpolated, so backslashes
    * survive verbatim.
    */
  def piiScrub(docs: DataFrame): DataFrame = {
    def cnt(re: String): Column =
      size(call_function("regexp_extract_all", col("text"), lit(re), lit(0)))
    val clean = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
        lit(IpRe), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))
    docs.select(col("doc_id"),
      cnt(EmailRe).as("n_emails"),
      cnt(IpRe).as("n_ips"),
      cnt(PhoneRe).as("n_phones"),
      clean.as("clean_text"))
      .orderBy("doc_id")
  }

  /** F79 — PER-SOURCE BOILERPLATE REPORT: lines whose WITHIN-SOURCE
    * document frequency clears `dfPct`% of that source's docs (and
    * df ≥ 2 — in a tiny source every line clears a percentage bar)
    * are template boilerplate (nav bars, footers, license headers) —
    * the CCNet-style signal F22's corpus-wide threshold structurally
    * misses: a footer on every page of a feed that is 5% of the
    * corpus never reaches a corpus-wide bar, yet is exactly what a
    * curator strips first. The report ranks FEEDS by templated-ness:
    * per source, distinct/boiler line counts and the share of line
    * OCCURRENCES that are boilerplate.
    *
    * Shape: one explode + two (source, line) aggregates (df on the
    * distinct doc frame, occurrences on the raw frame — same key, no
    * extra exchange under subset-key clustering), source doc-counts
    * broadcast; output is |sources| rows. Counts exact int64;
    * thresholds exact-int cross-multiplication; `boiler_share` ONE
    * IEEE division (NULL for a line-less source, never 0/0). */
  def boilerplateReport(docs: DataFrame, delim: String = "\n",
                        dfPct: Int = 30): DataFrame = {
    require(dfPct >= 1 && dfPct <= 100, s"dfPct must be in 1..100: $dfPct")
    val lines = docs
      .select(col("source"), col("doc_id"),
        explode(split(col("text"), Pattern.quote(delim))).as("line"))
      .filter(col("line") =!= "")
    val srcDocs = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val dfs = lines.select("source", "line", "doc_id").distinct()
      .groupBy("source", "line").agg(count(lit(1)).as("df"))
    val occ = lines.groupBy("source", "line").agg(count(lit(1)).as("occ"))
    val agg = dfs.join(occ, Seq("source", "line"))
      .join(broadcast(srcDocs), "source")
      .withColumn("boiler",
        col("df") >= 2 && col("df") * 100 >= col("n_docs") * dfPct)
      .groupBy("source")
      .agg(count(lit(1)).as("n_distinct_lines"),
        count(when(col("boiler"), lit(1))).as("n_boiler_lines"),
        sum(col("occ")).as("occ_total"),
        sum(when(col("boiler"), col("occ")).otherwise(lit(0L)))
          .as("occ_boiler"))
    srcDocs.join(agg, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_distinct_lines"), lit(0L)).as("n_distinct_lines"),
        coalesce(col("n_boiler_lines"), lit(0L)).as("n_boiler_lines"),
        coalesce(col("occ_total"), lit(0L)).as("occ_total"),
        coalesce(col("occ_boiler"), lit(0L)).as("occ_boiler"),
        when(col("occ_total") > 0,
          col("occ_boiler").cast("double") / col("occ_total").cast("double"))
          .as("boiler_share"))
      .orderBy("source")
  }

  /** F88 — K-ANONYMITY AUDIT over quasi-identifier groups: every
    * (source, lang, size-bucket) equivalence class with its
    * population and an `at_risk` flag for classes below k — the
    * re-identification screen a privacy review runs BEFORE release
    * (F23 scrubs direct identifiers; this measures whether the
    * *metadata* a release keeps — provenance, language, length —
    * still isolates individuals: a class of 1 is a fingerprint even
    * with every PII token gone; Sweeney's k-anonymity, the measure
    * GDPR pseudonymization arguments actually cite). Generalizing
    * the length to buckets is the standard k-anonymity move; the
    * bucket width is the generalization knob, and the audit is how
    * a release picks it (probed: width 64 puts ~99% of classes
    * below k=5 — no release; width 256 splits 17/57 — a real
    * decision surface).
    *
    * Shape: ONE grouped aggregate on the quasi-identifier tuple
    * (map-side combined, |classes| output rows — bounded by the
    * generalization grid, not the corpus), the flag a pure int
    * compare. Counts exact int64; exact-int `div` bucketing (Spark
    * div == DuckDB // on non-negative lengths). */
  def kAnonymityAudit(docs: DataFrame, k: Int = 5,
                      sizeBucket: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    require(sizeBucket >= 1, s"sizeBucket must be >= 1: $sizeBucket")
    docs
      .groupBy(col("source"), col("lang"),
        expr(s"n_chars div $sizeBucket").cast("long").as("size_bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("at_risk", col("n_docs") < k)
      .orderBy("source", "lang", "size_bucket")
  }
}
