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
}
