package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction for training corpora — the scrub stage
  * every large-scale text pipeline runs before tokenization (emails,
  * IPs, phone numbers must not reach the training set).
  *
  * Patterns are deliberately regex-dialect-portable: character classes
  * and bounded quantifiers only — no backreferences, no lookaround —
  * so they run identically under Java regex (Spark codegen) and RE2
  * (the DuckDB oracle), and CANNOT backtrack catastrophically on
  * adversarial input (linear-time matching either way; a crawl corpus
  * WILL contain pathological strings, so this is a scale-safety
  * property, not a style choice).
  *
  * Scale shape: pure row-local `regexp_count`/`regexp_replace` — one
  * codegen'd projection, no shuffle, no UDF; cost O(len × patterns)
  * per row. Patterns apply in declared order to progressively
  * scrubbed text, so a match consumed by an earlier redaction (the
  * digits of an email's host, say) is never double-counted by a later
  * pattern — and any replayer applying the same order gets the same
  * counts and bytes.
  */
object Pii {

  /** (tag, pattern, replacement) in scrub order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email",
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("ipv4",
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "<IP>"),
    ("phone",
      "\\+[0-9]{1,2} \\([0-9]{3}\\) [0-9]{3}-[0-9]{4}",
      "<PHONE>"))

  /** per-tag count columns (each computed on the text as the pattern
    * sees it after earlier redactions) plus the fully redacted text —
    * the one definition both the batch scrub and the streaming window
    * monitor project from. */
  def countColumns(text: Column): (Seq[Column], Column) =
    patterns.foldLeft((Seq.empty[Column], text)) {
      case ((cs, txt), (tag, re, repl)) =>
        (cs :+ regexp_count(txt, lit(re)).as(s"n_$tag"),
          regexp_replace(txt, re, repl))
    }

  /** total matches across all patterns, given countColumns in scope. */
  def totalCol: Column =
    patterns.map { case (tag, _, _) => col(s"n_$tag") }.reduce(_ + _)

  /** per-doc PII counts + redacted text: one row out per row in, with
    * `n_<tag>` counts (computed on the text as each pattern sees it),
    * `n_pii` total, `clean_text`, and an `is_dirty` flag for cheap
    * downstream filtering. */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // fold: each pattern counts on the PREVIOUS pattern's output, then
    // redacts — sequential semantics, single projection after fusion
    val (counts, cleaned) = countColumns(col(textCol))
    df.select((col(idCol).as("id") +: counts) :+
        cleaned.as("clean_text"): _*)
      .withColumn("n_pii", totalCol)
      .withColumn("is_dirty", totalCol > 0)
  }

  /** corpus-level scrub report: docs and match totals per PII type —
    * one aggregation over the scrubbed projection. */
  def report(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = scrub(df, idCol, textCol)
    val aggs = patterns.flatMap { case (tag, _, _) =>
      Seq(sum(col(s"n_$tag")).as(s"total_$tag"),
        sum(when(col(s"n_$tag") > 0, 1L).otherwise(0L))
          .as(s"docs_$tag"))
    } :+ sum(when(col("is_dirty"), 1L).otherwise(0L)).as("docs_dirty")
    s.agg(aggs.head, aggs.tail: _*)
  }
}
