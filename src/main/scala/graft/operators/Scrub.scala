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
    // Three FUSED replace+count passes ([[graft.functions.ScrubPass]],
    // r15): the built-in spelling ran each automaton twice per row — once
    // for regexp_replace, once for size(regexp_extract_all) — plus a
    // throwaway match array per count; fusing halves the regex work on
    // this pure-scan operator (guide §1.2 step 2). Same java.util.regex
    // automata, same left-to-right non-overlapping walk, same stage
    // ordering (URL, then email on the URL-scrubbed text, then phone), so
    // every count and the final text are identical to the built-in
    // spelling and the DuckDB oracle is unchanged.
    docs
      .select(col("doc_id"),
        graft.functions.ScrubPass(col("text"), UrlRe, "<URL>").as("u"))
      .select(col("doc_id"), col("u.n").as("n_urls"),
        graft.functions.ScrubPass(col("u.clean"), EmailRe, "<EMAIL>").as("e"))
      .select(col("doc_id"), col("n_urls"), col("e.n").as("n_emails"),
        graft.functions.ScrubPass(col("e.clean"), PhoneRe, "<PHONE>").as("p"))
      .select(col("doc_id"), col("p.clean").as("clean_text"),
        col("n_urls"), col("n_emails"), col("p.n").as("n_phones"))
      .orderBy("doc_id")
  }
}
