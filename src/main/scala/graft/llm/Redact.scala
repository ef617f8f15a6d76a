package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: replace emails / IPv4 addresses /
  * phone numbers / URLs with typed placeholder tokens, and count what was
  * redacted (the count feeds quality dashboards and doc-level drop rules —
  * published web-corpus pipelines scrub these classes before training).
  *
  * Everything is a narrow codegen'd projection over `regexp_replace` /
  * `regexp_count` — zero shuffles, scan-speed, streaming-safe (pure
  * per-row). Patterns deliberately use only the regex subset with identical
  * semantics in Java regex and RE2 (character classes, bounded repetition,
  * `\b`, non-capturing groups — no backrefs, no lookaround), so an external
  * engine reproduces the redaction byte-for-byte; the q140 DuckDB oracle
  * pins that parity.
  *
  * Order matters: URLs first (an email-shaped userinfo inside a URL must
  * redact as part of the URL, not leave `<EMAIL>` glued to scheme debris),
  * then emails, phones, IPs.
  */
object Redact {

  /** user@host.tld — local part per RFC-practical subset. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings like 1.2.3.4000
    * don't half-match. (No octet range check — 999.0.0.1 redacts too;
    * over-redaction is the safe direction for a scrubber.)
    */
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** International-format phone: + then 8+ digits with separators. The
    * leading + keeps the pattern from eating arbitrary digit runs (ids,
    * quantities); national formats are corpus-specific and out of scope.
    */
  val PhonePattern = "\\+[0-9][0-9 ()-]{6,}[0-9]"

  /** http(s) URL up to whitespace. */
  val UrlPattern = "https?://[^ \\t\\n]+"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"
  val UrlToken = "<URL>"

  /** Replace all four PII classes with their tokens (URL → email → phone →
    * IP; see ordering note above).
    */
  def redact(text: Column): Column = {
    val noUrl = regexp_replace(text, UrlPattern, UrlToken)
    val noEmail = regexp_replace(noUrl, EmailPattern, EmailToken)
    val noPhone = regexp_replace(noEmail, PhonePattern, PhoneToken)
    regexp_replace(noPhone, Ipv4Pattern, IpToken)
  }

  /** Per-class match counts on the RAW text (counted before any
    * replacement, so an email inside a URL counts for both classes —
    * counts answer "what does this doc contain", not "how many tokens did
    * redact() insert").
    */
  def piiCounts(text: Column): Column =
    struct(
      regexp_count(text, lit(UrlPattern)).cast("long").as("n_urls"),
      regexp_count(text, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(text, lit(PhonePattern)).cast("long").as("n_phones"),
      regexp_count(text, lit(Ipv4Pattern)).cast("long").as("n_ips")
    )
}
