package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation — the standard redaction pass a
  * real pipeline runs before training (emails, IPv4 addresses, phone-style
  * `+digits` numbers). Pure composition of the built-in (codegen'd)
  * `regexp_replace`; no custom kernel is warranted because the work IS
  * regex substitution. Patterns are deliberately RE2-safe ASCII classes so
  * a DuckDB oracle runs the byte-identical expressions (q57): Java regex
  * and RE2 agree on these (disjoint ASCII classes, `\b`, bounded
  * quantifiers).
  *
  * Order matters and is part of the contract: emails first (an email's
  * local part may contain digit runs a later pattern could nibble), then
  * IPv4 (dotted quads), then `+`-prefixed number runs.
  */
object Pii {
  // (?i): real-world emails are mixed-case; Java regex and RE2 treat the
  // flag identically. Phone runs are UNBOUNDED above the 7-digit floor —
  // a {7,15} cap would redact only the first 15 digits of a longer run
  // and leak the tail next to the marker.
  val EmailPattern = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+[0-9]{7,}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        Ipv4Pattern, "[IP]"),
      PhonePattern, "[PHONE]")

  /** Count of matches of `pattern` in `text` (portable: DuckDB
    * `len(regexp_extract_all(...))`). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
}
