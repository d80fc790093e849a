package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: replace e-mail addresses,
  * IPv4 addresses, and international phone numbers with typed
  * placeholder tokens, and count what was found (the audit trail a
  * compliance pass wants).
  *
  * Pure per-row `regexp_replace`/`regexp_count` — codegen'd, no
  * shuffle, runs inside the scan's WholeStageCodegen span at any
  * scale. Patterns deliberately use explicit ASCII classes and no
  * lookaround so the same pattern text runs identically under Java
  * regex (Spark) and RE2 (the DuckDB oracle) — the cross-engine
  * determinism rule the oracle suite depends on.
  */
object Redaction {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  /** International form only (`+` then 7-15 digits) — deliberately
    * conservative: free-form national numbers collide with ordinary
    * numerics in prose. */
  val PhonePattern = "\\+[0-9]{7,15}"

  /** `text` with e-mails, IPv4s, then phones replaced by placeholder
    * tokens (fixed order; the patterns are mutually exclusive on any
    * given span). */
  def redactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailPattern), lit("<EMAIL>")),
        lit(Ipv4Pattern), lit("<IP>")),
      lit(PhonePattern), lit("<PHONE>"))

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))
}
