package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction lanes for training-data curation: emails,
  * AU mobile numbers, IPv4 addresses, and payment-card numbers (counted
  * only when they pass the same Luhn kernel the validation pipeline uses
  * — reference semantics, TopologyProducer.java:325-340 — so a random
  * 16-digit run is not "a card"). The reference validates PII *formats*
  * on individual answers; scanning free text for leaked PII is north-rule
  * breadth every LLM pipeline needs before text leaves curation.
  *
  * Scale shape: a single codegen'd projection — regexp_extract_all +
  * a native Luhn expression inside an array filter, zero shuffle, zero
  * state. Counts are computed per lane on the RAW text (lanes are
  * word-boundary-disjoint by construction), so they are independent of
  * redaction order; `redacted` applies the replace chain
  * email → card → ip → phone.
  *
  * Pattern notes: every regex is RE2-compatible (no backrefs, no
  * lookaround) so the DuckDB oracle runs the LITERAL same patterns; the
  * card lane redacts every 13-19-digit run (conservative redaction ships
  * false positives, never leaks), while n_cards counts Luhn-valid runs
  * only.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b04[0-9]{8}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val CardRe = "\\b[0-9]{13,19}\\b"

  private def lane(t: Column, re: String): Column =
    regexp_extract_all(t, lit(re), lit(0))

  /** Per-doc lane counts + redacted text. */
  def scan(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val cards = filter(lane(t, CardRe),
      c => graft.functions.ChecksumExpr.luhn_check(c) ===
        graft.functions.ChecksumKernels.Valid)
    docs.select(col("doc_id"),
      coalesce(size(lane(t, EmailRe)), lit(0)).cast("long").as("n_emails"),
      coalesce(size(lane(t, PhoneRe)), lit(0)).cast("long").as("n_phones"),
      coalesce(size(lane(t, Ipv4Re)), lit(0)).cast("long").as("n_ips"),
      coalesce(size(cards), lit(0)).cast("long").as("n_cards"),
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            CardRe, "<CARD>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("redacted"))
  }
}
