package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and mask email addresses
  * and phone-style numbers with typed placeholder tokens — the standard
  * pre-training redaction pass.
  *
  * Pure codegen'd Catalyst regex expressions (RegExpReplace /
  * RegExpExtractAll), no UDF: a straight map-only scan at any scale,
  * pushdown- and whole-stage-codegen-friendly. The patterns are kept in
  * the common RE2 ∩ java.util.regex dialect (character classes, bounded
  * quantifiers, no backreferences/lookaround) so external engines — the
  * driver's DuckDB oracle among them — replicate matches exactly.
  */
object Redaction {

  /** Lowercase-normalized email shape; applied after lower(). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** International-prefix phone shape (+C[C]-NNN-NNNN). */
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  val EmailToken = "[EMAIL]"
  val PhoneToken = "[PHONE]"

  /** Count of email matches in `c` (expects lowercased text). */
  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailRe), lit(0)))

  /** Count of phone matches in `c`. */
  def phoneCount(c: Column): Column =
    size(regexp_extract_all(c, lit(PhoneRe), lit(0)))

  /** Masked text: emails first (their charset includes '+' and '-', so
    * the phone pass can never split an address), then phones. */
  def redact(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, EmailToken), PhoneRe, PhoneToken)

  /** The same masking pipeline on a plain JVM string (java.util.regex ≡
    * the RE2 ∩ Java dialect above) — the single implementation behind
    * the `graft_redact` SQL registration, so the SQL name can never
    * drift from the Column form's patterns/order/tokens. */
  def redactString(s: String): String =
    if (s == null) null
    else s.replaceAll(EmailRe, EmailToken).replaceAll(PhoneRe, PhoneToken)
}
