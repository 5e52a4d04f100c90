package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII-style scrubbing for training corpora: regex redaction of emails,
  * URLs, IPv4 addresses and phone-like digit runs, plus match counts for
  * corpus profiling. Pure codegen'd projections (`regexp_replace` /
  * `regexp_count`) — no UDFs, no shuffle; at 100 TB this is a map-only
  * pass fused into whatever scan precedes it.
  *
  * The patterns deliberately stay inside the common subset of Java regex
  * and RE2 (no backreferences, no lookaround) so the SAME pattern runs
  * in Spark and in the DuckDB oracle (q77) — and in any downstream
  * engine a corpus consumer might verify with.
  *
  * Redaction ORDER is part of the contract: URL → email → IPv4 → phone.
  * URLs go first (they swallow embedded digit runs and @-free hosts),
  * phones last (the loosest pattern; everything digit-bearing it should
  * NOT eat has already been tokenized away).
  */
object Scrub {

  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d -]{7,}\\d"

  val UrlTok = "[URL]"
  val EmailTok = "[EMAIL]"
  val IpTok = "[IP]"
  val PhoneTok = "[PHONE]"

  /** The four redaction stages, applied in contract order. */
  def redactUrls(text: Column): Column = regexp_replace(text, UrlRe, UrlTok)
  def redactEmails(text: Column): Column = regexp_replace(text, EmailRe, EmailTok)
  def redactIps(text: Column): Column = regexp_replace(text, Ipv4Re, IpTok)
  def redactPhones(text: Column): Column = regexp_replace(text, PhoneRe, PhoneTok)

  /** Full scrub: URL → email → IPv4 → phone. */
  def redactPii(text: Column): Column =
    redactPhones(redactIps(redactEmails(redactUrls(text))))

  /** Per-kind match counts as a struct, counted on the SAME intermediate
    * strings the redaction chain sees (so counts == replacements made;
    * counting every kind on the raw text would double-count digit runs
    * inside URLs as phones, etc.).
    */
  def piiCounts(text: Column): Column = {
    val afterUrl = redactUrls(text)
    val afterEmail = redactEmails(afterUrl)
    val afterIp = redactIps(afterEmail)
    struct(
      regexp_count(text, lit(UrlRe)).as("n_urls"),
      regexp_count(afterUrl, lit(EmailRe)).as("n_emails"),
      regexp_count(afterEmail, lit(Ipv4Re)).as("n_ips"),
      regexp_count(afterIp, lit(PhoneRe)).as("n_phones"))
  }
}
