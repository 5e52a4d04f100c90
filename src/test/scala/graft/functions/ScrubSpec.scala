package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(Scrub.redactPii(col("t"))).as[String].head()

  private def counts(s: String): (Int, Int, Int, Int) =
    Seq(s).toDF("t").select(Scrub.piiCounts(col("t")).as("c"))
      .select($"c.n_urls", $"c.n_emails", $"c.n_ips", $"c.n_phones")
      .as[(Int, Int, Int, Int)].head()

  test("each kind redacts to its token") {
    assert(scrub("mail me at jo.doe+x@ex-ample.org please") == "mail me at [EMAIL] please")
    assert(scrub("see https://ex.org/a?b=1 and http://x.io") == "see [URL] and [URL]")
    assert(scrub("host 192.168.0.17 down") == "host [IP] down")
    assert(scrub("call +1 415 555 0042 now") == "call [PHONE] now")
    assert(scrub("call 0800-123-4567.") == "call [PHONE].")
  }

  test("order contract: URLs swallow embedded emails/digits; phones never eat IPs") {
    // the email-looking and digit-run content inside the URL is ONE [URL]
    assert(scrub("ref http://u:p@ex.org/10.1.1.1/x?tel=12345678 end") == "ref [URL] end")
    // IP redacted before the loose phone pattern can touch its digits
    assert(scrub("10.0.0.1 then 12 34 56 78 90") == "[IP] then [PHONE]")
  }

  test("clean text is untouched and scrub is idempotent") {
    val clean = "the quick brown fox, 7 words only"
    assert(scrub(clean) == clean)
    val once = scrub("jo@ex.org at 10.0.0.1 via https://x.y ring 555-123-9876")
    assert(scrub(once) == once)
  }

  test("counts match replacements made, not raw-text double counting") {
    val t = "jo@ex.org and https://ex.org/path/1234567890 from 10.0.0.1 call 555 123 9876"
    // the URL's digit run is neither a phone nor its host an email
    assert(counts(t) == ((1, 1, 1, 1)))
    assert(counts("no pii here") == ((0, 0, 0, 0)))
    assert(counts("a@b.co c@d.co") == ((0, 2, 0, 0)))
  }

  test("null text stays null") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(Scrub.redactPii(col("t"))).as[Option[String]].head()
    assert(r.isEmpty)
  }
}
