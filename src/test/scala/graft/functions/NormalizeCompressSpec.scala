package graft.functions

import java.util.zip.Inflater

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeCompressSpec extends SparkSpec {
  import spark.implicits._

  test("NFC expression composes combining sequences, is idempotent, and fast-paths ASCII") {
    val rows = Seq(
      ("ascii only", "ascii only"),
      ("café", "café"),
      ("Ångström", "Ångström"),
      ("already é", "already é"),
      ("", ""))
    val out = rows.map(_._1).toDF("s")
      .select(NfcNormalize.nfc(col("s")).as("n"),
        NfcNormalize.nfc(NfcNormalize.nfc(col("s"))).as("nn"))
      .as[(String, String)].collect()
    out.zip(rows).foreach { case ((n, nn), (in, want)) =>
      assert(n == want, s"normalize($in)")
      assert(nn == n, s"idempotence($in)")
      assert(n == java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC),
        s"parity with java.text.Normalizer($in)")
    }
    // null propagates
    assert(Seq[String](null).toDF("s").select(NfcNormalize.nfc(col("s"))).head().isNullAt(0))
  }

  test("NFC changes exact-dedup verdicts: decomposed and precomposed forms unify") {
    val d = Seq((1L, "café au lait"), (2L, "café au lait")).toDF("doc_id", "text")
    assert(Dedup.exactDedup(d, "text", "doc_id").count() == 2) // different bytes
    val n = d.select(col("doc_id"), NfcNormalize.nfc(col("text")).as("text"))
    assert(Dedup.exactDedup(n, "text", "doc_id").count() == 1) // same grapheme content
  }

  test("deflate kernel round-trips through Inflater and is deterministic") {
    Seq("", "a", "the quick brown fox", "x" * 10000).foreach { s =>
      val in = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val n1 = DeflateSize.compute(in)
      assert(n1 == DeflateSize.compute(in), "deterministic")
      // re-deflate with an independent Deflater and inflate back
      val d = new java.util.zip.Deflater(6)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](s.length * 2 + 128)
      val len = d.deflate(buf)
      assert(len == n1, s"kernel size parity for len=${s.length}")
      val inf = new Inflater()
      inf.setInput(buf, 0, len)
      val out = new Array[Byte](s.getBytes("UTF-8").length + 1)
      val got = inf.inflate(out)
      assert(new String(out, 0, got, "UTF-8") == s, "round trip")
    }
  }

  test("gopherFlags: each rule fires on its own violation, conjunction on the clean doc") {
    val clean = ("the be of and that have with " + (1 to 50).map(i => s"word$i").mkString(" "))
    val rows = Seq(
      ("clean", clean),
      ("short", "the be of too short"), // < 50 words
      ("symbols", clean + " " + ("# ... " * 10)), // symbol ratio blown
      ("numeric", ("the be " + Seq.fill(60)("12345").mkString(" "))), // alpha fraction low
      ("nostop", (1 to 60).map(i => s"w$i").mkString(" ")), // no stopwords
      ("empty", ""))
    val got = rows.toDF("k", "text")
      .select(col("k"), TextFunctions.gopherFlags(col("text")).as("g"))
      .select(col("k"), col("g.wc_ok"), col("g.sym_ok"), col("g.alpha_ok"),
        col("g.stop_ok"), col("g.pass"))
      .as[(String, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(got("clean") == (true, true, true, true, true))
    assert(!got("short")._1 && !got("short")._5)
    assert(!got("symbols")._2 && !got("symbols")._5)
    assert(!got("numeric")._3 && !got("numeric")._5)
    assert(!got("nostop")._4 && !got("nostop")._5)
    assert(got("empty") == (false, true, true, false, false))
  }

  test("cleanText: entity decode order, control strip, whitespace collapse, NFC, trim") {
    val dirty = "  &amp;lt; A&#39;s &quot;q&quot; \u0007x\u0001 a \t b   café  "
    val want = "&lt; A's \"q\" x a b café"
    val got = Seq(dirty).toDF("s")
      .select(TextFunctions.cleanText(col("s"))).as[String].head()
    assert(got == want)
    // idempotent on already-clean text... except entity-looking content
    // decodes again by design (single-pass decode contract)
    val clean = "plain already clean"
    assert(Seq(clean).toDF("s")
      .select(TextFunctions.cleanText(col("s"))).as[String].head() == clean)
  }

  test("compressionBp separates repetitive from high-entropy text of equal length") {
    val rep = "spam spam spam " * 40
    val rnd = new scala.util.Random(7)
    val noisy = Seq.fill(rep.length)((rnd.nextInt(94) + 33).toChar).mkString
    assert(noisy.length == rep.length)
    val bp = Seq(("rep", rep), ("noise", noisy), ("empty", ""))
      .toDF("k", "s")
      .select(col("k"), DeflateSize.compressionBp(col("s")).as("bp"))
      .as[(String, Long)].collect().toMap
    assert(bp("rep") < 1500, s"repetitive text should compress hard, got ${bp("rep")}")
    assert(bp("noise") > 7000, s"high-entropy text should not, got ${bp("noise")}")
    assert(bp("empty") == 10000L)
    assert(bp("rep") < bp("noise"))
  }
}
