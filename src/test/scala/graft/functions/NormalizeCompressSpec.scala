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
