package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.load(spark, SfDir, "documents")
    .select($"doc_id", TextFunctions.wsTokenCount($"text").cast("long").as("n_tok"))

  test("packChunked: offsets are contiguous per shard and bins cover the stream") {
    val out = Packing.packChunked(docs, $"doc_id", $"n_tok",
      contextLen = 512L, nShards = 4).cache()
    // per shard, sorted by doc_id: each offset = previous offset + tokens
    val rows = out.select($"shard", $"doc_id", $"n_tok", $"tok_offset")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2))
    rows.foreach { case (shard, ds) =>
      var expect = 0L
      ds.foreach { case (_, id, tok, off) =>
        assert(off == expect, s"shard $shard doc $id: offset $off != $expect")
        expect += tok
      }
    }
    // bin arithmetic: start*len <= offset, end bin reaches the last token
    val bad = out.filter($"start_bin" * 512 > $"tok_offset" ||
      ($"end_bin" + 1) * 512 < $"tok_offset" + greatest($"n_tok", lit(1L)) - 1).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("packChunked is partition-invariant (content-hash shards, window cumsum)") {
    val a = Packing.packChunked(docs, $"doc_id", $"n_tok", 512L, 4)
      .select($"doc_id", $"start_bin").as[(Long, Long)].collect().toSet
    val b = Packing.packChunked(docs.repartition(13), $"doc_id", $"n_tok", 512L, 4)
      .select($"doc_id", $"start_bin").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("chunkSpans: full cover, exact overlap, short tail, degenerate empty doc") {
    val d = Seq((1L, 300L), (2L, 128L), (3L, 50L), (4L, 0L)).toDF("doc_id", "n_tok")
    val out = Packing.chunkSpans(d, $"doc_id", $"n_tok", size = 128, overlap = 32)
      .select($"doc_id", $"chunk_idx", $"tok_start", $"tok_end")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq)
    // 300 tokens, stride 96: [0,128) [96,224) [192,300) — covers, overlaps 32
    assert(out(1L) == Seq((0L, 128L), (96L, 224L), (192L, 300L)))
    assert(out(2L) == Seq((0L, 128L)), "exact-size doc is one chunk")
    assert(out(3L) == Seq((0L, 50L)), "short doc is one short chunk")
    assert(out(4L) == Seq((0L, 0L)), "empty doc emits the degenerate span")
  }

  test("chunkSpans rejects overlap >= size") {
    intercept[IllegalArgumentException] {
      Packing.chunkSpans(docs, $"doc_id", $"n_tok", size = 64, overlap = 64)
    }
  }

  test("chunkSpans fails loudly at the per-doc chunk cap instead of OOMing the array") {
    val d = Seq((1L, 10000L)).toDF("doc_id", "n_tok")
    val e = intercept[Exception] {
      Packing.chunkSpans(d, $"doc_id", $"n_tok", size = 128, overlap = 32,
        maxChunksPerDoc = 10L).count()
    }
    assert(e.getMessage.contains("chunkSpans"), s"unexpected: ${e.getMessage}")
    // at the default cap the same doc chunks fine
    assert(Packing.chunkSpans(d, $"doc_id", $"n_tok", size = 128, overlap = 32)
      .count() == 104L)
  }

  test("packedTokenStreams: contexts carry every id once, in stream order, across doc boundaries") {
    val d = Seq((1L, Seq(10, 11, 12)), (2L, Seq(20, 21)), (3L, Seq(30)))
      .toDF("doc_id", "ids")
    val out = Packing.packedTokenStreams(d, $"doc_id", $"ids",
        contextLen = 4L, nShards = 1)
      .orderBy($"bin").collect()
    // one shard: stream = 10,11,12,20,21,30 cut at 4
    assert(out.map(r => (r.getLong(1), r.getInt(2), r.getString(3))).toSeq ==
      Seq((0L, 4, "10,11,12,20"), (1L, 2, "21,30")))
    // partition-invariant (window + array_sort restore stream order)
    val out2 = Packing.packedTokenStreams(d.repartition(5), $"doc_id", $"ids",
        contextLen = 4L, nShards = 1)
      .orderBy($"bin").collect()
    assert(out.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
  }

  test("packedTokenStreams agrees with packChunked's bin geometry") {
    val docs = Seq((1L, (1 to 7).toSeq), (2L, (8 to 9).toSeq), (3L, Seq(10)),
        (4L, (11 to 23).toSeq))
      .map { case (i, ids) => (i, ids.map(_.toInt)) }.toDF("doc_id", "ids")
    val packed = Packing.packedTokenStreams(docs, $"doc_id", $"ids",
      contextLen = 5L, nShards = 4)
    val geom = Packing.packChunked(docs.select($"doc_id", size($"ids").as("n_tok")),
      $"doc_id", $"n_tok", contextLen = 5L, nShards = 4)
    // every context the geometry predicts is exactly covered by ids
    val binTotals = packed.groupBy($"shard").agg(sum($"n_ids").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val geomTotals = geom.groupBy($"shard").agg(sum($"n_tok").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(binTotals == geomTotals.filter(_._2 > 0))
  }

  test("packFirstFit: no bin exceeds budget unless a single doc does, ids stay whole") {
    val out = Packing.packFirstFit(docs, $"doc_id", $"n_tok",
      budget = 512L, nShards = 4)
      .join(docs, "doc_id")
    val fills = out.groupBy($"shard", $"bin")
      .agg(sum($"n_tok").as("fill"), count(lit(1)).as("n"), max($"n_tok").as("mx"))
    // an over-budget bin must be a singleton holding one over-budget doc
    val bad = fills.filter($"fill" > 512 && !($"n" === 1 && $"mx" > 512)).count()
    assert(bad == 0)
    // every doc packed exactly once
    assert(out.count() == docs.count())
  }

  test("packFirstFit matches a sequential reference fill per shard") {
    val d = Seq((1L, 200L), (2L, 200L), (3L, 200L), (4L, 700L), (5L, 10L), (6L, 500L))
      .toDF("doc_id", "n_tok")
    // one shard → pure sequential semantics are visible
    val got = Packing.packFirstFit(d, $"doc_id", $"n_tok", budget = 512L, nShards = 1)
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    // 200+200=400 fits; +200 overflows → bin1; 700>512 alone → bin2;
    // 10 after the over-budget doc overflows bin2 (700+10>512) → bin3;
    // 10+500=510 fits bin3
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 3L))
  }

  test("packFirstFit is partition-invariant") {
    val a = Packing.packFirstFit(docs, $"doc_id", $"n_tok", 512L, 4)
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toSet
    val b = Packing.packFirstFit(docs.repartition(13), $"doc_id", $"n_tok", 512L, 4)
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  // ---- content-defined chunking -----------------------------------------

  /** Independent imperative CDC reference: same 60-bit md5-prefix window
    * rule, written as a plain loop so an operator bug can't hide in
    * shared code.
    */
  private def md5fp(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }
  private def refCdc(text: String, w: Int = 4, div: Int = 8): Seq[(Long, Long, Long, Long)] = {
    val toks = text.trim.split("\\s+").toIndexedSeq
    val n = toks.length
    val cuts = 0 +: (w until n)
      .filter(c => md5fp(toks.slice(c - w, c).mkString(" ")) % div == 0) :+ n
    cuts.sliding(2).zipWithIndex.map { case (Seq(s, e), i) =>
      (i.toLong, s.toLong, e.toLong, md5fp(toks.slice(s, e).mkString(" ")))
    }.toSeq
  }
  private def collectCdc(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Long, Long, Long)]] =
    Packing.cdcChunks(df, $"doc_id", $"text")
      .select($"doc_id", $"chunk_idx", $"tok_start", $"tok_end", $"chunk_fp")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)
        .map(t => (t._2, t._3, t._4, t._5)).toSeq).toMap

  test("cdcChunks matches an independent imperative reference on random docs") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val txt = (1L to 20L).map(i =>
      (i, Array.fill(20 + rnd.nextInt(180))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val got = collectCdc(txt.toDF("doc_id", "text"))
    txt.foreach { case (id, t) =>
      assert(got(id) == refCdc(t), s"doc $id diverges from reference")
    }
  }

  test("cdcChunks: chunks tile the document; boundaries survive a head edit") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum", "gold", "jade")
    val base = Array.fill(200)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val got = collectCdc(Seq((1L, base), (2L, "zzz " + base)).toDF("doc_id", "text"))
    // tiling: starts/ends contiguous from 0 to n, in chunk_idx order
    got.foreach { case (id, cs) =>
      assert(cs.head._2 == 0L, s"doc $id does not start at 0")
      cs.sliding(2).foreach {
        case Seq((_, _, e, _), (_, s, _, _)) => assert(e == s, s"doc $id gap at $s")
        case _ => ()
      }
    }
    // content-defined cuts re-align after the prepended token: every
    // chunk of the original past its first is reproduced verbatim in
    // the edited doc (fixed-stride chunking would mis-align ALL of them)
    val fpA = got(1L).map(_._4)
    val fpB = got(2L).map(_._4)
    assert(fpA.length >= 10, "fixture too short to exercise boundaries")
    assert(fpB.takeRight(fpA.length - 1) == fpA.drop(1))
  }

  test("cdcChunks: empty and whitespace-only docs emit nothing; short doc is one chunk") {
    val got = collectCdc(Seq((1L, ""), (2L, "   "), (3L, "one two"))
      .toDF("doc_id", "text"))
    assert(!got.contains(1L) && !got.contains(2L))
    assert(got(3L) == Seq((0L, 0L, 2L, md5fp("one two"))))
  }
}
