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
}
