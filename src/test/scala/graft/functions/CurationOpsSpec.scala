package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 curation operators: substring-level duplicate spans,
  * deterministic corpus shuffle/sharding, fixed-centroid cluster
  * assignment.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("duplicateSpans finds a planted cross-doc duplicated passage with exact offsets") {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ") // exactly one 8-gram
    val d = docs(
      1L -> s"u1 u2 u3 $boiler v1 v2 v3",
      2L -> s"w1 $boiler x1 x2 x3 x4 x5",
      3L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
    val spans = Dedup.duplicateSpans(d, "text", "doc_id", k = 8, minCount = 2)
      .as[(Long, Long, Long)].collect().sorted
    // doc 1: boiler occupies tokens [3, 11); doc 2: [1, 9); doc 3 clean
    assert(spans.toSeq == Seq((1L, 3L, 11L), (2L, 1L, 9L)))
  }

  test("duplicateSpans merges overlapping windows into one maximal span") {
    // two docs share a 10-word passage → three overlapping 8-windows
    // each, which must merge into ONE span of length 10
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val d = docs(1L -> s"a1 $passage", 2L -> s"c1 c2 $passage")
    val spans = Dedup.duplicateSpans(d, "text", "doc_id", k = 8, minCount = 2)
      .as[(Long, Long, Long)].collect().sorted
    assert(spans.toSeq == Seq((1L, 1L, 11L), (2L, 2L, 12L)))
  }

  test("duplicateSpans counts INTRA-doc repeats (self-boilerplate is duplication)") {
    val boiler = (1 to 8).map(i => s"s$i").mkString(" ")
    val d = docs(1L -> s"$boiler m1 m2 m3 $boiler", 2L -> "n1 n2 n3 n4 n5 n6 n7 n8 n9")
    val spans = Dedup.duplicateSpans(d, "text", "doc_id", k = 8, minCount = 2)
      .as[(Long, Long, Long)].collect().sorted
    // tokens: s1..s8 = [0,8), m1 m2 m3 = [8,11), s1..s8 again = [11,19)
    assert(spans.toSeq == Seq((1L, 0L, 8L), (1L, 11L, 19L)))
  }

  test("scrubDuplicateSpans cuts every occurrence and keeps clean docs verbatim") {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = docs(
      1L -> s"u1 u2 u3 $boiler v1 v2 v3",
      2L -> s"w1 $boiler x1 x2 x3 x4 x5",
      3L -> "z1 z2   z3\tz4 z5 z6 z7 z8 z9 z10") // messy whitespace
    val got = Dedup.scrubDuplicateSpans(d, "text", "doc_id", k = 8, minCount = 2)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "u1 u2 u3 v1 v2 v3")
    assert(got(2L) == "w1 x1 x2 x3 x4 x5")
    // clean docs survive whole, whitespace-normalized (documented contract)
    assert(got(3L) == "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
    assert(got.keySet == Set(1L, 2L, 3L), "every input doc must appear")
  }

  test("scrubDuplicateSpans handles total loss, intra-doc repeats and short docs") {
    val boiler = (1 to 8).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> boiler,                       // doc IS the boilerplate → ""
      2L -> s"$boiler m1 m2 m3 $boiler",  // intra-doc repeat: both cut
      3L -> "tiny doc")                   // < k tokens: untouched
    val got = Dedup.scrubDuplicateSpans(d, "text", "doc_id", k = 8, minCount = 2)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "")
    assert(got(2L) == "m1 m2 m3")
    assert(got(3L) == "tiny doc")
  }

  test("scrubDuplicateSpans equals delete-marked-tokens reference on random corpora") {
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 30).map(i => s"t$i")
    val rows = (1L to 40L).map { id =>
      id -> (1 to (5 + rnd.nextInt(30))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val df = rows.toDF("doc_id", "text")
    val k = 4
    val spans = Dedup.duplicateSpans(df, "text", "doc_id", k = k, minCount = 2)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val want = rows.map { case (id, text) =>
      val ws = text.trim.split("\\s+")
      val cut = spans.getOrElse(id, Array()).flatMap { case (_, s, e) => s until e }.toSet
      id -> ws.zipWithIndex.collect { case (t, i) if !cut(i) => t }.mkString(" ")
    }.toMap
    val got = Dedup.scrubDuplicateSpans(df, "text", "doc_id", k = k, minCount = 2)
      .as[(Long, String)].collect().toMap
    assert(got == want)
  }

  test("duplicateStats covers every doc and computes exact basis points") {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = docs(
      1L -> s"u1 u2 $boiler", // 10 tokens, 8 duplicated → 8000 bp
      2L -> s"$boiler",       // 8 tokens, all duplicated → 10000 bp
      3L -> "k1 k2 k3")       // clean, short
    val st = Dedup.duplicateStats(d, "text", "doc_id", k = 8, minCount = 2)
      .select("doc_id", "n_tok", "dup_tok", "n_spans", "dup_bp")
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    assert(st.toSeq == Seq((1L, 10L, 8L, 1L, 8000L), (2L, 8L, 8L, 1L, 10000L),
      (3L, 3L, 0L, 0L, 0L)))
  }

  test("duplicateSpans matches a brute-force reference on random corpora (fixed seed)") {
    val k = 3
    def reference(corpus: Seq[(Long, Seq[String])]): Set[(Long, Long, Long)] = {
      val grams = corpus.flatMap { case (id, ws) =>
        ws.sliding(k).zipWithIndex.collect {
          case (g, i) if g.length == k => (g.mkString(" "), id, i.toLong)
        }
      }
      val dup = grams.groupBy(_._1).filter(_._2.size >= 2).keySet
      corpus.flatMap { case (id, _) =>
        val marked = grams.collect { case (g, i, p) if i == id && dup(g) => p }.sorted
        // interval merge of [p, p+k)
        val spans = marked.foldLeft(List.empty[(Long, Long)]) {
          case ((s, e) :: rest, p) if p <= e => (s, p + k) :: rest
          case (acc, p) => (p, p + k) :: acc
        }
        spans.map { case (s, e) => (id, s, e) }
      }.toSet
    }
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val corpus = (1L to (1 + rnd.nextInt(7)).toLong).map { id =>
        id -> Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(6)}")
      }
      val df = corpus.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
      val got = Dedup.duplicateSpans(df, "text", "doc_id", k = k, minCount = 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == reference(corpus), s"trial $trial corpus=$corpus")
    }
  }

  test("corpusShuffle is a permutation: dense 0..n-1 positions per shard, all docs once") {
    val d = spark.read.parquet(s"$SfDir/documents.parquet")
    val out = Sampling.corpusShuffle(d.select(col("doc_id"), col("text")),
      col("text"), col("doc_id"), nShards = 4)
    val n = d.count()
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
    // positions are dense per shard
    val dense = out.groupBy("shard")
      .agg(count(lit(1)).as("c"), max(col("pos")).as("mx"), min(col("pos")).as("mn"),
        countDistinct(col("pos")).as("dp"))
      .filter(col("mn") === 0 && col("mx") === col("c") - 1 && col("dp") === col("c"))
    assert(dense.count() == out.select("shard").distinct().count())
  }

  test("corpusShuffle is partition-invariant and order-decorrelated from doc_id") {
    val d = spark.read.parquet(s"$SfDir/documents.parquet").select(col("doc_id"), col("text"))
    val a = Sampling.corpusShuffle(d, col("text"), col("doc_id"), nShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().sorted
    val b = Sampling.corpusShuffle(d.repartition(13), col("text"), col("doc_id"), nShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().sorted
    assert(a.toSeq == b.toSeq)
    // the within-shard order must not be id order (that's the "shuffle")
    val shard0 = a.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(shard0.length > 10 && !(shard0.toSeq == shard0.toSeq.sorted))
  }

  test("assignToLowestIdCentroids matches the driver-side brute-force argmin") {
    val e = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val got = Similarity.assignToLowestIdCentroids(e, "vec_id", "embedding", 8)
      .as[(Long, Long)].collect().toMap
    val all = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val cents = all.take(8)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = all.map { case (id, v) =>
      id -> cents.minBy { case (cid, c) => (d2(v, c), cid) }._1
    }.toMap
    assert(got == want)
    // each centroid assigns to itself (distance 0, lowest cid wins ties)
    cents.foreach { case (cid, _) => assert(got(cid) == cid) }
  }
}
