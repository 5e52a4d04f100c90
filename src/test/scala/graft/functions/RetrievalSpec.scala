package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Inverted index + conjunctive retrieval vs hand-computed truth and a
  * brute-force scan reference.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark merge  Spark table"), // double space → empty token dropped; case-folded
    (2L, "merge table table"),
    (3L, "spark"),
    (4L, ""),                          // empty doc: no postings
    (5L, "vector merge spark")
  ).toDF("doc_id", "text")

  test("postings: tf per (term, doc), case-folded, empties dropped") {
    val p = Retrieval.postings(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(p == Set(
      ("spark", 1L, 2L), ("merge", 1L, 1L), ("table", 1L, 1L),
      ("merge", 2L, 1L), ("table", 2L, 2L),
      ("spark", 3L, 1L),
      ("vector", 5L, 1L), ("merge", 5L, 1L), ("spark", 5L, 1L)))
  }

  test("invertedIndex: df, sum_tf, sorted posting strings") {
    val idx = Retrieval.invertedIndex(
        Retrieval.postings(docs, col("doc_id"), col("text")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(idx("spark") == ((3L, 4L, "1,3,5")))
    assert(idx("merge") == ((3L, 3L, "1,2,5")))
    assert(idx("table") == ((2L, 3L, "1,2")))
    assert(idx("vector") == ((1L, 1L, "5")))
    assert(idx.size == 4)
  }

  test("invertedIndex: maxDf cap fails loudly naming the term") {
    val e = intercept[Exception] {
      Retrieval.invertedIndex(
        Retrieval.postings(docs, col("doc_id"), col("text")), maxDf = 2).collect()
    }
    // Spark wraps the SparkRuntimeException; match on the message text
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("posting list") &&
      (m.contains("'spark'") || m.contains("'merge'"))))
  }

  test("conjunctive AND == brute-force contains-all scan") {
    val hits = Retrieval.conjunctive(docs, col("doc_id"), col("text"),
        Seq("spark", "MERGE")) // mixed case + dup-free after fold
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits == Map(1L -> 3L, 5L -> 2L)) // sum_tf over the two terms
    // brute force on the larger corpus table for structure confidence
    val corpus = graft.sources.Tables.load(spark, SfDir, "documents")
    val terms = Seq("dup", "merge")
    val got = Retrieval.conjunctive(corpus, col("doc_id"), col("text"), terms)
      .collect().map(_.getLong(0)).toSet
    val want = corpus.filter(terms.map(t =>
        array_contains(split(lower(col("text")), " "), t)).reduce(_ && _))
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("conjunctive: single term, absent term, empty terms") {
    val one = Retrieval.conjunctive(docs, col("doc_id"), col("text"), Seq("vector"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(one == Map(5L -> 1L))
    assert(Retrieval.conjunctive(docs, col("doc_id"), col("text"),
      Seq("absent_term")).count() == 0)
    intercept[IllegalArgumentException] {
      Retrieval.conjunctive(docs, col("doc_id"), col("text"), Seq.empty)
    }
  }

  /** Plain-Scala replay of the cleared-integer BM25 formula — the same
    * arithmetic the operator and the q137 oracle both implement.
    */
  private def bm25Ref(corpus: Seq[(Long, String)], terms: Seq[String],
                      k: Int): Seq[(Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq }
    val n = corpus.size.toLong
    val l = toks.map(_._2.size.toLong).sum
    val q = terms.map(_.toLowerCase).distinct
    val df = q.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    toks.flatMap { case (id, ts) =>
      val dl = ts.size.toLong
      val hits = q.filter(ts.contains)
      if (hits.isEmpty) None
      else {
        val score = hits.map { t =>
          val tf = ts.count(_ == t).toLong
          val idf = (2 * n - 2 * df(t) + 1) * 10000L / (2 * df(t) + 1)
          idf * 22 * tf * l / (10 * tf * l + 3 * l + 9 * dl * n)
        }.sum
        Some((id, dl, hits.size.toLong, score))
      }
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(k)
  }

  test("bm25TopK == plain-Scala integer replay on the corpus table") {
    val corpus = graft.sources.Tables.load(spark, SfDir, "documents")
    val terms = Seq("vector", "merge", "window")
    val got = Retrieval.bm25TopK(corpus, col("doc_id"), col("text"), terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val want = bm25Ref(
      corpus.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq, terms, 10)
    assert(got == want && got.nonEmpty)
  }

  test("bm25TopK: rarer term outranks common term at equal tf and dl") {
    val c = Seq(
      (1L, "rare common pad"), (2L, "common extra pad"),
      (3L, "common other pad"), (4L, "common more pad"))
    val scores = Retrieval.bm25TopK(c.toDF("doc_id", "text"),
        col("doc_id"), col("text"), Seq("rare", "common"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // doc 1 holds the df=1 term (plus 'common'); docs 2-4 only the df=4 one
    assert(scores(1L) > scores(2L))
    assert(scores(2L) == scores(3L) && scores(3L) == scores(4L))
    assert(Retrieval.bm25TopK(c.toDF("doc_id", "text"), col("doc_id"),
      col("text"), Seq("absent"), k = 3).count() == 0)
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(c.toDF("doc_id", "text"), col("doc_id"),
        col("text"), Seq("x"), k = 0)
    }
  }
}
