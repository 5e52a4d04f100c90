package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val header = "cookie notice accept all terms privacy policy site nav menu"
  private val footer = "copyright footer links about contact careers press legal sitemap end"

  test("lines recurring in >= minDocs docs are stripped; singleton lines survive") {
    // 10-token lines by construction: header + unique body + footer
    val docs = Seq(
      (1L, s"$header alpha beta gamma delta one two three four five six $footer"),
      (2L, s"$header epsilon zeta eta theta ten nine eight seven six five $footer"),
      (3L, s"$header iota kappa lambda mu eleven twelve thirteen fourteen fifteen sixteen $footer"),
      (4L, "standalone document with its very own ten word body line"))
      .toDF("doc_id", "text")
    val out = Boilerplate.commonLineScrub(docs, "doc_id", "text",
        lineTokens = 10, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // docs 1-3: header and footer lines shared by 3 docs -> stripped;
    // the unique middle line survives
    assert(out(1L) == ((3L, 1L, "alpha beta gamma delta one two three four five six")))
    assert(out(2L) == ((3L, 1L, "epsilon zeta eta theta ten nine eight seven six five")))
    assert(out(3L)._2 == 1L && out(3L)._3.startsWith("iota kappa"))
    // doc 4: all singleton, untouched
    assert(out(4L) == ((1L, 1L, "standalone document with its very own ten word body line")))
  }

  test("below-threshold repetition (2 docs < minDocs=3) is kept") {
    val docs = Seq(
      (1L, s"$header unique one two three four five six seven eight nine"),
      (2L, s"$header other ten twenty thirty forty fifty sixty seventy eighty ninety"))
      .toDF("doc_id", "text")
    val out = Boilerplate.commonLineScrub(docs, "doc_id", "text", 10, 3)
    assert(out.filter(col("n_kept") =!= col("n_lines")).count() == 0,
      "2-doc repetition is below the threshold — nothing strips")
  }

  test("empty and whitespace-only docs keep a zero row; order is preserved on rebuild") {
    val body = (1 to 40).map(i => s"w$i").mkString(" ") // 4 lines of 10
    val docs = Seq((1L, body), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = Boilerplate.commonLineScrub(docs, "doc_id", "text", 10, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(out(1L)._1 == 4L && out(1L)._2 == body, "line order must survive the rebuild")
    assert(out(2L) == ((0L, "")) && out(3L) == ((0L, "")))
  }

  test("result is partition-invariant") {
    val docs = (1 to 60).map(i =>
        (i.toLong, s"$header body$i a b c d e f g h ${if (i % 2 == 0) footer else "odd tail line words here now then when why how"}"))
      .toDF("doc_id", "text")
    val a = Boilerplate.commonLineScrub(docs, "doc_id", "text", 10, 3)
      .orderBy("doc_id").collect().toSeq
    val b = Boilerplate.commonLineScrub(docs.repartition(7), "doc_id", "text", 10, 3)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
