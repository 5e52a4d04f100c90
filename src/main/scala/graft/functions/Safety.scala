package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorized token-blocklist screening — the safety-filter stage of a
  * training-data pipeline (category wordlists → per-document hit
  * counts → keep/drop decision). Complements the regex PII scrub
  * (Scrub): PII rewrites spans; the blocklist GATES whole documents on
  * curated term lists with severities.
  *
  * 100 TB shape: the blocklist is a broadcast map-side join onto the
  * exploded token stream — hits are counted BEFORE any shuffle (partial
  * aggregation), and only (id, counts) rows move. The corpus-wide left
  * join back to documents rides the id key. Zero UDFs; the tokenize/
  * join/count chain stays in whole-stage codegen.
  */
object Safety {

  /** Per-document screening: (id, n_warn, n_block, keep) where `keep`
    * is true iff NO term from a blocking category appears. Categories
    * in `blockCategories` block; all other listed categories only warn.
    * Terms are matched case-folded on the whitespace token stream —
    * the same tokenizer as Retrieval, so one pass can serve both.
    */
  def blocklistFlags(docs: DataFrame, idCol: Column, textCol: Column,
                     blocklist: Map[String, Seq[String]],
                     blockCategories: Set[String]): DataFrame = {
    require(blocklist.nonEmpty, "empty blocklist: nothing to screen")
    val unknown = blockCategories -- blocklist.keySet
    require(unknown.isEmpty, s"blockCategories not in blocklist: $unknown")
    val spark = docs.sparkSession
    import spark.implicits._
    val bl = blocklist.toSeq
      .flatMap { case (cat, terms) => terms.map(t => (t.toLowerCase, cat)) }
      .toDF("term", "category")
    val blockCats = blockCategories.toSeq
    val hits = docs
      .select(idCol.as("id"), explode(split(lower(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .join(broadcast(bl), "term")
      .groupBy(col("id"))
      .agg(
        sum(when(col("category").isin(blockCats: _*), 0L).otherwise(1L)).as("n_warn"),
        sum(when(col("category").isin(blockCats: _*), 1L).otherwise(0L)).as("n_block"))
    docs.select(idCol.as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_warn"), lit(0L)).as("n_warn"),
        coalesce(col("n_block"), lit(0L)).as("n_block"),
        (coalesce(col("n_block"), lit(0L)) === 0L).as("keep"))
  }
}
