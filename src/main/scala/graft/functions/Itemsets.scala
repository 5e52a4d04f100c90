package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise frequent-itemset mining over document token sets — the
  * A-priori candidate-generation discipline (Agrawal & Srikant,
  * VLDB'94) applied to corpus co-occurrence: which terms travel
  * together (template detection, collocation mining, topic seeds).
  *
  * 100 TB shape: the monotonicity prune IS the scale story. A pair can
  * only reach `minSupport` if both members do, so tokens are
  * support-filtered BEFORE any pair exists — the quadratic per-document
  * fan-out applies only to the surviving vocabulary (tiny by Zipf), and
  * pair generation is a pure per-row generator over the sorted survivor
  * set (no self-join: the doc_id never re-shuffles). Two shuffles total:
  * the unigram count and the pair count, both AQE-skewable.
  */
object Itemsets {

  /** Frequent co-occurring token pairs: each document contributes its
    * DISTINCT lowercased word tokens; emits `(tok_a, tok_b, support)`
    * for `tok_a < tok_b` pairs appearing in at least `minSupport`
    * documents. Deterministic — set semantics per document, binary
    * string order for the pair orientation.
    */
  def frequentPairs(df: DataFrame, id: Column, text: Column,
                    minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    // explode_outer + null filter: see graft.util.Explode (an inferred
    // pre-Generate filter would re-tokenize per row)
    val toks = df.select(id.cast("long").as("doc_id"),
        explode_outer(array_distinct(TextFunctions.tokens(text))).as("tok"))
      .filter(col("tok").isNotNull)
    val freq = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("__sup")).filter(col("__sup") >= minSupport)
    // survivor vocabulary is support-pruned → broadcast the semi-join
    val kept = toks.join(broadcast(freq.select(col("tok"))), Seq("tok"), "left_semi")
    val perDoc = kept.groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("tok"))).as("__ts"))
    perDoc
      // explode_outer: an inferred pre-Generate filter would build the
      // O(k²) pair expansion twice per row (see graft.util.Explode)
      .select(explode_outer(flatten(transform(col("__ts"), (a, i) =>
        transform(slice(col("__ts"), i + 2, greatest(size(col("__ts")), lit(1))),
          b => struct(a.as("tok_a"), b.as("tok_b")))))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}
