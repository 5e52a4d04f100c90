package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic span-corruption masking plan — the T5/UL2 denoising
  * layout (Raffel et al., JMLR'20 §3.1.4): choose ~`1/rateDiv` of token
  * positions as span starts, extend each `spanLen` tokens, merge
  * overlaps into maximal spans, number them per document. The selection
  * is pure content arithmetic (md5 of `doc_id:pos`), so the SAME mask
  * layout is reproduced on any engine, any partitioning, any rerun — a
  * training job can re-derive its corruption plan instead of storing it.
  *
  * 100 TB shape: candidate generation is a per-row generator over the
  * document's own positions (zero shuffle); the overlap merge is one
  * window partitioned by doc_id — never global. Output volume ≈
  * `n_tok/rateDiv` rows per document.
  */
object SpanMask {

  /** Emits `(doc_id, mask_id, span_start, span_end, n_masked)` with
    * `[span_start, span_end)` 0-based token spans, `mask_id` ordinal by
    * start, `n_masked` the span's token count. Expected masked fraction
    * ≈ `spanLen/rateDiv` (defaults: 3/20 = 15%, the T5 rate).
    */
  def maskSpans(df: DataFrame, id: Column, textCol: Column,
                rateDiv: Int = 20, spanLen: Int = 3): DataFrame = {
    require(rateDiv >= 2, s"rateDiv must be >= 2, got $rateDiv")
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    val starts = df.filter(length(trim(textCol)) > 0)
      .select(id.cast("long").as("doc_id"),
        size(split(trim(textCol), "\\s+")).as("__n"))
      .select(col("doc_id"), col("__n"),
        // explode_outer: an inferred pre-Generate filter would run the
        // md5 position-filter lambda twice per row (graft.util.Explode)
        explode_outer(filter(sequence(lit(0), col("__n") - 1), p =>
          conv(substring(md5(concat_ws(":", col("doc_id"), p)), 1, 15), 16, 10)
            .cast("long") % rateDiv === 0)).as("p"))
      .filter(col("p").isNotNull)
      .select(col("doc_id"), col("p"),
        least(col("p") + spanLen, col("__n")).as("e"))
    // gaps-and-islands merge of overlapping/adjacent candidate spans
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val prevEnd = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    starts
      .withColumn("__new", when(prevEnd.isNull || col("p") > prevEnd, 1).otherwise(0))
      .withColumn("__island", sum(col("__new")).over(w))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("p")).cast("long").as("span_start"),
        max(col("e")).cast("long").as("span_end"))
      .withColumn("mask_id",
        (row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("span_start"))) - 1).cast("long"))
      .select(col("doc_id"), col("mask_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_masked"))
  }
}
