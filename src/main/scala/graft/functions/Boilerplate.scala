package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal — the CCNet/RefinedWeb paragraph-
  * dedup step of a web-crawl curation pipeline: a LINE (paragraph) that
  * recurs across many distinct documents is template chrome (headers,
  * footers, cookie banners, nav bars), not content, and is stripped
  * from every document while singleton lines survive.
  *
  * Deduplication is by exact line identity via the engine-portable
  * 60-bit md5 fingerprint ([[TextFunctions.md5Fingerprint]]), so a SQL
  * oracle replays the whole pass. Differs from the duplicate-SPAN scrub
  * (Dedup.scrubDuplicateSpans — pairwise shared substrings) in unit and
  * rule: here the unit is a whole line and the threshold is corpus-wide
  * document frequency, which catches k-way template repetition that
  * pairwise span detection prices per pair.
  *
  * 100 TB shape: the line split is a pure per-row generator (zero
  * shuffle); the frequency pass shuffles only (fingerprint, doc)
  * DISTINCT pairs — 16 B rows, never text; the common-line set (doc
  * frequency ≥ minDocs) is a tiny fraction of the line population and
  * joins back by fingerprint equi-join. Nothing is all-pairs, nothing
  * sorts the corpus globally. Rebuild keeps per-doc line order via
  * `array_sort` over (line_no, line) structs — no window, no global
  * ordering assumption.
  */
object Boilerplate {

  /** Cut `textCol` into consecutive `lineTokens`-token pseudo-lines —
    * the line unit for corpora whose text carries no hard newlines (the
    * gate fixture); real crawl text would split on '\n' instead. Pure
    * per-row expression: whitespace split, then slice per line index.
    */
  def tokenLines(text: Column, lineTokens: Int): Column =
    tokenLinesFromToks(filter(split(text, "\\s+"), t => length(t) > 0),
      lineTokens)

  /** [[tokenLines]] over a PRE-STAGED whitespace-token column — the hot
    * path: `toks` appears inside the per-line lambda BODY, and an
    * inline `filter(split(text))` there re-tokenizes the whole document
    * PER LINE (interpreted higher-order eval re-computes body subtrees
    * per element — O(tokens²/lineTokens) per row; PlanAudit's
    * body-position rule caught exactly this). With a staged attribute
    * the body's slice is an O(lineTokens) read.
    */
  def tokenLinesFromToks(toks: Column, lineTokens: Int): Column = {
    val nLines = floor((size(toks) + lit(lineTokens - 1)) / lit(lineTokens)).cast("int")
    transform(
      sequence(lit(0), greatest(nLines - 1, lit(0))),
      i => array_join(slice(toks, i * lineTokens + 1, lit(lineTokens)), " "))
  }

  /** Strip every line whose corpus-wide DISTINCT-document frequency is
    * ≥ `minDocs`. Returns one row per input document:
    * (idCol, n_lines, n_kept, cleaned) — `cleaned` is the surviving
    * lines re-joined in original order ('' when everything was
    * boilerplate or the text was empty).
    */
  def commonLineScrub(df: DataFrame, idCol: String, textCol: String,
                      lineTokens: Int = 10, minDocs: Int = 3): DataFrame = {
    require(lineTokens >= 1, s"lineTokens must be >= 1, got $lineTokens")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df
      // token array staged: the line generator reads it from the lambda
      // body (size + per-line slice), so an inline tokenization would
      // re-split the document once per LINE (see tokenLinesFromToks)
      .select(col(idCol),
        filter(split(col(textCol), "\\s+"), t => length(t) > 0).as("__bl_toks"))
      .select(col(idCol),
        posexplode(tokenLinesFromToks(col("__bl_toks"), lineTokens))
          .as(Seq("line_no", "line")))
      .filter(length(col("line")) > 0)
      .withColumn("__lh", TextFunctions.md5Fingerprint(col("line")))
      // three consumers (frequency pass, anti-join, per-doc counts) —
      // unmaterialized, the split+line-generate+md5 pipeline re-runs
      // each; eager checkpoint blocks release with the result (GC)
      .localCheckpoint(true)
    // doc frequency per fingerprint: only (fingerprint, doc) pairs shuffle
    val common = lines.select(col("__lh"), col(idCol)).distinct()
      .groupBy(col("__lh")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__lh"))
    val kept = lines.join(common, Seq("__lh"), "left_anti")
    val rebuilt = lines.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"))
      .join(kept.groupBy(col(idCol))
          .agg(count(lit(1)).as("n_kept"),
            array_join(
              transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
                s => s.getField("line")), " ").as("cleaned")),
        Seq(idCol), "left")
    // docs whose text produced no lines at all (empty/whitespace) keep a row
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }
}
