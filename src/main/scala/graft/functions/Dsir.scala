package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR) — score a raw corpus
  * by how target-like each document's hashed n-gram feature counts are
  * (Xie et al. 2023, arXiv:2302.03169), the standard recipe for
  * selecting pretraining data that matches a trusted target domain.
  *
  * The published form scores with log-likelihood ratios of two hashed
  * bigram bag-of-words models; this implementation keeps the same
  * feature map (word bigrams hashed into `m` buckets) but replaces the
  * per-bucket log-ratio with an add-one-smoothed LINEAR likelihood
  * ratio at fixed-point integer scale:
  *
  *   r_b = (S · (tgt_b + 1) · (R + m)) div ((raw_b + 1) · (T + m))
  *   score(d) = Σ_b cnt_db · r_b
  *
  * where T/R are total target/raw feature counts. Exact-integer
  * arithmetic makes the score engine-portable (hash-gated against a
  * DuckDB oracle, q230) at the cost of ranking by the arithmetic-mean
  * ratio rather than the geometric-mean (log) one. PER BUCKET the
  * linear ratio is monotone with the published log-ratio; the
  * PER-DOCUMENT score (a cnt-weighted SUM of linear ratios vs a sum of
  * log ratios) is NOT — two documents can swap ranks across the two
  * forms, so the top-quantile cut is a deterministic, engine-portable
  * VARIANT of Xie et al.'s selection, not an equivalent reordering of
  * it (r8 ADVICE). The trade is deliberate: no transcendental
  * functions, every value hash-replayable.
  *
  * 100 TB shape: the heavy bigram stream collapses to per-(doc, bucket)
  * counts in one map-side-combined shuffle; bucket totals re-aggregate
  * those ≤ m·n_docs rows down to m rows, which broadcast back for the
  * scoring join; the per-doc score is a second keyed aggregation. The
  * (doc, bucket) relation feeds two consumers (bucket totals + scoring
  * join) and is eagerly checkpointed so neither branch recomputes the
  * tokenize/hash map (the round-7 cross-branch recompute class).
  *
  * Reference scope anchor: the reference engine has no data-selection
  * stage; this extends the curation layer the same way the dedup/ANN
  * families do (SURVEY.md §2.12).
  */
object Dsir {

  /** Portable 60-bit md5 bucket of a string column (the Dedup twin). */
  private def bucket(c: Column, m: Int): Column =
    pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"), lit(m.toLong))

  /** Per-document DSIR importance scores.
    *
    * @param docs     corpus with an id, a text, and a target-membership flag
    * @param isTarget rows where this is true define the target distribution
    *                 (they are still scored — self-selection is the
    *                 standard sanity check that targets rank high)
    * @param m        hashed feature buckets (power of two conventional)
    * @param scale    fixed-point scale S of the per-bucket ratio
    * @return (id, score) — score = Σ cnt_db · r_b, BIGINT. CONTRACT:
    *         documents with fewer than 2 tokens produce no bigrams and
    *         are ABSENT from the output (they have no feature mass to
    *         score — the q230 oracle mirrors this), so [[selectTopK]]
    *         can never select them; a caller who needs every document
    *         ranked should left-join the corpus back and treat the null
    *         score as "unscorable", distinct from a low score.
    */
  def importanceScores(docs: DataFrame, idCol: Column, textCol: Column,
                       isTarget: Column, m: Int = 256,
                       scale: Long = 1000000L): DataFrame = {
    // heavy map pass ONCE: tokens staged, bigrams exploded, bucketed,
    // then collapsed to per-(doc, bucket) counts with the target flag
    // carried (constant per doc, so min() is exact)
    val perDocBucket = docs
      .select(idCol.as("__id"), isTarget.cast("int").as("__tgt"),
        TextFunctions.tokens(textCol).as("__t"))
      .select(col("__id"), col("__tgt"),
        explode_outer(TextFunctions.ngrams(col("__t"), 2)).as("__bg"))
      .filter(col("__bg").isNotNull)
      .select(col("__id"), col("__tgt"), bucket(col("__bg"), m).as("__b"))
      .groupBy(col("__id"), col("__b"))
      .agg(count(lit(1)).as("__cnt"), min(col("__tgt")).as("__is_tgt"))
      .localCheckpoint(true) // two consumers below
    // bucket totals (m rows after the partial agg) + corpus totals
    val buckets = perDocBucket.groupBy(col("__b"))
      .agg(sum(col("__cnt")).as("__raw"),
        sum(col("__cnt") * col("__is_tgt")).as("__tgtc"))
    val totals = buckets.agg(
      sum(col("__raw")).as("__R"), sum(col("__tgtc")).as("__T"))
    val ratios = buckets.crossJoin(broadcast(totals))
      .select(col("__b"),
        expr(s"($scale * (__tgtc + 1) * (__R + $m)) div ((__raw + 1) * (__T + $m))")
          .as("__r"))
    // scoring join: ratio table is m rows — broadcast
    perDocBucket.join(broadcast(ratios), Seq("__b"))
      .groupBy(col("__id"))
      .agg(sum(col("__cnt") * col("__r")).as("score"))
      .select(col("__id").as("id"), col("score"))
  }

  /** Top-k resampling cut: the k most target-like raw documents
    * (ties broken by id for determinism). The full DSIR recipe samples
    * from the score distribution; the deterministic top-quantile cut is
    * the reproducible variant (and what the hash gate can check).
    */
  def selectTopK(scores: DataFrame, k: Int): DataFrame =
    scores.orderBy(col("score").desc, col("id").asc).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("id").asc)))
}
