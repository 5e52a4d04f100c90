package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling & curation for training-data pipelines.
  *
  * Everything is CONTENT-hash driven, never RNG: a sample must be stable
  * across reruns, partitionings, cluster sizes, and engines (the same
  * md5-prefix arithmetic as [[TextFunctions.hashSplit]]), or downstream
  * training runs aren't reproducible and holdout contamination can't be
  * audited. All operators are per-row projections + one partitioned
  * window at most — no global sorts, no driver state; shapes hold at
  * 100 TB.
  */
object Sampling {

  /** Stable 0..9999 bucket from content (basis points → 0.01% rate
    * granularity). Engine-portable: any SQL dialect reproduces it.
    */
  def hashBucketBp(key: Column): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long") % 10000

  /** Deterministic Bernoulli sample at `rateBp` basis points (5000 =
    * 50%). Same content → same verdict, everywhere, forever.
    */
  def hashSample(df: DataFrame, key: Column, rateBp: Int): DataFrame =
    df.filter(hashBucketBp(key) < rateBp)

  /** Source-reputation flag (FineWeb-style domain filtering): a row's
    * `src_keep` is true iff its source's MEAN `score` strictly beats the
    * corpus mean. The comparison is cross-multiplied
    * (sum_s·n_total > sum_total·n_s, decimal-widened) so no division
    * happens — bit-exact on any engine and overflow-safe when both sums
    * carry corpus-scale magnitudes. Shape: one shuffle for the
    * per-source aggregate, a key join back (source cardinality bounds
    * the join, AQE picks broadcast vs shuffle), a 1-row broadcast for
    * the corpus total. Adds (sum_z, n_s, src_keep).
    */
  def sourceReputationFlag(df: DataFrame, source: Column, score: Column): DataFrame = {
    val keyed = df.withColumn("__src", source).withColumn("__z", score)
    val bySrc = keyed.groupBy(col("__src").as("__srcb"))
      .agg(sum(col("__z")).as("sum_z"), count(lit(1)).as("n_s"))
    val tot = keyed.agg(sum(col("__z")).as("__sum_t"), count(lit(1)).as("__n_t"))
    keyed.join(bySrc, col("__src") <=> col("__srcb"))
      .crossJoin(broadcast(tot))
      .withColumn("src_keep",
        col("sum_z").cast("decimal(38,0)") * col("__n_t") >
          col("__sum_t").cast("decimal(38,0)") * col("n_s"))
      .drop("__src", "__srcb", "__z", "__sum_t", "__n_t")
  }

  /** Stratified deterministic sample: per-stratum rates in basis points
    * (the down-sample-the-head / up-weight-the-tail move of corpus
    * balancing), unknown strata fall back to `defaultBp`.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (s, bp)) =>
      when(stratum === s, lit(bp)).otherwise(acc)
    }
    df.filter(hashBucketBp(key) < rate)
  }

  /** Temperature-based corpus mixing at T=2: rebalance strata toward
    * p_s ∝ √n_s (the standard move that damps head domains and boosts
    * tail ones), targeting ~`budgetDocs` sampled documents overall.
    * Per-stratum keep rate in basis points:
    *
    *   bp_s = min(10000, (10000 · budget · ⌊√n_s⌋) div (n_s · Σ⌊√n_t⌋))
    *
    * — ALL integer arithmetic over exact counts (√ of an int64 is
    * correctly rounded IEEE, so ⌊√n⌋ is engine-exact), which keeps the
    * kept set hash-reproducible anywhere, like every sampler here.
    * Shape: one tiny per-stratum aggregate broadcast back onto the
    * corpus + the content-hash filter; the corpus makes one pass.
    */
  def temperatureSample(df: DataFrame, stratum: Column, key: Column,
                        budgetDocs: Long): DataFrame = {
    require(budgetDocs > 0, s"budgetDocs must be positive, got $budgetDocs")
    val w = df.groupBy(stratum.as("__s")).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    val agg = w.agg(sum(col("__w")), max(col("__w"))).head()
    // empty corpus: sum() aggregates to NULL — return the (empty) input
    // shape rather than NPE on the scalar
    if (agg.isNullAt(0)) return df.limit(0)
    val (totalW, maxW) = (agg.getLong(0), agg.getLong(1))
    // the keep-rate numerator 10000·budget·w must stay inside Int64 —
    // Spark's non-ANSI multiply wraps silently, which would corrupt keep
    // rates instead of failing. Fail loudly at the boundary.
    require(budgetDocs <= Long.MaxValue / 10000L / math.max(maxW, 1L),
      s"budgetDocs $budgetDocs overflows the integer keep-rate arithmetic " +
        s"(largest stratum weight $maxW): reduce the budget or pre-split strata")
    val rates = w.withColumn("__bp",
      least(lit(10000L), expr(s"(10000L * ${budgetDocs}L * __w) div (__n * ${totalW}L)")))
      .select(col("__s"), col("__bp"))
    df.join(broadcast(rates), stratum === col("__s"))
      .filter(hashBucketBp(key) < col("__bp"))
      .drop("__s", "__bp")
  }

  /** Deterministic training-order shuffle + sharding: route each
    * document to a shard by one 60-bit md5 slice of its content and
    * order WITHIN the shard by an independent second slice (chars 16-30
    * of the same digest — disjoint bits, so route and order are
    * uncorrelated and each shard is itself a uniformly shuffled sample).
    * Ties (duplicate content) break on `id`. Adds `shard` and 0-based
    * `pos` columns.
    *
    * This replaces the trainer-side "global shuffle" with a shape that
    * scales: NO global sort ever happens — the only wide op is one
    * window partitioned by shard, and shards are written independently.
    * Reproducible anywhere: same corpus → same shard files, same order.
    */
  def corpusShuffle(df: DataFrame, key: Column, id: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h1 = conv(substring(md5(key), 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(md5(key), 16, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h2"), col("__id"))
    df.withColumn("shard", (h1 % nShards).cast("int"))
      .withColumn("__h2", h2).withColumn("__id", id)
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("__h2", "__id")
  }

  /** Histogram-matched subsample: keep `source` rows so the kept set's
    * per-`bucket` histogram tracks `target`'s bucket COUNTS — the
    * length-matched-control-set move (evaluating a filter or building a
    * contrast corpus needs a comparison set with the same length/shape
    * distribution, or the comparison measures the length confound, not
    * the treatment). Per bucket the keep rate is min(1, n_T/n_S) in
    * content-hash basis points, so kept(b) ≈ min(n_S(b), n_T(b)); source
    * buckets absent from the target drop entirely (rate 0).
    *
    * Decision rule, exact integers only (decimal-widened cross-multiply,
    * no division — the same engine-portability discipline as
    * [[sourceReputationFlag]]): keep iff `hash_bp · n_S < 10000 · n_T`,
    * or `n_T ≥ n_S` (keep all). Below-granularity rates (n_T/n_S <
    * 1/10000) round down to empty — documented bp granularity, same as
    * every sampler here. Shape: two tiny per-bucket aggregates broadcast
    * back, one source pass; no shuffle of source rows.
    */
  def histogramMatchedSample(source: DataFrame, target: DataFrame,
                             bucket: Column, key: Column): DataFrame = {
    val nS = source.groupBy(bucket.as("__b")).agg(count(lit(1)).as("__ns"))
    val nT = target.groupBy(bucket.as("__b")).agg(count(lit(1)).as("__nt"))
    val counts = nS.join(nT, Seq("__b")) // inner: target-absent buckets drop
    source.join(broadcast(counts), bucket <=> col("__b"))
      .filter(col("__nt") >= col("__ns") ||
        hashBucketBp(key).cast("decimal(38,0)") * col("__ns") <
          lit(10000).cast("decimal(38,0)") * col("__nt"))
      .drop("__b", "__ns", "__nt")
  }

  /** Epoch-based domain upsampling: replicate each document
    * `epochsCenti(stratum)/100` times — the "repeat the high-quality
    * domain 2.5×" mixture move (fractional epochs are standard in
    * published LLM data recipes). A row emits `floor(centi/100)` full
    * copies plus one extra copy iff its content hash (salted with
    * "#epoch" so the decision is uncorrelated with [[hashSample]]'s)
    * lands under the fractional remainder; `centi < 100` therefore
    * degenerates to a plain deterministic downsample. Adds an `epoch`
    * column (0-based copy index) so downstream shuffles/packing can keep
    * copies distinct. Exact integer arithmetic end to end — the emitted
    * multiset is engine- and partitioning-reproducible.
    *
    * The generator is `explode(sequence(0, n_copies−1))` — per-row
    * bounded by `epochsCenti`'s cap (`require`d ≤ 100 epochs: an
    * upsample beyond that is a config bug amplifying one domain 100×,
    * and the cap keeps the per-row array allocation trivially small).
    */
  def epochUpsample(df: DataFrame, stratum: Column, key: Column,
                    epochsCenti: Map[String, Int],
                    defaultCenti: Int): DataFrame = {
    (defaultCenti +: epochsCenti.values.toSeq).foreach { c =>
      require(c >= 0 && c <= 10000,
        s"epochs are centi-epochs in [0, 10000] (= 0..100 epochs), got $c")
    }
    val centi = epochsCenti.foldLeft(lit(defaultCenti)) {
      case (acc, (s, c)) => when(stratum === s, lit(c)).otherwise(acc)
    }
    val extra = when(
      hashBucketBp(concat(key, lit("#epoch"))) < (centi % 100) * 100,
      lit(1L)).otherwise(lit(0L))
    // (x − x%100)/100 divides a multiple of 100: exact even through
    // Spark's double-typed `/`
    val nCopies = ((centi - centi % 100) / 100).cast("long") + extra
    df.withColumn("__nc", nCopies)
      .filter(col("__nc") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__nc") - 1L)))
      .drop("__nc")
  }

  /** Token-budget curation: per stratum, greedily keep the largest
    * documents (ties → lowest id) until the cumulative token count
    * exceeds `budget`. One partitioned-window pass; integer arithmetic
    * only, so the kept set is engine-exact.
    */
  def tokenBudget(df: DataFrame, stratum: Column, tokens: Column, id: Column,
                  budget: Long): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(tokens.desc, id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tokens.cast("long")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Stable 52-bit content rank for [[capPerGroup]]: the md5 prefix
    * truncated to 13 hex chars so the value is EXACTLY representable as
    * a double (the top-k aggregator scores in doubles; 60-bit prefixes
    * would round and could disagree with an integer-arithmetic oracle).
    */
  def hashRank52(key: Column): Column =
    conv(substring(md5(key), 1, 13), 16, 10).cast("long")

  /** Deterministic per-group cap — crawl-budget enforcement (keep at
    * most `k` docs per domain) and exact-k reservoir sampling (rank by
    * [[hashRank52]] for an unbiased stable draw) are the same operator:
    * keep the k rows with the LOWEST `rank` per group, ties → lowest id.
    *
    * Returns the kept (group, id) pairs; callers semi-join back for the
    * surviving rows. Shape: [[TopKByScore]] partial aggregation trims
    * every map partition to k before the exchange — O(k·groups)
    * shuffled, never a window sort over the corpus (the row_number
    * formulation sorts |corpus| rows; this shuffles |groups|·k).
    */
  def capPerGroup(df: DataFrame, group: Column, id: Column, rank: Column,
                  k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKByScore(k).toColumn
    df.select(group.cast("string").as("__g"), id.cast("long").as("__id"),
        rank.cast("double").as("__r"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      // TopKByScore keeps HIGHEST score (ties → lowest id); negate so the
      // lowest rank wins with the same tie rule
      .mapValues(r => (r._2, -r._3))
      .agg(agg)
      .flatMap { case (g, top) => top.map(t => (g, t._1)) }
      .toDF("group", "id")
  }

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007) with the
    * deterministic integer quantization this module's hash discipline
    * requires: priority `q_i = w_i / u_i` becomes the exact BIGINT
    * `w_i · 10^12 div (rank52_i + 1)` (so `u_i ≈ (rank52+1)/2^52`, a
    * content-derived uniform), keep the k highest priorities, and emit
    * each survivor's τ-capped unbiased weight estimate
    * `max(w_i, τ)` where τ is the (k+1)-th priority — all in the same
    * 10^12-scaled weight units, every division exact.
    *
    * Subset sums of `w_est_sc` estimate the population weight total
    * with variance ≤ one extra sample (the DLT optimality bound); the
    * deterministic u_i trades the i.i.d. guarantee for reproducibility,
    * the standing trade of this module.
    *
    * Magnitude: w · 10^12 must stay double-exact through the top-k
    * aggregator → w ≤ 9007 required loudly. Shape: per-row priority
    * projection + ONE bounded TopKByScore pass (O(k) shuffled per
    * partition); the τ computation reuses the same top-(k+1) rows.
    */
  def prioritySample(df: DataFrame, id: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKByScore(k + 1).toColumn
    val scored = df.select(id.cast("long").as("__id"),
        weight.cast("long").as("__w"),
        hashRank52(id.cast("string")).as("__r"))
      .withColumn("__w", when(col("__w") <= 9007L && col("__w") >= 0L, col("__w"))
        .otherwise(raise_error(format_string(
          "prioritySample: weight %d outside [0, 9007] — priorities would " +
            "lose integer exactness in the double-scored aggregator", col("__w")))
          .cast("long")))
      .withColumn("__p", expr("__w * 1000000000000L div (__r + 1)"))
    val top = scored.select(lit(1).as("__g"), col("__id"), col("__w"), col("__p"))
      .as[(Int, Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._4.toDouble))
      .agg(agg)
      .flatMap { case (_, t) => t.map(x => (x._1, x._2.toLong)) }
      .toDF("id", "p_sc")
    // τ = the (k+1)-th priority (0 when the population has ≤ k rows);
    // tiny (k+1)-row set: the window is over O(k), not the corpus
    val w = Window.orderBy(col("p_sc").desc, col("id").asc)
    val ranked = top.withColumn("__rk", row_number().over(w))
    val tau = ranked.agg(coalesce(
      max(when(col("__rk") === k + 1, col("p_sc"))), lit(0L)).as("__tau"))
    ranked.filter(col("__rk") <= k)
      .join(scored.select(col("__id").as("id"), col("__w")), "id")
      .crossJoin(broadcast(tau))
      .select(col("id"), col("__w").as("weight"), col("p_sc"),
        greatest(col("__w") * lit(1000000000000L), col("__tau")).as("w_est_sc"))
  }
}
