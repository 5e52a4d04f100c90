package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval with Reciprocal Rank Fusion (Cormack, Clarke &
  * Buettcher, SIGIR 2009): fuse a lexical ranking and a dense (embedding
  * cosine) ranking of the same candidate pool into one list via
  * `score(d) = Σ_lists 1/(k0 + rank_list(d))`.
  *
  * The fusion arithmetic is EXACT: with k0 = 60 and per-list depth ≤ 10,
  * every reciprocal 1/(60+r) is represented as `RrfScale div (60+r)`
  * where `RrfScale = lcm(61..70)` — all the divisions are exact integer
  * divisions, so the fused scores (and therefore the fused ranking,
  * ties → lowest id) replay bit for bit on any engine. No floats
  * anywhere in the fusion step.
  *
  * 100 TB shape: the query side is a literal id set (broadcast); the
  * lexical pass filters the posting stream to query terms BEFORE any
  * shuffle (only query-term postings move, the q132/q137 discipline) and
  * the dense pass is the q27 broadcast-query corpus scan; BOTH sides
  * reduce to per-query top-k through the bounded [[TopKByScore]]
  * partial aggregation — O(k·queries) rows reach the rank/fusion step,
  * which then runs windows over that tiny set only, never the corpus.
  * At larger query sets swap the dense leg for [[Similarity.annTopK]];
  * the fusion step is unchanged.
  */
object Fusion {

  /** lcm(61..70): the exact common denominator for 1/(k0+r), k0=60, r ≤ 10. */
  val RrfScale: Long = 142813628717760L

  /** Max per-list depth for which [[RrfScale]] divisions are exact. */
  val MaxDepth: Int = 10

  /** Lexical query-by-document ranking: score(q, c) = Σ over shared
    * distinct terms t of `tf_c(t) · idf_sc(t)` with q117's linear
    * integer idf `(10000 · N) div df(t)`. Returns per-query top-k
    * (query_id, cand_id, lex_sc) with ties → lowest cand id.
    */
  def lexicalTopK(docs: DataFrame, idCol: String, textCol: String,
                  queryIds: Seq[Long], k: Int): DataFrame = {
    require(queryIds.nonEmpty, "lexicalTopK needs at least one query id")
    val post = Retrieval.postings(docs, col(idCol), col(textCol))
    // distinct query terms, carried with their query id (query tf is
    // deliberately ignored: binary term presence, classic QBD form)
    val qterms = post.filter(col("id").isin(queryIds: _*))
      .select(col("term"), col("id").as("query_id")).distinct()
    // df over query terms only: term-filter BEFORE the count shuffle
    val dfc = post.join(broadcast(qterms.select("term").distinct()),
        Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val tot = docs.agg(count(lit(1)).as("n_docs"))
    val scored = post.join(broadcast(qterms), "term")
      .filter(col("id") =!= col("query_id"))
      .join(broadcast(dfc), "term")
      .crossJoin(broadcast(tot))
      .withColumn("w_sc", expr("tf * (10000 * n_docs div df_docs)"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("w_sc")).as("lex_sc"))
    // bounded top-k: lex_sc < 2^53 (tf·idf sums), double-exact in the
    // aggregator; ties → lowest id match the oracle's row_number rule
    val spark = docs.sparkSession
    import spark.implicits._
    val agg = new TopKByScore(k).toColumn
    scored.select(col("query_id").cast("long"), col("id").cast("long"),
        col("lex_sc").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg)
      .flatMap { case (q, top) => top.map(t => (q, t._1, t._2.toLong)) }
      .toDF("query_id", "cand_id", "lex_sc")
  }

  /** RRF-fuse two per-query candidate lists. Inputs carry
    * (query_id, cand_id, score); ranks are assigned here over the
    * ALREADY-bounded lists ((score desc, cand_id asc) — the tie rule
    * both top-k producers use), so the windows run on O(k·queries)
    * rows. Output: (query_id, cand_id, lex_rank, dense_rank, rrf_sc)
    * — fused top-`depth`, ranks null when a side didn't surface the
    * candidate.
    */
  def rrfFuse(lex: DataFrame, dense: DataFrame, depth: Int = MaxDepth,
              k0: Int = 60): DataFrame = {
    require(depth >= 1 && depth <= MaxDepth,
      s"depth must be in [1, $MaxDepth] for exact arithmetic, got $depth")
    require(k0 == 60, s"RrfScale is lcm(61..70): k0 must be 60, got $k0")
    def ranked(df: DataFrame, rank: String): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("cand_id").asc)
      df.withColumn(rank, row_number().over(w).cast("long"))
        .filter(col(rank) <= depth)
        .select(col("query_id"), col("cand_id"), col(rank))
    }
    val l = ranked(lex, "lex_rank")
    val d = ranked(dense, "dense_rank")
    val fused = l.join(d, Seq("query_id", "cand_id"), "full_outer")
      .withColumn("rrf_sc",
        coalesce(expr(s"${RrfScale}L div (${k0}L + lex_rank)"), lit(0L)) +
          coalesce(expr(s"${RrfScale}L div (${k0}L + dense_rank)"), lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_sc").desc, col("cand_id").asc)
    fused.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= depth)
      .select(col("query_id"), col("cand_id"), col("lex_rank"),
        col("dense_rank"), col("rrf_sc"))
  }

  /** End-to-end hybrid search over aligned (documents, embeddings)
    * tables: lexical QBD ranking fused with exact cosine ranking for
    * the given query doc ids.
    */
  def hybridTopK(docs: DataFrame, emb: DataFrame, queryIds: Seq[Long],
                 k: Int = MaxDepth): DataFrame = {
    val lex = lexicalTopK(docs, "doc_id", "text", queryIds, k)
      .select(col("query_id"), col("cand_id"), col("lex_sc").cast("double").as("score"))
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val dense = Similarity.bruteForceTopK(queries, emb, k)
      .select(col("query_id"), col("neighbor_id").as("cand_id"),
        col("cos").as("score"))
    rrfFuse(lex, dense, depth = k)
  }
}
