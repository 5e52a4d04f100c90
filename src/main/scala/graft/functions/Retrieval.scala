package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index construction and Boolean retrieval over the corpus —
  * the index-build side of a RAG/search pipeline (posting lists with
  * document frequencies feed BM25-class rankers; the integer-idf ranking
  * itself is q117's TF-IDF path). The reference engine has no retrieval
  * surface; this is a beyond-§2 LLM-pipeline operator.
  *
  * Tokenization is the engine-portable whitespace split (`split` on a
  * single space, empties dropped) so the oracle's `string_split` replays
  * it exactly; swap in `Bpe.mergedTokensPerDoc` upstream when subword
  * postings are wanted.
  *
  * 100 TB shape: `postings` is explode + ONE shuffle on (term, id) with
  * map-side partial counts; `invertedIndex` re-shuffles the already
  * term-keyed postings once more onto term alone. Posting lists are the
  * classic skew hazard — stopword terms collect millions of ids — so
  * `invertedIndex` takes a `maxDf` cap: a list over the cap fails the
  * job LOUDLY (with the offending term in the message) instead of
  * silently shipping a row downstream operators choke on. The cap is a
  * tripwire, not armor — a term hot enough to OOM the aggregation
  * itself dies in the agg before the check runs — so the real
  * discipline at scale is upstream: drop stopwords or shard hot terms
  * as (term, bucket) before indexing. Conjunctive search never builds
  * lists at all: it filters the posting stream to the
  * (broadcast-literal) query terms BEFORE the shuffle, so only
  * query-term rows move.
  */
object Retrieval {

  /** Term→document postings: (term, id, tf), one row per distinct
    * (term, doc) pair. Case-folded, empty tokens dropped.
    */
  def postings(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("id"), explode(split(lower(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("id"))
      .agg(count(lit(1)).as("tf"))

  /** Index rows: (term, df, sum_tf, ids) with `ids` the sorted posting
    * list rendered as a comma-joined string (engine-portable, and the
    * on-wire shape a downstream index store consumes). Fails loudly if
    * any term's df exceeds `maxDf` — see scaladoc.
    */
  def invertedIndex(post: DataFrame, maxDf: Long = 1L << 22): DataFrame =
    post.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("sum_tf"),
        concat_ws(",", transform(array_sort(collect_list(col("id"))),
          x => x.cast("string"))).as("ids"))
      .select(col("term"),
        when(col("df") <= maxDf, col("df"))
          .otherwise(raise_error(format_string(
            s"invertedIndex: posting list for term '%s' has df=%d (cap " +
              s"$maxDf) — shard hot terms by (term, bucket) or drop " +
              "stopwords", col("term"), col("df"))).cast("long"))
          .as("df"),
        col("sum_tf"), col("ids"))

  /** Conjunctive (AND) Boolean retrieval: documents containing EVERY
    * query term, with the summed term frequency as a tie-break score.
    * Query terms are a literal IN-list (codegen'd, evaluated pre-shuffle).
    */
  def conjunctive(docs: DataFrame, idCol: Column, textCol: Column,
                  terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "conjunctive retrieval needs at least one term")
    val t = terms.map(_.toLowerCase).distinct
    postings(docs, idCol, textCol)
      .filter(col("term").isin(t: _*))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("tf")).as("sum_tf"))
      .filter(col("n_hit") === t.size)
      .select(col("id"), col("sum_tf"))
  }

  /** BM25-shaped ranked retrieval (disjunctive) in EXACT integer
    * arithmetic, so the oracle replays every score bit for bit. With
    * k1 = 6/5 and b = 3/4 and the average document length kept as the
    * exact rational L/N (L = corpus token count, N = doc count — never
    * a rounded avgdl), the classic
    * `idf · tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)` clears to
    * integers as `idf_sc · 22·tf·L div (10·tf·L + 3·L + 9·dl·N)`.
    * The idf is the LOG-FREE rational `((2N − 2df + 1) · idfScale) div
    * (2df + 1)` — exactly monotone in the Robertson ratio
    * (N − df + ½)/(df + ½), strictly positive for df ≤ N (where true
    * BM25 goes negative past df > N/2, Lucene-style floors apply), and
    * portable because no engine's `ln` is involved. Same trade as
    * q117's linear idf: a deterministic, cross-engine ranking function
    * of the BM25 shape, not a float-faithful BM25.
    *
    * 100 TB shape: the term filter runs BEFORE the tf shuffle, so only
    * query-term postings move; df aggregates those same rows (tiny,
    * broadcast back); (N, L) is one scalar aggregate broadcast to the
    * candidates; the dl join keys the bounded candidate set against the
    * doc-length projection on id. The final top-k is
    * TakeOrderedAndProject — per-partition heaps, never a global sort.
    * Magnitude bound: `idf_sc · 22 · tf · L` must fit a Long — at
    * idfScale 10⁴ that holds while N·L stays under ~4·10¹³·tf⁻¹; shrink
    * `idfScale` for larger corpora (documented, `require`-checked
    * driver-side against overflow-free bounds is impossible without a
    * corpus pass, so the scale is the caller's knob).
    */
  def bm25TopK(docs: DataFrame, idCol: Column, textCol: Column,
               terms: Seq[String], k: Int = 10,
               idfScale: Long = 10000L): DataFrame = {
    require(terms.nonEmpty, "bm25 retrieval needs at least one term")
    require(k > 0, s"k must be positive, got $k")
    require(idfScale > 0, s"idfScale must be positive, got $idfScale")
    val t = terms.map(_.toLowerCase).distinct
    val lens = docs.select(idCol.as("id"),
      size(filter(split(lower(textCol), " "), x => x =!= "")).cast("long")
        .as("dl"))
    val tot = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("l_tot"))
    val post = postings(docs, idCol, textCol).filter(col("term").isin(t: _*))
    val dfc = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    post.join(broadcast(dfc), "term")
      .join(lens, "id")
      .crossJoin(broadcast(tot))
      .withColumn("idf_sc",
        expr(s"(2 * n_docs - 2 * df + 1) * $idfScale div (2 * df + 1)"))
      .withColumn("contrib", expr(
        "idf_sc * 22 * tf * l_tot div (10*tf*l_tot + 3*l_tot + 9*dl*n_docs)"))
      .groupBy(col("id"), col("dl"))
      .agg(count(lit(1)).as("n_hit"), sum(col("contrib")).as("score_sc"))
      .orderBy(col("score_sc").desc, col("id").asc)
      .limit(k)
  }
}
