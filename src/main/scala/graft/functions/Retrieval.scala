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
}
