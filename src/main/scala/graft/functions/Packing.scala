package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: place documents into fixed-size training contexts.
  *
  * Two standard shapes, both deterministic and engine-exact (integer
  * arithmetic over a content-hash shard assignment — same md5-prefix
  * basis as [[Sampling.hashBucketBp]], so any engine re-derives the
  * layout bit-for-bit):
  *
  *  - **Concat-then-chunk** ([[packChunked]]): the GPT-style pretraining
  *    layout — each shard's documents form one token stream in id order,
  *    cut into `contextLen` windows; documents may straddle a boundary.
  *    Pure projection + one partitioned window cumsum.
  *  - **First-fit, no split** ([[packFirstFit]]): each document lands
  *    whole in a bin; a bin closes when the next document would overflow
  *    `budget`. The greedy fill is inherently sequential, so it runs
  *    per shard: shards are independent, the scan inside a shard is a
  *    single sorted pass.
  *
  * Scale shape: ONE shuffle on the shard key for either form. Shard
  * count bounds both the window-sort size and the sequential-scan
  * length — at 100 TB you raise `nShards` (10⁵–10⁶), keeping per-task
  * work flat; no global sort, no driver state. The fat `text` column
  * never enters the shuffle — packing consumes only (id, token count),
  * and the plan joins placements back to content afterwards if needed.
  */
object Packing {

  /** Deterministic shard from the id — content-hash, not `pmod(id)`, so
    * adjacent ids spread and a re-numbered corpus reshuffles nothing
    * else. Engine-portable md5-prefix arithmetic.
    */
  def shardOf(id: Column, nShards: Int): Column =
    Sampling.hashBucketBp(id.cast("string")) % nShards

  /** Concat-then-chunk placement. Emits one row per document:
    * `shard`, `tok_offset` (start position in the shard's token stream),
    * `start_bin`/`end_bin` (the `contextLen` windows the document
    * touches — equal unless it straddles), `n_bins`.
    */
  def packChunked(df: DataFrame, id: Column, tokens: Column,
                  contextLen: Long, nShards: Int): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive, got $contextLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(id.cast("long").as("doc_id"), tokens.cast("long").as("n_tok"))
      .withColumn("shard", shardOf(col("doc_id"), nShards))
      .withColumn("tok_offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      // zero-token documents occupy no stream space: pin them to the bin
      // at their offset (greatest(n_tok,1) makes the end-bin arithmetic
      // degenerate to start_bin instead of offset-1 underflow). Integer
      // `div`, not floor(/): double division loses exactness past 2^53,
      // reachable by a shard stream's cumulative token count at scale.
      .withColumn("start_bin", expr(s"tok_offset div ${contextLen}L"))
      .withColumn("end_bin",
        expr(s"(tok_offset + greatest(n_tok, 1L) - 1L) div ${contextLen}L"))
      .withColumn("n_bins", col("end_bin") - col("start_bin") + 1)
  }

  /** Overlapping chunk spans: split each document's token stream into
    * windows of `size` tokens advancing by `size - overlap` — the
    * RAG/long-context preparation step. One generator expression per
    * row (`sequence` + `explode`), no shuffle at all: chunk geometry is
    * a pure function of the document's own token count.
    *
    * Span contract: chunk `i` covers `[i*stride, min(i*stride+size,
    * n_tok))`; every document emits at least one chunk (empty docs get
    * the degenerate `[0, 0)`), the last chunk is the only one shorter
    * than `size`, and consecutive chunks share exactly `overlap` tokens
    * until the tail.
    */
  def chunkSpans(df: DataFrame, id: Column, tokens: Column,
                 size: Int, overlap: Int,
                 maxChunksPerDoc: Long = 1L << 20): DataFrame = {
    require(size > 0, s"size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    require(maxChunksPerDoc > 0,
      s"maxChunksPerDoc must be positive, got $maxChunksPerDoc")
    val stride = size - overlap
    // `sequence` materializes the whole chunk-index array in ONE row
    // before exploding, so a pathological (n_tok huge, stride tiny)
    // document is an executor-OOM vector — fail loudly at the cap
    // instead (the RangeJoin explode-cap pattern). 2^20 chunks ≈ an 8 MB
    // transient array per row, safely inside any sane executor.
    val nc = lit(1L) + greatest(lit(0L),
      expr(s"(n_tok - ${size}L + ${stride}L - 1L) div ${stride}L"))
    df.select(id.cast("long").as("doc_id"), tokens.cast("long").as("n_tok"))
      .withColumn("__n_chunks",
        when(nc <= maxChunksPerDoc, nc)
          .otherwise(raise_error(format_string(
            s"chunkSpans: document %d yields %d chunks at size=$size " +
              s"overlap=$overlap (cap $maxChunksPerDoc) — raise the " +
              "stride or maxChunksPerDoc",
            col("doc_id"), nc)).cast("long")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("__n_chunks") - 1)))
      .select(col("doc_id"), col("n_tok"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(col("chunk_idx") * stride + size, col("n_tok")).as("tok_end"))
  }

  /** Content-defined chunking: split each document's whitespace-token
    * stream at positions where the fingerprint of the `window` tokens
    * immediately before the cut is ≡ 0 (mod `divisor`) — the
    * Rabin/FastCDC boundary rule (Xia et al., FAST'16) reduced to its
    * parallel core. Because a boundary depends only on LOCAL content, an
    * insertion near the head of a document shifts only the chunks up to
    * the first surviving boundary; everything after re-aligns — the
    * property that makes chunk-grained dedup robust to edits, where
    * fixed-stride chunking ([[chunkSpans]]) would mis-align every
    * window. Expected chunk length ≈ `divisor` tokens.
    *
    * Emits one row per chunk: (`doc_id`, `chunk_idx`, `tok_start`,
    * `tok_end`, `chunk_fp`) with `[tok_start, tok_end)` 0-based token
    * spans covering the document exactly and `chunk_fp` the 60-bit
    * md5-prefix fingerprint of the chunk's tokens — the same
    * engine-portable arithmetic as [[TextFunctions.md5Fingerprint]], so
    * any SQL engine re-derives every boundary and fingerprint
    * bit-for-bit. Documents whose trimmed text is empty emit nothing.
    *
    * 100 TB shape: a pure per-row generator — tokenize, test each cut
    * position against its local window hash, explode the cut list. ZERO
    * shuffles; the per-row transient is bounded by the document's own
    * token count (the same per-doc bound every tokenizing pass here
    * has). Chunk-level dedup downstream groups on `chunk_fp` — one
    * shuffle of (fp, doc, span) tuples, never text.
    */
  def cdcChunks(df: DataFrame, id: Column, textCol: Column,
                window: Int = 4, divisor: Int = 8): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    def fp(s: Column): Column =
      conv(substring(md5(s), 1, 15), 16, 10).cast("long")
    df.filter(length(trim(textCol)) > 0)
      .select(id.cast("long").as("doc_id"),
        split(trim(textCol), "\\s+").as("__ws"))
      .withColumn("__n", size(col("__ws")))
      // cut positions: c in [window, n-1] where the fingerprint of the
      // window tokens ending just before c hits the boundary residue;
      // always cut at 0 and n so chunks tile the document exactly
      .withColumn("__cuts", concat(
        array(lit(0)),
        when(col("__n") > window,
          filter(sequence(lit(window), col("__n") - 1),
            c => fp(concat_ws(" ",
              slice(col("__ws"), c - window + 1, lit(window)))) % divisor === 0))
          .otherwise(array().cast("array<int>")),
        array(col("__n"))))
      .withColumn("chunk_idx",
        explode(sequence(lit(0), size(col("__cuts")) - 2)))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        element_at(col("__cuts"), col("chunk_idx") + 1).cast("long").as("tok_start"),
        element_at(col("__cuts"), col("chunk_idx") + 2).cast("long").as("tok_end"),
        fp(concat_ws(" ", slice(col("__ws"),
          element_at(col("__cuts"), col("chunk_idx") + 1) + 1,
          element_at(col("__cuts"), col("chunk_idx") + 2)
            - element_at(col("__cuts"), col("chunk_idx") + 1)))).as("chunk_fp"))
  }

  /** Materialize the ACTUAL packed training contexts: each shard's
    * documents form one token-ID stream in id order (the [[packChunked]]
    * layout), cut into `contextLen` windows — emitted as one row per
    * non-empty (shard, bin) with the ordered comma-joined ids. This is
    * the end state of the tokenize→encode→pack pipeline: what a trainer
    * reads.
    *
    * Shape: the per-token explode IS the output volume (every token id
    * lands in exactly one context), so there is no asymptotic slack to
    * remove — one shuffle on (shard, bin), order restored per bin by an
    * `array_sort` over (offset, id) structs, no global sort. `ids` is an
    * `array<int>` column (e.g. split of [[Bpe.encodedIdsPerDoc]]'s
    * output).
    */
  def packedTokenStreams(df: DataFrame, id: Column, idsCol: Column,
                         contextLen: Long, nShards: Int): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive, got $contextLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val base = df.select(id.cast("long").as("doc_id"),
        idsCol.cast("array<int>").as("__ids"))
      .withColumn("n_tok", size(col("__ids")).cast("long"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("shard", shardOf(col("doc_id"), nShards))
      .withColumn("tok_offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("shard"), col("tok_offset"),
        posexplode(col("__ids")).as(Seq("__pos", "__tid")))
      .withColumn("__off", col("tok_offset") + col("__pos"))
      .withColumn("bin", expr(s"__off div ${contextLen}L"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).cast("int").as("n_ids"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("__off"), col("__tid")))),
          s => s.getField("__tid"))).as("ids"))
  }

  /** First-fit whole-document packing: within a shard (id order), a
    * document joins the current bin unless it would push the fill past
    * `budget`, in which case it opens the next bin — an over-budget
    * document gets a bin of its own. Emits (`shard`, `doc_id`, `bin`).
    *
    * The sequential fill runs inside `mapPartitions` over data
    * repartitioned by shard and sorted by (shard, id): one pass, state
    * resets at each shard boundary, many shards share a task. This is
    * the (d)-tier escape hatch of the operator preference order — the
    * running fill is a loop-carried dependency no window frame
    * expresses (`sum() over` can't conditionally reset).
    */
  def packFirstFit(df: DataFrame, id: Column, tokens: Column,
                   budget: Long, nShards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), tokens.cast("long").as("n_tok"))
      .withColumn("shard", shardOf(col("doc_id"), nShards))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .select(col("shard").cast("long"), col("doc_id"), col("n_tok"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = -1L
        var fill = 0L
        var bin = 0L
        it.map { case (shard, docId, tok) =>
          if (shard != curShard) { curShard = shard; fill = tok; bin = 0L }
          else if (fill + tok > budget) { bin += 1; fill = tok }
          else fill += tok
          (shard, docId, bin)
        }
      }
      .toDF("shard", "doc_id", "bin")
  }
}
