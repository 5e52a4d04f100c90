package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration weighted PageRank over an edge list — the link-graph
  * reputation signal web-corpus curation pipelines rank hosts by before
  * deciding what to crawl, keep, or upsample (the Common-Crawl-era
  * descendant of Page et al., "The PageRank Citation Ranking", 1999).
  * The reference engine has no graph ranking; this is a beyond-§2
  * LLM-pipeline operator alongside dedup clustering (q76).
  *
  * EXACT-INTEGER formulation: ranks live in fixed-point parts-per-SCALE
  * longs, every division is integer `div` on non-negative operands, and
  * every per-node inflow is a SUM of longs (order-independent), so the
  * result is bit-identical on any engine, any partitioning, any run —
  * the same portability discipline as the simhash/TF-IDF integer paths.
  * With SCALE = 1e9 and edge weights ≤ 1e9, the contribution product
  * r_u·w_e ≤ 1e18 stays inside a long (checked, fails loudly).
  *
  * Per iteration:  r'(v) = (15·base) div 100  +  (85·Σ_{(u,v,w)∈E}
  * (r(u)·w) div W_out(u)) div 100,   base = SCALE div N.
  * Dangling mass (nodes with no out-edges) is dropped, not
  * redistributed — the standard simplification when ranking hosts for
  * curation, where relative order is what's consumed; total mass decays
  * accordingly and comparisons stay exact.
  *
  * 100 TB shape: the rank table is one row per node and the iteration
  * is K bounded rounds of (edge ⋈ rank on src) + groupBy(dst) — the
  * Pregel message-passing shape as two shuffles per round on the EDGE
  * relation's keys. Edges and out-degrees are pre-aggregated once and
  * persisted so each round re-reads a materialized skinny (src, dst, w,
  * outw) set rather than re-running the upstream joins. Rank lineage is
  * truncated every `checkpointEvery` rounds (not every round): each
  * eager `localCheckpoint` is a full job, and for the common small-K
  * call the per-round jobs COST more than the shallow 2K-operator plan
  * they avoid (measured 16.7 s → 2 s on the q130 fixture); deep
  * iterations still get O(checkpointEvery) plan depth, the same
  * optimizer-vs-data discipline as ConnectedComponents. On a real
  * cluster, pre-partitioning edges by src lets every round reuse one
  * side of the shuffle.
  */
object PageRank {

  /** Ranks after exactly `iters` rounds: (node, rank) with rank in
    * parts-per-`scale`. `edges` rows are (src, dst, weight ≥ 0);
    * parallel edges are summed. Self-loops are legal (a host linking to
    * itself keeps its own mass — the closed-form oracle replays them
    * identically). Null endpoints/weights are dropped.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
          iters: Int = 5, scale: Long = 1000000000L,
          checkpointEvery: Int = 10): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(scale > 0, s"scale must be positive, got $scale")
    require(checkpointEvery > 0, s"checkpointEvery must be positive")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("w").isNotNull && col("w") > 0)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val out = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    // skinny materialized iteration input: (src, dst, w, outw); nodes
    // derive from it so the upstream edge build runs exactly ONCE
    val ew = e.join(out, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = ew.select(col("src").as("node"))
      .union(ew.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // N and the max-weight overflow check are the only driver-side
    // values — two O(1) scalar reads off the persisted inputs
    val n = nodes.count()
    if (n == 0) {
      val empty = nodes.withColumn("rank", lit(0L)).localCheckpoint(true)
      ew.unpersist(); nodes.unpersist()
      return empty
    }
    val maxW = ew.agg(max(col("w"))).head().getLong(0)
    require(maxW <= Long.MaxValue / scale,
      s"edge weight $maxW would overflow rank·weight at scale $scale")
    val base = scale / n
    val teleport = 15L * base / 100L
    var ranks = nodes.withColumn("rank", lit(base))
    var sinceCkpt = 0
    for (_ <- 1 to iters) {
      // `div` is INTEGER division end to end — `/` on longs is double
      // division in both Spark and DuckDB, and a 2^53-crossing product
      // would silently lose exactness right where scale matters
      val inflow = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst"), expr("rank * w div outw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"85 * coalesce(inflow, 0L) div 100"))
            .cast("long").as("rank"))
      sinceCkpt += 1
      if (sinceCkpt >= checkpointEvery) { ranks = ranks.localCheckpoint(true); sinceCkpt = 0 }
    }
    // one eager materialization truncates whatever lineage remains and
    // releases the cached inputs
    val result = ranks.localCheckpoint(true)
    ew.unpersist(); nodes.unpersist()
    result
  }
}
