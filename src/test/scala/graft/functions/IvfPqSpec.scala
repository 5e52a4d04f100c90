package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVFADC quality + shape pins (the AnnRecallSpec discipline for the
  * combined-quantizer path, q232): PQ codes are 12-bit sketches of
  * 64-float vectors, so ADC ranking is lossier than exact-vector IVF —
  * the floor pins that the compression stays useful, and the
  * containment test pins that IVFADC candidates come from the SAME
  * coarse probe geometry as ivfTopKPortable (both replay the identical
  * integer Lloyd), so a divergence means the residual/code leg broke.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.sources.Tables.load(spark, SfDir, "embeddings")
  private lazy val queries = emb.filter($"vec_id" <= 20)
    .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select($"query_id".cast("long"), $"neighbor_id".cast("long"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }

  private lazy val ivfpq = topSets(
    Similarity.ivfPqTopKPortable(queries, emb, k = 10, dim = 64))

  test("IVFADC recall@10 vs exact cosine stays above its pinned floor") {
    val exact = topSets(Similarity.bruteForceTopK(queries, emb, 10))
    val r = exact.map { case (q, ex) =>
      ivfpq.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    info(f"IVFADC recall@10 = $r%.4f")
    // measured 0.4333 at sf0.001 (500 vectors, 12-bit codes): the codes
    // keep ~43% of the exact neighbours while storing 0.6% of the bytes;
    // the floor catches a silent collapse (e.g. codes all-zero → ~0.06)
    assert(r >= 0.30, f"IVFADC recall@10 degraded to $r%.4f")
  }

  test("IVFADC candidates come from the coarse probe lists (same Lloyd as IVF)") {
    // nCentroids PINNED on BOTH sides (r8 ADVICE): the auto-derived
    // counts go through different caps (128 literal vs 4096 table), so
    // a fixture past 128² vectors would silently train two different
    // coarse geometries and void the containment premise — the explicit
    // pin enforces shared geometry instead of assuming it
    val ivfpq16 = topSets(
      Similarity.ivfPqTopKPortable(queries, emb, k = 10, dim = 64,
        nCentroids = 16))
    val ivf = topSets(Similarity.ivfTopKPortable(queries, emb, k = 500,
      nCentroids = 16, nProbe = 8))
    // identical integer Lloyd → identical lists; k = corpus size → ivf
    // returns EVERY candidate in the probed lists, so missing
    // containment means the residual/code leg diverged from the coarse
    // probe geometry
    ivfpq16.foreach { case (q, ns) =>
      val reach = ivf.getOrElse(q, Set.empty)
      assert(ns.subsetOf(reach),
        s"query $q: ADC results ${ns -- reach} not in probed lists")
    }
  }

  test("the MaxTrainRows default is a no-op below the bound — training is bit-identical") {
    // the gate corpora all sit under MaxTrainRows, so the sampled-
    // training default must not move a single oracle-replayed value
    def run(mtr: Long) =
      Similarity.ivfPqTopKPortable(queries, emb, k = 10, dim = 64,
          nCentroids = 16, maxTrainRows = mtr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(Similarity.MaxTrainRows) === run(0L)) // 0 = force full corpus
  }

  test("sample-trained quantizers (forced, 10x corpus) stay in the full-trained recall band") {
    // force the hash sample at the 5000-vector sf0.01 corpus with a
    // 500-row bound (10% — production-shaped: the default bound only
    // triggers past 65k vectors, where the sampled fraction is smaller
    // still and k-means quality depends on the sample's DISTRIBUTION,
    // not its count). Pinned RELATIVE to the same-geometry full-trained
    // run: sampling may move individual neighbours but must not cost a
    // recall step. (At the 500-vector fixture a forced 128-row sample
    // DOES cost one — 0.26 vs 0.43 — which is the tiny-corpus regime
    // the n <= maxTrainRows guard exists for, not the production path.)
    val emb10 = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val q10 = emb10.filter($"vec_id" <= 20)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact10 = topSets(Similarity.bruteForceTopK(q10, emb10, 10))
    def recallOf(mtr: Long): Double = {
      val sys = topSets(Similarity.ivfPqTopKPortable(q10, emb10, k = 10,
        dim = 64, maxTrainRows = mtr))
      exact10.map { case (q, ex) =>
        sys.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
      }.sum / exact10.size
    }
    val full = recallOf(0L) // force full-corpus training
    val sampled = recallOf(500L)
    info(f"IVFADC recall@10 at 10x: full-trained $full%.4f, sample-trained $sampled%.4f")
    assert(sampled >= full - 0.10,
      f"sample-trained recall $sampled%.4f fell out of the full-trained band $full%.4f")
  }

  private lazy val goldIntL2 = topSets(
    Similarity.bruteForceTopKIntL2(queries, emb, 10))

  private def recallVsGold(sys: Map[Long, Set[Long]]): Double =
    goldIntL2.map { case (q, g) =>
      sys.getOrElse(q, Set.empty).intersect(g).size.toDouble / g.size
    }.sum / goldIntL2.size

  test("IVFADC+R re-rank recall beats plain ADC (Jégou §V's point)") {
    val rerank = topSets(Similarity.ivfPqRerankTopK(queries, emb, k = 10,
      rerank = 50, dim = 64))
    val rAdc = recallVsGold(ivfpq)
    val rRr = recallVsGold(rerank)
    info(f"recall@10 vs int-L2 gold: ADC $rAdc%.4f, +rerank $rRr%.4f")
    // the 50-candidate shortlist re-scored exactly can only improve the
    // top-10 relative to ranking by lossy 12-bit codes; strict > would
    // be corpus-dependent, >= guards the wiring, the floor the quality
    assert(rRr >= rAdc, f"re-rank recall $rRr%.4f below plain ADC $rAdc%.4f")
    assert(rRr >= 0.50, f"re-rank recall degraded to $rRr%.4f")
  }

  test("brute-force int-L2 gold is exact on a hand-checked corpus") {
    val c = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(2f, 0f)),
      (3L, Array(0f, 3f))).toDF("vec_id", "embedding")
    val q = Seq((0L, Array(0f, 0f))).toDF("query_id", "query_vec")
    val got = Similarity.bruteForceTopKIntL2(q, c, k = 3)
      .orderBy($"l2_q", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq
    val s = 1L << 20 // the fixed-point scale: l2 = (d·2^20)²
    assert(got === Seq((0L, 1L, s * s), (0L, 2L, 4L * s * s),
      (0L, 3L, 9L * s * s)))
  }

  test("centroid-TABLE coarse leg is bit-identical to the literal tree (ADC)") {
    // the table path (used automatically past MaxLiteralCentroids
    // derived lists) is a PLAN change only: same exact integer argmin,
    // same lowest-cid ties — forced onto the same small geometry it
    // must reproduce the literal path's every id and distance
    def run(tables: Boolean) =
      Similarity.ivfPqTopKPortable(queries, emb, k = 10, dim = 64,
          nCentroids = 16, useTablesOpt = Some(tables))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(tables = true) === run(tables = false))
  }

  test("centroid-TABLE coarse leg is bit-identical to the literal tree (re-rank)") {
    def run(tables: Boolean) =
      Similarity.ivfPqRerankTopK(queries, emb, k = 10, rerank = 50,
          dim = 64, nCentroids = 16, useTablesOpt = Some(tables))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(tables = true) === run(tables = false))
  }

  test("ADC distances are deterministic across runs") {
    val a = Similarity.ivfPqTopKPortable(queries, emb, k = 10, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Similarity.ivfPqTopKPortable(queries, emb, k = 10, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
