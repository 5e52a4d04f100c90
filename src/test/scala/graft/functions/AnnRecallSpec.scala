package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Numeric recall floor for the approximate ANN paths (VERDICT r2 item 6):
  * with deterministic seeds, recall@10 of LSH (q28's path) and IVF (q61's
  * path) against the exact brute-force answers (q27's path, oracle-checked)
  * is a FIXED number — pin it so a silent quality regression (bad
  * signature, broken probe selection) fails the build, not just slows a
  * benchmark. Measured values are recorded in SCALE.md.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.sources.Tables.load(spark, SfDir, "embeddings")
  private lazy val queries = emb.filter($"vec_id" <= 20)
    .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select($"query_id".cast("long"), $"neighbor_id".cast("long"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }

  private lazy val exact = topSets(Similarity.bruteForceTopK(queries, emb, 10))

  private def recallAt10(approx: Map[Long, Set[Long]]): Double =
    exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size

  test("LSH annTopK recall@10 against exact top-k stays above its pinned floor") {
    // measured 0.5857 (sf0.001, seeds fixed). The single-table exact-match
    // form this replaced measured 0.0095 — this spec is what caught it.
    val r = recallAt10(topSets(Similarity.annTopK(queries, emb, k = 10, dim = 64)))
    info(f"LSH recall@10 = $r%.4f")
    assert(r >= 0.50, f"LSH recall@10 degraded to $r%.4f")
  }

  test("IVF ivfTopK recall@10 against exact top-k stays above its pinned floor") {
    // measured 0.8095 (sf0.001, deterministic init/tie-breaks)
    val r = recallAt10(topSets(Similarity.ivfTopK(queries, emb, k = 10)))
    info(f"IVF recall@10 = $r%.4f")
    assert(r >= 0.70, f"IVF recall@10 degraded to $r%.4f")
  }

  test("IVF with probe-all is exactly the brute-force answer (recall 1.0)") {
    val r = recallAt10(topSets(
      Similarity.ivfTopK(queries, emb, k = 10, nCentroids = 8, nProbe = 8)))
    assert(r == 1.0, f"probe-all IVF must equal exact, got recall $r%.4f")
  }
}
