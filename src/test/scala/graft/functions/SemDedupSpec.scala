package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("drops within-cluster near-dups; cluster boundary misses are by design") {
    // centroids = vectors of the 2 lowest ids: (1,0) and (0,1).
    // 3 ≈ 1 (same cluster → drops), 4 ≈ 2 (same cluster → drops),
    // 5 ≈ 6 but they straddle the boundary (5→cluster 1, 6→cluster 2):
    // SemDeDup's documented approximation keeps BOTH.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.999f, 0.01f)),
      (4L, Array(0.01f, 0.999f)),
      (5L, Array(0.709f, 0.705f)),
      (6L, Array(0.705f, 0.709f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedup(vecs, "vec_id", "embedding",
      nClusters = 2, threshold = 0.95)
    val kept = got.select("vec_id").as[Long].collect().sorted
    assert(kept === Array(1L, 2L, 5L, 6L))
    val clusters = got.as[(Long, Long)].collect().toMap
    assert(clusters(5L) === 1L && clusters(6L) === 2L)
  }

  test("survivor set satisfies the SemDeDup invariant on the real fixture") {
    val emb = graft.sources.Tables.load(spark, SfDir, "embeddings")
    val kept = Similarity.semDedup(emb, "vec_id", "embedding",
        nClusters = 8, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    // recompute assignment + exact cosine driver-side (fixture is tiny)
    val rows = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val cents = rows.take(8)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    // the SAME expanded form (|v|² − 2⟨v,c⟩ + |c|², sequential fold) the
    // Spark side evaluates — a (x−y)² recompute can flip near-ties
    def d2(v: Array[Double], c: Array[Double]) =
      dot(v, v) - 2 * dot(v, c) + dot(c, c)
    val cluster = rows.map { case (id, v) =>
      id -> cents.minBy { case (cid, cv) => (d2(v, cv), cid) }._1
    }.toMap
    def cos(a: Array[Double], b: Array[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val byId = rows.toMap
    val expectedDropped = (for {
      (idB, vb) <- rows
      (idA, va) <- rows if idA < idB && cluster(idA) == cluster(idB)
      if cos(va, vb) >= 0.95
    } yield idB).toSet
    assert(kept === rows.map(_._1).toSet -- expectedDropped)
    assert(byId.keySet.nonEmpty && kept.nonEmpty)
  }

  test("default cluster count derives ceil(sqrt n) — same result as the explicit value") {
    // 500-vector fixture: ceil(sqrt 500) = 23; a caller who keeps the
    // default at a billion vectors gets ~sqrt n clusters (capped), so
    // the per-cluster quadratic cosine block stays bounded — the
    // autoCentroids rule applied to SemDeDup
    val emb = graft.sources.Tables.load(spark, SfDir, "embeddings")
    val derived = Similarity.semDedup(emb, "vec_id", "embedding")
      .select("vec_id").as[Long].collect().toSet
    val explicit23 = Similarity.semDedup(emb, "vec_id", "embedding",
        nClusters = 23)
      .select("vec_id").as[Long].collect().toSet
    assert(derived === explicit23)
  }
}
