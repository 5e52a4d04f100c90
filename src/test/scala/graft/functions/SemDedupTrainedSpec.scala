package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Similarity.semDedupTrained]] — the published SemDeDup recipe's
  * trained k-means clusters, vs the gate form's fixed lowest-id
  * centroids: same within-cluster dedup semantics (shared code), so
  * the only degree of freedom is cluster GEOMETRY. The contract pinned
  * here: trained clusters must recover at least as many planted
  * near-dup drops as the fixed form at the same k, the survivor set
  * must be deterministic across runs, and sampling the training set
  * must not change the planted-drop recovery.
  */
class SemDedupTrainedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.sources.Tables.load(spark, SfDir, "embeddings")

  /** Corpus ∪ deterministically perturbed copies (cos ≈ 0.997 with
    * their sources — the duplicate class SemDeDup exists for). The
    * copy's id is source + 100000, always the LARGER id, so a
    * recovered duplicate shows up as a dropped twin.
    */
  private lazy val planted: DataFrame = {
    val base = emb.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val shifted = base.select(($"vec_id" + 100000L).as("vec_id"),
      expr("transform(embedding, (x, i) -> x * (1.0d + 0.08d * (double(i % 7) - 3.0d) / 3.0d))")
        .as("embedding"))
    base.unionByName(shifted)
  }

  private def droppedTwins(survivors: DataFrame): Long = {
    val total = planted.count() / 2
    total - survivors.filter($"vec_id" >= 100000L).count()
  }

  test("trained clusters recover at least the fixed-centroid form's planted drops") {
    val fixed = droppedTwins(
      Similarity.semDedup(planted, "vec_id", "embedding", nClusters = 16))
    val trained = droppedTwins(
      Similarity.semDedupTrained(planted, "vec_id", "embedding", nClusters = 16))
    info(s"planted twins dropped: fixed-centroid $fixed, trained $trained (of 500)")
    assert(trained >= fixed,
      s"trained clusters recovered fewer planted dups ($trained < $fixed)")
    // and a floor in absolute terms: a twin at cos 0.997 is only missed
    // when the pair straddles a cluster boundary
    assert(trained >= 400, s"trained-cluster planted-drop recovery fell to $trained/500")
  }

  test("survivor set is deterministic across runs") {
    def run() = Similarity.semDedupTrained(planted, "vec_id", "embedding",
      nClusters = 16).select($"vec_id").as[Long].collect().toSet
    assert(run() == run())
  }

  test("sample-trained clusters (forced) keep the planted-drop recovery") {
    // 10% forced sample at the 1000-vector planted corpus — the path
    // every corpus past MaxTrainRows takes by default
    val sampled = droppedTwins(Similarity.semDedupTrained(planted, "vec_id",
      "embedding", nClusters = 16, maxTrainRows = 100L))
    info(s"planted twins dropped with forced 10% training sample: $sampled/500")
    assert(sampled >= 400,
      s"sample-trained planted-drop recovery fell to $sampled/500")
  }

  test("the fixed-point portable twin matches the trained form's recovery class") {
    // q236 hash-gates semDedupTrainedPortable against the DuckDB
    // replay; pinned here: its integer-Lloyd geometry recovers planted
    // twins at least as well as the FIXED-centroid form (training must
    // help, in exact arithmetic too) and stays within the trained
    // family's floor
    val fixed = droppedTwins(
      Similarity.semDedup(planted, "vec_id", "embedding", nClusters = 16))
    val portable = droppedTwins(
      Similarity.semDedupTrainedPortable(planted, "vec_id", "embedding",
        nClusters = 16))
    info(s"planted twins dropped: fixed $fixed, portable-trained $portable (of 500)")
    assert(portable >= fixed,
      s"integer-trained clusters recovered fewer planted dups ($portable < $fixed)")
    assert(portable >= 400, s"portable-trained recovery fell to $portable/500")
  }

  test("derived sizing (nClusters <= 0) uses the table-cap sqrt rule") {
    // 1000 planted vectors -> ceil(sqrt) = 32 clusters; the result must
    // keep every survivor exactly once with a cluster id attached
    val out = Similarity.semDedupTrained(planted, "vec_id", "embedding")
    assert(out.columns.toSeq == Seq("vec_id", "cluster_id"))
    assert(out.select($"vec_id").distinct().count() == out.count())
  }
}
