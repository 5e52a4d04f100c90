package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Portable distinct sketches: merge algebra (the 100 TB property —
  * shard sketches union by re-max / re-min-k, never re-scan), accuracy
  * within the theoretical band on real data, and the exact-mode
  * degeneracies.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL: sketch of a union == max-merge of the shards' sketches") {
    val a = (1L to 4000L).toDF("v")
    val b = (3000L to 7000L).toDF("v")
    val whole = Hll.registers(a.unionByName(b), col("v"), p = 9)
      .orderBy("reg").as[(Int, Int)].collect().toSeq
    val merged = Hll.registers(a, col("v"), p = 9)
      .unionByName(Hll.registers(b, col("v"), p = 9))
      .groupBy(col("reg")).agg(max(col("rank")).as("rank"))
      .orderBy("reg").as[(Int, Int)].collect().toSeq
    assert(whole === merged)
  }

  test("HLL estimate lands inside the ~3/sqrt(m) band on 10k distinct values") {
    val df = (1L to 10000L).toDF("v")
    val est = Hll.distinctEstimate(df, col("v"), p = 9)
      .select(col("est").cast("long")).head().getLong(0)
    // 1.04/sqrt(512) ≈ 4.6% std; 3σ ≈ 14%
    assert(math.abs(est - 10000L) < 1400, s"HLL est $est too far from 10000")
  }

  test("HLL registers never exceed 2^p rows and ranks stay in [1, 52]") {
    val regs = Hll.registers((1L to 5000L).toDF("v"), col("v"), p = 9)
      .as[(Int, Int)].collect()
    assert(regs.length <= 512)
    assert(regs.forall { case (r, k) => r >= 0 && r < 512 && k >= 1 && k <= 52 })
  }

  test("KMV: sketch of a union == min-k merge of the shards' sketches") {
    val a = (1L to 4000L).toDF("v")
    val b = (3000L to 7000L).toDF("v")
    val whole = Kmv.sketch(a.unionByName(b), col("v"), k = 128)
      .as[Long].collect().toSeq
    val merged = Kmv.sketch(a, col("v"), k = 128)
      .unionByName(Kmv.sketch(b, col("v"), k = 128))
      .distinct().orderBy(col("h")).limit(128)
      .as[Long].collect().toSeq
    assert(whole === merged)
  }

  test("KMV estimate lands inside the band; sub-k inputs return the exact count") {
    val est = Kmv.distinctEstimate((1L to 10000L).toDF("v"), col("v"), k = 1024)
      .select(col("est").cast("long")).head().getLong(0)
    // 1/sqrt(k−1) ≈ 3.1% std; 3σ ≈ 9.4%
    assert(math.abs(est - 10000L) < 940, s"KMV est $est too far from 10000")
    val small = Kmv.distinctEstimate((1L to 50L).toDF("v"), col("v"), k = 1024)
      .select(col("n_min"), col("est").cast("long")).head()
    assert(small.getLong(0) == 50L && small.getLong(1) == 50L,
      "below k distinct values the sketch must return the exact count")
  }

  test("KMV overlap: identical sets give jaccard 10000, disjoint sets 0") {
    val a = (1L to 3000L).toDF("v")
    val same = Kmv.overlap(Kmv.sketch(a, col("v"), 256),
      Kmv.sketch(a, col("v"), 256), k = 256).head()
    assert(same.getAs[Long]("jaccard_bp") == 10000L)
    assert(same.getAs[Long]("c") == 256L)
    val b = (100001L to 103000L).toDF("v")
    val disj = Kmv.overlap(Kmv.sketch(a, col("v"), 256),
      Kmv.sketch(b, col("v"), 256), k = 256).head()
    assert(disj.getAs[Long]("jaccard_bp") == 0L)
  }

  test("KMV overlap intersection estimate tracks the true overlap") {
    // |A|=6000, |B|=6000, |A∩B|=2000, |A∪B|=10000 → J = 0.2
    val a = (1L to 6000L).toDF("v")
    val b = (4001L to 10000L).toDF("v")
    val r = Kmv.overlap(Kmv.sketch(a, col("v"), 512),
      Kmv.sketch(b, col("v"), 512), k = 512).head()
    val j = r.getAs[Long]("jaccard_bp")
    assert(math.abs(j - 2000L) < 600, s"sketch jaccard $j too far from 2000 bp")
    val inter = r.getAs[Long]("est_inter")
    assert(math.abs(inter - 2000L) < 700, s"est_inter $inter too far from 2000")
  }

  test("KMV sketch plans as TakeOrdered, never a global sort") {
    val p = Kmv.sketch((1L to 5000L).toDF("v"), col("v"), k = 256)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$p")
  }
}
