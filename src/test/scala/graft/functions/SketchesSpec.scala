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

  test("KMV overlap in the sub-k regime is EXACT (union sketch = union set)") {
    // |A|=100, |B|=100, |A∩B|=50, |A∪B|=150 < k=256: every hash
    // survives the sketches, so overlap must be exact arithmetic —
    // the fixed-k denominator bug deflated this to ≈1953 bp
    val a = (1L to 100L).toDF("v")
    val b = (51L to 150L).toDF("v")
    val r = Kmv.overlap(Kmv.sketch(a, col("v"), 256),
      Kmv.sketch(b, col("v"), 256), k = 256).head()
    assert(r.getAs[Long]("c") == 50L)
    assert(r.getAs[Long]("est_inter") == 50L,
      s"sub-k est_inter must be exact 50, got ${r.getAs[Long]("est_inter")}")
    assert(r.getAs[Long]("jaccard_bp") == (10000L * 50) / 150,
      s"sub-k jaccard must be exact 3333, got ${r.getAs[Long]("jaccard_bp")}")
    // and both-empty inputs stay 0, not a 0-division NULL
    val e = spark.emptyDataset[Long].toDF("v")
    val z = Kmv.overlap(Kmv.sketch(e, col("v"), 256),
      Kmv.sketch(e, col("v"), 256), k = 256).head()
    assert(z.getAs[Long]("est_inter") == 0L && z.getAs[Long]("jaccard_bp") == 0L)
  }

  test("HLL/KMV: null values carry no distinct value — sketches ignore them") {
    val withNulls = (1L to 1000L).toDF("v")
      .select(when(col("v") <= 900, col("v")).as("v")) // 100 nulls
    val clean = (1L to 900L).toDF("v")
    val rN = Hll.distinctEstimate(withNulls, col("v"), p = 9).head()
    val rC = Hll.distinctEstimate(clean, col("v"), p = 9).head()
    assert(rN.getAs[Long]("n_regs") == rC.getAs[Long]("n_regs") &&
      rN.getAs[Long]("s_scaled") == rC.getAs[Long]("s_scaled"),
      "a null value must not occupy an HLL register")
    val kN = Kmv.sketch(withNulls, col("v"), 64).as[Long].collect().toSeq
    val kC = Kmv.sketch(clean, col("v"), 64).as[Long].collect().toSeq
    assert(kN === kC, "a null hash must not occupy a KMV sketch slot")
  }

  test("HLL small-range correction: within the linear-counting 3-sigma band") {
    // p=9 → m=512; the raw estimator is biased below est ≈ 2.5·m = 1280.
    // correctedEstimate must land within max(2%, 3σ) of the true count
    // across the zone, σ² = m·(e^t − t − 1) with t = n/m (Whang et al.
    // 1990, the linear-counting variance) — at n=100 σ ≈ 3.2, so a flat
    // 2% bound would be tighter than the estimator's own theory.
    val m = 512
    var corrections = 0
    for (n <- Seq(10L, 25L, 50L, 100L, 200L, 400L, 800L, 1200L)) {
      val r = Hll.distinctEstimate((1L to n).toDF("v"), col("v"), p = 9).head()
      val raw = r.getAs[Number]("est").longValue()
      val corrected = Hll.correctedEstimate(
        r.getAs[Long]("n_zero_regs"), m, raw)
      if (corrected != raw) corrections += 1
      val t = n.toDouble / m
      val sigma3 = 3 * math.sqrt(m * (math.exp(t) - t - 1))
      val tol = math.max(math.max(1L, math.round(n * 0.02)), math.ceil(sigma3).toLong)
      assert(math.abs(corrected - n) <= tol,
        s"corrected estimate $corrected for n=$n outside band ±$tol (raw $raw)")
    }
    assert(corrections > 0, "the correction zone was never exercised")
    // outside the zone the raw estimate passes through untouched
    assert(Hll.correctedEstimate(nZeroRegs = 3, m = 512, rawEst = 10000L) == 10000L)
    // zero empty registers → ln undefined → raw passes through
    assert(Hll.correctedEstimate(nZeroRegs = 0, m = 512, rawEst = 600L) == 600L)
  }

  test("KMV sketch plans as TakeOrdered, never a global sort") {
    val p = Kmv.sketch((1L to 5000L).toDF("v"), col("v"), k = 256)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$p")
  }
}
