package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a larger test set from sf0.1 by replicating fact tables with
  * key offsets (dims unchanged) — a scaling probe for SCALE.md, not a
  * benchmark target.
  * `runMain graft.tools.ScaleGen <outDir> [factor] [mode]`.
  *
  * Offsets keep per-entity volumes realistic: new order/event/doc/vector
  * ids per replica; user ids offset per replica (constant events/user);
  * customer keys SHARED across replicas (fact-to-dim fan-in grows with
  * scale, as it does in production).
  *
  * Two text/embedding modes (round-8 — VERDICT r7 #6):
  *  - `replica` (default): texts get an appended replica tag. Replicas
  *    stay ≥0.8-similar to their twins, so TRUE near-dup output grows
  *    ~quadratically in the factor — good for stress-testing output
  *    volume, BLIND for plan scaling (a superlinear wall reading is
  *    corpus construction, not a plan regression).
  *  - `organic`: every token gets a replica-specific suffix
  *    (regexp_replace on word runs) and embeddings circular-shift by the
  *    replica index. Intra-replica pair structure is EXACTLY the base
  *    corpus' (suffixing is a bijection on the token universe; rotation
  *    preserves norms and intra-replica angles); cross-replica
  *    similarity collapses. Near-dup pairs therefore grow LINEARLY with
  *    the factor — the constant-near-dup-rate corpus that measures the
  *    PLAN, not the construction.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val mode = args.lift(2).getOrElse("replica")
    require(mode == "replica" || mode == "organic", s"bad mode $mode")
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rep(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = graft.sources.Tables.load(spark, src, name)
      val all = (0 until factor).map(i => f(base, i)).reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$out/$name.parquet")
      // count the WRITTEN files (metadata-only) instead of re-running the union
      println(s"[scalegen] $name -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    // dims copied once
    Seq("region", "nation", "customer", "supplier", "part").foreach { name =>
      graft.sources.Tables.load(spark, src, name)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    val oOff = 2000000L
    rep("orders")((df, i) => df.withColumn("o_orderkey", col("o_orderkey") + lit(i * oOff)))
    rep("lineitem")((df, i) => df.withColumn("l_orderkey", col("l_orderkey") + lit(i * oOff)))
    // user offset must clear the full user-id range (sf0.1 spans 0..1499;
    // a 1000 offset would overlap replicas and double some users' volumes)
    rep("events")((df, i) => df
      .withColumn("event_id", col("event_id") + lit(i * 10000000L))
      .withColumn("user_id", col("user_id") + lit(i * 10000L)))
    rep("documents")((df, i) => df
      .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
      .withColumn("text",
        if (mode == "organic" && i > 0)
          // suffix every word/number run: a bijection on the token
          // universe per replica — intra-replica similarity preserved,
          // cross-replica similarity destroyed
          regexp_replace(col("text"), "[\\p{L}\\p{N}]+", s"$$0r$i")
        else concat(col("text"), lit(s" replica$i"))))
    rep("embeddings")((df, i) => df
      .withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
      .withColumn("embedding",
        if (mode == "organic" && i > 0) {
          // circular shift by i: norms and intra-replica angles exact,
          // cross-replica cosine decorrelated
          val dim = 64
          concat(slice(col("embedding"), i % dim + 1, dim - i % dim),
            slice(col("embedding"), 1, i % dim))
        } else col("embedding")))
    spark.stop()
  }
}
