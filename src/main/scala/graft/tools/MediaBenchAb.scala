package graft.tools

import org.apache.spark.sql.SparkSession

/** The q134/q34/q35/q102 bench-elevation postmortem (VERDICT r10 watch
  * item 2): the multimodal family read 2.6-6.4 s across all four r10
  * sf0.1 runs vs 0.73 s in r9 with UNTOUCHED code. The family reads
  * only `documents.doc_id` and synthesizes media bytes in-JVM
  * (mapPartitions codecs), so "first-touch file IO" cannot explain it;
  * the candidates are (a) codec-path JIT warm-up — the bench's
  * sf0.001 warm pass drives ~500 docs through the codec loops, far
  * below compilation thresholds, so sample 1 at sf0.1 runs partly
  * interpreted — (b) GC pressure from neighboring suite entries, and
  * (c) host state. This probe runs each family member N times in ONE
  * JVM (optionally dropping the page cache between samples to kill
  * the IO hypothesis explicitly), printing per-sample walls plus JIT
  * compilation-time and GC deltas — the sample SHAPE is the verdict:
  * monotone fast-tail = JIT; random spikes correlated with GC = heap;
  * flat = the r10 numbers were host state.
  *
  * `runMain graft.tools.MediaBenchAb [sfDir] [samples=12] [dropCaches]`
  */
object MediaBenchAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(12)
    val drop = args.contains("dropCaches")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fam = Seq("q34_multimodal_decode", "q35_media_features",
      "q102_video_frame_stats", "q134_image_ahash_dups")
    val qs = graft.SparkEntry.queries.filter(q => fam.contains(q._1))
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.stream()
      .mapToLong(_.getCollectionTime).sum()
    (1 to n).foreach { i =>
      if (drop) {
        Runtime.getRuntime.exec(Array("sh", "-c",
          "sync; echo 3 > /proc/sys/vm/drop_caches")).waitFor()
      }
      fam.foreach { name =>
        val (jit0, gc0) = (jit.getTotalCompilationTime, gcMs)
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[mediaAb] $name%-24s sample $i%2d: $w%6.2f s " +
          f"jit+${jit.getTotalCompilationTime - jit0}%5d ms gc+${gcMs - gc0}%5d ms")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
