package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfQ153 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs0 = graft.sources.Tables.load(spark, dir, "documents")
    val docs = docs0.select(col("doc_id").cast("long").as("id"),
      array_distinct(transform(
        graft.functions.TextFunctions.shingles(graft.functions.TextFunctions.tokens(col("text")), 3),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))).as("els"))
      .filter(size(col("els")) > 0)
    time("warm docs count")(docs.count())
    time("hash+distinct only")(docs.count())
    val dfreq = docs.select(explode(col("els")).as("el")).groupBy(col("el")).agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val sorted = docs.select(col("id"), size(col("els")).as("n"), explode(col("els")).as("el"))
      .join(dfreq, Seq("el")).groupBy(col("id"), col("n"))
      .agg(array_sort(collect_list(struct(col("df"), col("el")))).as("st"))
    time("sorted")(sorted.count())
    val tBp = 6000
    val prefixLen = expr(s"cast(n - (($tBp * cast(n as bigint) + 9999) div 10000) + 1 as int)")
    val pre = sorted.select(col("id"), col("n"),
        posexplode(slice(col("st"), lit(1), prefixLen)).as(Seq("pos", "pt")))
      .select(col("id"), col("n"), col("pos"), col("pt.el").as("el"))
    time("prefix explode")(pre.count())
    val a = pre.select(col("el").as("elA"), col("id").as("idA"), col("n").as("na"), col("pos").as("posA"))
    val b = pre.select(col("el").as("elB"), col("id").as("idB"), col("n").as("nb"), col("pos").as("posB"))
    val alphaBp = expr(s"($tBp * cast(greatest(na, nb) as bigint) + 9999) div 10000")
    val cand = a.join(b, col("elA") === col("elB") && col("idA") < col("idB") &&
        least(col("na"), col("nb")) * 10000L >= lit(tBp.toLong) * greatest(col("na"), col("nb")) &&
        lit(1L) + least(col("na") - col("posA") - 1L, col("nb") - col("posB") - 1L) >= alphaBp)
      .select(col("idA"), col("idB"))
    time("candidates (pre-distinct)")(println("  n=" + cand.count()))
    time("candidates distinct")(println("  n=" + cand.distinct().count()))
    val full = time("full query")(graft.functions.PrefixJoin.shingleHashJaccardJoin(docs0, "doc_id", "text", 3, 0.6).count())
    println("pairs=" + full)
    spark.stop()
  }
}
