package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolated A/B of the coarse-assignment step's three candidate shapes
  * at a fixed >cap geometry (centroids sampled, no training):
  *  - chained:  greatest() over nC struct subtrees (one per centroid)
  *  - matrix:   ONE typedLit 2-D centroid array + transform/array_min
  *              (O(1) plan size, zero shuffle)
  *  - table:    broadcast centroid join + min(struct) hash aggregate
  * Scratch evidence for SCALE.md; not part of the library surface.
  */
object ArgminAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nC = args.lift(1).map(_.toInt).getOrElse(448)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val scale = (1L << 20).toDouble
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => round(x.cast("double") * scale).cast("long")).as("vi"))
      .persist()
    val n = emb.count()
    val cents: Array[Array[Long]] = emb.orderBy(col("id")).limit(nC)
      .select(col("vi")).collect().map(_.getAs[scala.collection.Seq[Long]](0).toArray)
    println(s"[argmin] corpus=$n nC=${cents.length}")

    // the production kernel (codegen IntSqDist); pass lambda=true as
    // arg 3 to measure the pre-round-8 lambda composition instead
    val useLambda = args.lift(2).contains("lambda")
    def sqd(vi: Column, cA: Array[Long]): Column =
      if (useLambda)
        aggregate(zip_with(vi, lit(cA), (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
      else graft.functions.IntSqDist.intSqDist(vi, lit(cA))
    def sqdc(vi: Column, cv: Column): Column =
      if (useLambda)
        aggregate(zip_with(vi, cv, (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
      else graft.functions.IntSqDist.intSqDist(vi, cv)

    def chained(vi: Column): Column =
      -greatest(cents.zipWithIndex.map { case (cA, i) =>
        struct((-sqd(vi, cA)).as("negd"), lit(-i).as("negcid")) }: _*).getField("negcid")
    val mlit = typedLit(cents.map(_.toSeq).toSeq)
    def matrix(vi: Column): Column =
      array_min(transform(mlit, (c, i) =>
        struct(sqdc(vi, c).as("d"), i.as("cid")))).getField("cid")
    val ctab = cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toSeq.toDF("cid", "civ")
    def tablePath(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(ctab))
        .select(col("id"), struct(sqdc(col("vi"), col("civ")).as("d"), col("cid")).as("__s"))
        .groupBy(col("id")).agg(min(col("__s")).as("__m"))
        .select(col("id"), col("__m.cid").as("cid"))

    def time(tag: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[argmin] $tag median=${ts(1)}%.2f s spread=[${ts.head}%.2f, ${ts.last}%.2f]")
    }
    time("matrix ")(emb.select(col("id"), matrix(col("vi")).as("cid")))
    time("chained")(emb.select(col("id"), chained(col("vi")).as("cid")))
    time("table  ")(tablePath(emb))

    // ---- FLOAT shapes (the marginTopKAnn/ivfTopK side): the chained
    // tree scores with the codegen'd DotProduct expression, the matrix
    // form pays interpreted lambda evaluation, the table join scores
    // with codegen DotProduct but materializes n·nC rows
    val femb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .persist()
    femb.count()
    val fcents: Array[Array[Double]] = femb.orderBy(col("id")).limit(nC)
      .select(col("v")).collect().map(_.getAs[scala.collection.Seq[Double]](0).toArray)
    def fchained(v: Column): Column =
      -greatest(fcents.zipWithIndex.map { case (cA, i) =>
        struct((graft.functions.DotProduct.dotProduct(v, lit(cA)) * 2
          - lit(cA.map(x => x * x).sum)).as("score"), lit(-i).as("negcid")) }: _*)
        .getField("negcid")
    val fmlit = typedLit(fcents.map(_.toSeq).toSeq)
    val fn2 = typedLit(fcents.map(c => c.map(x => x * x).sum).toSeq)
    def fmatrix(v: Column): Column =
      array_min(transform(fmlit, (c, i) =>
        struct((element_at(fn2, i + 1)
          - aggregate(zip_with(v, c, (a, b) => a * b), lit(0.0d), (acc, x) => acc + x) * 2).as("d"),
          i.as("cid")))).getField("cid")
    val fctab = fcents.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq, c.map(x => x * x).sum) }
      .toSeq.toDF("cid", "cv", "cn2")
    def ftable(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(fctab))
        .select(col("id"),
          struct((col("cn2") - graft.functions.DotProduct.dotProduct(col("v"), col("cv")) * 2).as("d"),
            col("cid")).as("__s"))
        .groupBy(col("id")).agg(min(col("__s")).as("__m"))
        .select(col("id"), col("__m.cid").as("cid"))
    // round-9: the SAME matrix shape with the codegen DotProduct kernel
    // inside the lambda (the r8 finding predicted interpreted-lambda
    // dot was f-matrix's whole 34.3 s problem — this isolates it)
    def fmatrixK(v: Column): Column =
      array_min(transform(fmlit, (c, i) =>
        struct((element_at(fn2, i + 1)
          - graft.functions.DotProduct.dotProduct(v, c) * 2).as("d"),
          i.as("cid")))).getField("cid")
    time("f-matrix ")(femb.select(col("id"), fmatrix(col("v")).as("cid")))
    time("f-matrixK")(femb.select(col("id"), fmatrixK(col("v")).as("cid")))
    time("f-chained")(femb.select(col("id"), fchained(col("v")).as("cid")))
    time("f-table  ")(ftable(femb))
    val f1 = femb.select(col("id"), fmatrix(col("v")).as("cid"))
      .exceptAll(femb.select(col("id"), fchained(col("v")).as("cid"))).count()
    val f2 = femb.select(col("id"), fmatrixK(col("v")).as("cid"))
      .exceptAll(femb.select(col("id"), fchained(col("v")).as("cid"))).count()
    println(s"[argmin] f-diffs matrix-vs-chained=$f1 matrixK-vs-chained=$f2")
    // parity: all three must agree
    val a = emb.select(col("id"), matrix(col("vi")).as("cid"))
    val b = emb.select(col("id"), chained(col("vi")).as("cid"))
    val c = tablePath(emb)
    val d1 = a.exceptAll(b).count(); val d2 = a.exceptAll(c.select(col("id"), col("cid").cast("int"))).count()
    println(s"[argmin] diffs matrix-vs-chained=$d1 matrix-vs-table=$d2")
    spark.stop()
  }
}
