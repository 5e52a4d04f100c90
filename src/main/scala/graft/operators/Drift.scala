package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring for ingestion pipelines: the exact
  * two-sample Kolmogorov–Smirnov distance of each group's value
  * distribution against the REST of the corpus — the "did this source's
  * document-length profile shift?" check a 100 TB crawl pipeline runs
  * per feed before admitting a batch.
  *
  * The KS statistic sup_v |F_g(v) − F_rest(v)| is computed EXACTLY in
  * cross-multiplied integer arithmetic: the supremum over step points is
  * max over the corpus' distinct values of
  * |cumG·nRest − cumRest·nG|, reported as basis points via integer
  * division — no floats anywhere, so any SQL engine replays it
  * bit-for-bit. (Long arithmetic bounds: nG·nRest must fit 63 bits —
  * fine to ~3·10⁹ rows per side; beyond that widen to decimal.)
  *
  * 100 TB shape: one (group, value) count aggregate reduces the corpus
  * to a grid of |groups| × |distinct values| rows; all windows partition
  * by group over that GRID (value domains like document length are
  * bounded — thousands of distinct values), never over the corpus. The
  * dense grid (every group × every value, zeros filled) is required for
  * correctness: F_g is flat where the group has no mass but F_rest still
  * steps, and the sup can land exactly there.
  */
object Drift {

  /** Per-group exact KS distance vs the rest of the corpus.
    * Output: (group, n, ks_bp) — group value (as string), the group's
    * row count, and floor(10000 · D) where D is the KS distance.
    * Groups covering the whole corpus (nRest = 0) are excluded — there
    * is no "rest" distribution to compare against.
    */
  def ksPerGroup(df: DataFrame, group: Column, value: Column): DataFrame = {
    val cnt = df.select(group.cast("string").as("__g"), value.cast("long").as("__v"))
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val groups = cnt.select(col("__g")).distinct()
      .join(cnt.groupBy(col("__g").as("__g2")).agg(sum(col("__c")).as("__ng"))
          .withColumnRenamed("__g2", "__g"), Seq("__g"))
    val values = cnt.groupBy(col("__v")).agg(sum(col("__c")).as("__cv"))
    val total = cnt.agg(sum(col("__c")).as("__n")).head().getLong(0)
    // dense grid: every (group, value) with zero-filled group counts —
    // both sides are aggregates (|groups| and |distinct values|), so the
    // cross join is broadcast-tiny by construction
    val grid = groups.crossJoin(broadcast(values))
      .join(cnt, Seq("__g", "__v"), "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val wg = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = grid
      .withColumn("__cumG", sum(col("__c")).over(wg))
      .withColumn("__cumAll", sum(col("__cv")).over(wg))
      .withColumn("__cumRest", col("__cumAll") - col("__cumG"))
      .withColumn("__nRest", lit(total) - col("__ng"))
      .withColumn("__num",
        abs(col("__cumG") * col("__nRest") - col("__cumRest") * col("__ng")))
    stepped.filter(col("__nRest") > 0)
      .groupBy(col("__g"), col("__ng"), col("__nRest"))
      .agg(max(col("__num")).as("__maxnum"))
      // `div`, not `/`: long/long must stay integer division (DuckDB `//`)
      .select(col("__g").as("group"), col("__ng").as("n"),
        expr("(__maxnum * 10000) div (__ng * __nRest)").as("ks_bp"))
  }
}
