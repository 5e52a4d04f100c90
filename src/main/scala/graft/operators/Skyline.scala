package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (Börzsönyi et al., ICDE 2001): rows not strictly
  * dominated on the (maximize x, maximize y) plane — multi-criteria
  * selection (e.g. "longest AND most lexically diverse docs" with
  * neither metric collapsing into a weighted sum). Domination is
  * `q.x ≥ p.x ∧ q.y ≥ p.y ∧ (q.x > p.x ∨ q.y > p.y)`; exact duplicates
  * of a skyline point all survive (nothing strictly beats them).
  *
  * Shape — the 2-D case needs NO all-pairs and no corpus sort:
  *   1. per distinct x, only rows at `max y(x)` can be on the skyline —
  *      one partial-agg'd groupBy, output is |distinct x| rows;
  *   2. the classic sweep over that REDUCED set: x descending, a
  *      point survives iff its y strictly beats every y at strictly
  *      larger x (running max via a window over |distinct x| rows —
  *      the GroupedPercentiles counts-table discipline: windows over
  *      tiny derived tables, never the corpus);
  *   3. one semi-join back for the surviving rows.
  * Continuous-valued x should be bucketed first (the caller's knob);
  * integer metrics — the engine's standing discipline — need nothing.
  */
object Skyline {

  /** Skyline rows as (id, x, y), both criteria maximized. */
  def pareto2D(df: DataFrame, id: Column, x: Column, y: Column): DataFrame = {
    val pts = df.select(id.cast("long").as("id"), x.cast("long").as("x"),
      y.cast("long").as("y"))
    val maxPerX = pts.groupBy(col("x")).agg(max(col("y")).as("y"))
    // running strict-predecessor max: rows at larger x only
    val w = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = maxPerX
      .withColumn("__prev", max(col("y")).over(w))
      .filter(col("__prev").isNull || col("y") > col("__prev"))
      .select(col("x"), col("y"))
    pts.join(sky, Seq("x", "y"), "left_semi")
      .select(col("id"), col("x"), col("y"))
  }
}
