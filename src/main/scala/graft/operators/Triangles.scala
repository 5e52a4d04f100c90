package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered edge orientation
  * (Schank & Wagner 2005; the MapReduce form in Suri & Vassilvitskii,
  * WWW 2011): fix the total order `≺ = (degree, id)` lexicographic,
  * orient every undirected edge from its ≺-smaller endpoint to the
  * larger, build wedges by joining oriented edges on their shared
  * source, and close each wedge `(u→x, u→y)` with `x ≺ y` against the
  * oriented list's `x→y` — a pure EQUI-join, and each triangle is
  * counted exactly once from its ≺-minimum corner.
  *
  * The scale point: orientation bounds every node's OUT-degree by
  * O(√|E|), so the wedge join's per-key fan-out is capped no matter how
  * hot a hub node is — where the naive `a<b<c` 3-way self-join puts a
  * hub's full degree² into one task. Per-node counts are one explode of
  * the closed triangles.
  */
object Triangles {

  /** All triangles as (u, x, y) corners with u ≺ x ≺ y, plus loops and
    * duplicate/reverse edges normalized away first.
    */
  def triangles(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val e = edges
      .select(least(src, dst).cast("long").as("a"),
        greatest(src, dst).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val o = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("u"), col("da").as("du"),
          col("b").as("v"), col("db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("db").as("du"),
          col("a").as("v"), col("da").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
    val w1 = o.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val w2 = o.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = w1.join(w2, Seq("u"))
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
    wedges.join(o.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .select(col("u"), col("x"), col("y"))
  }

  /** Per-node triangle participation: (node, n_triangles); nodes in no
    * triangle are absent.
    */
  def perNode(edges: DataFrame, src: Column, dst: Column): DataFrame =
    triangles(edges, src, dst)
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
}
