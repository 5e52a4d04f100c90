package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiler: per-column null counts, distinct counts and
  * value bounds, emitted as one row per column — the `ANALYZE TABLE` /
  * data-quality summary every ingestion run wants next to its row-count
  * reconciliation (reference utils/validation semantics: profile before
  * trusting).
  *
  * Shape: ALL metrics for ALL columns are computed in a SINGLE aggregate
  * over one scan — min/max/count are map-side partials, so the table is
  * read once no matter how many columns are profiled. The wide 1-row
  * result is then exploded to the long (column, metric…) form; the
  * explode touches one row, not the table.
  *
  * Distinct counts: `exact = false` (the 100 TB default) uses
  * `approx_count_distinct` (HLL, fixed-size partials, stays one pass);
  * `exact = true` uses `count(DISTINCT …)`, which Spark plans via an
  * Expand of the input — one duplicated pass per distinct column. Exact
  * mode exists so the profile is engine-reproducible (the gate query
  * hash-matches DuckDB); approx is what you run on a lake.
  *
  * Bounds are computed in the column's NATIVE type (numeric min, not
  * lexicographic) and cast to string only for the uniform output schema.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val dt = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(dt.contains(c), s"no such column: $c"))
    def nd(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
