package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit rules — the constraint checks a lake
  * runs before publishing a table (the Deequ/expectations family,
  * re-expressed as exact aggregates):
  *
  *  - primary-key uniqueness (duplicate key count),
  *  - functional dependencies `lhs → rhs` (lhs groups carrying >1
  *    distinct rhs),
  *  - referential integrity (child keys with no parent),
  *  - null rates per column,
  *  - k-anonymity over a quasi-identifier set (groups smaller than k —
  *    the privacy-release floor).
  *
  * Every rule is one partial-agg'd groupBy or one anti-join — no rule
  * scans twice, and the outputs are exact integer counts a release gate
  * can threshold on. At 100 TB each rule is a single shuffle on its own
  * key; run them as one job each (they share scans via cache only if
  * the caller arranges it — rules are independent by design so a
  * failing rule's job can be retried alone).
  */
object DataQuality {

  /** Rows whose key occurs more than once: (violations = extra rows). */
  def pkViolations(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_violations"))

  /** lhs groups carrying more than one distinct rhs value. */
  def fdViolations(df: DataFrame, lhs: Column, rhs: Column): DataFrame =
    df.groupBy(lhs.as("k")).agg(countDistinct(rhs).as("nv"))
      .filter(col("nv") > 1)
      .agg(count(lit(1)).cast("long").as("n_violations"))

  /** Child rows whose foreign key has no parent (null FKs are not
    * orphans — SQL semantics, they're the null-rate rule's job).
    */
  def orphans(child: DataFrame, fk: Column,
              parent: DataFrame, pk: Column): DataFrame =
    child.select(fk.as("k")).filter(col("k").isNotNull)
      .join(parent.select(pk.as("k")).distinct(), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))

  /** Null count of one column. */
  def nullCount(df: DataFrame, c: Column): DataFrame =
    df.agg(sum(when(c.isNull, 1L).otherwise(0L)).as("n_violations"))

  /** Quasi-identifier groups smaller than k (re-identification risk). */
  def kAnonymityViolations(df: DataFrame, quasi: Seq[Column], k: Long): DataFrame =
    df.groupBy(quasi: _*).agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .agg(count(lit(1)).cast("long").as("n_violations"))

  /** Run a named rule set and stack the results as (rule, n_violations). */
  def audit(rules: Seq[(String, DataFrame)]): DataFrame =
    rules.map { case (name, df) =>
      df.select(lit(name).as("rule"),
        coalesce(col("n_violations"), lit(0L)).cast("long").as("n_violations"))
    }.reduce(_ unionByName _)
}
