package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy record linkage (FastSS, Bocek et al.
  * 2007 / the SymSpell family): to find all matches within edit
  * distance 1, each side emits its string plus every single-character
  * deletion variant as join keys; two strings within one edit ALWAYS
  * share a key (delete-on-one-side covers insert/delete, delete-on-both
  * covers substitution), so an EQUI-join over the variant keys is a
  * complete candidate generator — no similarity join, no block scan,
  * no all-pairs anywhere.
  *
  * 100 TB shape: explode factor is |s|+1 keys per record; keys are
  * near-unique for near-unique strings, so the candidate join is
  * sparse. One shuffle on the variant key, `levenshtein` verify only on
  * candidates, then a partial-agg argmin per probe record. This is the
  * dirty-record → catalog linkage step of an entity-resolution
  * pipeline; for distance k > 1 the same scheme applies k nested
  * deletions (explode factor |s| choose k — keep strings short or
  * pre-block).
  */
object FuzzyJoin {

  /** The string plus all |s| single-deletion variants, de-duplicated. */
  def deletionKeys(s: Column): Column =
    array_distinct(concat(array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), length(s))))))

  /** Best edit-distance-≤1 match per probe row: (probe_id, match_id,
    * dist), argmin by (dist, match_id). Probe rows with no candidate
    * within one edit are absent (no match found).
    */
  def bestMatch1(probe: DataFrame, probeId: Column, probeText: Column,
                 catalog: DataFrame, catId: Column, catText: Column): DataFrame = {
    // explode_outer + null filter, NOT explode: InferFiltersFromGenerate
    // would inline the deletion-key transform into an inferred filter and
    // re-run it per row (see graft.util.Explode); keys are never null
    val p = probe.select(probeId.as("probe_id"), probeText.as("__pt"),
      explode_outer(deletionKeys(probeText)).as("__k"))
      .filter(col("__k").isNotNull)
    val c = catalog.select(catId.as("match_id"), catText.as("__ct"),
      explode_outer(deletionKeys(catText)).as("__k"))
      .filter(col("__k").isNotNull)
    p.join(c, "__k")
      .select(col("probe_id"), col("match_id"), col("__pt"), col("__ct"))
      .distinct()
      // 3-arg levenshtein early-exits past the threshold (returns -1)
      .withColumn("dist", levenshtein(col("__pt"), col("__ct"), 1))
      .filter(col("dist") >= 0)
      .groupBy(col("probe_id"))
      .agg(min(struct(col("dist"), col("match_id"))).as("__best"))
      .select(col("probe_id"), col("__best.match_id").as("match_id"),
        col("__best.dist").cast("long").as("dist"))
  }
}
