package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed frequent-terms ("heavy hitters") via the two-pass
  * Misra-Gries scheme — the scale-true alternative to a full
  * `groupBy(term).count()` when the term universe is huge (corpus-wide
  * n-gram vocabularies run to billions of distinct keys at 100 TB, and a
  * full-vocabulary shuffle is almost entirely wasted work when only the
  * >f-fraction terms are wanted).
  *
  * Pass 1 runs a Misra-Gries summary of capacity `m` independently in
  * each partition (`mapPartitions`, O(m) memory, amortized O(1) per
  * token) and ships ONLY the surviving candidate terms — at most m per
  * partition — to the driver. Soundness is the pigeonhole argument: if a
  * term's global count c satisfies c·den > n·num with m ≥ den/num, then
  * in at least one partition its local count exceeds n_p/m (otherwise
  * summing the per-partition bounds gives c ≤ n/m ≤ n·num/den), and
  * Misra-Gries guarantees every term with partition count > n_p/m
  * survives that partition's summary. So the candidate union contains
  * every true heavy hitter; pass 2 recounts ONLY the candidates exactly
  * (an `InSet` filter, then an ordinary partial+final count) and applies
  * the threshold in exact integer arithmetic. No approximation reaches
  * the output: the result is bit-identical to the full groupBy, having
  * shuffled O(m · partitions) keys instead of the vocabulary.
  *
  * Driver footprint is bounded by capacity × partitions (terms only, no
  * counts), independent of data volume — the same bounded-metadata shape
  * as the IVF centroid collect. Reference analog: the corpus-statistics
  * passes of datalakeingestion's profiling step (transformers/
  * transform_funcs.py) compute full value_counts; this is the form that
  * survives a 100 TB vocabulary.
  */
object HeavyHitters {

  /** Terms of `termCol` (string) whose exact corpus count `c` satisfies
    * `c * den > n * num` where n = total term count — i.e. frequency
    * strictly above num/den. Output: (term, cnt), exact counts.
    *
    * `slack` multiplies the minimum sound capacity ceil(den/num); extra
    * capacity only shrinks the candidate set's false-positive tail
    * (pass 2 removes false positives regardless — slack trades a little
    * summary memory for a smaller recount filter).
    */
  def heavyHitters(
      terms: DataFrame,
      termCol: String,
      num: Long,
      den: Long,
      slack: Int = 2): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"fraction $num/$den not in (0,1]")
    require(slack >= 1, "slack must be >= 1")
    val m = math.toIntExact(((den + num - 1) / num) * slack)
    import terms.sparkSession.implicits._
    val ds = terms.select(col(termCol).cast("string")).as[String]

    // pass 1: per-partition Misra-Gries; emit (candidate?, term, localN)
    val summary: Array[(Boolean, String, Long)] =
      ds.mapPartitions { it =>
        val counters = mutable.HashMap.empty[String, Long]
        var n = 0L
        it.foreach { t =>
          if (t != null) {
            n += 1
            counters.get(t) match {
              case Some(c) => counters.update(t, c + 1)
              case None =>
                if (counters.size < m) counters.update(t, 1L)
                else {
                  // decrement-all; amortized O(1): each decrement pairs
                  // with one prior increment
                  val dead = counters.iterator.collect {
                    case (k, 1L) => k
                  }.toList
                  counters.mapValuesInPlace((_, c) => c - 1)
                  dead.foreach(counters.remove)
                }
            }
          }
        }
        counters.keysIterator.map(k => (true, k, 0L)) ++
          Iterator.single((false, "", n))
      }.collect()

    val n = summary.collect { case (false, _, c) => c }.sum
    val candidates = summary.collect { case (true, t, _) => t }.distinct.toSeq

    // pass 2: exact recount restricted to candidates; integer threshold
    ds.filter(col(termCol).isInCollection(candidates))
      .groupBy(col(termCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * den > lit(n) * num)
      .select(col(termCol), col("cnt"))
  }

  /** Convenience: heavy-hitter unigrams of a text column. */
  def heavyTerms(
      docs: DataFrame,
      text: Column,
      num: Long,
      den: Long): DataFrame =
    heavyHitters(
      // explode_outer + null filter: see graft.util.Explode
      docs.select(explode_outer(TextFunctions.tokens(text)).as("term"))
        .filter(col("term").isNotNull),
      "term", num, den)
}
