package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Markov transition matrix: hand-computed chains, ordering, ppm. */
class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  // user 1: a -> b -> a -> c ; user 2: b -> b
  private val events = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "a"), (1L, 40L, "c"),
    (2L, 10L, "b"), (2L, 20L, "b")
  ).toDF("user_id", "seq", "event_type")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Transitions.matrix(df, col("user_id"), col("event_type"), Seq(col("seq").asc))
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap

  test("hand-computed chain: counts and exact ppm shares") {
    val m = run(events)
    assert(m == Map(
      ("a", "b") -> ((1L, 500000L)),   // a -> {b, c}: 1/2 each
      ("a", "c") -> ((1L, 500000L)),
      ("b", "a") -> ((1L, 500000L)),   // b -> {a, b}: 1/2 each
      ("b", "b") -> ((1L, 500000L))))
  }

  test("streams never cross users; first event of a key emits no pair") {
    // single-event user contributes nothing
    val m = run(events.unionByName(Seq((3L, 5L, "z")).toDF("user_id", "seq", "event_type")))
    assert(!m.keys.exists { case (f, t) => f == "z" || t == "z" })
  }

  test("ppm rows sum to <= 1e6 per from-state (floor division)") {
    val df = (1 to 300).map(i => (1L, i.toLong, "s" + (i % 7))).toDF("user_id", "seq", "event_type")
    val byFrom = Transitions.matrix(df, col("user_id"), col("event_type"), Seq(col("seq").asc))
      .groupBy("from_state").agg(sum("p_ppm").as("p")).collect().map(_.getLong(1))
    assert(byFrom.forall(p => p <= 1000000L && p > 1000000L - 7))
  }
}
