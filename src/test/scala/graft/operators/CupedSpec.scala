package graft.operators

import graft.SparkSpec

/** CUPED adjustment: hand case, variance-reduction direction, edges. */
class CupedSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, Long, Long)*) =
    Cuped.adjust(rows.toDF("arm", "x", "y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("hand case: perfect x-y correlation gives theta = 1 and equalized arms") {
    // y == x exactly: theta_bp = 10000; adjusted totals become
    // sum_y*1e4 - (n*sum_x - n_a*sx) div n — removing ALL x-explained spread
    val m = run((0L, 10L, 10L), (0L, 20L, 20L), (1L, 30L, 30L), (1L, 40L, 40L))
    assert(m(0L)._4 == 10000L && m(1L)._4 == 10000L)
    // n=4, Σx=100: both arms' adjusted totals collapse to
    // n_a · grand_mean · 1e4 = 2 · 25 · 1e4 — the x-explained spread
    // between arms vanishes entirely
    assert(m(0L)._5 == 500000L)
    assert(m(1L)._5 == 500000L)
  }

  test("uncorrelated covariate (Sxy = 0) leaves outcomes unadjusted") {
    // x symmetric, y constant -> Sxy = 0 -> theta 0 -> adj = sum_y * 1e4
    val m = run((0L, 1L, 5L), (0L, 3L, 5L), (1L, 1L, 5L), (1L, 3L, 5L))
    assert(m(0L)._4 == 0L && m(0L)._5 == 10L * 10000L)
    assert(m(1L)._5 == 10L * 10000L)
  }

  test("zero-variance covariate degrades to theta 0, no division blowup") {
    val m = run((0L, 7L, 3L), (1L, 7L, 9L))
    assert(m(0L)._4 == 0L && m(0L)._5 == 3L * 10000L)
  }

  test("adjustment preserves the pooled outcome total (sum over arms invariant)") {
    val rows = (1L to 40L).map(i => (i % 2, (i * 13) % 50, (i * 7) % 60 + ((i * 13) % 50) / 2))
    val m = run(rows: _*)
    val rawTotal = rows.map(_._3).sum * 10000L
    // Σ_arms adj = Σy·1e4 − θ·(n·Σx − n·Σx) div n = Σy·1e4 exactly when
    // the div-n terms cancel; integer floor makes it exact here because
    // the two arms' centering terms are computed independently — allow
    // the ±(arms) floor slack
    val adjTotal = m.values.map(_._5).sum
    assert(math.abs(adjTotal - rawTotal) <= 2L * 10000L)
  }
}
