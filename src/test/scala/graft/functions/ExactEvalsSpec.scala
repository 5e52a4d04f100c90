package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The widened eval arithmetic must be EXACT past 2⁶³ — each widened
  * path is checked against a driver-side BigInt reference at adversarial
  * magnitudes where the int64 path provably overflows (and, under ANSI,
  * throws rather than wrapping — also pinned). On small inputs the two
  * paths must agree bit for bit.
  */
class ExactEvalsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- AUC

  private val aucGroups = Seq(
    // (score, p, n) with per-class totals ~3·10⁹ — u2 ~ 2·P·N ~ 2·10¹⁹ > 2⁶³
    (-5L, 900000000L, 100000000L),
    (-1L, 800000000L, 700000000L),
    (2L, 300000000L, 1200000000L),
    (9L, 1000000000L, 1000000000L))

  private def aucRef(rows: Seq[(Long, Long, Long)]): (BigInt, BigInt, BigInt, Long) = {
    val sorted = rows.sortBy(_._1)
    var cum = BigInt(0); var u2 = BigInt(0); var np = BigInt(0); var nn = BigInt(0)
    sorted.foreach { case (_, p, n) =>
      u2 += BigInt(p) * (2 * cum + n); cum += n; np += p; nn += n
    }
    val bp = ((BigInt(10000) * u2) / (2 * np * nn)).toLong
    (np, nn, u2, bp)
  }

  test("widened AUC is exact past 2^63 (BigInt reference); narrow path throws under ANSI") {
    val grp = aucGroups.toDF("score", "p", "n")
    val r = ExactEvals.aucBpFromGroups(grp, widen = true).head()
    val (np, nn, u2, bp) = aucRef(aucGroups)
    assert(BigInt(r.getDecimal(0).toBigInteger) === np)
    assert(BigInt(r.getDecimal(1).toBigInteger) === nn)
    assert(BigInt(r.getDecimal(2).toBigInteger) === u2)
    assert(r.getLong(3) === bp)
    assertThrows[Exception] {
      ExactEvals.aucBpFromGroups(grp, widen = false).collect()
    }
  }

  test("narrow and widened AUC agree on in-range inputs") {
    val small = Seq((-3L, 5L, 2L), (0L, 1L, 7L), (4L, 9L, 3L))
    val a = ExactEvals.aucBpFromGroups(small.toDF("score", "p", "n")).head()
    val b = ExactEvals.aucBpFromGroups(small.toDF("score", "p", "n"),
      widen = true).head()
    assert(a.getLong(0) === b.getDecimal(0).longValueExact())
    assert(a.getLong(2) === b.getDecimal(2).longValueExact())
    assert(a.getLong(3) === b.getLong(3))
    val (_, _, u2, bp) = aucRef(small)
    assert(BigInt(a.getLong(2)) === u2 && a.getLong(3) === bp)
  }

  // --------------------------------------------------------------- lift

  test("widened lift is exact past 2^63 (BigInt reference)") {
    // 10⁶·co·n_users ~ 10⁶·4·10⁹·3·10⁹ ≈ 1.2·10²⁵ — far past 2⁶³
    val co = 4000000000L; val nu = 3000000000L
    val ca = 3500000000L; val cb = 3600000000L
    val counts = Seq(("a", "b", co, ca, cb, nu))
      .toDF("type_a", "type_b", "co", "cnt_a", "cnt_b", "n_users")
    val r = ExactEvals.pairLiftFromCounts(counts, widen = true).head()
    val support = (BigInt(10000) * co / nu).toLong
    val lift = (BigInt(1000000) * co * nu / (BigInt(ca) * cb)).toLong
    assert(r.getLong(5) === support && r.getLong(6) === lift)
    assertThrows[Exception] {
      ExactEvals.pairLiftFromCounts(counts, widen = false).collect()
    }
  }

  // --------------------------------------------------------------- TWAP

  test("widened TWAP is exact past 2^63 (BigInt reference); paths agree in range") {
    // per-row cents·dur ≈ 8·10¹²·9·10⁸ ≈ 7·10²¹ — one segment already
    // overflows int64 — while twap_sc ≈ 10⁶·8·10¹² = 8·10¹⁸ still fits
    // a long (the ratio-fits contract)
    val segs = Seq((1L, 8000000000000L, 900000000L),
      (1L, 8000000000001L, 800000000L),
      (1L, 7999999999999L, 700000000L))
    val r = ExactEvals.twapFromSegments(
      segs.toDF("user_id", "cents", "dur_s"), widen = true).head()
    val wsum = segs.map { case (_, c, d) => BigInt(c) * d }.sum
    val dur = segs.map(_._3).sum
    assert(BigInt(r.getDecimal(3).toBigInteger) === wsum)
    assert(r.getLong(4) === (BigInt(1000000) * wsum / dur).toLong)
    assertThrows[Exception] {
      ExactEvals.twapFromSegments(
        segs.toDF("user_id", "cents", "dur_s"), widen = false).collect()
    }
    val small = Seq((7L, 120L, 30L), (7L, 90L, 0L), (8L, 5L, 2L))
    val a = ExactEvals.twapFromSegments(small.toDF("user_id", "cents", "dur_s"))
      .orderBy("user_id").collect()
    val b = ExactEvals.twapFromSegments(small.toDF("user_id", "cents", "dur_s"),
        widen = true).orderBy("user_id").collect()
    assert(a.map(_.getLong(4)).toSeq === b.map(_.getLong(4)).toSeq)
  }

  // ------------------------------------------------------ weighted mean

  test("widened weighted mean is exact past 2^63 (BigInt reference)") {
    // Σ w·x = 200k·6·8·10¹² ≈ 9.6·10¹⁸ > 2⁶³ while the scaled mean
    // 10⁶·8·10¹² = 8·10¹⁸ still fits a long (the ratio-fits contract)
    val nRows = 200000L; val w0 = 6L; val x0 = 8000000000000L
    val df = spark.range(nRows)
      .select(lit(1L).as("replica"), lit(w0).as("w"), lit(x0).as("x"))
    val r = ExactEvals.weightedMeanSc(df, col("replica"), col("w"), col("x"),
      "replica", "mean_sc", widen = true).head()
    val wsum = BigInt(nRows) * w0 * x0
    val neff = BigInt(nRows) * w0
    assert(BigInt(r.getDecimal(1).toBigInteger) === neff)
    assert(r.getLong(2) === (BigInt(1000000) * wsum / neff).toLong)
    assertThrows[Exception] {
      ExactEvals.weightedMeanSc(df, col("replica"), col("w"), col("x"),
        "replica", "mean_sc", widen = false).collect()
    }
  }
}
