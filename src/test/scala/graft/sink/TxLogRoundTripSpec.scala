package graft.sink

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Commit-log serialization round-trip property: the hand-rolled JSON
  * (no JSON lib resolves offline) must replay every commit it renders,
  * over the full path alphabet writers actually produce — and refuse
  * anything that could corrupt the log.
  */
class TxLogRoundTripSpec extends AnyFunSuite {

  // batch-uuid dirs, Hive partition dirs (col=value), spark part files
  private val pathGen: Gen[String] = for {
    batch <- Gen.listOfN(8, Gen.alphaNumChar).map(c => "batch-" + c.mkString)
    part <- Gen.option(for {
      k <- Gen.identifier.map(_.take(10))
      v <- Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)
    } yield s"$k=$v")
    file <- Gen.listOfN(10, Gen.alphaNumChar).map(c => s"part-${c.mkString}.snappy.parquet")
  } yield (Seq(batch) ++ part.toSeq :+ file).mkString("/")

  private val commitGen: Gen[TxTable.Commit] = for {
    v <- Gen.chooseNum(1L, 1000000L)
    added <- Gen.listOf(pathGen)
    removed <- Gen.listOf(pathGen)
  } yield TxTable.Commit(v, added, removed)

  test("parse(render(c)) == c for arbitrary realistic commits") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(commitGen) { c => TxTable.parse(TxTable.render(c)) == c })
    assert(res.passed, res.toString)
  }

  test("hostile path characters round-trip intact (percent-encoding, not refusal)") {
    // commas in Hive partition values, quotes, backslashes, brackets —
    // any of these raw in the JSON would corrupt the regex-based replay
    val nasty = TxTable.Commit(3L,
      added = Seq("batch-x/p=a,b/part-1.parquet", "batch-y/we\"ird\\name].parquet"),
      removed = Seq("batch-z/[old],{file}.parquet"))
    assert(TxTable.parse(TxTable.render(nasty)) == nasty)
  }

  test("parse rejects junk and truncated commits instead of fabricating one") {
    intercept[IllegalArgumentException] { TxTable.parse("not json at all") }
    // version present but the added array unterminated: corrupt, NOT
    // Commit(5, Nil, Nil) — fabricating empties would drop files on replay
    intercept[IllegalArgumentException] {
      TxTable.parse("""{"version":5,"added":["a.parquet"""")
    }
  }
}
