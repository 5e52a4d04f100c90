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

  test("render refuses paths that would corrupt the JSON") {
    intercept[IllegalArgumentException] {
      TxTable.render(TxTable.Commit(1L, Seq("bad\"quote.parquet"), Nil))
    }
    intercept[IllegalArgumentException] {
      TxTable.render(TxTable.Commit(1L, Nil, Seq("bad\\slash.parquet")))
    }
  }

  test("parse rejects junk instead of fabricating a commit") {
    intercept[IllegalArgumentException] { TxTable.parse("not json at all") }
  }
}
