package graft

import java.sql.Timestamp
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ReasonCode, RunLog, RunStatus}
import graft.operators.Transforms
import graft.state.LogStore

/** Property tests for the driver-side invariants (SURVEY.md §5):
  * watermark recovery, bucket arithmetic, predicate synthesis. Spark-free
  * (pure functions) so the generator loop stays fast. Raw ScalaCheck
  * (no scalatest bridge in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  test("BPE rank-order application ≡ priority-queue application on random merges and words") {
    val genMergesAndWord = for {
      n <- Gen.choose(0, 10)
      picks <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 63), Gen.choose(0, 63)))
      word <- Gen.listOf(Gen.oneOf("a", "b", "c")).map(_.mkString)
    } yield (growMerges(picks), word)
    check("bpe-rank-order")(Prop.forAll(genMergesAndWord) { case (merges, word) =>
      graft.functions.Bpe.applyMerges(word, merges) == priorityApply(word, merges)
    })
  }

  /** Grow a VALID merge table: each rule draws both components from the
    * pool of symbols existing when it is learned (base chars + earlier
    * products) — the invariant real training guarantees and the
    * rank-order equivalence argument relies on. Indices mod the growing
    * pool make deep, layered product-of-product rules reachable.
    */
  private def growMerges(picks: List[(Int, Int)]): Vector[(String, String)] = {
    var pool = Vector("a", "b", "c")
    val out = Vector.newBuilder[(String, String)]
    val seen = collection.mutable.Set[(String, String)]()
    picks.foreach { case (i, j) =>
      val rule = (pool(i % pool.size), pool(j % pool.size))
      if (!seen(rule)) {
        out += rule; seen += rule; pool :+= rule._1 + rule._2
      }
    }
    out.result()
  }

  private def priorityApply(word: String,
                            merges: Vector[(String, String)]): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var cont = true
    while (cont && syms.length > 1) {
      syms.zip(syms.tail).flatMap(rank.get).sorted.headOption match {
        case None => cont = false
        case Some(r) =>
          val (a, b) = merges(r)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
      }
    }
    syms
  }

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val baseTs = LocalDateTime.of(2021, 1, 1, 0, 0, 0)

  private def successLog(end: String) =
    RunLog(1L, RunStatus.Success, "x", end, 1L, 1L, "r", new Timestamp(0))

  private def check(name: String)(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("datetime watermark: start is exactly 1s past the max prior success end") {
    check("wm-datetime")(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 500000000L))) { offsets =>
      val prior = offsets.map(o => successLog(baseTs.plusSeconds(o).format(fmt)))
      val (start, reason) = LogStore.nextStartValue(prior, dateNotAvailable = false)
      val startTs = LocalDateTime.parse(start, fmt)
      reason == ReasonCode.Subsequent &&
        prior.forall(l => LocalDateTime.parse(l.endValue, fmt).isBefore(startTs)) &&
        startTs == baseTs.plusSeconds(offsets.max + 1)
    })
  }

  test("int watermark: start = max + 1 regardless of order; non-success ignored") {
    check("wm-int")(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(1L, Long.MaxValue / 2))) { ends =>
      val prior = scala.util.Random.shuffle(
        ends.map(e => successLog(e.toString)) :+
          RunLog(1L, RunStatus.Failed, "x", (ends.max + 999).toString, 1, 1, "r", new Timestamp(0)))
      val (start, _) = LogStore.nextStartValue(prior, dateNotAvailable = true)
      start.toLong == ends.max + 1
    })
  }

  test("watermark is monotone: adding a later success never moves start backwards") {
    check("wm-monotone")(Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(0L, 1000000L)), Gen.choose(0L, 1000000L)) {
      (offsets, extra) =>
        val prior = offsets.map(o => successLog(baseTs.plusSeconds(o).format(fmt)))
        val (s1, _) = LogStore.nextStartValue(prior, dateNotAvailable = false)
        val later = prior :+ successLog(baseTs.plusSeconds(offsets.max + extra).format(fmt))
        val (s2, _) = LogStore.nextStartValue(later, dateNotAvailable = false)
        !LocalDateTime.parse(s2, fmt).isBefore(LocalDateTime.parse(s1, fmt))
    })
  }

  test("bucketWidth is total on sane formats and positive") {
    check("bucket")(Prop.forAll(Gen.choose(1, 1000), Gen.oneOf("", "K", "M")) { (n, suffix) =>
      val w = Transforms.bucketWidth(s"$n$suffix")
      val mult = suffix match { case "" => 1L; case "K" => 1000L; case "M" => 1000000L }
      w == n * mult && w > 0
    })
  }

  test("pushdownWhere coalesce form expands both columns for any window") {
    check("pushdown")(Prop.forAll(
      Gen.identifier, Gen.identifier, Gen.choose(1L, 1000000L), Gen.choose(1L, 1000000L)) {
      (a0, b0, lo, hi) =>
        val (a, b) = (s"c_$a0", s"d_$b0")
        val sql = graft.sources.Incremental.pushdownWhere(
          s"coalesce($a, $b)", lo.toString, Some(hi.toString), isDatetime = false)
        sql == s"($a BETWEEN $lo AND $hi OR $b BETWEEN $lo AND $hi)"
    })
  }

  test("SimHash kernel: deterministic and permutation-invariant (bag semantics)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    check("simhash")(Prop.forAll(
      Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { tokens =>
      val arr = ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray)
      val h1 = graft.functions.SimHash64.compute(arr)
      val shuffled = ArrayData.toArrayData(
        scala.util.Random.shuffle(tokens).map(UTF8String.fromString).toArray)
      h1 == graft.functions.SimHash64.compute(arr) &&
        graft.functions.SimHash64.compute(shuffled) == h1
    })
  }
}
