package graft.tools

import scala.jdk.CollectionConverters._

/** Round-over-round bench delta report from `bench_history.jsonl`
  * (VERDICT r8 item 4): per-entry medians of the two most recent FULL
  * runs at the same sf dir, with each delta judged against the OLD
  * run's recorded [min, max] spread — a new median inside the old band
  * is noise by the run's own evidence, not a result. Flags:
  *
  *  - REGRESSED: new median > old max AND > relThr × old median
  *  - IMPROVED:  new median < old min AND < old median / relThr
  *  - NEW / GONE: entry present in only one run
  *
  * plus an ABSOLUTE floor (`minAbsDelta`, default 0.3 s): sub-second
  * entries drift 20-40% between JVMs from suite order/JIT alone, and a
  * 0.13 → 0.18 s "regression" is not actionable — without the floor the
  * report drowns real deltas in noise flags (measured on two same-code
  * sf0.01 runs: 19 flags without, the true kernel-swap deltas with).
  *
  * Pure JVM (no Spark session — this reads ~500 JSON lines). Fields are
  * extracted by pattern, matching exactly what Bench writes.
  * `runMain graft.tools.BenchCompare [historyPath] [relThr=1.25] [minAbsDelta=0.3]`.
  */
object BenchCompare {
  private val F = """"(\w+)":("[^"]*"|[-0-9.eE]+)""".r

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("bench_history.jsonl")
    val relThr = args.lift(1).map(_.toDouble).getOrElse(1.25)
    val minAbsDelta = args.lift(2).map(_.toDouble).getOrElse(0.3)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala.filter(_.nonEmpty)
    val rows = lines.map { l =>
      val kv = F.findAllMatchIn(l).map(m =>
        m.group(1) -> m.group(2).stripPrefix("\"").stripSuffix("\"")).toMap
      kv
    }
    // compare WITHIN one sf: bench_history may mix scale factors
    // (SPARK_GRAFT_SF_DIR changes between local iteration and driver
    // runs) and a cross-sf delta is a bogus 10x flag, not a result —
    // so take the newest run's sf and the two most recent runs AT it
    val newestSf = rows.last.getOrElse("sf", "?")
    val atSf = rows.filter(_.getOrElse("sf", "?") == newestSf)
    val runs = atSf.map(_("run")).distinct
    if (runs.size < 2) {
      println(s"[benchcmp] only ${runs.size} run(s) at sf $newestSf in $path — nothing to compare")
      return
    }
    val (oldRun, newRun) = (runs(runs.size - 2), runs.last)
    def byName(run: String) =
      atSf.filter(_("run") == run).map(r => r("name") -> r).toMap
    val (o, n) = (byName(oldRun), byName(newRun))
    println(s"[benchcmp] $oldRun -> $newRun " +
      s"(sf $newestSf, relThr $relThr)")
    var reg, imp = 0
    for (name <- (o.keySet ++ n.keySet).toSeq.sorted) (o.get(name), n.get(name)) match {
      case (None, Some(_)) => println(f"NEW       $name")
      case (Some(_), None) => println(f"GONE      $name")
      case (Some(a), Some(b)) =>
        val (om, olo, ohi) = (a("median").toDouble, a("min").toDouble, a("max").toDouble)
        val nm = b("median").toDouble
        if (om > 0 && nm > ohi && nm > om * relThr && nm - om > minAbsDelta) {
          reg += 1
          println(f"REGRESSED $name%-32s $om%7.2f [$olo%.2f, $ohi%.2f] -> $nm%7.2f (${nm / om}%.2fx)")
        } else if (om > 0 && nm >= 0 && nm < olo && nm < om / relThr && om - nm > minAbsDelta) {
          imp += 1
          println(f"IMPROVED  $name%-32s $om%7.2f [$olo%.2f, $ohi%.2f] -> $nm%7.2f (${nm / om}%.2fx)")
        }
      case _ => ()
    }
    def tot(m: Map[String, Map[String, String]]) =
      m.values.map(_("median").toDouble).filter(_ >= 0).sum
    println(f"[benchcmp] totals: ${tot(o)}%.1f -> ${tot(n)}%.1f s over " +
      s"${n.size} entries; $reg regressed, $imp improved beyond spread+threshold")
  }
}
