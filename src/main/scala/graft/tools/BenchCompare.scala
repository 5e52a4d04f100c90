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
  * sf0.01 runs: 19 flags without, the true kernel-swap deltas with),
  *
  * plus a WHOLE-RUN normalizer (round 11, the r10 verdict's comparator
  * item): two same-code runs can differ by a uniform host-state factor
  * (page cache, thermal, background load — the 05:30 r10 run sat ~1.3×
  * above its same-code siblings and produced 18 false flags). Before
  * banding, every new median is divided by the MEDIAN OF RATIOS
  * new/old over shared entries — a uniform shift normalizes to 1.0 and
  * flags nothing, while a genuine single-entry regression (b156's
  * count-before-persist, 1.33→1.77 s) barely moves a ~250-entry median
  * and still trips. The factor is printed; a factor far from 1.0 is
  * itself the "this run's host was busy" diagnosis. Skipped (1.0) when
  * fewer than 8 shared entries support it.
  *
  * Pure JVM (no Spark session — this reads ~500 JSON lines). Fields are
  * extracted by pattern, matching exactly what Bench writes.
  * `runMain graft.tools.BenchCompare [historyPath] [relThr=1.25] [minAbsDelta=0.3] [oldRun newRun]`
  * — the optional explicit run ids re-judge any historical pair.
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
    val explicitPair = (args.lift(3), args.lift(4)) match {
      case (Some(a), Some(b)) => Some((a, b))
      case _ => None
    }
    // an explicit pair carries its own sf (re-judging history); the
    // default pair lives at the newest run's sf
    val newestSf = explicitPair
      .flatMap(p => rows.find(_.get("run").contains(p._1)))
      .getOrElse(rows.last).getOrElse("sf", "?")
    val atSf = rows.filter(_.getOrElse("sf", "?") == newestSf)
    val runs = atSf.map(_("run")).distinct
    if (explicitPair.isEmpty && runs.size < 2) {
      println(s"[benchcmp] only ${runs.size} run(s) at sf $newestSf in $path — nothing to compare")
      return
    }
    val (oldRun, newRun) = explicitPair.getOrElse((runs(runs.size - 2), runs.last))
    def byName(run: String) =
      atSf.filter(_("run") == run).map(r => r("name") -> r).toMap
    val (o, n) = (byName(oldRun), byName(newRun))
    require(o.nonEmpty && n.nonEmpty,
      s"run ids not found at sf $newestSf: $oldRun / $newRun")
    // whole-run scale: median of new/old ratios over shared entries —
    // robust to any minority of genuine per-entry deltas
    val ratios = (o.keySet & n.keySet).toSeq
      .map(k => (o(k)("median").toDouble, n(k)("median").toDouble))
      .collect { case (om, nm) if om > 0 && nm > 0 => nm / om }
      .sorted
    val scale =
      if (ratios.size < 8) 1.0
      else if (ratios.size % 2 == 1) ratios(ratios.size / 2)
      else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2.0
    println(f"[benchcmp] $oldRun -> $newRun " +
      f"(sf $newestSf, relThr $relThr, run scale $scale%.3fx over ${ratios.size} shared)")
    var reg, imp = 0
    for (name <- (o.keySet ++ n.keySet).toSeq.sorted) (o.get(name), n.get(name)) match {
      case (None, Some(_)) => println(f"NEW       $name")
      case (Some(_), None) => println(f"GONE      $name")
      case (Some(a), Some(b)) =>
        val (om, olo, ohi) = (a("median").toDouble, a("min").toDouble, a("max").toDouble)
        val raw = b("median").toDouble
        val nm = if (raw >= 0) raw / scale else raw // normalized before banding
        if (om > 0 && nm > ohi && nm > om * relThr && nm - om > minAbsDelta) {
          reg += 1
          println(f"REGRESSED $name%-32s $om%7.2f [$olo%.2f, $ohi%.2f] -> $nm%7.2f (${nm / om}%.2fx, raw $raw%.2f)")
        } else if (om > 0 && nm >= 0 && nm < olo && nm < om / relThr && om - nm > minAbsDelta) {
          imp += 1
          println(f"IMPROVED  $name%-32s $om%7.2f [$olo%.2f, $ohi%.2f] -> $nm%7.2f (${nm / om}%.2fx, raw $raw%.2f)")
        }
      case _ => ()
    }
    def tot(m: Map[String, Map[String, String]]) =
      m.values.map(_("median").toDouble).filter(_ >= 0).sum
    println(f"[benchcmp] totals: ${tot(o)}%.1f -> ${tot(n)}%.1f s over " +
      s"${n.size} entries; $reg regressed, $imp improved beyond spread+threshold")
  }
}
