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
  * banding, every new median is divided by a whole-run scale estimated
  * from the shared entries' new/old ratios — a uniform shift
  * normalizes to 1.0 and flags nothing, while a genuine single-entry
  * regression (b156's count-before-persist, 1.33→1.77 s) barely moves
  * a ~250-entry estimate and still trips.
  *
  * On a round that genuinely speeds up one FAMILY, the improved
  * entries drag the median-of-ratios below the true host factor and
  * every untouched entry's normalized ratio inflates — r12's
  * margin-family speedup pulled the median to 0.897 while the
  * same-code host pair read 0.919×, manufacturing false ~1.26-1.29×
  * flags on untouched entries (round 13, the r12 verdict's comparator
  * item). Fix: an optional EXCLUDE REGEX names the entries whose code
  * paths the round's diff touched; they are left out of the SCALE
  * estimate (still judged for flags), so the normalizer reads only the
  * untouched bulk. Both scales print — trimmed (used for banding) and
  * all-entries — and their disagreement is itself the "this round
  * moved a family" signal. Two honest findings from validating this on
  * the r12 history: (1) a robust-statistic alternative (half-sample
  * mode) locks onto whatever cluster happens to be tightest in these
  * broad (±20-40% sub-second noise) ratio distributions — on the
  * r11→r12 pair it read 0.746 vs median 0.822 and manufactured five
  * NEW false flags — rejected; (2) excluding the r12 touched family
  * moved the scale only 0.897 → 0.898, so the r12 false flags were
  * n=5 sampling noise, not normalizer drag. What actually closed them
  * (twice, by hand) was the raw-median-inside-historical-band check —
  * so the tool now runs it: a REGRESSED candidate whose RAW median
  * sits at or below the entry's all-history max (prior runs, same sf)
  * downgrades to WITHIN-HIST instead of flagging. Genuine regressions
  * (b156's 1.77 raw vs a 1.50 history max) still trip. Scale skipped
  * (1.0) when fewer than 8 entries support it.
  *
  * Pure JVM (no Spark session — this reads ~500 JSON lines). Fields are
  * extracted by pattern, matching exactly what Bench writes.
  * `runMain graft.tools.BenchCompare [historyPath] [relThr=1.25] [minAbsDelta=0.3] [oldRun newRun] [excludeRegex]`
  * — the optional explicit run ids re-judge any historical pair.
  */
object BenchCompare {
  private val F = """"(\w+)":("[^"]*"|[-0-9.eE]+)""".r

  private def medianOf(sorted: Seq[Double]): Double =
    if (sorted.size % 2 == 1) sorted(sorted.size / 2)
    else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0

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
    // robust to any minority of genuine per-entry deltas. The TRIMMED
    // estimate additionally drops the round's declared touched set
    // (excludeRegex), so a genuinely-improved family cannot drag the
    // normalizer below the host factor and inflate untouched entries.
    val excludeRe = args.lift(5).map(_.r)
    def ratiosOf(names: Iterable[String]): Seq[Double] = names.toSeq
      .map(k => (o(k)("median").toDouble, n(k)("median").toDouble))
      .collect { case (om, nm) if om > 0 && nm > 0 => nm / om }
      .sorted
    val shared = (o.keySet & n.keySet).toSeq
    val ratios = ratiosOf(shared)
    val trimmedRatios = excludeRe match {
      case Some(re) => ratiosOf(shared.filterNot(re.findFirstIn(_).isDefined))
      case None => ratios
    }
    val allScale = if (ratios.size < 8) 1.0 else medianOf(ratios)
    val scale = if (trimmedRatios.size < 8) 1.0 else medianOf(trimmedRatios)
    println(f"[benchcmp] $oldRun -> $newRun " +
      f"(sf $newestSf, relThr $relThr, run scale $scale%.3fx over " +
      f"${trimmedRatios.size} untouched" +
      (if (excludeRe.isDefined)
         f" / $allScale%.3fx over all ${ratios.size} shared" else "") + ")")
    // the all-history raw envelope per entry (runs BEFORE the new one,
    // same sf): the r11/r12 adjudication pattern — "the raw median sits
    // inside the entry's recorded historical band" — run by the tool
    // instead of by hand (round 13, the r12 verdict's comparator item;
    // two rounds of false flags were closed exactly this way)
    val runOrder = runs.zipWithIndex.toMap
    val priorRuns = runOrder.get(newRun) match {
      case Some(i) => runs.take(i).toSet
      case None => runs.toSet - newRun
    }
    val histMax: Map[String, Double] = atSf
      .filter(r => priorRuns.contains(r("run")))
      .groupBy(_("name"))
      .map { case (k, rs) => k -> rs.map(_("max").toDouble).max }
    var reg, imp, hist = 0
    for (name <- (o.keySet ++ n.keySet).toSeq.sorted) (o.get(name), n.get(name)) match {
      case (None, Some(_)) => println(f"NEW       $name")
      case (Some(_), None) => println(f"GONE      $name")
      case (Some(a), Some(b)) =>
        val (om, olo, ohi) = (a("median").toDouble, a("min").toDouble, a("max").toDouble)
        val raw = b("median").toDouble
        val nm = if (raw >= 0) raw / scale else raw // normalized before banding
        if (om > 0 && nm > ohi && nm > om * relThr && nm - om > minAbsDelta) {
          if (histMax.get(name).exists(raw <= _)) {
            hist += 1
            println(f"WITHIN-HIST $name%-30s $om%7.2f [$olo%.2f, $ohi%.2f] -> $nm%7.2f " +
              f"(raw $raw%.2f <= history max ${histMax(name)}%.2f: sampling noise, not a regression)")
          } else {
            reg += 1
            println(f"REGRESSED $name%-32s $om%7.2f [$olo%.2f, $ohi%.2f] -> $nm%7.2f (${nm / om}%.2fx, raw $raw%.2f)")
          }
        } else if (om > 0 && nm >= 0 && nm < olo && nm < om / relThr && om - nm > minAbsDelta) {
          imp += 1
          println(f"IMPROVED  $name%-32s $om%7.2f [$olo%.2f, $ohi%.2f] -> $nm%7.2f (${nm / om}%.2fx, raw $raw%.2f)")
        }
      case _ => ()
    }
    def tot(m: Map[String, Map[String, String]]) =
      m.values.map(_("median").toDouble).filter(_ >= 0).sum
    println(f"[benchcmp] totals: ${tot(o)}%.1f -> ${tot(n)}%.1f s over " +
      s"${n.size} entries; $reg regressed, $imp improved beyond spread+threshold" +
      (if (hist > 0) s", $hist within-history (auto-adjudicated)" else ""))
  }
}
