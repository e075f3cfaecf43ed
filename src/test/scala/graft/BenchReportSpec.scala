package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[BenchReport]] — the shape of the two bench output channels.
  *
  * The stdout line is the artifact the driver records; rounds 6-7
  * taught that letting diagnostics ride on it (per-rep arrays grew it
  * past 5 KB) breaks the driver's parser silently (parsed=null) while
  * rc stays 0. These pins make that regression a test failure instead
  * of a lost round of benchmark evidence.
  */
class BenchReportSpec extends AnyFunSuite {

  private val names = (1 to 15).map(i => f"q$i%02d_some_longish_query_name")
  // idle-box shape: tight spread, no outlier
  private val full = names.map(n => n -> Seq(0.41, 0.39, 0.43, 0.40, 0.42))
  // one contended pass: every query's rep 3 ran ~5x slow
  private val oneBad = names.map(n => n -> Seq(0.41, 0.39, 2.2, 0.40, 0.42))

  test("stdout line stays compact: no per-rep data, bounded per-query size") {
    val line = BenchReport.renderLine(full, "/root/testdata/sf0.1")
    assert(!line.contains("reps"), "per-rep arrays belong to the detail channel")
    assert(!line.contains("median_queries"), "stat tables belong to the detail channel")
    // ~45 B/query + fixed overhead, with headroom; the driver's
    // observed tail window is 2000 chars and must hold the whole line
    assert(line.length <= 60 * names.size + 200,
      s"stdout line grew to ${line.length} chars — driver parser at risk")
    assert(line.count(_ == '\n') === 0, "must be ONE line")
  }

  test("stdout line is well-formed JSON with the recorded keys") {
    val line = BenchReport.renderLine(full, "/sf")
    // structural sanity without a JSON lib: balanced braces, known keys
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.count(_ == '{') === line.count(_ == '}'))
    for (k <- Seq("\"metric\":", "\"value\":", "\"unit\":", "\"queries\":",
        "\"failed\":", "\"contended\":", "\"anchor_ratio\":", "\"sf\":"))
      assert(line.contains(k), s"missing $k")
  }

  test("anchor heat: a uniformly hot host flips contended via the idle-pin ratio; no pins for the sf -> null ratio") {
    // q01 sf0.1 newest pin is r15 = 0.45 s; a suite reading ~3x that
    // with PERFECTLY tight reps is invisible to the spread probe but
    // loud in the anchor channel (the r16 sf1 failure mode)
    val hot = full ++ Seq(
      "q01_pricing_summary" -> Seq(1.35, 1.34, 1.36, 1.35, 1.35))
    val hotLine = BenchReport.renderLine(hot, "/root/testdata/sf0.1")
    assert(hotLine.contains(""""contended":true"""), hotLine)
    assert("\"anchor_ratio\":(\\d+\\.\\d+)".r.findFirstMatchIn(hotLine)
      .exists(_.group(1).toDouble > 2.5), hotLine)
    // at-pin anchors: contended stays false, ratio ~1
    val cool = full ++ Seq(
      "q01_pricing_summary" -> Seq(0.46, 0.45, 0.44, 0.45, 0.46))
    val coolLine = BenchReport.renderLine(cool, "/root/testdata/sf0.1")
    assert(coolLine.contains(""""contended":false"""), coolLine)
    // an sf with no recorded pins (or no label): ratio null, flag
    // falls back to the spread probe alone
    assert(BenchReport.renderLine(hot, "/sf")
      .contains(""""anchor_ratio":null"""))
  }

  test("queries with no samples are named in failed, not hidden as -1.0") {
    val withDead = full.take(3) ++ Seq(
      "q97_dead_query" -> Seq.empty[Double],
      "q98_dead_query" -> Seq.empty[Double])
    val line = BenchReport.renderLine(withDead, "/sf")
    assert(line.contains(""""failed":["q97_dead_query","q98_dead_query"]"""))
    // the dead queries still appear in the stat map as -1.0 (schema
    // stability for per-query tooling), but the failed list is the
    // explicit signal
    assert(line.contains(""""q97_dead_query":-1.0"""))
  }

  test("healthy suite reports failed:[] and contended:false") {
    val line = BenchReport.renderLine(full, "/sf")
    assert(line.contains(""""failed":[]"""))
    assert(line.contains(""""contended":false"""))
  }

  test("setup/probe split rows ride in the map but never the headline total") {
    val withSplits = full ++ Seq(
      "q118_setup" -> Seq(15.0, 15.1, 15.2, 15.0, 15.1),
      "q118_probe" -> Seq(2.5, 2.5, 2.5, 2.5, 2.5))
    val line = BenchReport.renderLine(withSplits, "/sf")
    assert(line.contains(""""q118_setup":"""), "split rows must be recorded")
    assert(line.contains(""""q118_probe":"""))
    val v = """"value":([-0-9.eE]+)""".r.findFirstMatchIn(line)
      .map(_.group(1).toDouble).getOrElse(fail(s"no value in $line"))
    // total = 15 x 0.40-ish; the 15 s setup row must not be in it
    assert(v < 10.0, s"aux rows leaked into the headline total: $v")
    // nor may a split row become the contention probe (its series
    // would break cross-round probe comparability)
    val contendedSplit = full ++ Seq("q118_probe" -> Seq(0.01, 0.01, 0.09))
    assert(BenchReport.renderLine(contendedSplit, "/sf")
      .contains(""""contended":false"""))
  }

  test("contended box flips the flag via the cheapest-query probe") {
    // cheapest query spread 0.1 -> 0.9 = 9x > 3x
    val contended = full.take(3) ++ Seq("q99_cheapest" -> Seq(0.1, 0.1, 0.9))
    assert(BenchReport.renderLine(contended, "/sf").contains(""""contended":true"""))
  }

  test("intentional-duplicate entries are excluded from dup_adjusted_total and named in notes") {
    val dupName = "q143_incremental_containment_dfguard"
    assert(BenchReport.DupNotes.contains(dupName),
      "the round-12 containment double-run must stay annotated until the bench set changes")
    assert(BenchReport.DupNotes.contains("q146_ivf_store_probe"),
      "the round-13 store-lifecycle entry must stay annotated: its time is " +
        "init+append+teardown, not query-series movement")
    val withDup = full ++ Seq(dupName -> Seq(3.5, 3.5, 3.5, 3.5, 3.5))
    val line = BenchReport.renderLine(withDup, "/sf")
    def num(key: String): Double =
      ("\"" + key + "\":([-0-9.eE]+)").r.findFirstMatchIn(line)
        .map(_.group(1).toDouble).getOrElse(fail(s"no $key in $line"))
    val v = num("value")
    val adj = num("dup_adjusted_total")
    assert(math.abs((v - adj) - 3.5) < 1e-9,
      s"adjusted total must exclude exactly the annotated entry: $v vs $adj")
    assert(line.contains("\"notes\":{\"" + dupName + "\":"),
      "the annotation must ride the artifact, not commit-message prose")
    // a suite without the duplicate (BENCH_ONLY runs) reports no notes
    assert(BenchReport.renderLine(full, "/sf").contains(""""notes":{}"""))
  }

  test("detail channel carries the rep spread and stat tables") {
    val detail = BenchReport.renderDetail(oneBad)
    for (k <- Seq("\"stat\":", "\"median_total\":", "\"min_queries\":",
        "\"median_queries\":", "\"contention_probe\":", "\"idle_pins\":",
        "\"reps\":"))
      assert(detail.contains(k), s"missing $k")
    // the idle reference pins ride the artifact so future rounds diff
    // against idle, not in-suite, figures — and stay well-formed rows
    assert(BenchReport.IdlePins.nonEmpty &&
      detail.contains(""""query":"q118_incremental_containment","sf":"sf1""""))
    assert(detail.contains("[0.41,0.39,2.2,0.4,0.42]"), "raw samples must survive")
  }

  test("aux-row matcher strips exactly the split rows, not real queries named *_probe") {
    // q146_ivf_store_probe is a REAL headline entry whose name happens
    // to end in _probe; a suffix-only matcher silently dropped it from
    // the total (round-13 find). Split rows are bare-prefix qNNN_setup
    // / qNNN_probe and only those may be excluded.
    val withLifecycle = full ++ Seq(
      "q146_ivf_store_probe" -> Seq(4.0, 4.0, 4.0, 4.0, 4.0),
      "q118_probe" -> Seq(2.0, 2.0, 2.0, 2.0, 2.0))
    val line = BenchReport.renderLine(withLifecycle, "/sf")
    def num(key: String): Double =
      ("\"" + key + "\":([-0-9.eE]+)").r.findFirstMatchIn(line)
        .map(_.group(1).toDouble).getOrElse(fail(s"no $key in $line"))
    val base = ("\"value\":([-0-9.eE]+)").r
      .findFirstMatchIn(BenchReport.renderLine(full, "/sf"))
      .map(_.group(1).toDouble).get
    assert(math.abs(num("value") - (base + 4.0)) < 1e-9,
      "q146 must count in the headline total; q118_probe must not")
    // and the DupNotes exclusion (not the aux matcher) takes it back
    // out of the comparable series
    assert(math.abs((num("value") - num("dup_adjusted_total")) - 4.0) < 1e-9)
  }

  test("trimmed stat on the line rejects the one contended pass — and flags it") {
    val line = BenchReport.renderLine(oneBad, "/sf")
    // per-query trimmed median of (0.41,0.39,2.2,0.40,0.42) drops 2.2
    // -> median of (0.39,0.40,0.41,0.42) = 0.40 (lower-of-two); total
    // = 15 * 0.40 — the 2.2s outlier never touches the headline value,
    // while the probe's 5.6x max/min spread still trips the flag so
    // the artifact says not to trust cross-round comparison
    // parse the value instead of substring-matching JVM double
    // formatting (a 15-term 0.4 sum renders 6.000000000000001 — an
    // order-of-summation change must not flip this test)
    val v = """"value":([-0-9.eE]+)""".r.findFirstMatchIn(line)
      .map(_.group(1).toDouble)
      .getOrElse(fail(s"no value field in $line"))
    assert(math.abs(v - 6.0) < 1e-9, line)
    assert(line.contains(""""contended":true"""))
  }
}
