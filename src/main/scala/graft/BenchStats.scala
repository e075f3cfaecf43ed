package graft

/** Pure statistics behind [[Bench]]'s recorded artifact (round 6 —
  * contention-proofing; see Bench's scaladoc for the methodology
  * rationale). Factored out so the math that decides the HEADLINE
  * number is spec-pinned: a regression here silently misreports the
  * engine, which is exactly what round 5's artifact did.
  */
object BenchStats {

  /** Lower median (index (n-1)/2 of the sorted samples); -1 on empty
    * — Bench's sentinel for "query threw on every pass". */
  def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) -1.0 else xs.sorted.apply((xs.size - 1) / 2)

  /** 20%-trimmed median: drop the slowest ⌈20%⌉ samples (never all of
    * them), then take the median of the rest. With 5 interleaved
    * passes, one contended pass cannot touch the reported value —
    * scheduling noise only ever ADDS time, so trimming from the top
    * is safe in a way symmetric trimming is not. */
  def trimmed(xs: Seq[Double]): Double =
    if (xs.isEmpty) -1.0
    else median(xs.sorted.dropRight(math.ceil(xs.size * 0.2).toInt.min(xs.size - 1)))

  /** max/min sample spread, guarded against a zero min. */
  def maxMinRatio(xs: Seq[Double]): Double =
    xs.max / xs.min.max(1e-9)

  /** Contention self-diagnosis on the cheapest query's samples: a
    * fixed-cost sub-second probe has no data-dependent variance, so a
    * >3× spread there is the box, not the engine — the artifact then
    * says not to trust itself. */
  def contended(probeSamples: Seq[Double]): Boolean =
    maxMinRatio(probeSamples) > 3.0
}
