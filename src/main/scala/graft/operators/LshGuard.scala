package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-bucket guard for banded (LSH-style) candidate generators.
  *
  * Every banded near-dup detector in the engine turns "similar docs"
  * into "docs sharing a (band, bv) bucket" and equi-joins the bucket
  * table with itself — the 100 TB-safe shape (shuffle per bucket,
  * never per pair) EXCEPT when one bucket is pathologically wide: a
  * band value shared by k docs emits k²/2 in-bucket candidate pairs,
  * and a near-identical boilerplate corpus (cookie banners, licence
  * headers, templated listings) makes k = 10⁴⁺ real at crawl scale —
  * a single such bucket detonates the candidate join while every
  * plan-shape invariant still holds.
  *
  * The guard: buckets whose occupancy exceeds `cap` are SKIPPED as
  * candidate generators (both join sides), like PPJoin's df ≥ 2 slice
  * but from the opposite end of the frequency spectrum.
  *
  * RECALL CONTRACT (documented, deliberate): a true near-dup pair is
  * lost only if EVERY band where the two docs collide is hot. With
  * b = 8 independent bands a j ≥ 0.8 pair collides in ~5 bands in
  * expectation, so sparse-corpus recall is untouched — the pairs the
  * guard drops are precisely the members of ≥ cap-sized boilerplate
  * families, where per-pair output is useless anyway (k² pairs carry
  * no more information than the family itself). Handle those families
  * upstream/downstream of near-dedup: byte-identical copies via exact
  * dedup (q40/q100 — run it first; it has no width pathology), and
  * near-identical template families via the boilerplate detectors
  * (q95's shingle-df) — which is also what public MinHashLSH practice
  * does (Spark's own MinHashLSH OOMs on such buckets).
  *
  * The occupancy aggregate and the anti-join both key on (band, bv) —
  * the same key the candidate join shuffles on — so the guard reuses
  * that partitioning instead of adding an exchange of its own; the
  * hot-bucket list itself is tiny (≤ |bands| / cap entries) and AQE
  * broadcasts it.
  */
object LshGuard {

  /** Default per-(band, bv) occupancy cap. Gate-data headroom is
    * measured, not hoped: the widest q42 bucket at sf0.1 holds 4 docs
    * (sf0.01: 3), so 256 is ~60× above anything the oracle corpus
    * produces while bounding a pathological bucket's candidate
    * output at 256²/2 ≈ 33k pairs. Override per session with
    * `graft.lsh.maxBucket`. */
  val DefaultMaxBucket = 256

  def maxBucket(s: SparkSession): Int =
    s.conf.getOption("graft.lsh.maxBucket").map(_.toInt)
      .getOrElse(DefaultMaxBucket)

  /** `(band, bv)` keys whose occupancy in `occupancy` exceeds `cap`.
    * Pass the UNION of both join sides' band tables when the
    * candidate join is not a self-join (incremental delta vs store):
    * what detonates is the product of the two sides' widths, so the
    * guard caps their combined occupancy. */
  def hotBuckets(occupancy: DataFrame, cap: Int): DataFrame = {
    require(cap >= 1, s"bucket cap must be >= 1, got $cap")
    occupancy.groupBy(col("band"), col("bv"))
      .agg(count(lit(1)).as("__w"))
      .filter(col("__w") > cap)
      .select(col("band"), col("bv"))
  }

  /** `bands` minus the rows landing in `hot` buckets. */
  def prune(bands: DataFrame, hot: DataFrame): DataFrame =
    bands.join(hot, Seq("band", "bv"), "left_anti")

  /** Self-join convenience: prune `bands` by its own occupancy. */
  def pruneSelf(bands: DataFrame, cap: Int): DataFrame =
    prune(bands, hotBuckets(bands, cap))
}
