package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over `array<float>` embedding columns —
  * the TRAIN step of an IVF index (q47 demonstrates the probe side
  * over fixed cells; this learns the cells), and the general
  * "centroid the corpus" primitive (coreset build, dataset
  * cartography, dedup-cluster summarization).
  *
  * Per iteration, ONE distributed job:
  *  - assignment is ROW-LOCAL: the k centroids travel as a plan
  *    literal (k·d doubles — KBs for any practical k), each row
  *    computes its squared distances via codegen'd HOFs and takes the
  *    argmin; no join, no shuffle of vectors;
  *  - the update is a groupBy(cell) running [[VectorMean]] — a
  *    mergeable typed Aggregator whose buffer is one (Σ-vector, n)
  *    pair, so the exchange carries at most k·(d+1) doubles per
  *    partition (the map-side partial), never the vectors themselves;
  *  - the same pass folds in Σ min-dist², so convergence is observed
  *    for free (`Model.sseHistory`, non-increasing by Lloyd's
  *    argument — each assignment uses the centroids that minimize the
  *    previous assignment's SSE, each mean minimizes its cell's).
  *
  * Determinism: seeding is the k smallest `xxhash64(id)` rows (no
  * RNG, stable across runs/partitionings); argmin ties break to the
  * first centroid (`array_position` semantics); the mean's
  * element-wise sums are doubles accumulated per partition then
  * merged — floating-point sum order varies with partitioning like
  * every distributed mean, so centroids are deterministic given a
  * fixed partitioning (exact cross-run equality is spec'd; bit-parity
  * across DIFFERENT partitionings is not promised, same contract as
  * Spark's own avg).
  *
  * Empty cells keep their previous centroid (the standard Lloyd
  * fallback; at k ≪ n with hash seeding this is rare).
  *
  * Degenerate vectors (NULL, wrong width vs the trained dim, a NULL
  * element, a NaN/Inf element) are corrupt-DROPPED at the assignment
  * seam in both [[train]] and [[assign]] — the q55/q58 discipline: a
  * mismatched `zip_with` folds to a null distance (null-cell NPE in
  * the update, or a silently vanishing groupBy row), and a NaN/Inf
  * element makes EVERY distance non-finite, so the argmin cell is
  * undefined (round 13: previously such a row still assigned — to
  * whatever cell NaN comparison semantics happened to pick — and
  * poisoned that cell's mean in train and its day's drift stats in
  * [[IvfStore.driftReport]]).
  *
  * At 100 TB: the caller caches (or samples) the training frame —
  * each iteration is one scan; the standard discipline is train on a
  * sample (a few million vectors), then one final [[assign]] pass
  * over the full corpus. Driver traffic is k·(d+1) doubles per
  * iteration. */
object KMeans {

  /** (Σ element-wise, count) — the mergeable mean buffer. */
  case class MeanBuf(sum: Array[Double], n: Long)

  /** Element-wise mean of double-array vectors as a typed Aggregator:
    * map-side partials hold one (Σ, n) per (cell, partition). */
  final class VectorMean extends Aggregator[Seq[Double], MeanBuf, Seq[Double]] {
    override def zero: MeanBuf = MeanBuf(Array.emptyDoubleArray, 0L)
    // reduce/merge MUTATE the left buffer's sum array in place (round
    // 17): Spark's aggregation owns that buffer exclusively between
    // calls (ObjectHashAggregate keeps it as a live object; sort-based
    // fallback deserializes a fresh copy per row-group), so the old
    // per-row defensive clone was a d-wide alloc+copy on EVERY input
    // row. Arithmetic (element order, accumulation order) unchanged.
    override def reduce(b: MeanBuf, v: Seq[Double]): MeanBuf =
      if (b.n == 0L) MeanBuf(v.toArray, 1L)
      else {
        val s = b.sum
        var i = 0
        while (i < s.length) { s(i) += v(i); i += 1 }
        MeanBuf(s, b.n + 1L)
      }
    override def merge(x: MeanBuf, y: MeanBuf): MeanBuf =
      if (x.n == 0L) y
      else if (y.n == 0L) x
      else {
        val s = x.sum
        var i = 0
        while (i < s.length) { s(i) += y.sum(i); i += 1 }
        MeanBuf(s, x.n + y.n)
      }
    override def finish(b: MeanBuf): Seq[Double] =
      if (b.n == 0L) Seq.empty else b.sum.toSeq.map(_ / b.n)
    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Trained centroids plus the per-iteration Σ min-dist² trace. */
  case class Model(centroids: Seq[Array[Double]], sseHistory: Seq[Double])

  /** struct(cell, dist2) of `vec` against `cents` — the assignment
    * kernel, as the native [[graft.functions.L2ArgMin]] JIT loop
    * (round 17, guide §4): the HOF chain it replaces bit-for-bit
    * (`transform(cents, c -> aggregate(zip_with(c, vec, ...), 0D, +))`
    * + `array_min` + `array_position`) interpreted its lambdas k·d
    * times per row and allocated k zipped arrays — the dominant
    * per-row cost of every assign pass (ExpressionSpec pins the
    * equality, including argmin tie-break and corrupt-row nulls). */
  private def argMinCol(cents: Seq[Array[Double]], vec: Column): Column =
    graft.functions.Vectors.l2ArgMin(vec,
      array(cents.map(c => lit(c)): _*))

  /** Σ x² of the vector as one row-local HOF — the finite-vector
    * probe: a NaN element NaNs it, an Inf element Infs it, a NULL
    * element NULLs it (null acc propagates), so ONE predicate pair
    * (`!isnan(n2) && n2 < Inf`, null-rejecting by three-valued
    * filter logic) covers every element pathology. The q113
    * discipline, applied at the assignment seam. */
  private def sumSq(vecCol: String): Column =
    aggregate(col(vecCol), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Rows whose vector is usable against `dim`-wide centroids —
    * the corrupt-DROP seam (q55/q58 discipline): NULL or wrong-width
    * vectors can't be assigned a cell (`zip_with` against a
    * mismatched width folds to a null distance), and a NaN/Inf/NULL
    * ELEMENT makes every distance non-finite or null so the argmin
    * cell is undefined (see [[sumSq]]) — all are cut HERE, visibly,
    * instead of surfacing as a null-cell NPE in the update step,
    * silently vanishing from a groupBy, or landing in an arbitrary
    * cell that probes then scan in vain. Shared across the engine
    * (round 13): [[IvfStore.recallReport]]'s query sampling and the
    * q146 gate filter reuse THIS predicate, so a future change to
    * what "usable" means (say, an overflow-to-Inf allowance) cannot
    * silently diverge the write path, the monitors, and the oracle
    * gate — the DuckDB oracles mirror it as
    * `len(v) = dim AND no-null-element AND isfinite(list_sum(x²))`. */
  private[graft] def usable(vecCol: String, dim: Int): Column = {
    val n2 = sumSq(vecCol)
    col(vecCol).isNotNull && size(col(vecCol)) === dim &&
      !isnan(n2) && n2 < lit(Double.PositiveInfinity)
  }

  /** `df`'s usable rows (NULL/wrong-dim vectors corrupt-DROPPED, see
    * [[usable]]) plus `cell` (0-based int; argmin ties break to the
    * first centroid) and `dist2` (squared distance to that cell's
    * centroid) — the final full-corpus pass, and the IVF
    * cell-assignment step. The k·d distance transform appears in both
    * derived columns of ONE projection, so whole-stage codegen's
    * common-subexpression elimination evaluates it once per row. */
  def assign(df: DataFrame, cents: Seq[Array[Double]], vecCol: String): DataFrame = {
    require(cents.nonEmpty, "cannot assign against zero centroids")
    val ac = argMinCol(cents, col(vecCol))
    df.filter(usable(vecCol, cents.head.length))
      .withColumns(Map(
        "dist2" -> ac.getField("dist2"),
        "cell" -> ac.getField("cell")))
  }

  /** Lloyd's k-means. `df` is scanned once for seeding plus once per
    * iteration — cache it (or train on a sample) when it isn't a
    * cheap parquet scan. */
  def train(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5): Model = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._

    // deterministic seeds: the k hash-smallest NON-NULL rows (uniform
    // over the corpus, independent of partitioning/row order). The
    // trained dim is the MAJORITY width over 2k candidates — a
    // corrupt wrong-width row that happens to hash low must not
    // define the dim and drop the whole corpus; rows off the majority
    // width are corrupt-dropped per iteration (see [[usable]]). Ties
    // break deterministically (higher count, then narrower width). A
    // seed set shorter than k (corrupt candidates filtered) stays
    // usable — Lloyd's doesn't require exactly k non-empty cells.
    // The finite guard (round 13) keeps a NaN/Inf/null-element vector
    // from becoming a seed CENTROID — one poisoned seed makes every
    // distance to it NaN for the whole corpus, far worse than the
    // per-row pathology [[usable]] cuts.
    val seedN2 = sumSq(vecCol)
    val seedCands: Seq[Array[Double]] = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0 &&
        !isnan(seedN2) && seedN2 < lit(Double.PositiveInfinity))
      .select(col(vecCol).cast("array<double>").as("v"),
        xxhash64(col(idCol)).as("h"))
      .orderBy($"h".asc).limit(2 * k)
      .select($"v").as[Seq[Double]].collect().toSeq.map(_.toArray)
    require(seedCands.nonEmpty, "cannot seed k-means from an empty frame")
    val dim = seedCands.groupBy(_.length).toSeq
      .maxBy { case (w, g) => (g.size, -w) }._1
    var cents = seedCands.filter(_.length == dim).take(k)

    val meanAgg = udaf(new VectorMean,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    val sse = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      val ac = argMinCol(cents, col(vecCol))
      // one projection: codegen subexpression elimination evaluates
      // the native argmin once per row (valid now that the kernel is
      // a codegen expression — the old HOF chain was CodegenFallback)
      val stats = df
        .filter(usable(vecCol, dim))
        .select(col(vecCol).cast("array<double>").as("v"),
          ac.getField("dist2").as("d2"),
          ac.getField("cell").as("cell"))
        .groupBy($"cell")
        .agg(meanAgg($"v").as("mean"), sum($"d2").as("cell_sse"))
        .collect() // k rows of (cell, d-vector, scalar) — bounded
      sse += stats.map(_.getDouble(2)).sum
      val means = stats.map(r =>
        r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty cells (absent from the agg) keep their previous centroid
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    Model(cents, sse.result())
  }
}
