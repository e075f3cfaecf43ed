package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained product-quantization codebooks: `m` subspaces of
  * `dim / m` dims each, `codebooks(s)` the subspace-`s` codewords
  * (each `subDim` wide, ≤ `k` of them). Codes index INTO
  * `codebooks(s)` 0-based. Jégou/Douze/Schmid PQ (TPAMI 2011) —
  * extension surface; the reference has no vector code
  * (nearest is the 784-float feature build, SURVEY.md §2.8 M1).
  */
final case class PqModel(dim: Int, m: Int, codebooks: Seq[Seq[Seq[Double]]]) {
  require(m >= 1 && dim % m == 0,
    s"dim $dim must be divisible by m $m")
  require(codebooks.length == m,
    s"expected $m codebooks, got ${codebooks.length}")
  def subDim: Int = dim / m
  /** Bytes per encoded vector at array<int> codes vs array<float>
    * raw — the memory-compression claim, used in scaladoc/specs. */
  def codeInts: Int = m
}

/** Product quantization + asymmetric-distance (ADC) scoring — the
  * memory side of the 100 TB ANN story.
  *
  * [[IvfStore]] bounds the PAIR COUNT a probe touches (cell pruning
  * at the file index); PQ bounds the BYTES AND FLOPS per pair: an
  * encoded corpus row is `m` small ints (m=8 → 8 codes ≈ 8–32 bytes)
  * instead of `dim` floats (dim=64 → 256 bytes), and scoring a pair
  * is `m` table lookups + adds instead of `dim` multiply-adds. The
  * two compose: IVF prunes which rows are scanned, PQ shrinks what a
  * scanned row costs. At 100 TB the encoded corpus is ~32× smaller
  * than the float corpus — the difference between an ANN probe that
  * reads archive parquet and one that fits in executor memory.
  *
  * Semantics (all row-local, zero-shuffle except the final top-k
  * window, which shuffles |Q|·topK-bounded candidates):
  *  - [[ProductQuantizer.train]]: per-subspace Lloyd's k-means via
  *    [[KMeans.train]] on `slice(vec)` projections — m driver-
  *    orchestrated trains over ONE cached, optionally hash-sampled
  *    projection of the corpus (`graft.pq.maxTrainRows`, the
  *    [[IvfStore]] bounded-retrain discipline: deterministic
  *    `xxhash64(id) % ceil(n/cap) == 0` slice, row-local, no sort).
  *  - [[ProductQuantizer.encode]]: per row, per subspace, the argmin
  *    codeword by squared L2 (ties to the FIRST codeword — the
  *    [[KMeans.assign]] tie rule). One projection of HOFs over
  *    literal codebooks; no shuffle, no UDF.
  *  - [[ProductQuantizer.adcTopK]]: queries stay FLOAT (asymmetric):
  *    per query one m×|codebook| lookup table of subspace distances
  *    is computed once, then every (query, code-row) pair folds
  *    `m` `element_at` lookups. Approximate distance =
  *    exact distance to the RECONSTRUCTION — `adcTopK` equals
  *    brute-force L2 top-k over [[ProductQuantizer.reconstruct]]ed
  *    vectors, an exact identity spec'd in PqSpec, so approximation
  *    error lives entirely in the quantizer, never in the scorer.
  *
  * Degenerate inputs (NULL / wrong-width / NaN/Inf-element vectors)
  * corrupt-DROP at every seam via [[KMeans.usable]] — the engine-wide
  * q55/q58 discipline; a poisoned vector must not define a codeword
  * (train), take an undefined argmin cell (encode), or rank first in
  * every probe (NaN orders above all doubles in Spark).
  *
  * The oracle-gated siblings are q147/q148 (SimilarityQueries): same
  * encode/ADC arithmetic with a deterministic SAMPLED codebook
  * (`vec_id % 25 = 3` — no k-means) so DuckDB reproduces the exact
  * result; THIS operator is the trained path those queries pin the
  * semantics of.
  */
object ProductQuantizer {

  /** Mirrors `graft.ivf.maxTrainRows`: k-means FLOPS on an archive-
    * scale corpus must be bounded by a deterministic sample, never by
    * hoping the caller remembered to. `<= 0` disables. */
  val MaxTrainRowsConf = "graft.pq.maxTrainRows"
  val DefaultMaxTrainRows = 4000000L

  /** Squared L2 between two array columns, element arithmetic in
    * double, sequential left fold — the same formulation the q147
    * oracle evaluates, so trained and sampled paths share semantics.
    * Native [[graft.functions.VecL2d2]] JIT loop since round 17 —
    * bit-identical to the zip_with+aggregate HOF it replaces
    * (ExpressionSpec pins the equality). */
  private[graft] def d2(a: Column, b: Column): Column =
    graft.functions.Vectors.l2d2(a, b)

  private def subSlice(vec: Column, s: Column, subDim: Int): Column =
    slice(vec, s * lit(subDim) + lit(1), lit(subDim))

  /** Train per-subspace codebooks. `df` is projected once to
    * (id, vec), hash-sampled past the conf cap, cached for the
    * m × (iters+1) k-means scans, and unpersisted. `k` ≤ 256 is the
    * classic byte-code regime; larger k is allowed (codes are ints).
    */
  def train(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int = 5): PqModel = {
    require(m >= 1 && dim % m == 0, s"dim $dim must be divisible by m $m")
    val subDim = dim / m
    val spark = df.sparkSession
    val cap = spark.conf.getOption(MaxTrainRowsConf).map(_.toLong)
      .getOrElse(DefaultMaxTrainRows)
    val usableRows = df.filter(KMeans.usable(vecCol, dim))
      .select(col(idCol).as("__pq_id"), col(vecCol).as("__pq_vec"))
    val base0 =
      if (cap <= 0) usableRows
      else {
        val n = usableRows.count()
        if (n <= cap) usableRows
        else {
          val every = math.ceil(n.toDouble / cap).toLong
          usableRows.filter(pmod(xxhash64(col("__pq_id")), lit(every)) === 0)
        }
      }
    val base = base0.persist()
    try {
      require(!base.isEmpty, "cannot train PQ codebooks from an empty frame")
      val books = (0 until m).map { s =>
        val sub = base.select(col("__pq_id"),
          slice(col("__pq_vec"), s * subDim + 1, subDim).as("__pq_sub"))
        KMeans.train(sub, "__pq_id", "__pq_sub", k = k, iters = iters)
          .centroids.map(_.toSeq)
      }
      PqModel(dim, m, books)
    } finally { base.unpersist(); () }
  }

  private def cbLit(model: PqModel): Column = typedlit(model.codebooks)

  /** Encoded frame: usable rows of `df` plus `outCol: array<int>` of
    * length `m` (0-based codeword indices). Row-local, zero-shuffle. */
  def encode(df: DataFrame, model: PqModel, vecCol: String,
      outCol: String = "pq_codes"): DataFrame = {
    val cb = cbLit(model)
    df.filter(KMeans.usable(vecCol, model.dim))
      .withColumn(outCol,
        transform(sequence(lit(0), lit(model.m - 1)), s => {
          val d2s = transform(element_at(cb, s + 1), c =>
            d2(subSlice(col(vecCol), s, model.subDim), c))
          (array_position(d2s, array_min(d2s)) - 1).cast("int")
        }))
  }

  /** The decoded approximation: `array<double>[dim]` rebuilt from the
    * codes — `adcTopK`'s distances are EXACT distances to this. */
  def reconstruct(model: PqModel, codesCol: Column): Column = {
    val cb = cbLit(model)
    flatten(transform(sequence(lit(0), lit(model.m - 1)), s =>
      element_at(element_at(cb, s + 1),
        element_at(codesCol, s + 1) + 1)))
  }

  /** ADC top-k: float `queries` against the encoded `corpus`.
    * Per query row, ONE lookup table (m × |codebook| subspace
    * distances to the query's float subvectors) is computed in a
    * projection; the corpus then streams through a chunk-broadcast
    * cross join folding `m` lookups per pair — per-pair cost is m
    * adds, per-corpus-row memory is the code array, and the corpus
    * side never shuffles (the final rank window partitions by query
    * over candidate rows only). Chunking reuses the ANN family's
    * guarded broadcast (`graft.maxBroadcastRows`): chunks union
    * BEFORE the window, so results are independent of chunk count.
    *
    * Returns (qIdCol, idCol, adc_d2, rank ≤ topK), ranked by ADC
    * distance asc then corpus id asc. Self-pairs are NOT excluded —
    * the caller decides whether query ids live in the corpus. */
  def adcTopK(corpus: DataFrame, idCol: String, codesCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      model: PqModel, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val cb = cbLit(model)
    val qLut = queries.filter(KMeans.usable(qVecCol, model.dim))
      .select(col(qIdCol),
        transform(sequence(lit(0), lit(model.m - 1)), s =>
          transform(element_at(cb, s + 1), c =>
            d2(subSlice(col(qVecCol), s, model.subDim), c)))
          .as("__pq_lut"))
    val chunks = graft.queries.SimilarityQueries.broadcastChunks(
      qLut, col(qIdCol), "PQ ADC query set")
    val scored = chunks.map { q =>
      // hand-made corpora guard: a NULL / wrong-width code array
      // nulls the fold — and a null distance would rank FIRST in the
      // asc window (Spark sorts nulls first), so corrupt rows are
      // dropped here, the engine's corrupt-drop seam discipline
      corpus.select(col(idCol), col(codesCol))
        .filter(col(codesCol).isNotNull && size(col(codesCol)) === model.m)
        .crossJoin(q)
        .select(col(qIdCol), col(idCol),
          // native JIT ADC fold — bit-identical to the zip_with +
          // try_element_at HOF (out-of-range codes null the score
          // instead of killing the probe; see Vectors.adcFold)
          graft.functions.Vectors.adcFold(col(codesCol), col("__pq_lut"))
            .as("adc_d2"))
    }.reduce(_ union _)
    scored
      .filter(col("adc_d2").isNotNull) // out-of-range code → null lookup
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(qIdCol))
          .orderBy(col("adc_d2").asc, col(idCol).asc)))
      .filter(col("rank") <= topK)
  }
}
