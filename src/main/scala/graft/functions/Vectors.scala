package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Column-level vector math over `array<float>` embeddings.
  *
  * All helpers are pure Catalyst higher-order-function expressions
  * (`zip_with`/`aggregate`) — codegen'd, no UDFs, no shuffle: the
  * 100 TB-safe building block for similarity search over the
  * `embeddings` table (extension surface; the reference's only vector
  * math is the 784-float feature build, SURVEY.md §2.8 M1,
  * reference `utils/PredictionUtils.java:35-57`).
  *
  * Elements are cast to double before any arithmetic so Spark and the
  * DuckDB oracle accumulate in the same precision and order
  * (sequential left fold).
  */
object Vectors {

  /** Σ aᵢ·bᵢ as double; sequential fold order. Native [[VecDot]]
    * expression (JIT loop) — bit-identical to [[dotHof]], ~10× faster
    * (Spark HOFs interpret their lambdas per element). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The pure-HOF formulation — kept as the semantic reference for
    * [[dot]] (equality spec'd in ExpressionSpec). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ as double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Σ (aᵢ−bᵢ)² as double (sequential fold; null on width mismatch or
    * null element — exact zip_with semantics). Native [[VecL2d2]] JIT
    * loop; the HOF reference is [[l2d2Hof]] (equality spec'd in
    * ExpressionSpec). */
  def l2d2(a: Column, b: Column): Column =
    ColumnBridge.column(VecL2d2(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The pure-HOF formulation — the semantic reference for [[l2d2]]. */
  def l2d2Hof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dlt = x.cast("double") - y.cast("double"); dlt * dlt
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Σᵢ lut[i][codes[i]] (1-based try_element_at addressing) — the PQ
    * ADC fold as the native [[AdcFold]] JIT loop; HOF reference is
    * [[adcFoldHof]] (equality spec'd in ExpressionSpec, including
    * out-of-range / negative / null codes). */
  def adcFold(codes: Column, lut: Column): Column =
    ColumnBridge.column(AdcFold(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut)))

  /** The pure-HOF formulation — the semantic reference for [[adcFold]]. */
  def adcFoldHof(codes: Column, lut: Column): Column =
    aggregate(
      zip_with(codes, lut, (code, row) => try_element_at(row, code + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** struct(cell, dist2): first argmin centroid + its L2² — the
    * k-means assignment kernel as ONE native [[L2ArgMin]] expression
    * (the HOF chain it replaces bit-for-bit lives in
    * [[graft.operators.KMeans]]'s ExpressionSpec reference). `cents`
    * must be an `array<array<double>>` column (normally a literal). */
  def l2ArgMin(vec: Column, cents: Column): Column =
    ColumnBridge.column(L2ArgMin(
      ColumnBridge.expression(vec), ColumnBridge.expression(cents)))

  /** cos(a,b) given precomputed norms (avoids recomputing ‖·‖ per pair
    * in the O(n²) join — precompute per side, then one dot per pair).
    *
    * A ZERO denominator (a zero-norm vector on either side — the
    * degenerate row every real corpus contains) yields NULL, not an
    * ANSI DIVIDE_BY_ZERO error: the q113 `nullif` rule, applied at
    * the one shared definition so every cosine consumer inherits the
    * same totality. NULL then behaves exactly as the undefined
    * similarity should — `>= t` filters drop it, `ORDER BY cosine
    * DESC` ranks it last in BOTH engines (gate corpora carry no
    * zero-norm vectors, so oracle equality is untouched; the
    * degenerate-row contract is DegenerateInputSpec's). */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / nullif(normA * normB, lit(0.0))
}
