package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared element accessor + the Spark-SQL double total order, so the
  * two L2 expressions below stay bit-identical to their HOF reference
  * formulations (ExpressionSpec pins both equalities).
  *
  * Why these exist (round 17, guide §1.2 step 2 / §4): Spark's
  * higher-order functions (`zip_with`, `aggregate`, `transform`)
  * evaluate their lambdas INTERPRETED, one invocation per element —
  * the L2 hot paths (IVF probe candidate scoring, k-means assignment)
  * were paying k·d or d interpreted calls plus a zipped-array
  * allocation per row. Same move as [[VecDot]]/[[SrpSig]]/
  * [[WordShingleHashes]]: one JIT'd loop, identical arithmetic
  * (sequential double fold, same cast points). */
object VecL2Impl {

  /** Spark SQL's double comparison (SQLOrderingUtil.compareDoubles):
    * IEEE `<`/`>` first, so -0.0 == 0.0; NaN greatest and equal to
    * itself via Double.compare on the leftover cases. */
  def sqlCompare(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1 else if (x == y) 0
    else java.lang.Double.compare(x, y)

  /** Σ (double(aᵢ) − double(bᵢ))², sequential fold — bit-identical to
    * `aggregate(zip_with(a, b, (x,y) -> (double(x)-double(y))²),
    * 0.0D, +)`: a length mismatch (zip_with pads the short side with
    * null) or any null element nulls the whole sum. Boxed return so
    * null survives the JNI-free codegen call. */
  def l2d2(a: ArrayData, aFloat: Boolean, b: ArrayData,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  /** The ADC fold — see [[AdcFold]] for the parity contract. */
  def adcFold(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (lut.numElements() != m) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i) || lut.isNullAt(i)) return null
      val row = lut.getArray(i)
      val n = row.numElements()
      // element_at addressing: 1-based from the front, negative from
      // the END, |idx| > n invalid (null under try_element_at) — and
      // idx 0 THROWS even in try mode (INVALID_INDEX_OF_ZERO; the HOF
      // reference behaves identically, ExpressionSpec pins it)
      val idx = codes.getInt(i) + 1
      val pos =
        if (idx > 0 && idx <= n) idx - 1
        else if (idx < 0 && -idx <= n) n + idx
        else if (idx == 0)
          org.apache.spark.sql.graft.ErrorBridge.invalidIndexOfZero()
        else return null
      if (row.isNullAt(pos)) return null
      s += row.getDouble(pos)
      i += 1
    }
    s
  }

  /** Argmin cell + its dist² against an array of centroids —
    * bit-identical to the HOF reference
    * `d2 = transform(cents, c -> aggregate(zip_with(c, v, ...), 0D, +));
    *  (cell, dist2) = (array_position(d2, array_min(d2)) - 1,
    *                   array_min(d2))`:
    * per-centroid sums in centroid order, null entries (width
    * mismatch / null element) skipped exactly as array_min skips
    * nulls, ties to the FIRST minimal centroid (array_position
    * returns the first match), doubles compared in Spark's SQL order.
    * All-null distances → (null, null) struct fields, as the HOF
    * chain yields. */
  def l2ArgMin(v: ArrayData, vFloat: Boolean, cents: ArrayData): InternalRow = {
    val k = cents.numElements()
    val n = v.numElements()
    var best = 0.0
    var bestIdx = -1
    var c = 0
    while (c < k) {
      if (!cents.isNullAt(c)) {
        val cent = cents.getArray(c)
        if (cent.numElements() == n) {
          var s = 0.0
          var ok = true
          var i = 0
          while (ok && i < n) {
            if (cent.isNullAt(i) || v.isNullAt(i)) ok = false
            else {
              val x = cent.getDouble(i)
              val y = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
              val d = x - y
              s += d * d
              i += 1
            }
          }
          if (ok && (bestIdx < 0 || sqlCompare(s, best) < 0)) {
            best = s
            bestIdx = c
          }
        }
      }
      c += 1
    }
    if (bestIdx < 0) InternalRow(null, null)
    else InternalRow(bestIdx, best)
  }
}

/** Native ADC fold: Σᵢ lut[i][codes[i]+1] (1-based, try_element_at
  * semantics) — the PQ asymmetric-distance inner loop. Bit-identical
  * to `aggregate(zip_with(codes, lut, (c, row) ->
  * try_element_at(row, c + 1)), 0.0D, +)`: a length mismatch between
  * codes and lut, a null code, a null LUT row, or an out-of-range
  * lookup (index 0 from code −1; |index| > row length — negative
  * indexes address from the END, element_at's contract) nulls the
  * whole sum, exactly as the HOF's null poisons its aggregate
  * (ExpressionSpec pins the equality on all those edges). */
case class AdcFold(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_fold requires (array<int>, array<array<double>>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_fold"

  override protected def nullSafeEval(c: Any, l: Any): Any =
    VecL2Impl.adcFold(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val tmp = ctx.freshName("adc")
      s"""java.lang.Double $tmp = graft.functions.VecL2Impl.adcFold($c, $l);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcFold = copy(left = newLeft, right = newRight)
}

/** Native L2 squared distance over two float/double array columns →
  * double (null on width mismatch or null element — the exact
  * zip_with+aggregate semantics; see [[VecL2Impl.l2d2]]). */
case class VecL2d2(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(t: DataType): Option[Boolean] = t match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOk(left.dataType), elemOk(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_l2d2 requires array<float|double> on both sides, got " +
          s"(${left.dataType.simpleString(10)}, ${right.dataType.simpleString(10)})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2d2"

  private lazy val aFloat = elemOk(left.dataType).get
  private lazy val bFloat = elemOk(right.dataType).get

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecL2Impl.l2d2(a.asInstanceOf[ArrayData], aFloat,
      b.asInstanceOf[ArrayData], bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("l2d2")
      s"""java.lang.Double $tmp =
         |  graft.functions.VecL2Impl.l2d2($a, $aFloat, $b, $bFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecL2d2 = copy(left = newLeft, right = newRight)
}

/** Native k-means assignment: (vec, centroids) →
  * struct(cell int, dist2 double) — the first centroid (in order)
  * minimizing the L2² distance under Spark's double ordering; see
  * [[VecL2Impl.l2ArgMin]] for the exact HOF-chain parity contract. */
case class L2ArgMin(left: Expression, right: Expression) extends BinaryExpression {

  private def vecOk(t: DataType): Option[Boolean] = t match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (vecOk(left.dataType), right.dataType) match {
      case (Some(_), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"l2_argmin requires (array<float|double>, array<array<double>>), got " +
          s"(${left.dataType.simpleString(10)}, ${right.dataType.simpleString(10)})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = true),
    StructField("dist2", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "l2_argmin"

  private lazy val vFloat = vecOk(left.dataType).get

  override protected def nullSafeEval(v: Any, cents: Any): Any =
    VecL2Impl.l2ArgMin(v.asInstanceOf[ArrayData], vFloat,
      cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.VecL2Impl.l2ArgMin($v, $vFloat, $c);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): L2ArgMin = copy(left = newLeft, right = newRight)
}
