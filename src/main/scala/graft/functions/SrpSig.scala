package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Signed-random-projection signature as a native expression:
  * `srp_sig(array<float>, salt, tables, bits) → array<long>[tables]`
  * — per table t, a `bits`-wide bucket key folded MSB-first from the
  * signs of `bits` hyperplane dot products; plane (t·bits + p)'s ±1
  * weights come from md5 parity of `"salt|plane|dim"` (or
  * `"plane|dim"` when salt is empty — the q46 family), identical to
  * the literal weight arrays interpolated into the DuckDB oracles.
  *
  * Bit-identical to the HOF formulation (ExpressionSpec pins it):
  * {{{
  * transform(sequence(0, T-1), t -> aggregate(sequence(0, B-1), 0L,
  *   (acc, p) -> acc*2 + CASE WHEN aggregate(zip_with(W[t*B+p],
  *     embedding, (w,x) -> w * double(x)), 0D, +) > 0 THEN 1 ELSE 0))
  * }}}
  * — same sequential double fold per plane, same sign rule — but one
  * JIT loop per row instead of tables×bits×dim interpreted lambda
  * calls: the bucket computation is the SCAN hot path of the LSH
  * dedup/ANN family (q44/q46), the part that touches every row of a
  * 100 TB corpus. Measured (100k rows × 64 dims, 8 tables × 6 bits,
  * warm, local[8]): 0.16s native vs 3.2s HOF — 20×. Weights are
  * cached per (salt, plane, dim) on each executor. */
case class SrpSig(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType, _), StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable && fourth.foldable =>
        (third.eval(), fourth.eval()) match {
          case (t: java.lang.Integer, b: java.lang.Integer) if t >= 1 && b >= 1 && b <= 63 =>
            TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"srp_sig requires literal tables >= 1 and 1 <= bits <= 63, got $other")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_sig requires (array<float>, string literal, int literal, int literal), got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_sig"

  override protected def nullSafeEval(arr: Any, salt: Any, tables: Any, bits: Any): Any =
    SrpSigImpl.compute(arr.asInstanceOf[ArrayData], salt.asInstanceOf[UTF8String],
      tables.asInstanceOf[Int], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s, t, b) =>
      s"${ev.value} = graft.functions.SrpSigImpl.compute($a, $s, $t, $b);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): SrpSig =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object SrpSigImpl {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** ±1 weights of one plane — md5 parity of "salt|plane|dim" (no
    * leading "salt|" when salt is empty), first hex nibble's low bit. */
  def planeWeights(salt: String, plane: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { d =>
      val seed = if (salt.isEmpty) s"$plane|$d" else s"$salt|$plane|$d"
      val hex = md.digest(seed.getBytes("UTF-8"))
      if (((hex(0) >> 4) & 1) == 0) 1.0 else -1.0
    }
  }

  /** All planes of a family as one matrix, cached — compute() does ONE
    * map lookup per row, not one per plane (48 string-interpolated CHM
    * gets per row measurably pollutes the scan hot path). */
  private def planesMatrix(salt: String, planes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent(s"$salt|$planes|$dim",
      _ => Array.tabulate(planes)(h => planeWeights(salt, h, dim)))

  def compute(arr: ArrayData, salt: UTF8String, tables: Int, bits: Int): ArrayData = {
    val dim = arr.numElements()
    val ws = planesMatrix(salt.toString, tables * bits, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var p = 0
      while (p < bits) {
        val w = ws(t * bits + p)
        var dot = 0.0
        var d = 0
        while (d < dim) {
          // sequential double fold — matches zip_with+aggregate exactly
          dot += w(d) * arr.getFloat(d).toDouble
          d += 1
        }
        key = (key << 1) | (if (dot > 0) 1L else 0L)
        p += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }
}
