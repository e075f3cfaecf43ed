package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual-hash-style signature over an opaque payload as one
  * native expression: `byte_grid_dhash(bin) → long` — the dHash idea
  * (public: gradient hash over a downsampled grid, widely documented
  * for image near-dup) applied to the RAW BYTE STREAM, so it is
  * codec-independent: no decoder needed, which is exactly what makes
  * it usable at the engine's multimodal seam where payloads are
  * opaque `binary` (swap in a real decode → pixel grid and the
  * banding/verify pipeline downstream is unchanged).
  *
  * Signature: the payload is cut into 64 equal cells
  * (cell i = bytes [⌊i·len/64⌋, ⌊(i+1)·len/64⌋)); bit i (0 ≤ i < 63)
  * is set iff mean(cell i) > mean(cell i+1) — a 63-bit gradient
  * fingerprint. Means compare EXACTLY via cross-multiplication
  * (sumᵢ·nᵢ₊₁ > sumᵢ₊₁·nᵢ — integer math, so the DuckDB oracle can
  * reproduce the signature bit-for-bit from character codes; no
  * float divide). Empty cells (len < 64) have sum = n = 0, making
  * both products 0 → bit unset, deterministically; the gated queries
  * filter to len ≥ 64 where every cell is non-empty. Overflow-safe
  * for payloads < ~256 MB (sum ≤ 255·(len/64+1), n ≤ len/64+1).
  *
  * Robustness profile (why gradients, not raw means): a localized
  * byte edit perturbs one or two cells → ≤ 4 signature bits, while
  * global brightness-style shifts (every byte +c) preserve all
  * gradients — the classic dHash trade. A length change re-bins
  * every cell, so this detects near-twin payloads of similar size
  * (the post-exact-dedup case), not arbitrary crops.
  *
  * Row-local, one JIT loop per row, no allocation beyond two 64-long
  * arrays; stays inside whole-stage codegen via [[doGenCode]].
  */
case class ByteGridHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_grid_dhash requires binary, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "byte_grid_dhash"

  override protected def nullSafeEval(bin: Any): Any =
    ByteGridHashImpl.compute(bin.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.ByteGridHashImpl.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): ByteGridHash =
    copy(child = newChild)
}

object ByteGridHashImpl {
  val Cells = 64
  /** Signature width in bits (adjacent-cell gradients). */
  val Bits: Int = Cells - 1

  def compute(b: Array[Byte]): Long = {
    val len = b.length
    val sums = new Array[Long](Cells)
    val ns = new Array[Long](Cells)
    var i = 0
    while (i < Cells) {
      // long multiply BEFORE divide: i*len would overflow int for
      // payloads > ~33 MB
      val lo = (i.toLong * len / Cells).toInt
      val hi = ((i + 1).toLong * len / Cells).toInt
      var s = 0L
      var p = lo
      while (p < hi) { s += (b(p) & 0xff); p += 1 }
      sums(i) = s
      ns(i) = (hi - lo).toLong
      i += 1
    }
    gradientSig(sums, ns)
  }

  /** The 63-bit adjacent-cell gradient over 64 (sum, count) cells —
    * factored out of [[compute]] so a REAL decoder
    * ([[graft.ops.PayloadDecoder]], round 11) can feed pixel-grid
    * luma cells through the IDENTICAL signature definition the raw
    * byte path uses: downstream banding/verify/store code is shared
    * bit-for-bit, only the cell source differs. Cross-multiplied
    * integer compare — no float divide, empty cells (count 0) compare
    * 0 > 0 = false deterministically. */
  def gradientSig(sums: Array[Long], ns: Array[Long]): Long = {
    require(sums.length == Cells && ns.length == Cells,
      s"gradient signature needs exactly $Cells cells")
    var sig = 0L
    var i = 0
    while (i < Bits) {
      if (sums(i) * ns(i + 1) > sums(i + 1) * ns(i)) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Hamming distance between two signatures. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
