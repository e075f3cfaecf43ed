package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio text signal as one native expression:
  * `deflate_ratio(text) → struct<raw_bytes, deflated_bytes, ratio>`,
  * ratio = deflated/raw over the UTF-8 bytes, raw DEFLATE (no zlib
  * header), default level.
  *
  * This is the entropy-style quality filter public web-corpus
  * pipelines (CCNet, RefinedWeb, Dolma — all published) apply
  * alongside word-level heuristics: machine-generated spam and
  * boilerplate compress far below natural prose (ratio ≪), while
  * encrypted/binary junk pasted into text barely compresses at all
  * (ratio ≈ 1). It complements q76 (distinct-shingle repetition —
  * blind to sub-word and long-range structure) and q51/q120 (word
  * heuristics): DEFLATE's LZ77 window sees 32 KiB of context.
  *
  * Engine-shape notes:
  *  - row-local, one JIT loop per row; the Deflater (native zlib
  *    state) and output buffer are THREAD-LOCAL and reset per call —
  *    allocating per row measured ~8× slower, and Deflater is not
  *    safe to share across threads;
  *  - `ratio` is NULL for zero-length text (no 0/0), mirroring the
  *    q51 `nullif` discipline;
  *  - no DuckDB oracle exists for zlib byte counts, so the gated
  *    query carrying this (q128) is the registry's only ROWS-ONLY
  *    entry; the behavioral contract lives in DeflateRatioSpec
  *    (codegen ≡ interpreted, determinism, ordering of
  *    repetitive < prose < high-entropy, exact byte accounting
  *    against java.util.zip run standalone);
  *  - byte counts are deterministic for a fixed JDK's zlib; across
  *    JDK upgrades they may shift a few bytes, which is why the spec
  *    pins ORDERINGS and invariants, not magic constants.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires string, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("raw_bytes", LongType, nullable = false),
    StructField("deflated_bytes", LongType, nullable = false),
    StructField("ratio", DoubleType, nullable = true)))

  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(text: Any): Any =
    DeflateRatioImpl.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.DeflateRatioImpl.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatioImpl {
  // Deflater wraps native zlib state: not thread-safe, expensive to
  // allocate (native malloc + dictionary setup). One per executor
  // thread, reset per row. end() is deliberately never called — the
  // thread-local lives as long as the task thread, and zlib streams
  // are finalizer-backed for the JVM's lifetime.
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION,
        /* nowrap = raw deflate, no zlib header/trailer */ true)
  }
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val raw = bytes.length.toLong
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = buffers.get()
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    val ratio: Any =
      if (raw == 0L) null else java.lang.Double.valueOf(out.toDouble / raw)
    new GenericInternalRow(Array[Any](raw, out, ratio))
  }
}
