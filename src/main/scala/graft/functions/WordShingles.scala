package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a text, as one native expression:
  * `word_shingles(text, n) → array<string>`.
  *
  * Bit-identical to the HOF formulation used across the dedup family
  * (spec'd in ExpressionSpec):
  * {{{
  * array_distinct(transform(sequence(1, size(ws) - (n-1)),
  *   i -> concat_ws(' ', slice(ws, i, n))))
  * where ws = split(trim(text), "\\s+")
  * }}}
  * including its edge semantics: `trim` strips ASCII space (0x20)
  * ONLY, `split` keeps interior/leading empty tokens exactly like
  * Spark's regex split with limit −1, and distinctness preserves
  * first-occurrence order (LinkedHashSet ≡ array_distinct).
  *
  * Why native: higher-order functions interpret their lambda per
  * element (~29 µs/shingle measured); this is one JIT loop per row.
  * Codegen emits a static call, keeping the surrounding projection
  * inside whole-stage codegen.
  */
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        // n ≤ 0 would silently yield arrays of empty-string shingles;
        // reject at analysis time instead
        right.eval() match {
          case n: java.lang.Integer if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case n => TypeCheckResult.TypeCheckFailure(
            s"word_shingles requires n >= 1, got $n")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires (string, int literal), got $other")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    WordShinglesImpl.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.WordShinglesImpl.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

/** Per-document term frequencies as one native expression:
  * `word_counts(text) → array<struct<word: string, tf: bigint>>`,
  * one entry per DISTINCT token of `split(trim(text), "\\s+")` in
  * first-occurrence order, `tf` = its occurrence count.
  *
  * Replaces the explode → groupBy(doc, word) formulation: term counting
  * is row-local (a document's words live in ONE row), so the big
  * per-token shuffle in TF-IDF/BM25-style pipelines is unnecessary —
  * explode the counted pairs instead (|distinct terms| rows, not
  * |tokens|) and only document frequency still aggregates globally.
  * Token semantics identical to the HOF form (space-only trim, regex
  * split keeping empty tokens, ExpressionSpec pins equality). */
case class WordCounts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_counts requires string, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("word", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("tf", org.apache.spark.sql.types.LongType,
        nullable = false))),
    containsNull = false)
  override def prettyName: String = "word_counts"

  override protected def nullSafeEval(text: Any): Any =
    WordShinglesImpl.counts(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WordShinglesImpl.counts($t);")

  override protected def withNewChildInternal(newChild: Expression): WordCounts =
    copy(child = newChild)
}

/** Fused shingle-and-hash: `word_shingle_hashes(text, n) →
  * array<bigint>`, the xxhash64 (seed 42 — SQL `xxhash64()` parity,
  * via [[org.apache.spark.sql.catalyst.expressions.XxHash64Function]])
  * of each DISTINCT n-word shingle, first-occurrence order.
  *
  * Bit-identical to
  * `transform(word_shingles(text, n), x -> xxhash64(x))` (ExpressionSpec)
  * — but that HOF interprets its lambda per shingle (measured 2.4 s
  * to hash the sf0.1 corpus vs 0.5 s for codegen'd hashing); this is
  * one JIT loop per row and never materializes the shingle strings
  * as a column. The dedup family's posting pipelines (q41/q72/q77/
  * q78) only ever need the hashes. */
case class WordShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        right.eval() match {
          case n: java.lang.Integer if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case n => TypeCheckResult.TypeCheckFailure(
            s"word_shingle_hashes requires n >= 1, got $n")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingle_hashes requires (string, int literal), got $other")
    }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    WordShinglesImpl.hashes(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.WordShinglesImpl.hashes($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingleHashes =
    copy(left = newLeft, right = newRight)
}

object WordShinglesImpl {
  // Spark's split(str, regex) delegates to Java's Pattern.split with
  // limit -1; reusing the same compiled pattern reproduces it exactly.
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def counts(text: UTF8String): ArrayData = {
    val words = ws.split(text.trim().toString, -1)
    val tf = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < words.length) {
      tf.merge(words(i), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[AnyRef](tf.size())
    val it = tf.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Same distinct-shingle walk as [[compute]], emitting SQL-parity
    * xxhash64 longs instead of strings. */
  def hashes(text: UTF8String, n: Int): ArrayData = {
    val shingles = compute(text, n)
    val out = new Array[Long](shingles.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(shingles.getUTF8String(i), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    // UTF8String.trim() strips 0x20 only — same as SQL trim(col)
    val words = ws.split(text.trim().toString, -1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
