package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle set, as a native Catalyst expression.
  *
  * `minhash_sig(array<string>) → array<long>[K]` where
  * `sig[i] = min over shingles s of (A[i]·x(s) + B[i]) mod P`,
  * `x(s)` = first 7 md5 bytes of `s` (big-endian) mod P, `P = 2³¹−1`.
  *
  * Semantically identical to the pure-SQL formulation
  * `transform(sequence(0,K-1), i -> array_min(transform(xs, x -> (A[i]*x+B[i]) % P)))`
  * with `x = conv(substring(md5(s),1,14),16,10) % P` — but ~20× faster:
  * Spark's higher-order functions are interpreted per element (lambda
  * variables, boxing), measured at ~29 µs/shingle; this is one tight
  * JIT-compiled loop with one digest per shingle. The same constants
  * feed the DuckDB oracle so results stay bit-identical.
  *
  * Codegen emits a static call (the standard pattern for loop-heavy
  * expressions), keeping the surrounding projection in whole-stage
  * codegen.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigImpl.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Rolling-window document fingerprint as a native expression:
  * `rolling_fingerprint(text) → struct<fingerprint: string,
  * n_distinct_windows: long>` — min md5-hex over all 8-char windows
  * (lexicographic) + distinct-window count. Identical to the SQL
  * formulation over `transform(sequence(1, len-7), i ->
  * md5(substring(text, i, 8)))` but one JIT loop instead of
  * interpreted higher-order functions (~2.4M digest calls at sf0.1).
  * Unsigned digest-byte comparison ≡ hex-string comparison ('0'-'9'
  * < 'a'-'f' in ASCII matches nibble order). */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires string, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("fingerprint", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct_windows", LongType, nullable = false)))
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigImpl.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigImpl.fingerprint($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** 60-bit SimHash of a shingle set as a native expression:
  * `simhash60(array<string>) → bigint` — per shingle h = first 15 md5
  * hex chars as int (60 bits); fingerprint bit j set iff
  * Σ over shingles of (bit j of h ? +1 : −1) > 0. Identical to the
  * SQL/HOF formulation over `(h >> j) & 1` (spec'd in ExpressionSpec)
  * with one digest + one 60-step JIT loop per shingle instead of
  * 60 interpreted lambda evaluations per shingle. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigImpl.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigImpl.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Band split for SimHash candidate generation (q43): 11 disjoint
  * bands over bits [0,60) — five 6-bit + six 5-bit. Pigeonhole: two
  * fingerprints with hamming ≤ 10 differ in ≤ 10 bit positions, each
  * in exactly one band, so ≥ 1 of the 11 bands is bit-identical —
  * banding is an EXACT-recall candidate generator (property-tested in
  * DedupPairsSpec against random bounded-hamming pairs). */
object SimHashBands {
  /** (bitOffset, width) per band. */
  val defs: Seq[(Int, Int)] = {
    val widths = Seq.fill(5)(6) ++ Seq.fill(6)(5)
    widths.scanLeft(0)(_ + _).zip(widths)
  }
  def bands(fp: Long): Array[Long] =
    defs.map { case (off, w) => (fp >>> off) & ((1L << w) - 1) }.toArray
}

/** Constants + the tight loops. Static forwarders make
  * `MinHashSigImpl.compute(...)` callable from generated Java. */
object MinHashSigImpl {
  val K = 24
  val P: Long = 2147483647L // 2^31 - 1

  /** Universal-hash multipliers/offsets (deterministic LCG, seed 42) —
    * interpolated verbatim into the DuckDB oracle SQL. */
  val (a: Array[Long], b: Array[Long]) = {
    var x = 42L
    def next(): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % (P - 2)) + 1
    }
    (Array.fill(K)(next()), Array.fill(K)(next()))
  }

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** x(s): first 7 digest bytes big-endian (== first 14 hex chars) mod P. */
  def baseHash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var x = 0L
    var i = 0
    while (i < 7) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
    x % P
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned lexicographic compare of two 16-byte digests. */
  private def lessThan(x: Array[Byte], y: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    false
  }

  /** min md5 over 8-char windows (≥1 window even for short texts,
    * mirroring `sequence(1, greatest(len-7, 1))`) + distinct count. */
  def fingerprint(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val md = digests.get()
    val n = text.numChars()
    val last = math.max(n - 7, 1)
    var minD: Array[Byte] = null
    val seen = new java.util.HashSet[java.math.BigInteger]()
    var i = 0
    while (i < last) {
      md.reset()
      val win = text.substringSQL(i + 1, 8)
      val d = md.digest(win.getBytes)
      seen.add(new java.math.BigInteger(1, d))
      if (minD == null || lessThan(d, minD)) minD = d
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(toHex(minD)), seen.size().toLong)
  }

  /** 60-bit hash = first 15 hex chars of md5 (bytes 0-6 + the high
    * nibble of byte 7), matching `conv(substring(md5(s),1,15),16,10)`. */
  def baseHash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var x = 0L
    var i = 0
    while (i < 7) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
    (x << 4) | ((d(7) >> 4) & 0xfL)
  }

  def simhash(shingles: ArrayData): Long = {
    val n = shingles.numElements()
    val sums = new Array[Int](60)
    var j = 0
    while (j < n) {
      val h = baseHash60(shingles.getUTF8String(j))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (sums(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val sig = Array.fill(K)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = baseHash(shingles.getUTF8String(j))
      var i = 0
      while (i < K) {
        val h = (a(i) * x + b(i)) % P
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
}
