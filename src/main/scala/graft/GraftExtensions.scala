package graft

import graft.functions.{ByteGridHash, DeflateRatio, MinHashSig, RollingFingerprint, SimHash60, SrpSig, VecDot, WordCounts, WordShingleHashes, WordShingles}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions: custom Catalyst expressions registered as SQL
  * functions. Install either via
  * `spark.sql.extensions=graft.GraftExtensions` / `.withExtensions`,
  * or imperatively with [[GraftExtensions.ensureRegistered]] (works on
  * sessions the caller doesn't build — e.g. the driver's). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args.head)),
    (FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (args: Seq[Expression]) => RollingFingerprint(args.head)),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    (FunctionIdentifier("vec_l2d2"),
      new ExpressionInfo(classOf[graft.functions.VecL2d2].getName, "vec_l2d2"),
      (args: Seq[Expression]) => graft.functions.VecL2d2(args(0), args(1))),
    (FunctionIdentifier("l2_argmin"),
      new ExpressionInfo(classOf[graft.functions.L2ArgMin].getName, "l2_argmin"),
      (args: Seq[Expression]) => graft.functions.L2ArgMin(args(0), args(1))),
    (FunctionIdentifier("adc_fold"),
      new ExpressionInfo(classOf[graft.functions.AdcFold].getName, "adc_fold"),
      (args: Seq[Expression]) => graft.functions.AdcFold(args(0), args(1))),
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => SimHash60(args.head)),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0), args(1))),
    (FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[WordShingleHashes].getName, "word_shingle_hashes"),
      (args: Seq[Expression]) => WordShingleHashes(args(0), args(1))),
    (FunctionIdentifier("word_counts"),
      new ExpressionInfo(classOf[WordCounts].getName, "word_counts"),
      (args: Seq[Expression]) => WordCounts(args.head)),
    (FunctionIdentifier("srp_sig"),
      new ExpressionInfo(classOf[SrpSig].getName, "srp_sig"),
      (args: Seq[Expression]) => SrpSig(args(0), args(1), args(2), args(3))),
    (FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (args: Seq[Expression]) => DeflateRatio(args.head)),
    (FunctionIdentifier("byte_grid_dhash"),
      new ExpressionInfo(classOf[ByteGridHash].getName, "byte_grid_dhash"),
      (args: Seq[Expression]) => ByteGridHash(args.head)))

  /** Idempotent per-session registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }
  }
}
