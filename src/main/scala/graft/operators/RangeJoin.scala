package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join: pairs (l, r) with equal keys and
  * `rTime - lTime ∈ [lo, hi]` — implemented as an equi-join on
  * (keys, time bucket) + residual range filter, instead of an
  * equi-join on keys alone with the range as a post-join filter.
  *
  * Why: a plain keyed join materializes |events-per-key|² pairs per
  * key before filtering — quadratic in key activity, the thing that
  * detonates at 100 TB. Bucketing by `w = hi - lo` bounds the blowup:
  * each left row joins at most two buckets (⌊(t+lo)/w⌋, ⌊(t+hi)/w⌋),
  * so pair volume is per-bucket-quadratic (time-local) instead of
  * per-key-quadratic. Correctness: any r with rt-lt ∈ [lo,hi] has
  * ⌊rt/w⌋ ∈ {⌊(lt+lo)/w⌋, ⌊(lt+hi)/w⌋} since the window spans < 2w.
  *
  * Times are long (any fixed unit); callers pick it (micros here).
  */
object RangeJoin {

  def banded(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, lo: Long, hi: Long): DataFrame = {
    require(hi > lo, s"empty band [$lo, $hi]")
    val w = hi - lo
    // exact integer bucket division for non-negative shifted times
    // (epoch timestamps are): subtract the remainder, then the
    // division is exact — no float rounding at bucket boundaries
    def bucket(c: Column): Column = {
      val t = c.cast("long")
      ((t - pmod(t, lit(w))) / w).cast("long")
    }
    val l = left.withColumn("__jb", explode(array_distinct(array(
      bucket(col(leftTime) + lo), bucket(col(leftTime) + hi)))))
    val r = right.withColumn("__jb", bucket(col(rightTime)))
    l.join(r, keys :+ "__jb")
      .filter(col(rightTime) >= col(leftTime) + lo &&
        col(rightTime) <= col(leftTime) + hi)
      .drop("__jb")
  }
}
