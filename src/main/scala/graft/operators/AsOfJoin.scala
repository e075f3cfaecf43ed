package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable left as-of join: for every left row, attach the latest right
  * row with `rightTime <= leftTime` and equal keys.
  *
  * The reference has no as-of join (SURVEY.md §2.5, "absent join types");
  * this is part of the generalized operator surface. Implemented as
  * union → single shuffle on the keys → per-partition sort → running
  * `last(_, ignoreNulls)` window, i.e. one exchange and no per-key cross
  * product — the formulation that survives 100TB inputs (a naive
  * `join(l.t >= r.t) + groupBy(max)` materializes |L|×|R| pairs per key).
  *
  * Ties (`rightTime == leftTime`) match, like DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t`. Callers must pre-deduplicate the right
  * side per (keys, rightTime); non-key column names must be disjoint
  * between the two sides.
  *
  * Skew note: one hot key lands in one task's sort. For skewed key
  * domains pre-salt: split the left by a salt column and replicate right
  * rows per salt — deliberately not automatic, since it duplicates the
  * build side.
  */
object AsOfJoin {

  /** @param left      probe side; all rows kept (left-outer semantics)
    * @param right     build side; payload cols must not collide with left's
    * @param keys      equi-key column names present on both sides
    * @param leftTime  ordering column on `left` (orderable type)
    * @param rightTime ordering column on `right` (same type)
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val side = "__asof_side"
    val t = "__asof_t"
    val leftRest = left.columns.filterNot(keys.contains)
    val rPayload = right.columns.filterNot(keys.contains) // incl. rightTime
    require(leftRest.intersect(rPayload).isEmpty,
      s"as-of join: colliding non-key columns ${leftRest.intersect(rPayload).mkString(",")}")

    val lPart = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as(t), lit(1).as(side)) ++
        leftRest.map(col) ++
        rPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rPart = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as(t), lit(0).as(side)) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rPayload.map(col): _*)

    // Right rows (side=0) sort before left rows (side=1) at equal time →
    // a right row at exactly leftTime is visible to that left row.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lPart.unionByName(rPart)
      .select(
        (keys ++ Seq(t, side) ++ leftRest).map(col) ++
          rPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col(side) === 1)
      .drop(side, t)
  }

  /** As-of join with a tolerance (pandas `merge_asof(tolerance=...)`):
    * the latest match older than `within` allows is DISCARDED — the
    * left row survives with null payload (left-outer semantics), it
    * does not fall back to an even older match. Same single-shuffle
    * plan as [[leftAsOf]] plus a row-local post-pass: the matched
    * `rightTime` rides along in the payload, so the tolerance check
    * needs no extra join.
    *
    * @param within row-local predicate (leftTime, matchedRightTime) →
    *               keep; e.g. micros difference ≤ 7 days */
  def leftAsOfWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      within: (Column, Column) => Column): DataFrame = {
    val joined = leftAsOf(left, right, keys, leftTime, rightTime)
    val rPayload = right.columns.filterNot(keys.contains)
    val ok = col(rightTime).isNotNull && within(col(leftTime), col(rightTime))
    joined.select(joined.columns.toIndexedSeq.map { c =>
      if (rPayload.contains(c))
        when(ok, col(c)).otherwise(lit(null).cast(right.schema(c).dataType)).as(c)
      else col(c)
    }: _*)
  }
}
