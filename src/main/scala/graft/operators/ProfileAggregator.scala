package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** The A1 profile-merge monoid as a typed `Aggregator` — the §2.10
  * UDAF surface (the reference's `Combine.CombineFn`,
  * `transforms/AppProfiles.java:71-111` / `mergeDps`,
  * `utils/DeviceProfileUtils.java:206-240`). Spark runs `reduce` as
  * the map-side partial and `merge` across shuffle partitions — the
  * exact Beam combiner-lifting analogue (SURVEY §4), in ONE shuffle
  * with the nested result assembled in `finish`.
  *
  * Prefer the relational decomposition (q03/q04/q60) when the shape
  * allows — Catalyst can't see through an opaque Aggregator buffer;
  * this exists for the single-pass nested-state cases (and mirrors
  * the streaming state monoid in graft.streaming.StreamingOps). */
object ProfileAggregator {

  /** (userId, eventType, tsMicros) input row. */
  type In = (Long, String, Long)

  case class Buf(first: Long, last: Long, types: Map[String, Long])
  case class Out(firstAt: Long, lastAt: Long, nTypes: Int, totalEvents: Long, activity: String)

  val merge: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    override def zero: Buf = Buf(Long.MaxValue, Long.MinValue, Map.empty)

    override def reduce(b: Buf, a: In): Buf = Buf(
      math.min(b.first, a._3), math.max(b.last, a._3),
      b.types.updated(a._2, b.types.getOrElse(a._2, 0L) + 1L))

    override def merge(x: Buf, y: Buf): Buf = Buf(
      math.min(x.first, y.first), math.max(x.last, y.last),
      y.types.foldLeft(x.types) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      })

    /** activity rendered as canonical compact JSON (same format as
      * DuckDB's to_json over a sorted list(struct) — oracle-comparable). */
    override def finish(b: Buf): Out = {
      val act = b.types.toSeq.sortBy(_._1)
        .map { case (t, c) => s"""{"event_type":"$t","cnt":$c}""" }
        .mkString("[", ",", "]")
      Out(b.first, b.last, b.types.size, b.types.valuesIterator.sum, act)
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }
}
