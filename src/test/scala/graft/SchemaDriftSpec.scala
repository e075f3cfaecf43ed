package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the round-8 testdata schema drift: the driver
  * regenerated `events.parquet` with a NAIVE TIMESTAMP(MICROS) `ts`
  * (Spark: TIMESTAMP_NTZ) where earlier generations shipped
  * TIMESTAMP(NANOS) (Spark with `nanosAsLong`: LongType). The old
  * loader assumed the nanos encoding unconditionally and every
  * events-table query — 25 of them — died at analysis with
  * DATATYPE_MISMATCH, which the round-7 gate recorded as silently
  * missing correctness entries.
  *
  * [[Tables.events]] must therefore accept EVERY encoding the data has
  * ever shipped in and normalize to session-zone TimestampType with
  * identical instants. This spec writes the same instants in all three
  * encodings and asserts the loader converges them bit-identically, so
  * the next generation flip fails HERE with a named assertion instead
  * of wiping a round's gate.
  */
class SchemaDriftSpec extends AnyFunSuite with SparkSpec {

  // two instants, micro precision: 2024-03-01T12:00:00.123456Z and +1h
  private val micros = Seq(1709294400123456L, 1709298000123456L)

  private def writeDir(suffix: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-drift-$suffix").toString

  private def eventsDf(tsCol: org.apache.spark.sql.Column) = {
    val s = spark
    import s.implicits._
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Round-trips a frame through parquet and loads it via Tables.events. */
  private def loadBack(df: org.apache.spark.sql.DataFrame, tag: String) = {
    val dir = writeDir(tag)
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  test("ntz-micros, ltz-micros, and long-nanos encodings load identically") {
    val s = spark
    import s.implicits._
    // (a) naive micros — the round-8 generation (TIMESTAMP_NTZ on disk)
    val ntz = eventsDf(timestamp_micros($"us").cast(TimestampNTZType))
    // (b) session-zone micros — the plain LTZ encoding
    val ltz = eventsDf(timestamp_micros($"us"))
    // (c) long nanos — the pre-round-8 generation. Spark cannot WRITE
    // parquet TIMESTAMP(NANOS), but with nanosAsLong that column READS
    // as plain int64, so an int64 `ts` exercises the identical branch.
    val nanos = eventsDf(($"us" * 1000L).cast(LongType))

    val frames = Map("ntz" -> ntz, "ltz" -> ltz, "nanos" -> nanos)
      .map { case (tag, df) => tag -> loadBack(df, tag) }

    for ((tag, df) <- frames) {
      assert(df.schema("ts").dataType === TimestampType,
        s"$tag: loader must normalize ts to session-zone TimestampType")
      // the exact call that died at analysis in round 7
      val got = df.select(unix_micros($"ts")).as[Long].collect().sorted
      assert(got.toSeq === micros, s"$tag: instants drifted through the loader")
    }
  }

  test("an events query plans end-to-end on the ntz encoding") {
    val s = spark
    import s.implicits._
    val dir = writeDir("query")
    eventsDf(timestamp_micros($"us").cast(TimestampNTZType))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    // q03's aggregate shape: unix_micros inside min/max over groupBy
    val r = Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type")
      .agg(min(unix_micros($"ts")).as("first_at"),
        max(unix_micros($"ts")).as("last_at"))
      .collect()
    assert(r.length === 2)
  }
}
