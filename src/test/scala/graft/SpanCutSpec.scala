package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** q119 span-cut semantics on a planted corpus — the oracle proves
  * engine parity; this proves the CUTS land where a human expects:
  * a shared 20-token license header is removed from both carriers,
  * unique remainders survive token-exact, a doc that is nothing but
  * the header collapses to empty, and untouched docs pass through
  * verbatim. */
class SpanCutSpec extends AnyFunSuite with SparkSpec {

  private val header = (1 to 20).map(i => s"lic$i").mkString(" ")
  private val bodyA = "alpha beta gamma delta epsilon zeta eta theta"
  private val bodyB = "one two three four five six seven eight nine"

  private lazy val result: Map[Long, (Long, Long, String)] = {
    val dir = java.nio.file.Files.createTempDirectory("spancut").toString
    val rows = Seq(
      Row(1L, s"$header $bodyA", "en", "web", 0L),
      Row(2L, s"$header $bodyB", "en", "web", 0L),
      Row(3L, header, "en", "web", 0L),
      Row(4L, "totally unique short doc with no repeats at all", "en", "web", 0L))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    QueryRegistry.byName("q119_span_cut").fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
  }

  test("shared header is cut from both carriers; unique bodies survive exactly") {
    assert(result(1L) === ((28L, 20L, bodyA)))
    assert(result(2L) === ((29L, 20L, bodyB)))
  }

  test("a doc that IS the shared span collapses to empty") {
    assert(result(3L) === ((20L, 20L, "")))
  }

  test("docs without cross-doc spans pass through verbatim") {
    assert(result(4L) ===
      ((9L, 0L, "totally unique short doc with no repeats at all")))
  }
}
