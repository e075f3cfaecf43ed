package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** CSV/TSV ingest: schema enforced, the two distinct CSV failure legs
  * both exercised — parser-level corruption (bad typed value, extra
  * tokens) and structurally-short rows that CSV silently null-fills
  * (only the required-fields check catches those). */
class CsvSourceSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("drop taxonomy: bad value / wrong arity / blank / empty required, all counted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val lines = Seq(
      "1,hello world,en",
      "2,bonjour,fr",
      "abc,bad id,en",      // unparsable long -> corrupt column set
      "3,short row",        // fewer tokens than schema -> parser-corrupt
      "",                   // blank: the CSV reader SKIPS it pre-parse —
                            // never a row, so not counted as a drop
      "5,,en",              // parses fine; empty text -> null -> required drop
      "6,too,many,tokens")  // more tokens than schema -> parser-corrupt
    java.nio.file.Files.write(dir.resolve("part-0.csv"),
      lines.mkString("\n").getBytes("UTF-8"))

    val (df, dropped) = graft.sources.CsvSource.read(
      spark, dir.toString, schema, Seq("doc_id", "text"))
    val got = df.as[(Long, String, Option[String])].collect().toSet
    assert(got == Set(
      (1L, "hello world", Some("en")), (2L, "bonjour", Some("fr"))))
    assert(dropped == 4L,
      s"bad-long + short + empty-required + extra-tokens: $dropped")
  }

  test("TSV delimiter and required trailing field") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tsv")
    val lines = Seq(
      "1\thello\ten",
      "2\tmissing lang")  // lang required here -> dropped
    java.nio.file.Files.write(dir.resolve("d.tsv"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (df, dropped) = graft.sources.CsvSource.read(
      spark, dir.toString, schema, Seq("doc_id", "text", "lang"), delimiter = "\t")
    assert(df.as[(Long, String, String)].collect().toSeq == Seq((1L, "hello", "en")))
    assert(dropped == 1L)
  }

  test("parquet fixture round-trips through CSV losslessly") {
    import org.apache.spark.sql.functions._
    val sf = sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"
    assume(new java.io.File(sf).isDirectory)
    // lang/source are delimiter-free; text is quoted by the writer
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-csvrt").toString + "/d"
    docs.write.option("header", "false").csv(dir)
    val (back, dropped) = graft.sources.CsvSource.read(
      spark, dir, StructType(schema.fields), Seq("doc_id", "text"))
    assert(dropped == 0L)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b), "CSV round-trip changed data")
  }
}
