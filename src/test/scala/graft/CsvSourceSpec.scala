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
      "",                   // blank: visible to the text-based default
                            // path -> dropped + counted (like JSONL)
      "5,,en",              // parses fine; empty text -> null -> required drop
      "6,too,many,tokens")  // more tokens than schema -> parser-corrupt
    java.nio.file.Files.write(dir.resolve("part-0.csv"),
      lines.mkString("\n").getBytes("UTF-8"))

    val (df, dropped) = graft.sources.CsvSource.read(
      spark, dir.toString, schema, Seq("doc_id", "text"))
    val got = df.as[(Long, String, Option[String])].collect().toSet
    assert(got == Set(
      (1L, "hello world", Some("en")), (2L, "bonjour", Some("fr"))))
    assert(dropped == 5L,
      s"bad-long + short + blank + empty-required + extra-tokens: $dropped")
  }

  test("count and frame agree under downstream column pruning") {
    import spark.implicits._
    // score is corrupt but NOT required: the row must stay dropped
    // even when a downstream projection no longer references score
    // (the read.csv pruning trap — the from_csv path is immune)
    val wide = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("score", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-csvprune")
    java.nio.file.Files.write(dir.resolve("d.csv"),
      Seq("1,hi,10", "2,yo,notanumber").mkString("\n").getBytes("UTF-8"))
    val (df, dropped) = graft.sources.CsvSource.read(
      spark, dir.toString, wide, Seq("doc_id", "text"))
    assert(dropped == 1L)
    assert(df.select("doc_id").as[Long].collect().toSeq == Seq(1L),
      "projected read resurrected a counted-dropped row")
    assert(df.count() == 1L)
  }

  test("reader branch: count and frame stay consistent (materialized kept frame)") {
    import spark.implicits._
    // the CSV reader's lazy re-parses prune columns; the branch pins
    // the counting pass's classification by materializing — a row
    // corrupt only in the non-required score column must stay dropped
    // under a later narrow projection
    val wide = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("score", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-csvpin")
    java.nio.file.Files.write(dir.resolve("d.csv"),
      Seq("doc_id,text,score", "1,hi,10", "2,yo,notanumber")
        .mkString("\n").getBytes("UTF-8"))
    val (df, dropped) = graft.sources.CsvSource.read(
      spark, dir.toString, wide, Seq("doc_id", "text"), header = true)
    assert(dropped == 1L)
    assert(df.select("doc_id").as[Long].collect().toSeq == Seq(1L),
      "reader-branch projection resurrected a counted-dropped row")
  }

  test("multiLine branch: RFC-4180 quoted embedded newlines survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-csvml")
    java.nio.file.Files.write(dir.resolve("d.csv"),
      "1,\"hello\nworld\",en\n2,flat,fr".getBytes("UTF-8"))
    val (df, dropped) = graft.sources.CsvSource.read(
      spark, dir.toString, schema, Seq("doc_id", "text"), multiLine = true)
    assert(dropped == 0L)
    val got = df.as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "hello\nworld", "en"), (2L, "flat", "fr")))
  }

  test("header branch: header row consumed, not parsed as data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-csvhdr")
    java.nio.file.Files.write(dir.resolve("d.csv"),
      Seq("doc_id,text,lang", "1,hi,en").mkString("\n").getBytes("UTF-8"))
    val (df, dropped) = graft.sources.CsvSource.read(
      spark, dir.toString, schema, Seq("doc_id", "text"), header = true)
    assert(dropped == 0L)
    assert(df.as[(Long, String, String)].collect().toSeq == Seq((1L, "hi", "en")))
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
