package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** JSONL ingest: schema enforced (not inferred), corrupt lines and
  * records missing required fields dropped + counted, well-formed
  * records preserved exactly — the P1 drop-corrupt discipline on the
  * LLM-corpus interchange format. */
class JsonlSourceSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("reads good lines, drops corrupt and incomplete ones, counts the drops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
      """not json at all {{{""",                        // corrupt
      "",                                               // blank line
      """{"doc_id": 3, "lang": "de"}""",                // missing required text
      """{"doc_id": 9, "text": "truncated", "lang": """, // malformed TAIL: permissive
                                                         // from_json still parses
                                                         // doc_id/text — must drop
      """{"doc_id": 4, "text": "extra is fine", "lang": "en", "extra": 9}""")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val (df, dropped) = graft.sources.JsonlSource.read(
      spark, dir.toString, schema, Seq("doc_id", "text"))
    val got = df.as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "hello world", "en"), (2L, "bonjour", "fr"), (4L, "extra is fine", "en")))
    assert(dropped == 4L, "corrupt + blank + incomplete + malformed-tail all counted")
  }

  test("streaming ingest: records flow, drops surface as observed metrics") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-stream")
    java.nio.file.Files.write(dir.resolve("b0.jsonl"), Seq(
      """{"doc_id": 1, "text": "alpha", "lang": "en"}""",
      """broken {{{""",
      """{"doc_id": 2, "text": "beta", "lang": "fr"}""").mkString("\n").getBytes("UTF-8"))
    val q = graft.sources.JsonlSource.readStream(
        spark, dir.toString + "/*.jsonl", schema, Seq("doc_id", "text"))
      .writeStream.format("memory").queryName("jsonl_stream").start()
    try {
      q.processAllAvailable()
      // second batch arrives later with one incomplete record
      java.nio.file.Files.write(dir.resolve("b1.jsonl"), Seq(
        """{"doc_id": 3, "text": "gamma", "lang": "de"}""",
        """{"doc_id": 4, "lang": "es"}""").mkString("\n").getBytes("UTF-8"))
      q.processAllAvailable()
      val got = spark.table("jsonl_stream").as[(Long, String, String)]
        .collect().map(_._1).toSet
      assert(got == Set(1L, 2L, 3L), "kept records across both batches")
      // an EMPTY file landing must report dropped=0, not null (SUM
      // over an empty batch is null without the coalesce)
      java.nio.file.Files.write(dir.resolve("b2.jsonl"), Array.emptyByteArray)
      q.processAllAvailable()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("jsonl_ingest")))
        .map(r => (r.getAs[Long]("lines"),
          Option(r.get(r.fieldIndex("dropped"))).map(_.asInstanceOf[Long])))
      assert(metrics.contains((3L, Some(1L))), s"batch-0 metrics missing: $metrics")
      assert(metrics.contains((2L, Some(1L))), s"batch-1 metrics missing: $metrics")
      metrics.foreach { case (_, d) =>
        assert(d.isDefined, s"null dropped metric leaked: $metrics") }
    } finally q.stop()
  }

  test("parquet fixture round-trips through JSONL losslessly") {
    import org.apache.spark.sql.functions._
    val sf = sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"
    assume(new java.io.File(sf).isDirectory)
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-rt").toString + "/docs"
    docs.select(to_json(struct(col("doc_id"), col("text"), col("lang"))).as("value"))
      .write.text(dir)
    val (back, dropped) = graft.sources.JsonlSource.read(
      spark, dir, schema, Seq("doc_id", "text"))
    assert(dropped == 0L)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
