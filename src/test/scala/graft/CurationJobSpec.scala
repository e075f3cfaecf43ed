package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.CurationJob
import graft.sources.TfRecordSource

/** [[CurationJob]] — the composed curation pipeline. Each cut is
  * planted independently so the per-stage counts prove WHICH stage
  * removed WHAT; the export round-trips through the real TFRecord
  * reader.
  */
class CurationJobSpec extends AnyFunSuite with SparkSpec {

  private val good = Seq(
    1L -> "the quick brown fox jumps over the lazy dog by the river bank today",
    2L -> "completely different content about distributed query engines and shuffle plans",
    3L -> "a third unique document discussing parquet column pruning and predicate pushdown")

  test("each stage cuts exactly its planted rows; manifest matches; export round-trips") {
    val s = spark
    import s.implicits._
    val docs = (good ++ Seq(
      // exact-dup of doc 1 (higher id loses)
      10L -> good.head._2,
      // near-dup of doc 2 (one word changed)
      11L -> "completely different content about distributed query engines and shuffle costs",
      // quality rejects: too short / too few words / non-alpha
      12L -> "tiny",
      13L -> "one two three four",
      14L -> "1234567890 !!!! ???? %%%% 0987654321 #### $$$$ 1111 2222 3333",
      // contaminated: shares 3-grams with the benchmark text
      15L -> "the secret benchmark question about esoteric trivia appears here word for word today"
    )).toDF("doc_id", "text")
    val bench = Seq("what is the secret benchmark question about esoteric trivia")
      .toDF("text")

    val docsDir = java.nio.file.Files.createTempDirectory("cur-docs").toString
    val benchDir = java.nio.file.Files.createTempDirectory("cur-bench").toString
    val outDir = java.nio.file.Files.createTempDirectory("cur-out").toString + "/shards"
    docs.write.mode("overwrite").parquet(docsDir)
    bench.write.mode("overwrite").parquet(benchDir)

    val report = CurationJob.run(s, docsDir, benchDir, outDir,
      CurationJob.Config(targetShardBytes = 1024))

    assert(report.input === 9)
    assert(report.afterExact === 8)      // doc 10 collapsed into doc 1
    assert(report.afterQuality === 5)    // 12, 13, 14 cut
    assert(report.afterNear === 4)       // 11 suppressed by doc 2
    assert(report.curated === 3)         // 15 decontaminated
    assert(report.recordsWritten === 3 && report.shards >= 1)

    // export round-trip through the real TFRecord reader
    val back = TfRecordSource.read(s, s"$outDir/part-*")
      .select(from_json(decode(col("value"), "UTF-8"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING")).as("r"))
      .select(col("r.doc_id"), col("r.text"))
    assert(back.as[(Long, String)].collect().toSet === good.toSet)

    // manifest on disk agrees with the returned report
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "_manifest.json")), "UTF-8")
    assert(manifest.contains("\"curated\":3") && manifest.contains("\"input\":9"))
  }

  test("stats=false skips stage counts but still reports what landed") {
    val s = spark
    import s.implicits._
    val docsDir = java.nio.file.Files.createTempDirectory("cur-docs2").toString
    val benchDir = java.nio.file.Files.createTempDirectory("cur-bench2").toString
    val outDir = java.nio.file.Files.createTempDirectory("cur-out2").toString + "/shards"
    good.toDF("doc_id", "text").write.mode("overwrite").parquet(docsDir)
    Seq("unrelated benchmark line with enough words here")
      .toDF("text").write.mode("overwrite").parquet(benchDir)

    val report = CurationJob.run(s, docsDir, benchDir, outDir, stats = false)
    assert(report.input === -1 && report.afterNear === -1)
    assert(report.curated === 3 && report.recordsWritten === 3)
  }

  test("nearDedupSpillDir: spill-backed near-dedup decides identically end to end") {
    val s = spark
    import s.implicits._
    val docs = (good ++ Seq(
      11L -> "completely different content about distributed query engines and shuffle costs"))
      .toDF("doc_id", "text")
    val docsDir = java.nio.file.Files.createTempDirectory("cur-docs3").toString
    val benchDir = java.nio.file.Files.createTempDirectory("cur-bench3").toString
    val spill = java.nio.file.Files.createTempDirectory("cur-spill").toString
    docs.write.mode("overwrite").parquet(docsDir)
    Seq("unrelated benchmark line with enough words here")
      .toDF("text").write.mode("overwrite").parquet(benchDir)

    def survivors(cfg: CurationJob.Config): Set[Long] =
      CurationJob.curate(s.read.parquet(docsDir), s.read.parquet(benchDir), cfg)
        .curated.select($"doc_id").as[Long].collect().toSet

    val spilled = survivors(CurationJob.Config(nearDedupSpillDir = Some(spill)))
    assert(new java.io.File(spill).listFiles()
      .exists(f => f.getName.startsWith("run-") && new java.io.File(f, "bands").exists()),
      "spill dir unused")
    assert(spilled === survivors(CurationJob.Config()))
    assert(spilled === Set(1L, 2L, 3L)) // 11 suppressed by doc 2 either way
  }

  /** The streaming twin: quality + fp-keyed near-dedup (subsumes exact
    * — identical text ⇒ identical fingerprint) + row-local probe
    * decontamination, driven through real micro-batches. Twins arrive
    * in a LATER batch than their originals so the retained row is
    * deterministic. */
  test("curateStream: each planted row is cut by its stage across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode

    val bench = Seq("what is the secret benchmark question about esoteric trivia")
      .toDF("text")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = CurationJob.curateStream(
      in.toDF().toDF("doc_id", "ts", "text"), bench,
      watermark = "10 minutes")
    val q = stream.writeStream.format("memory").queryName("curated_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData(
        (1L, t(1), good(0)._2),
        (2L, t(1), good(1)._2))
      q.processAllAvailable()
      in.addData(
        (10L, t(2), good(0)._2),                     // exact dup of 1 (same fp)
        (11L, t(2), good(1)._2.replace(" ", "  ")),  // whitespace twin of 2: md5 differs, shingles identical
        (12L, t(2), "tiny"),                         // quality: too short
        (13L, t(2), "1234567890 !!!! ???? %%%% 0987654321 #### $$$$ 1111 2222 3333"),
        (14L, t(2), null),                           // degenerate: NULL text must cut at quality, not crash the stateful op
        (15L, t(2), "the secret benchmark question about esoteric trivia appears here word for word today"))
      q.processAllAvailable()
      val got = s.table("curated_stream")
        .select($"doc_id").as[Long].collect().toSet
      assert(got === Set(1L, 2L))
    } finally q.stop()
  }

  test("runStream: curated stream lands as committed TFRecord batches, batch-parity encoding") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val bench = Seq("what is the secret benchmark question about esoteric trivia")
      .toDF("text")
    val out = java.nio.file.Files.createTempDirectory("curate-stream-out").toString
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = CurationJob.runStream(
      in.toDF().toDF("doc_id", "ts", "text"), bench,
      out, java.nio.file.Files.createTempDirectory("curate-stream-ckpt").toString,
      watermark = "10 minutes")
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      in.addData((1L, t(1), good(0)._2), (2L, t(1), good(1)._2))
      q.processAllAvailable()
      in.addData(
        (10L, t(2), good(0)._2),   // fp dup of 1 — cut
        (12L, t(2), "tiny"),       // quality — cut
        (15L, t(2), "the secret benchmark question about esoteric trivia appears here word for word today"))
      q.processAllAvailable()
    } finally q.stop()
    val lines = graft.streaming.TfRecordStreamSink.readCommitted(s, out)
      .collect().map(new String(_, "UTF-8")).sorted.toSeq
    // exact batch-run encoding: one compact JSON object per doc
    assert(lines === Seq(1L -> good(0)._2, 2L -> good(1)._2).map { case (id, tx) =>
      s"""{"doc_id":$id,"text":"$tx"}"""
    })
  }
}
