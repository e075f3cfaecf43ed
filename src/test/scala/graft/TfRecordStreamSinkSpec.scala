package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TfRecordSource
import graft.streaming.TfRecordStreamSink

/** Streaming TFRecord export: end-to-end through a real
  * MemoryStream-driven query, plus the commit-protocol edges
  * (replay short-circuit, crashed-attempt debris, torn batches
  * invisible to the manifest reader, empty-batch commit). */
class TfRecordStreamSinkSpec extends AnyFunSuite with SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("streamed batches round-trip bit-exact through committed manifests") {
    val s = spark
    import s.implicits._
    val out = tmpDir("tfstream-out")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    // capture-free lambda: `bytes _` would drag the spec instance
    // (non-serializable scalatest Engine) into the task closure
    val q = TfRecordStreamSink.start(
      in.toDS().map(v => v.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      out, tmpDir("tfstream-ckpt"),
      targetShardBytes = 64L) // tiny target: forces multiple shards
    try {
      in.addData("alpha", "beta", "gamma")
      q.processAllAvailable()
      in.addData("delta", "epsilon")
      q.processAllAvailable()
    } finally q.stop()
    val got = TfRecordStreamSink.readCommitted(spark, out)
      .collect().map(new String(_, "UTF-8")).sorted.toSeq
    assert(got === Seq("alpha", "beta", "delta", "epsilon", "gamma"))
    // each batch directory carries its manifest commit marker
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted.toSeq
    assert(dirs === Seq("batch-00000000", "batch-00000001"))
    dirs.foreach(d =>
      assert(new java.io.File(s"$out/$d/_MANIFEST.json").isFile, d))
  }

  test("replaying a committed batch id short-circuits; files untouched") {
    val s = spark
    import s.implicits._
    val out = tmpDir("tfstream-replay")
    val data = s.createDataset(Seq(bytes("one"), bytes("two")))
    val r1 = TfRecordStreamSink.writeBatch(data, out, batchId = 7L)
    assert(!r1.skippedReplay && r1.records === 2L && r1.files >= 1)
    val before = new java.io.File(s"$out/batch-00000007").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    // foreachBatch re-delivers batch 7 after a checkpoint-uncommitted
    // restart — possibly with DIFFERENT content ordering; the id alone
    // must dedupe
    val r2 = TfRecordStreamSink.writeBatch(
      s.createDataset(Seq(bytes("three"))), out, batchId = 7L)
    assert(r2.skippedReplay && r2.files === 0 && r2.records === 0L)
    val after = new java.io.File(s"$out/batch-00000007").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after === before)
    assert(TfRecordStreamSink.readCommitted(spark, out)
      .collect().map(new String(_, "UTF-8")).sorted.toSeq === Seq("one", "two"))
  }

  test("crashed-attempt debris is swept; manifest listing matches output exactly") {
    val s = spark
    import s.implicits._
    val out = tmpDir("tfstream-debris")
    // simulate a crashed attempt: data files present, NO manifest
    val bdir = new java.io.File(s"$out/batch-00000003")
    assert(bdir.mkdirs())
    Files.write(bdir.toPath.resolve("part-00099.tfrecord.gz"),
      Array[Byte](1, 2, 3)) // garbage — and an index the rewrite won't produce
    // a torn batch is invisible to the committed reader
    assert(TfRecordStreamSink.readCommitted(spark, out).count() === 0L)
    val r = TfRecordStreamSink.writeBatch(
      s.createDataset(Seq(bytes("real"))), out, batchId = 3L)
    assert(!r.skippedReplay && r.records === 1L)
    val names = bdir.listFiles().map(_.getName).sorted.toSeq
    assert(!names.contains("part-00099.tfrecord.gz"), "debris survived the sweep")
    val manifest = new String(Files.readAllBytes(
      bdir.toPath.resolve("_MANIFEST.json")), "UTF-8")
    names.filter(_.startsWith("part-")).foreach(n =>
      assert(manifest.contains("\"" + n + "\""), s"$n missing from manifest"))
    assert(TfRecordStreamSink.readCommitted(spark, out)
      .collect().map(new String(_, "UTF-8")).toSeq === Seq("real"))
  }

  test("an empty batch still commits: id is deduped, reader stays total") {
    val s = spark
    import s.implicits._
    val out = tmpDir("tfstream-empty")
    val empty = s.createDataset(Seq.empty[Array[Byte]])
    val r = TfRecordStreamSink.writeBatch(empty, out, batchId = 0L)
    assert(!r.skippedReplay && r.files === 0 && r.records === 0L)
    assert(new java.io.File(s"$out/batch-00000000/_MANIFEST.json").isFile)
    // replay of the empty batch is also a no-op
    assert(TfRecordStreamSink.writeBatch(
      s.createDataset(Seq(bytes("late"))), out, batchId = 0L).skippedReplay)
    assert(TfRecordStreamSink.readCommitted(spark, out).count() === 0L)
  }

  test("readFiles on an explicit list matches the single-glob read") {
    val s = spark
    import s.implicits._
    val out = tmpDir("tfstream-readfiles")
    TfRecordStreamSink.writeBatch(
      s.createDataset(Seq(bytes("x"), bytes("y"))), out, batchId = 1L)
    val files = TfRecordStreamSink.committedFiles(spark, out)
    assert(files.nonEmpty)
    val viaList = TfRecordSource.readFiles(spark, files)
      .collect().map(new String(_, "UTF-8")).sorted.toSeq
    val viaGlob = TfRecordSource.read(spark, s"$out/batch-*/part-*")
      .collect().map(new String(_, "UTF-8")).sorted.toSeq
    assert(viaList === viaGlob && viaList === Seq("x", "y"))
    assert(TfRecordSource.readFiles(spark, Nil).count() === 0L)
  }
}
