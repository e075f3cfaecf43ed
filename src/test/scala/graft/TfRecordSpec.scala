package graft

import graft.ops.AdtechPipeline
import graft.sources.TfRecordSource
import org.scalatest.funsuite.AnyFunSuite

/** TFRecord source spec: the reference's input path (S1) end-to-end —
  * golden corpus bytes framed as .tfrecord.gz, read distributed,
  * decoded, and run through pipeline #1. */
class TfRecordSpec extends AnyFunSuite with SparkSpec {

  private def corpusBytes: Seq[Array[Byte]] = {
    val in = getClass.getResourceAsStream("/golden/test07.bidlogs.txt")
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
    lines.map(java.util.Base64.getDecoder.decode)
  }

  test("gzipped TFRecord files round-trip and feed pipeline #1") {
    val tmp = java.nio.file.Files.createTempDirectory("tfrec").toFile
    val recs = corpusBytes
    // two shards, mixed compression — glob must pick up both
    TfRecordSource.writeLocal(recs.take(10), new java.io.File(tmp, "bidlog-0.tfrecord.gz"), gzip = true)
    TfRecordSource.writeLocal(recs.drop(10), new java.io.File(tmp, "bidlog-1.tfrecord"), gzip = false)

    val ds = TfRecordSource.read(spark, s"$tmp/bidlog-*")
    assert(ds.count() == 22)

    val dps = AdtechPipeline.deviceProfiles(
      AdtechPipeline.validBidLogs(AdtechPipeline.decodeBidLogBytes(ds)))
    assert(dps.count() == 4) // golden expectation of corpus 07
  }

  test("distributed TfRecordSink round-trips bit-exact (gzip and plain)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // golden protos + random blobs of varied size, incl. a zero-length
    // record (the framing must carry it: len=0, crc of empty payload)
    val recs = corpusBytes ++
      (1 to 40).map(i => Array.fill(rnd.nextInt(2000))(rnd.nextInt().toByte)) :+
      Array.emptyByteArray
    val want = recs.map(java.util.Base64.getEncoder.encodeToString).sorted
    for (gzip <- Seq(true, false)) {
      val dir = java.nio.file.Files.createTempDirectory(s"tfsink-$gzip").toString
      val ds = spark.createDataset(recs).repartition(3)
      val (files, n) = graft.sources.TfRecordSink.write(ds, dir, gzip = gzip)
      assert(n == recs.size.toLong)
      assert(files == 3, "one shard per non-empty partition")
      val ext = if (gzip) ".tfrecord.gz" else ".tfrecord"
      // ignore Hadoop LocalFS .crc sidecars
      assert(new java.io.File(dir).listFiles()
        .filterNot(_.getName.startsWith("."))
        .forall(_.getName.endsWith(ext)))
      val got = TfRecordSource.read(spark, s"$dir/part-*")
        .collect().map(java.util.Base64.getEncoder.encodeToString).sorted
      assert(got.toSeq === want, s"gzip=$gzip round-trip diverged")
    }
  }

  test("writeBalanced: shard count tracks payload bytes, shards balanced, lossless") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // ~1000 records of ~1 KiB framed -> ~1 MiB payload; 128 KiB target
    // -> expect ~8 shards
    val recs = (1 to 1000).map(_ => Array.fill(1000 + rnd.nextInt(48))(rnd.nextInt().toByte))
    val totalFramed = recs.map(_.length + 16L).sum
    val target = 128L * 1024
    val dir = java.nio.file.Files.createTempDirectory("tfbal").toString
    val (files, n) = graft.sources.TfRecordSink.writeBalanced(
      spark.createDataset(recs), dir, targetShardBytes = target, gzip = false)
    assert(n == recs.size.toLong)
    assert(files == math.ceil(totalFramed.toDouble / target).toInt,
      s"shard count $files should be ceil($totalFramed / $target)")
    // balance: with ~1000 hash-spread records no shard should exceed
    // twice the target or hold less than a third of the mean
    val sizes = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.length())
    assert(sizes.length == files)
    assert(sizes.max <= 2 * target, s"oversized shard: ${sizes.mkString(",")}")
    assert(sizes.min >= sizes.sum / sizes.length / 3,
      s"starved shard: ${sizes.mkString(",")}")
    // lossless
    val got = TfRecordSource.read(spark, s"$dir/part-*")
      .collect().map(java.util.Base64.getEncoder.encodeToString).sorted
    assert(got.toSeq === recs.map(java.util.Base64.getEncoder.encodeToString).sorted)
    // duplicate-heavy input (the pre-dedup crawl shape): balance must
    // hold — content-keyed sharding would pile all copies in one shard
    val hot = Array.fill(1000)(7.toByte)
    val dupRecs = Seq.fill(500)(hot) ++
      (1 to 500).map(_ => Array.fill(1000)(rnd.nextInt().toByte))
    val dupDir = java.nio.file.Files.createTempDirectory("tfdup").toString
    val (dupFiles, _) = graft.sources.TfRecordSink.writeBalanced(
      spark.createDataset(dupRecs), dupDir, targetShardBytes = target, gzip = false)
    val dupSizes = new java.io.File(dupDir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length())
    assert(dupSizes.length == dupFiles && dupSizes.max <= 2 * target,
      s"duplicate-heavy shards unbalanced: ${dupSizes.mkString(",")}")
    // empty input: no files, no error
    assert(graft.sources.TfRecordSink.writeBalanced(
      spark.emptyDataset[Array[Byte]], dir + "-empty") == ((0, 0L)))
  }

  test("writeBalanced: 100:1 record-size skew still bounds shard bytes") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // heavy tail: 40 records of ~100 KiB among 400 of ~1 KiB, shuffled
    // so big records cluster unpredictably; target 256 KiB keeps the
    // biggest record under target/2, so cumulative packing guarantees
    // max shard < target + maxRec <= 1.5x target
    val recs = rnd.shuffle(
      (1 to 40).map(_ => Array.fill(100 * 1024)(rnd.nextInt().toByte)) ++
      (1 to 400).map(_ => Array.fill(1024)(rnd.nextInt().toByte)))
    val totalFramed = recs.map(_.length + 16L).sum
    val target = 256L * 1024
    val dir = java.nio.file.Files.createTempDirectory("tfskew").toString
    val (files, n) = graft.sources.TfRecordSink.writeBalanced(
      spark.createDataset(recs).repartition(7), dir,
      targetShardBytes = target, gzip = false)
    assert(n == recs.size.toLong)
    // a big record straddling the final boundary can leave the last
    // byte-window with no record START -> count may undershoot ceil by 1
    val want = math.ceil(totalFramed.toDouble / target).toInt
    assert(files == want || files == want - 1,
      s"shard count $files should be within 1 of ceil($totalFramed / $target) = $want")
    val sizes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length())
    assert(sizes.length == files)
    assert(sizes.max <= (1.5 * target).toLong,
      s"skewed shard blew the byte bound: ${sizes.sorted.mkString(",")}")
    val got = TfRecordSource.read(spark, s"$dir/part-*")
      .collect().map(java.util.Base64.getEncoder.encodeToString).sorted
    assert(got.toSeq === recs.map(java.util.Base64.getEncoder.encodeToString).sorted)
  }

  test("commit sweeps stale attempt temps and never leaves a torn final") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfstale").toString
    // plant a stale temp from a "failed attempt" of partition 0
    val stale = new java.io.File(dir, ".part-00000.attempt-999.tfrecord.tmp")
    java.nio.file.Files.write(stale.toPath, Array[Byte](1, 2, 3))
    val recs = (1 to 10).map(i => Array.fill(64)(i.toByte))
    val (files, n) = graft.sources.TfRecordSink.write(
      spark.createDataset(recs).repartition(1), dir, gzip = false)
    assert(files == 1 && n == 10)
    assert(!stale.exists(), "stale attempt temp survived commit")
    // no temp of any kind remains; final file round-trips
    assert(new java.io.File(dir).listFiles()
      .forall(f => !f.getName.endsWith(".tmp")))
    assert(TfRecordSource.read(spark, s"$dir/part-*").count() == 10)
  }

  test("CRC corruption is detected") {
    val tmp = java.nio.file.Files.createTempDirectory("tfrec-bad").toFile
    val f = new java.io.File(tmp, "bad.tfrecord")
    TfRecordSource.writeLocal(corpusBytes.take(2), f, gzip = false)
    // flip one payload byte after the headers of the first record
    val raf = new java.io.RandomAccessFile(f, "rw")
    raf.seek(14)
    val b = raf.read(); raf.seek(14); raf.write(b ^ 0x01)
    raf.close()
    val e = intercept[org.apache.spark.SparkException] {
      TfRecordSource.read(spark, f.getAbsolutePath).count()
    }
    assert(e.getMessage.contains("CRC") ||
      Option(e.getCause).exists(_.getMessage.contains("CRC")))
    // the error must NAME the file — a bare "CRC mismatch" from one
    // task over a 100k-file glob is undebuggable
    assert(e.getMessage.contains("bad.tfrecord") ||
      Option(e.getCause).exists(_.getMessage.contains("bad.tfrecord")))
  }

  test("truncated file (killed writer) fails loudly, naming the file") {
    val tmp = java.nio.file.Files.createTempDirectory("tfrec-trunc").toFile
    val f = new java.io.File(tmp, "torn.tfrecord")
    TfRecordSource.writeLocal(corpusBytes.take(3), f, gzip = false)
    // chop mid-record: keep the first frame intact, cut into the second
    val full = java.nio.file.Files.readAllBytes(f.toPath)
    val firstFrame = 8 + 4 + corpusBytes.head.length + 4
    java.nio.file.Files.write(f.toPath,
      java.util.Arrays.copyOf(full, firstFrame + 9))
    val e = intercept[org.apache.spark.SparkException] {
      TfRecordSource.read(spark, f.getAbsolutePath).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    // the cut lands mid-CRC → readFully's "expected N bytes" EOF; a
    // cut mid-length-header raises "truncated length header" — either
    // way the wrapped message must name the file
    assert(msgs(e).exists(m => m.contains("torn.tfrecord") &&
        (m.contains("truncated") || m.contains("expected"))),
      s"expected a truncation error naming the file, got: ${msgs(e)}")
  }
}
