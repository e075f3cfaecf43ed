package graft

import graft.functions.ByteGridHashImpl
import graft.queries.MultimodalQueries
import graft.sources.PayloadRecords
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal payload seam end-to-end:
  *  - arbitrary BINARY payloads (all 256 byte values, empty, skewed
  *    sizes) round-trip bit-exactly through the proto-wire records +
  *    byte-packed gzip TFRecord shards, with the export manifest's
  *    accounting verified on the way back in;
  *  - the byte-grid perceptual hash finds PLANTED byte-level
  *    near-twins (few-byte in-place edits) through the banded
  *    pipeline, and keeps unrelated payloads apart — the behavioral
  *    contract behind q140;
  *  - the native expression's eval agrees with an independent spec
  *    reimplementation across the full byte range (signatures are
  *    UNSIGNED-byte means — a sign bug would only show on >0x7f
  *    bytes, which the ASCII gate corpus never exercises).
  */
class MultimodalPayloadSpec extends AnyFunSuite with SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("payload export round-trips bit-exact and the manifest accounts for it") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq(
      (1L, "image", Array.tabulate(256)(_.toByte)),          // every byte value
      (2L, "audio", Array.emptyByteArray),                   // empty payload
      (3L, "", bytes(0x00, 0xff, 0x80, 0x7f)),               // empty modality
      (0L, "video", Array.fill(50000)(rnd.nextInt().toByte)) // id 0 (wire-suppressed) + big blob
    ) ++ (10L to 29L).map(i =>
      (i, "image", Array.fill(rnd.nextInt(3000))(rnd.nextInt().toByte)))
    val df = rows.toDF("doc_id", "modality", "payload")
    val dir = java.nio.file.Files.createTempDirectory("payrec").toString

    val m = PayloadRecords.export(df, dir, targetShardBytes = 16 * 1024)
    assert(m.records === rows.length)
    assert(m.payloadBytes === rows.map(_._3.length.toLong).sum)
    assert(m.shards >= 2, "16 KiB target over ~90 KiB of payload must split shards")
    assert(m.byModality === rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap)

    val back = PayloadRecords.readCommitted(spark, dir)
      .as[(Long, String, Array[Byte])].collect()
      .map { case (id, mo, p) => id -> ((mo, p.toSeq)) }.toMap
    assert(back.size === rows.length)
    rows.foreach { case (id, mo, p) =>
      assert(back(id) === ((mo, p.toSeq)), s"payload $id not bit-exact")
    }

    // a tampered manifest must fail the read loudly (rewrite through
    // the Hadoop FS so the local ChecksumFileSystem's .crc sidecar
    // follows — the point is OUR cross-check firing, not the crc's)
    val mf = java.nio.file.Paths.get(dir, "_manifest.json")
    val txt = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_manifest.json"), true)
    try out.write(txt.replaceFirst(
      "\"records\":\\d+", "\"records\":999").getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalArgumentException] {
      PayloadRecords.readCommitted(spark, dir)
    }
    assert(e.getMessage.contains("does not match its manifest"))
  }

  test("hostile modality strings survive the manifest round-trip") {
    import spark.implicits._
    // modality is arbitrary user data: quotes/backslashes/control
    // chars must neither corrupt the manifest JSON nor mis-key the
    // per-modality accounting; null normalizes to "" as on the wire
    val rows = Seq(
      (1L, """im"age\weird""", bytes(1, 2, 3)),
      (2L, "line\nbreak", bytes(4, 5)),
      (3L, null.asInstanceOf[String], bytes(6)))
    val dir = java.nio.file.Files.createTempDirectory("payesc").toString
    val m = PayloadRecords.export(rows.toDF("doc_id", "modality", "payload"), dir)
    assert(m.byModality === Map(
      """im"age\weird""" -> 1L, "line\nbreak" -> 1L, "" -> 1L))
    val back = PayloadRecords.readCommitted(spark, dir)
      .as[(Long, String, Array[Byte])].collect()
      .map(r => r._1 -> r._2).toMap
    assert(back === Map(1L -> """im"age\weird""", 2L -> "line\nbreak", 3L -> ""))
  }

  test("null payloads are rejected at export, not smuggled") {
    import spark.implicits._
    val df = Seq((1L, "image", Option(bytes(1, 2, 3))), (2L, "image", None))
      .toDF("doc_id", "modality", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      PayloadRecords.export(df, java.nio.file.Files.createTempDirectory("payn").toString)
    }
    assert(e.getMessage.contains("null payload")
      || Option(e.getCause).exists(_.getMessage.contains("null payload")))
  }

  test("byte-grid dHash: planted near-twins pair up, unrelated payloads stay apart") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val base = Array.fill(4096)(rnd.nextInt().toByte)
    val twin = base.clone()
    // a localized 3-byte in-place edit — the post-exact-dedup
    // payload-edit case (same length, same alignment)
    twin(100) = (twin(100) ^ 0x55).toByte
    twin(101) = (twin(101) ^ 0x2a).toByte
    twin(102) = (twin(102) ^ 0x7f).toByte
    val other = Array.fill(4096)(rnd.nextInt().toByte)
    val hamTwin = ByteGridHashImpl.hamming(
      ByteGridHashImpl.compute(base), ByteGridHashImpl.compute(twin))
    assert(hamTwin <= 4, s"3-byte edit must stay local to its cells, got $hamTwin")
    val hamOther = ByteGridHashImpl.hamming(
      ByteGridHashImpl.compute(base), ByteGridHashImpl.compute(other))
    assert(hamOther > 6, s"independent payloads must not collide, got $hamOther")

    // through the BANDED pipeline (the same fn q140 runs)
    graft.GraftExtensions.ensureRegistered(spark)
    val sigs = Seq((1L, base), (2L, twin), (3L, other))
      .toDF("doc_id", "payload")
      .select($"doc_id", length($"payload").cast("long").as("n_bytes"),
        expr("byte_grid_dhash(payload)").as("sig"))
    val pairs = MultimodalQueries.phashPairs(sigs)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)),
      s"banding must surface exactly the planted twin pair, got $pairs")
  }

  test("expression agrees with an independent reimplementation on full-range bytes") {
    // independent BigInt-based reference (different arithmetic path)
    def ref(b: Array[Byte]): Long = {
      val cells = 64
      val sums = (0 until cells).map { i =>
        val lo = (i.toLong * b.length / cells).toInt
        val hi = ((i + 1).toLong * b.length / cells).toInt
        (BigInt(b.slice(lo, hi).map(x => (x & 0xff).toLong).sum), BigInt(hi - lo))
      }
      (0 until 63).foldLeft(0L) { (acc, i) =>
        if (sums(i)._1 * sums(i + 1)._2 > sums(i + 1)._1 * sums(i)._2)
          acc | (1L << i)
        else acc
      }
    }
    val rnd = new scala.util.Random(31)
    val cases = Seq(
      Array.emptyByteArray,                       // len 0: all cells empty
      bytes(0xff),                                // len 1 < cells
      Array.tabulate(63)(_.toByte),               // len = cells - 1
      Array.tabulate(64)(i => (255 - i).toByte),  // len = cells exactly
      Array.tabulate(256)(_.toByte),              // every byte value, high bytes
      Array.fill(65)(0xff.toByte),                // constant: all gradients flat
      Array.fill(1000)(rnd.nextInt().toByte),
      Array.fill(4097)(rnd.nextInt().toByte))     // non-divisible length
    cases.foreach { c =>
      assert(ByteGridHashImpl.compute(c) === ref(c),
        s"len=${c.length} disagreed with the reference arithmetic")
    }
    // constant payload: no strict gradient anywhere → signature 0
    assert(ByteGridHashImpl.compute(Array.fill(640)(7.toByte)) === 0L)

    // codegen and interpreted paths agree (and null stays null)
    import spark.implicits._
    val df = cases.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("id", "payload")
    graft.GraftExtensions.ensureRegistered(spark)
    val viaSql = df.selectExpr("id", "byte_grid_dhash(payload) AS sig")
      .as[(Long, Long)].collect().toMap
    cases.zipWithIndex.foreach { case (c, i) =>
      assert(viaSql(i.toLong) === ref(c))
    }
    val n = Seq((1L, Option.empty[Array[Byte]])).toDF("id", "payload")
      .selectExpr("byte_grid_dhash(payload) AS sig").collect()
    assert(n.head.isNullAt(0), "null payload must hash to null")
  }
}
