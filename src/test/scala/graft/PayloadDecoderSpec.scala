package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ByteGridHashImpl
import graft.ops.{ImageIoDecoder, PayloadDecoder}

/** [[PayloadDecoder]] / [[ImageIoDecoder]] — the real-codec decode
  * seam (round 11): a JDK-decodable image feeds PIXEL luma cells
  * through the IDENTICAL gradient signature + banding pipeline the
  * raw-byte path uses. The image fixtures are hand-built 24-bit BMPs
  * (no imageio needed to CONSTRUCT them, so this spec compiles
  * everywhere); decode tests run only where the JRE ships
  * `java.desktop`, and the graceful-refusal path is pinned
  * unconditionally via a decoder pointed at a class that does not
  * exist — exactly how a stripped server-JRE presents. */
class PayloadDecoderSpec extends AnyFunSuite with SparkSpec {

  /** Uncompressed 24-bpp bottom-up BMP with gray pixel value
    * `lum(x, y)` — gray means decoded BT.601 luma == the raw value
    * (299v + 587v + 114v = 1000v), keeping expectations integer. */
  private def bmp(w: Int, h: Int, lum: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val imgSize = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    for (y <- h - 1 to 0 by -1) {
      for (x <- 0 until w) {
        val v = (lum(x, y) & 0xff).toByte
        buf.put(v).put(v).put(v)
      }
      (0 until rowBytes - w * 3).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  // 32×32, luma rising left→right: within a row of the 8×8 cell grid
  // every adjacent-cell gradient is "rising" (bit unset), every
  // row-wrap gradient (cell 8k+7 → 8(k+1)) falls from the bright
  // right edge to the dark left edge (bit set) → bits 7,15,…,55
  private val base = bmp(32, 32, (x, _) => x * 7)
  private val BaseSig = 0x0080808080808080L

  private def decoder = ImageIoDecoder()

  test("graceful refusal: a stripped JRE (absent imageio class) fails with instructions, not NoClassDefFoundError") {
    val d = ImageIoDecoder(imageIoClass = "no.such.javax.ImageIO")
    assert(!d.available)
    val e = intercept[IllegalArgumentException](d.lumaCells(base))
    assert(e.getMessage.contains("javax.imageio"))
  }

  test("decoded pixel grid reproduces the pinned gradient signature; near-twin within radius, reversed image far") {
    assume(decoder.available, "JRE lacks java.desktop — decode tests skipped")
    val Some((sums, ns)) = decoder.lumaCells(base): @unchecked
    assert(ns.sum === 32L * 32 && ns.forall(_ === 16L),
      "32×32 must pool to 64 cells of 16 pixels")
    assert(ByteGridHashImpl.gradientSig(sums, ns) === BaseSig)

    // one brightened pixel cannot flip a 448-luma inter-cell margin
    val twin = bmp(32, 32, (x, y) => if (x == 0 && y == 0) 8 else x * 7)
    val Some((ts, tn)) = decoder.lumaCells(twin): @unchecked
    assert(ByteGridHashImpl.hamming(
      ByteGridHashImpl.gradientSig(ts, tn), BaseSig) <= 6)

    // luma falling left→right reverses every gradient
    val far = bmp(32, 32, (x, _) => 217 - x * 7)
    val Some((fs, fn)) = decoder.lumaCells(far): @unchecked
    assert(ByteGridHashImpl.hamming(
      ByteGridHashImpl.gradientSig(fs, fn), BaseSig) === 63)
  }

  test("undecodable bytes are corrupt-dropped, not errored") {
    assume(decoder.available, "JRE lacks java.desktop — decode tests skipped")
    assert(decoder.lumaCells("definitely not an image".getBytes).isEmpty)
    // truncated header: a reader may claim it then reject mid-parse
    assert(decoder.lumaCells(base.take(20)).isEmpty)
  }

  test("decoded sigs feed the shared banded near-dup pipeline end-to-end") {
    assume(decoder.available, "JRE lacks java.desktop — decode tests skipped")
    val s = spark
    import s.implicits._
    val twin = bmp(32, 32, (x, y) => if (x == 0 && y == 0) 8 else x * 7)
    val far = bmp(32, 32, (x, _) => 217 - x * 7)
    val pl = Seq(
      1L -> base, 2L -> twin, 3L -> far,
      4L -> "garbage payload that is not an image at all".getBytes)
      .toDF("doc_id", "payload")
    val sigs = PayloadDecoder.sigs(pl, decoder)
    assert(sigs.select($"doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L),
      "undecodable row must drop; decodable rows must sign")
    // the byte-path pair pipeline consumes the decoded sigs verbatim:
    // same-size BMPs band together, only the pixel-twin verifies
    val pairs = graft.queries.MultimodalQueries.phashPairs(sigs)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)), s"got $pairs")
  }
}
