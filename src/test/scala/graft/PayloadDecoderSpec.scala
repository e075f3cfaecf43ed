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
  private val twin = bmp(32, 32, (x, y) => if (x == 0 && y == 0) 8 else x * 7)
  private val far = bmp(32, 32, (x, _) => 217 - x * 7)
  // the SAME picture as `base` under a different ENCODING: BMP readers
  // stop at the header's declared image size, so trailing junk changes
  // the byte stream (and its length, and its byte-grid sig) without
  // touching one pixel — the minimal stand-in for a PNG→BMP re-encode
  private val reenc = base ++ Array.fill(7)(0x5a.toByte)

  private def decoder = ImageIoDecoder()

  test("graceful refusal: a stripped JRE (absent imageio class) fails with instructions, not NoClassDefFoundError") {
    val d = ImageIoDecoder(imageIoClass = "no.such.javax.ImageIO")
    assert(!d.available)
    val e = intercept[IllegalArgumentException](d.lumaGrid(base))
    assert(e.getMessage.contains("javax.imageio"))
  }

  test("decoded pixel grid reproduces the pinned gradient signature; near-twin within radius, reversed image far") {
    assume(decoder.available, "JRE lacks java.desktop — decode tests skipped")
    val Some(g) = decoder.lumaGrid(base): @unchecked
    assert(g.width === 32 && g.height === 32)
    assert(g.counts.sum === 32L * 32 && g.counts.forall(_ === 16L),
      "32×32 must pool to 64 cells of 16 pixels")
    assert(ByteGridHashImpl.gradientSig(g.sums, g.counts) === BaseSig)

    // one brightened pixel cannot flip a 448-luma inter-cell margin
    val Some(t) = decoder.lumaGrid(twin): @unchecked
    assert(ByteGridHashImpl.hamming(
      ByteGridHashImpl.gradientSig(t.sums, t.counts), BaseSig) <= 6)

    // luma falling left→right reverses every gradient
    val Some(f) = decoder.lumaGrid(far): @unchecked
    assert(ByteGridHashImpl.hamming(
      ByteGridHashImpl.gradientSig(f.sums, f.counts), BaseSig) === 63)
  }

  test("undecodable bytes are corrupt-dropped, not errored") {
    assume(decoder.available, "JRE lacks java.desktop — decode tests skipped")
    assert(decoder.lumaGrid("definitely not an image".getBytes).isEmpty)
    // truncated header: a reader may claim it then reject mid-parse —
    // JDK codecs throw RuntimeExceptions on malformed streams, which
    // must become None (a poison payload in a streaming batch would
    // otherwise wedge the job on permanent replay)
    assert(decoder.lumaGrid(base.take(20)).isEmpty)
    assert(decoder.lumaGrid(base.take(200)).isEmpty, "torn pixel data")
  }

  test("hostile-input guards: decode-bomb rejected from the header; sub-pool-grid images refused") {
    assume(decoder.available, "JRE lacks java.desktop — decode tests skipped")
    // a 71-byte file declaring a 50000×50000 canvas: geometry must be
    // rejected from the HEADER (2.5 Gpx > MaxPixels), never allocated
    val bomb = base.take(54 + 17)
    val bb = java.nio.ByteBuffer.wrap(bomb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 50000).putInt(22, 50000)
    assert(decoder.lumaGrid(bomb).isEmpty, "decode-bomb must drop, not OOM")
    // below the 8×8 pool grid every adjacent gradient touches an
    // empty cell → ALL such images share the all-zero sig and would
    // suppress each other; refused like the byte path's len < 64
    assert(decoder.lumaGrid(bmp(4, 4, (x, y) => x * 50 + y)).isEmpty)
    assert(decoder.lumaGrid(bmp(7, 32, (x, y) => x * 30 + y)).isEmpty)
    assert(decoder.lumaGrid(bmp(8, 8, (x, y) => x * 30 + y * 3)).isDefined,
      "8×8 is the floor, not a refusal")
  }

  test("LumaGrid enforces the packed-band-key geometry bound at the seam itself") {
    // the band key is width*2^20 + height — a third-party decoder
    // returning dims >= 2^20 would silently bleed width bits into
    // height; the bound is the TYPE's contract, not ImageIoDecoder's
    // private discipline
    val cells = new Array[Long](ByteGridHashImpl.Cells)
    intercept[IllegalArgumentException](
      graft.ops.LumaGrid(cells, cells, 1 << 20, 16))
    intercept[IllegalArgumentException](
      graft.ops.LumaGrid(cells, cells, 16, 1 << 20))
    intercept[IllegalArgumentException](graft.ops.LumaGrid(cells, cells, 0, 16))
    intercept[IllegalArgumentException](graft.ops.LumaGrid(cells, cells, 16, -1))
    assert(graft.ops.LumaGrid(cells, cells, (1 << 20) - 1, 1).width == (1 << 20) - 1)
  }

  test("reflective decode failures: NonFatal causes corrupt-drop; fatal causes resurface") {
    import java.lang.reflect.InvocationTargetException
    import graft.ops.ImageIoDecoder
    // codec choking on hostile bytes → undecodable → None
    assert(ImageIoDecoder.undecodable(
      new InvocationTargetException(new java.io.IOException("torn"))).isEmpty)
    assert(ImageIoDecoder.undecodable(
      new InvocationTargetException(new ArrayIndexOutOfBoundsException(3))).isEmpty)
    assert(ImageIoDecoder.undecodable(
      new InvocationTargetException(null)).isEmpty)
    // an executor memory emergency or task kill during decode is NOT a
    // corrupt payload — swallowing it would hide the problem from the
    // task framework; the CAUSE must resurface
    intercept[OutOfMemoryError](ImageIoDecoder.undecodable(
      new InvocationTargetException(new OutOfMemoryError("imageio buffer"))))
    intercept[InterruptedException](ImageIoDecoder.undecodable(
      new InvocationTargetException(new InterruptedException())))
  }

  test("decoded sigs keep the corpus id type (no silent cast to long)") {
    assume(decoder.available, "JRE lacks java.desktop — decode tests skipped")
    val s = spark
    import s.implicits._
    val pl = Seq("doc-url-a" -> base, "doc-url-b" -> far)
      .toDF("doc_id", "payload")
    val sigs = PayloadDecoder.sigs(pl, decoder)
    assert(sigs.schema("doc_id").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(sigs.select($"doc_id").as[String].collect().toSet ===
      Set("doc-url-a", "doc-url-b"))
  }

  test("re-encode invariance: different bytes, same pixels → identical sig AND identical band-fusion key") {
    assume(decoder.available, "JRE lacks java.desktop — decode tests skipped")
    val s = spark
    import s.implicits._
    // byte level: the encodings genuinely differ (the byte path would
    // never band these together — lengths differ)
    assert(!java.util.Arrays.equals(base, reenc) && base.length != reenc.length)
    assert(ByteGridHashImpl.compute(base) !== ByteGridHashImpl.compute(reenc))
    // decoded level: geometry (not byte length) is the fused key, so
    // the pair is bandable and the sigs are bit-identical
    val sigs = PayloadDecoder.sigs(
      Seq(1L -> base, 2L -> reenc).toDF("doc_id", "payload"), decoder)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sigs(1L) === sigs(2L), s"re-encode must not change (key, sig): $sigs")
    assert(sigs(1L)._1 === ((32L << 20) | 32L), "key must be packed geometry")
  }

  test("decoded sigs feed the shared banded near-dup pipeline end-to-end") {
    assume(decoder.available, "JRE lacks java.desktop — decode tests skipped")
    val s = spark
    import s.implicits._
    val pl = Seq(
      1L -> base, 2L -> twin, 3L -> far,
      4L -> "garbage payload that is not an image at all".getBytes)
      .toDF("doc_id", "payload")
    val sigs = PayloadDecoder.sigs(pl, decoder)
    assert(sigs.select($"doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L),
      "undecodable row must drop; decodable rows must sign")
    // the byte-path pair pipeline consumes the decoded sigs verbatim:
    // same-geometry BMPs band together, only the pixel-twin verifies
    val pairs = graft.queries.MultimodalQueries.phashPairs(sigs)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)), s"got $pairs")
  }

  test("DedupStore.ingestPhash(decoder = …): a re-encoded archived image dies against the sig store") {
    assume(decoder.available, "JRE lacks java.desktop — decode tests skipped")
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("phs-dec").toString
    val dec = Some(decoder: PayloadDecoder)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select($"doc_id").as[Long].collect().toSet
    val d1 = graft.operators.DedupStore.ingestPhash(
      Seq(1L -> base, 2L -> far).toDF("doc_id", "payload"),
      root, "2024-07-01", decoder = dec)
    assert(ids(d1) === Set(1L, 2L))
    // day 2: 10 = RE-ENCODING of archived 1 (different bytes — the
    // byte-sig store would pass it); 11 = pixel twin of archived 2;
    // 12 = fresh image; 13 = undecodable → no sig, passes through
    val d2 = graft.operators.DedupStore.ingestPhash(
      Seq(10L -> reenc,
        11L -> bmp(32, 32, (x, y) => if (x == 5 && y == 5) 210 else 217 - x * 7),
        12L -> bmp(32, 32, (x, y) => (x * 7 + y * 31) % 256),
        13L -> "not an image".getBytes).toDF("doc_id", "payload"),
      root, "2024-07-02", decoder = dec)
    assert(ids(d2) === Set(12L, 13L), s"got ${ids(d2)}")
  }
}
