package graft.ops

import graft.functions.ByteGridHashImpl
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** A decoded payload's 64-cell luma grid plus its source geometry —
  * everything downstream needs: the cells feed
  * [[ByteGridHashImpl.gradientSig]], the dimensions feed the band
  * key (see [[PayloadDecoder.sigs]] — geometry, not byte length, is
  * what survives a re-encode).
  *
  * Geometry bounds are part of THIS type's contract, not any one
  * decoder's private discipline (round 12): [[PayloadDecoder.sigs]]
  * packs the band-fusion key as `width·2²⁰ + height`, so a decoder
  * returning dims outside (0, 2²⁰) would silently corrupt the packed
  * key — width bits bleeding into height mis-fuses band keys with no
  * error. A third-party decoder that can see such dims must reject
  * the payload itself (return None — corrupt-drop), not construct an
  * out-of-range grid. */
final case class LumaGrid(sums: Array[Long], counts: Array[Long],
    width: Int, height: Int) {
  require(width > 0 && width < (1 << 20) && height > 0 && height < (1 << 20),
    s"LumaGrid geometry must be in (0, 2^20) per dimension — the packed " +
      s"band key is width*2^20 + height — got ${width}x$height; a decoder " +
      "seeing such dims must corrupt-drop the payload (return None) instead")
}

/** Pluggable payload-DECODE seam (round 11) — the [[TensorFlowScorer]]
  * mold applied to the multimodal pillar: the engine's perceptual
  * near-dup pipeline is codec-independent by construction
  * ([[graft.functions.ByteGridHash]] hashes raw bytes), but a real
  * deployment's first request is "point it at JPEGs" — decode the
  * image and hash the PIXELS, so re-encodes and metadata rewrites
  * that scramble the byte stream but not the picture still collide.
  * This trait is that one swap point: a decoder turns payload bytes
  * into the SAME 64-cell (sum, count) grid the byte path aggregates,
  * and [[ByteGridHashImpl.gradientSig]] turns either grid into the
  * identical 63-bit signature — everything downstream (7×9-bit
  * banding, hamming verify, [[graft.operators.DedupStore.ingestPhash]]
  * persistence, which takes a `decoder` directly) is shared code,
  * unchanged.
  *
  * Undecodable payloads return None and are DROPPED by [[sigs]] — the
  * corrupt-drop policy the engine applies at every decode seam (the
  * reference's proto-decode stance; q55's observed metric is the
  * monitoring pattern to copy if drop-rate visibility is needed).
  *
  * Implementations must be Serializable (they ship to executors) and
  * cheap to construct per-JVM — cache native resources in a companion
  * (the [[TensorFlowScorer]] bundle discipline), not in the instance.
  */
trait PayloadDecoder extends Serializable {

  /** The payload's 64-cell luma grid + geometry, or None if it does
    * not decode under this codec. */
  def lumaGrid(payload: Array[Byte]): Option[LumaGrid]
}

object PayloadDecoder {

  /** `(doc_id, n_bytes, sig)` from a `(idCol, payloadCol)` frame via
    * a real decoder — shape-identical to
    * [[graft.queries.MultimodalQueries]]' byte-path signature frame,
    * so the banded pair join, the planted-twin gate machinery and the
    * sig store consume either. Row-local `mapPartitions` (decode is
    * per-payload CPU, no shuffle); null and undecodable payloads are
    * dropped (corrupt-drop). The id column keeps its CORPUS type
    * (string URLs, UUIDs, longs — same id-type-agnostic contract as
    * the byte path and the store's template mechanism; no silent
    * cast).
    *
    * The `n_bytes` slot — the value the banding fuses into every band
    * key — carries the packed PIXEL GEOMETRY (`width·2²⁰ + height`),
    * NOT the encoded byte length: two encodings of the same picture
    * (PNG vs BMP, stripped metadata, different row padding) differ in
    * bytes but not geometry, and matching across re-encodes is the
    * decoded path's entire reason to exist. The fusion still does its
    * band-key-space job (the ×47 lesson): corpora bucket by image
    * size, and a resize re-bins every grid cell anyway (the dHash
    * contract — same-geometry in-place edits, not crops). */
  def sigs(pl: DataFrame, decoder: PayloadDecoder,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    val in = pl.select(col(idCol).as("doc_id"),
      col(payloadCol).cast("binary").as("__pl"))
    val outSchema = StructType(Seq(in.schema.head,
      StructField("n_bytes", LongType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    in.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null) None
        else decoder.lumaGrid(bytes).map { g =>
          Row(r.get(0), (g.width.toLong << 20) | g.height.toLong,
            ByteGridHashImpl.gradientSig(g.sums, g.counts))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}

/** Image decoder over the JDK's own codec stack (`javax.imageio` —
  * PNG/JPEG/BMP/GIF readers ship with every full JRE), accessed via
  * REFLECTION so the engine still compiles and runs on a stripped
  * runtime without the `java.desktop` module (server-jre images): on
  * such a JRE [[available]] is false and [[lumaGrid]] fails with
  * instructions instead of a NoClassDefFoundError mid-task — the
  * [[TensorFlowScorer]] graceful-refusal contract
  * (PayloadDecoderSpec pins both paths).
  *
  * Decode discipline (a crawl's payload column is HOSTILE input):
  *  - geometry is read from the HEADER first (`ImageReader.getWidth/
  *    getHeight` before `read`), so a decode-bomb — a tiny file
  *    declaring a 40000×40000 canvas — is rejected by [[MaxPixels]]
  *    BEFORE any pixel buffer is allocated, instead of OOM-killing
  *    the executor and wedging a streaming batch on permanent replay;
  *  - ANY codec failure during header or pixel decode (JDK readers
  *    throw RuntimeExceptions, not just IOExceptions, on malformed
  *    streams) is "undecodable" → None → corrupt-drop. Only the
  *    missing-JRE-module case refuses loudly;
  *  - images narrower or shorter than the 8×8 pool grid are refused
  *    (w, h ≥ 8): below that, alternating pool cells are empty and
  *    EVERY such image degenerates to the all-zero gradient — two
  *    distinct 4×4 icons would suppress each other as "near-dups".
  *    The byte path's `length ≥ 64` filter guards the same
  *    degeneracy; this is its pixel-space twin.
  *
  * Cell mapping: the decoded image is average-pooled onto an 8×8
  * spatial grid (pixel (x, y) → cell (⌊8y/h⌋·8 + ⌊8x/w⌋)); each
  * pixel contributes its INTEGER BT.601 luma
  * (⌊(299·R + 587·G + 114·B) / 1000⌋), keeping the whole signature
  * integer-exact like the byte path.
  *
  * The `imageIoClass` parameter exists for the spec's refusal-path
  * pin (point it at a class that does not exist and the decoder
  * behaves exactly as it would on a stripped JRE). */
final case class ImageIoDecoder(
    imageIoClass: String = "javax.imageio.ImageIO") extends PayloadDecoder {

  /** True when the JRE ships the imageio stack. */
  def available: Boolean =
    try { Class.forName(imageIoClass); true }
    catch { case _: Throwable => false }

  override def lumaGrid(payload: Array[Byte]): Option[LumaGrid] = {
    require(available, ImageIoDecoder.Missing)
    ImageIoDecoder.grid(imageIoClass, payload)
  }
}

object ImageIoDecoder {

  private[ops] val Missing =
    "javax.imageio is not available (this JRE was built without the " +
      "java.desktop module) — run on a full JRE, or plug a codec-library " +
      "PayloadDecoder implementation instead"

  /** Decoded-pixel cap (16M px ≈ 64 MB int buffer) — checked against
    * the HEADER dims before allocation; the decode-bomb guard. */
  private[ops] val MaxPixels: Long = 1L << 24

  private final case class Api(createStream: java.lang.reflect.Method,
      getReaders: java.lang.reflect.Method, setInput: java.lang.reflect.Method,
      getW: java.lang.reflect.Method, getH: java.lang.reflect.Method,
      readImg: java.lang.reflect.Method, dispose: java.lang.reflect.Method,
      rgb: java.lang.reflect.Method)

  // resolved once per (JVM, class-name) — reflective Method lookups
  // are the per-call cost worth caching; the decode itself dominates.
  // Lookup failures here mean the module is absent → propagate (the
  // loud-refusal path), unlike per-payload decode failures below.
  private val apis = new java.util.concurrent.ConcurrentHashMap[String, Api]()

  private def api(cls: String): Api = apis.computeIfAbsent(cls, c => {
    val io = Class.forName(c)
    val reader = Class.forName("javax.imageio.ImageReader")
    Api(
      io.getMethod("createImageInputStream", classOf[Object]),
      io.getMethod("getImageReaders", classOf[Object]),
      reader.getMethod("setInput", classOf[Object]),
      reader.getMethod("getWidth", classOf[Int]),
      reader.getMethod("getHeight", classOf[Int]),
      reader.getMethod("read", classOf[Int]),
      reader.getMethod("dispose"),
      // BufferedImage.getRGB(startX, startY, w, h, rgbArray, offset,
      // scansize) — ONE reflective call per image, not one per pixel
      Class.forName("java.awt.image.BufferedImage")
        .getMethod("getRGB", classOf[Int], classOf[Int], classOf[Int],
          classOf[Int], classOf[Array[Int]], classOf[Int], classOf[Int]))
  })

  private[ops] def grid(cls: String, bytes: Array[Byte]): Option[LumaGrid] = {
    val a = api(cls)
    try {
      val iis = a.createStream.invoke(null, new java.io.ByteArrayInputStream(bytes))
      if (iis == null) return None
      try {
        val readers = a.getReaders.invoke(null, iis)
          .asInstanceOf[java.util.Iterator[AnyRef]]
        if (!readers.hasNext) return None // no registered codec claims it
        val rd = readers.next()
        try {
          a.setInput.invoke(rd, iis)
          val w = a.getW.invoke(rd, Int.box(0)).asInstanceOf[Int]
          val h = a.getH.invoke(rd, Int.box(0)).asInstanceOf[Int]
          if (w < 8 || h < 8 || w >= (1 << 20) || h >= (1 << 20) ||
              w.toLong * h > MaxPixels) return None
          val bi = a.readImg.invoke(rd, Int.box(0))
          if (bi == null) return None
          val px = new Array[Int](w * h)
          a.rgb.invoke(bi, Int.box(0), Int.box(0), Int.box(w), Int.box(h),
            px, Int.box(0), Int.box(w))
          val sums = new Array[Long](ByteGridHashImpl.Cells)
          val ns = new Array[Long](ByteGridHashImpl.Cells)
          var y = 0
          while (y < h) {
            val row = (y.toLong * 8 / h).toInt * 8
            var x = 0
            while (x < w) {
              val p = px(y * w + x)
              val luma = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff)
                + 114 * (p & 0xff)) / 1000
              val cell = row + (x.toLong * 8 / w).toInt
              sums(cell) += luma
              ns(cell) += 1
              x += 1
            }
            y += 1
          }
          Some(LumaGrid(sums, ns, w, h))
        } finally a.dispose.invoke(rd)
      } finally iis.asInstanceOf[AutoCloseable].close()
    } catch {
      // a reader claimed the stream then choked on it — the JDK
      // codecs throw IOException AND assorted RuntimeExceptions
      // (ArrayIndexOutOfBounds, NegativeArraySize, CMMException) on
      // malformed input; all of it is "undecodable", none of it may
      // kill the task (a poison payload in a streaming batch would
      // wedge the job on permanent replay)
      case e: java.lang.reflect.InvocationTargetException => undecodable(e)
    }
  }

  /** The corrupt-drop decision for a reflective decode failure
    * (round 12): NonFatal causes are "undecodable" → None, but a
    * FATAL cause wrapped by reflection (OutOfMemoryError from ImageIO
    * internals, InterruptedException from a task kill) is an executor
    * problem, not a corrupt payload — swallowing it would reclassify
    * a memory emergency as a data drop and hide it from the task
    * framework. Rethrow the CAUSE so it surfaces exactly as a direct
    * call would have thrown it. */
  private[graft] def undecodable(
      e: java.lang.reflect.InvocationTargetException): Option[LumaGrid] = {
    val c = e.getCause
    if (c != null && !scala.util.control.NonFatal(c)) throw c
    None
  }
}
