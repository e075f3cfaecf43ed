package graft.ops

import graft.functions.ByteGridHashImpl
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** A decoded payload's 64-cell luma grid plus its source geometry —
  * everything downstream needs: the cells feed
  * [[ByteGridHashImpl.gradientSig]], the dimensions feed the band
  * key (see [[PayloadDecoder.sigs]] — geometry, not byte length, is
  * what survives a re-encode). */
final case class LumaGrid(sums: Array[Long], counts: Array[Long],
    width: Int, height: Int)

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
    * dropped (corrupt-drop).
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
    val spark = pl.sparkSession
    import spark.implicits._
    pl.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        if (bytes == null) None
        else decoder.lumaGrid(bytes).map { g =>
          (id, (g.width.toLong << 20) | g.height.toLong,
            ByteGridHashImpl.gradientSig(g.sums, g.counts))
        }
      })
      .toDF("doc_id", "n_bytes", "sig")
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
  * Cell mapping: the decoded image is average-pooled onto an 8×8
  * spatial grid (pixel (x, y) → cell (⌊8y/h⌋·8 + ⌊8x/w⌋)); each
  * pixel contributes its INTEGER BT.601 luma
  * (⌊(299·R + 587·G + 114·B) / 1000⌋), keeping the whole signature
  * integer-exact like the byte path. Images smaller than 8×8 leave
  * empty cells, which the gradient compares deterministically
  * (0 > 0 = false) — same rule as short byte payloads.
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

  // resolved once per (JVM, class-name) — reflective Method lookups are
  // the per-call cost worth caching; the decode itself dominates
  private val methods =
    new java.util.concurrent.ConcurrentHashMap[String, (java.lang.reflect.Method, java.lang.reflect.Method)]()

  private def readAndRgb(cls: String) =
    methods.computeIfAbsent(cls, c => {
      val read = Class.forName(c)
        .getMethod("read", classOf[java.io.InputStream])
      // BufferedImage.getRGB(startX, startY, w, h, rgbArray, offset,
      // scansize) — ONE reflective call per image, not one per pixel
      val rgb = Class.forName("java.awt.image.BufferedImage")
        .getMethod("getRGB", classOf[Int], classOf[Int], classOf[Int],
          classOf[Int], classOf[Array[Int]], classOf[Int], classOf[Int])
      (read, rgb)
    })

  private[ops] def grid(cls: String, bytes: Array[Byte]): Option[LumaGrid] = {
    val (read, rgbM) = readAndRgb(cls)
    // ImageIO.read returns null for streams no registered reader
    // claims, and throws for streams a reader claims then rejects —
    // both are "undecodable" here
    val img =
      try read.invoke(null, new java.io.ByteArrayInputStream(bytes))
      catch { case e: java.lang.reflect.InvocationTargetException
        if e.getCause.isInstanceOf[java.io.IOException] => null }
    if (img == null) return None
    val bi = img.asInstanceOf[AnyRef]
    val w = bi.getClass.getMethod("getWidth").invoke(bi).asInstanceOf[Int]
    val h = bi.getClass.getMethod("getHeight").invoke(bi).asInstanceOf[Int]
    if (w <= 0 || h <= 0 || w >= (1 << 20) || h >= (1 << 20)) return None
    val px = new Array[Int](w * h)
    rgbM.invoke(bi, Int.box(0), Int.box(0), Int.box(w), Int.box(h),
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
  }
}
