package graft.io

import graft.io.AdtechProtos._

/** Protobuf wire-format writer — the inverse of [[ProtoWire]] — plus
  * the reference's sink encodings (S3: one Base64 proto per text line,
  * `utils/IOUtils.java:15-19`; the round-trip contract is
  * decode(encode(x)) == x, spec'd in ProtoCodecSpec).
  *
  * Proto3 default-suppression applies: zero/empty scalars are not
  * written, matching canonical protobuf serialization.
  */
object ProtoWriter {

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream(64)

    def varint(v: Long): this.type = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
      this
    }

    def key(field: Int, wireType: Int): this.type = varint((field.toLong << 3) | wireType)

    def int(field: Int, v: Long): this.type =
      if (v == 0) this else { key(field, 0); varint(v) }

    def str(field: Int, v: String): this.type =
      if (v == null || v.isEmpty) this else bytes(field, v.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    def bytes(field: Int, v: Array[Byte]): this.type = {
      key(field, 2); varint(v.length.toLong); out.write(v); this
    }

    /** Nested message (always written, even if empty — callers decide). */
    def msg(field: Int)(body: Writer => Unit): this.type = {
      val w = new Writer
      body(w)
      bytes(field, w.result())
    }

    def result(): Array[Byte] = out.toByteArray
  }

  /** map<int32,int32> entry list (entry = {1: key, 2: value}). Entries
    * sorted by key for deterministic output. */
  private def mapInt(w: Writer, field: Int, m: Map[Int, Int]): Unit =
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      w.msg(field) { e => e.int(1, k.toLong); e.int(2, v.toLong) }
    }

  def encodeDeviceId(r: DeviceIdRec): Array[Byte] = {
    val w = new Writer
    w.int(1, r.os.toLong)
    w.str(2, r.uuid)
    w.result()
  }

  def encodeDeviceProfile(r: DeviceProfileRec): Array[Byte] = {
    val w = new Writer
    if (r.os != 0 || r.uuid.nonEmpty)
      w.msg(1) { id => id.int(1, r.os.toLong); id.str(2, r.uuid) }
    r.app.foreach { a =>
      w.msg(5) { aw =>
        aw.str(1, a.bundle)
        aw.int(2, a.firstAt)
        aw.int(3, a.lastAt)
        mapInt(aw, 6, a.countPerExchange)
      }
    }
    w.int(9, r.firstAt)
    w.int(10, r.lastAt)
    r.geo.foreach { g =>
      w.msg(11) { gw => gw.str(1, g.country); gw.str(2, g.region) }
    }
    w.result()
  }

  def encodeAppProfile(r: AppProfileRec): Array[Byte] = {
    val w = new Writer
    w.str(1, r.bundle)
    w.int(2, r.userCount.toLong)
    mapInt(w, 3, r.userCountPerExchange)
    w.result()
  }

  def encodeIapp(r: IappRec): Array[Byte] = {
    val w = new Writer
    w.str(1, r.bundle)
    w.int(2, r.numPurchasers)
    w.int(3, r.totalAmount)
    w.result()
  }

  def toBase64(bytes: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bytes)
}
