package graft.io

/** Minimal protobuf wire-format reader (public encoding spec:
  * varint / 64-bit / length-delimited / 32-bit field encodings).
  *
  * The reference interchanges every intermediate dataset as one
  * Base64-encoded proto message per text line (S2/S3, reference
  * `utils/ProtoUtils.java:22-42`, `utils/IOUtils.java:15-19`). This
  * engine reads that format without a protoc toolchain: a streaming
  * field reader plus per-message decoders in [[AdtechProtos]]. It is
  * dependency-free and serializable, so decoding runs distributed
  * inside `mapPartitions` (no driver-side collect).
  */
object ProtoWire {

  final class Reader(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start

    def hasMore: Boolean = pos < end

    def varint(): Long = {
      var shift = 0
      var out = 0L
      var b = 0
      do {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        b = buf(pos) & 0xff
        pos += 1
        out |= (b & 0x7fL) << shift
        shift += 7
        if (shift > 70) throw new IllegalArgumentException("varint too long")
      } while ((b & 0x80) != 0)
      out
    }

    /** Returns (fieldNumber, wireType). */
    def key(): (Int, Int) = {
      val k = varint()
      ((k >>> 3).toInt, (k & 7).toInt)
    }

    /** Reader over the next length-delimited value (submessage). */
    def subReader(): Reader = {
      val len = varint().toInt
      if (len < 0 || pos + len > end) throw new IllegalArgumentException("bad length")
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }

    def bytes(): Array[Byte] = {
      val len = varint().toInt
      if (len < 0 || pos + len > end) throw new IllegalArgumentException("bad length")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }

    def string(): String = new String(bytes(), java.nio.charset.StandardCharsets.UTF_8)

    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val len = varint().toInt; pos += len
      case 5 => pos += 4
      case t => throw new IllegalArgumentException(s"unsupported wire type $t")
    }
  }

  /** Decode one `map<int32,int32>` entry submessage (key=1, value=2). */
  def mapEntryInt(r: Reader): (Int, Int) = {
    var k = 0
    var v = 0
    while (r.hasMore) {
      val (f, wt) = r.key()
      f match {
        case 1 => k = r.varint().toInt
        case 2 => v = r.varint().toInt
        case _ => r.skip(wt)
      }
    }
    (k, v)
  }
}
