package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** S1: TFRecord source — the reference's raw input format
  * (`jobs1/BidLogJob.java:135` reads `input/bidlog*.tfrecord.gz`).
  *
  * TFRecord framing (public TensorFlow spec): per record
  * `uint64 length (LE) | uint32 masked-crc32c(length) | bytes |
  * uint32 masked-crc32c(bytes)`, mask(c) = ((c>>>15)|(c<<17)) +
  * 0xa282ead8. CRCs are verified; a mismatch throws (corrupt framing
  * is a file-level error, unlike per-record proto corruption which
  * the decode stage drops — P1 semantics).
  *
  * Scale note: `.gz` members are non-splittable, so parallelism is
  * one task per file — the same property the reference relies on
  * (SURVEY §2.1 S1). Files are streamed (never materialized whole);
  * `binaryFile` pruning pushes the path glob down.
  */
object TfRecordSource {

  private val MaskDelta = 0xa282ead8

  private def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val crc = new java.util.zip.CRC32C
    crc.update(bytes, off, len)
    val c = crc.getValue.toInt
    ((c >>> 15) | (c << 17)) + MaskDelta
  }

  private def readFully(in: java.io.InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var read = 0
    while (read < n) {
      val r = in.read(buf, read, n - read)
      if (r < 0) throw new java.io.EOFException(s"expected $n bytes, got $read")
      read += r
    }
    buf
  }

  private def le64(b: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  private def le32(b: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt

  /** Parse one stream of TFRecord frames. */
  def parseStream(in: java.io.InputStream): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] = advance()
      private def advance(): Array[Byte] = {
        val lenHdr = new Array[Byte](8)
        val first = in.read(lenHdr, 0, 1)
        if (first < 0) return null // clean EOF
        var read = 1
        while (read < 8) {
          val r = in.read(lenHdr, read, 8 - read)
          if (r < 0) throw new java.io.EOFException("truncated length header")
          read += r
        }
        val len = le64(lenHdr)
        require(len >= 0 && len < Int.MaxValue, s"bad record length $len")
        val lenCrc = le32(readFully(in, 4))
        require(lenCrc == maskedCrc(lenHdr, 0, 8), "length CRC mismatch")
        val data = readFully(in, len.toInt)
        val dataCrc = le32(readFully(in, 4))
        require(dataCrc == maskedCrc(data, 0, data.length), "data CRC mismatch")
        data
      }
      override def hasNext: Boolean = nextRec != null
      override def next(): Array[Byte] = {
        val r = nextRec
        nextRec = advance()
        r
      }
    }

  /** Serializable snapshot of a Hadoop conf (the class itself is not
    * serializable; executors must not fall back to a fresh
    * `new Configuration()` that drops every spark.hadoop.* setting). */
  private[sources] def confEntries(
      c: org.apache.hadoop.conf.Configuration): Seq[(String, String)] = {
    val it = c.iterator()
    val buf = Seq.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.result()
  }
  private[sources] def rebuildConf(
      entries: Seq[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Wrap a record iterator so any framing/IO failure names the FILE
    * it came from. A bare "data CRC mismatch" in a dead task on a
    * 100k-file input is undebuggable; with the path it's one `hdfs
    * dfs -stat` away. Construction is guarded too (gzip header
    * errors throw before the first record). */
  private def withFileContext(p: String)(
      mk: => Iterator[Array[Byte]]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private def ctx[B](f: => B): B =
        try f catch {
          case e: java.io.IOException =>
            throw new java.io.IOException(s"corrupt TFRecord file $p: ${e.getMessage}", e)
          case e: IllegalArgumentException =>
            throw new java.io.IOException(s"corrupt TFRecord framing in $p: ${e.getMessage}", e)
        }
      private val inner = ctx(mk)
      override def hasNext: Boolean = ctx(inner.hasNext)
      override def next(): Array[Byte] = ctx(inner.next())
    }

  /** Distributed read: glob → one task per file (gzip non-splittable),
    * streamed record iteration. */
  def read(spark: SparkSession, pathGlob: String): Dataset[Array[Byte]] =
    readFiles(spark, Seq(pathGlob))

  /** Multi-path variant of [[read]] — an explicit file list (e.g. from
    * [[graft.streaming.TfRecordStreamSink.readCommitted]]'s manifests)
    * instead of one glob. Empty list → empty dataset (a day-zero
    * export directory has no committed batches). */
  def readFiles(spark: SparkSession, paths: Seq[String]): Dataset[Array[Byte]] = {
    import spark.implicits._
    if (paths.isEmpty) return spark.emptyDataset[Array[Byte]]
    val hadoopConf = confEntries(spark.sparkContext.hadoopConfiguration)
    spark.read.format("binaryFile").load(paths: _*)
      .select("path")
      .as[String]
      .mapPartitions { paths =>
        val conf = rebuildConf(hadoopConf)
        paths.flatMap { p =>
          withFileContext(p) {
            val hPath = new org.apache.hadoop.fs.Path(p)
            val fs = hPath.getFileSystem(conf)
            val raw: java.io.InputStream = fs.open(hPath)
            val in = if (p.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw) else raw
            parseStream(new java.io.BufferedInputStream(in))
          }
        }
      }
  }

  /** Frame ONE record (`uint64 len | crc(len) | bytes | crc(bytes)`) —
    * the single encoder shared by [[writeLocal]] and the distributed
    * [[TfRecordSink]], so write-side framing can never drift from the
    * read-side verification above. */
  def writeFrame(out: java.io.OutputStream, r: Array[Byte]): Unit = {
    val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(r.length.toLong)
    val lenHdr = bb.array()
    out.write(lenHdr)
    writeLe32(out, maskedCrc(lenHdr, 0, 8))
    out.write(r)
    writeLe32(out, maskedCrc(r, 0, r.length))
  }

  /** Local writer (fixtures/tests; the distributed sink is
    * [[TfRecordSink]]). */
  def writeLocal(records: Seq[Array[Byte]], file: java.io.File, gzip: Boolean): Unit = {
    val fout = new java.io.FileOutputStream(file)
    val out = if (gzip) new java.util.zip.GZIPOutputStream(fout) else fout
    try records.foreach(writeFrame(out, _))
    finally out.close()
  }

  private def writeLe32(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
}
