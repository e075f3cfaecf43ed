package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Dataset

/** TFRecord(.gz) WRITE side — the export half of the reference's
  * interchange story (its IO layer reads and writes the format,
  * `utils/IOUtils.java:15-19`; training-data export commonly targets
  * tfrecord shards alongside [[graft.io.ShardWriter]]'s parquet).
  *
  * One output file per partition: gzip members are non-splittable, so
  * file count = read-side parallelism — the exact mirror of
  * [[TfRecordSource]]'s one-task-per-file read. Size the partitioning
  * upstream (`repartition(n)` / [[graft.io.ShardWriter]]-style byte
  * balancing) to pick the shard layout; each task streams its records
  * through [[TfRecordSource.writeFrame]] (same CRC32C framing the
  * read side verifies — round-trip is bit-exact, TfRecordSpec).
  * Nothing is collected to the driver beyond one count per file.
  */
object TfRecordSink {

  /** TFRecord framing overhead per record: 8-byte length + two
    * 4-byte masked CRCs. */
  private val FrameOverhead = 16L

  /** Byte-TARGETED shard export — [[graft.io.ShardWriter]]'s
    * discipline for the tfrecord format: size the shard count from
    * the actual framed payload (⌈bytes / targetShardBytes⌉) and
    * spread records round-robin across that many shards. Round-robin
    * equalizes per-shard ROW counts exactly, so shard BYTES track the
    * target as long as record sizes are not pathologically skewed
    * (a single record bigger than the target necessarily overflows
    * its shard — no row-level sharding can fix that); it is
    * deliberately NOT content-keyed, which would pile every copy of
    * a duplicated record into one shard on pre-dedup corpora. One
    * counting pass + one shuffle; no driver-side data movement.
    * Sizes are pre-gzip (compressed size depends on content; the
    * target bounds the uncompressed payload like a row-group target
    * does).
    * @return (filesWritten, recordsWritten) */
  def writeBalanced(records: Dataset[Array[Byte]], dir: String,
      targetShardBytes: Long = 128L * 1024 * 1024,
      gzip: Boolean = true): (Int, Long) = {
    import records.sparkSession.implicits._
    require(targetShardBytes > 0, "targetShardBytes must be positive")
    val totalBytes = records.map(r => r.length + FrameOverhead)
      .agg(org.apache.spark.sql.functions.sum("value"))
      .as[Option[Long]].head().getOrElse(0L)
    if (totalBytes == 0L) return (0, 0L)
    // clamped so a tiny target on a huge corpus can't wrap Int
    val shards = math.min(Int.MaxValue.toLong, math.max(1L,
      math.ceil(totalBytes.toDouble / targetShardBytes).toLong)).toInt
    // round-robin, NOT content-keyed: hashing record bytes would pile
    // every duplicate of a hot record into one shard (pre-dedup crawl
    // exports are exactly that shape) — row-count spreading is what
    // actually bounds shard bytes for near-uniform record sizes
    write(records.repartition(shards), dir, gzip)
  }

  /** @return (filesWritten, recordsWritten) */
  def write(records: Dataset[Array[Byte]], dir: String,
      gzip: Boolean = true): (Int, Long) = {
    val ext = if (gzip) ".tfrecord.gz" else ".tfrecord"
    // carry the session's Hadoop conf to executors — a fresh
    // Configuration() there would drop every spark.hadoop.* setting
    // (S3A credentials/endpoints, fs.defaultFS)
    val hadoopConf = TfRecordSource.confEntries(
      records.sparkSession.sparkContext.hadoopConfiguration)
    val counts = records.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val conf = TfRecordSource.rebuildConf(hadoopConf)
        val finalPath = new Path(dir, f"part-$idx%05d$ext")
        val fs = finalPath.getFileSystem(conf)
        // attempt-unique temp + rename-on-success: a speculative or
        // zombie attempt can never tear a file another attempt wrote —
        // rename is atomic, so the final name only ever holds a
        // COMPLETE file (last complete attempt wins)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId).getOrElse(0L)
        val tmp = new Path(dir, f".part-$idx%05d.attempt-$attempt$ext.tmp")
        val raw: java.io.OutputStream = fs.create(tmp, true)
        val out = if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
        var n = 0L
        try it.foreach { r => TfRecordSource.writeFrame(out, r); n += 1 }
        finally out.close()
        fs.delete(finalPath, false)
        require(fs.rename(tmp, finalPath), s"commit rename failed for $finalPath")
        Iterator.single(n)
      }
    }.collect()
    (counts.length, counts.sum)
  }
}
