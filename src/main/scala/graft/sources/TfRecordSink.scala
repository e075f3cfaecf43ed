package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.Dataset

/** TFRecord(.gz) WRITE side — the export half of the reference's
  * interchange story (its IO layer reads and writes the format,
  * `utils/IOUtils.java:15-19`; training-data export commonly targets
  * tfrecord shards alongside [[graft.io.ShardWriter]]'s parquet).
  *
  * One output file per partition: gzip members are non-splittable, so
  * file count = read-side parallelism — the exact mirror of
  * [[TfRecordSource]]'s one-task-per-file read. Size the partitioning
  * upstream (`repartition(n)` / [[writeBalanced]]'s byte packing) to
  * pick the shard layout; each task streams its records through
  * [[TfRecordSource.writeFrame]] (same CRC32C framing the read side
  * verifies — round-trip is bit-exact, TfRecordSpec). Nothing is
  * collected to the driver beyond one count per file.
  */
object TfRecordSink {

  /** TFRecord framing overhead per record: 8-byte length + two
    * 4-byte masked CRCs. */
  private val FrameOverhead = 16L

  /** Byte-PACKED shard export — [[graft.io.ShardWriter]]'s discipline
    * for the tfrecord format, byte-aware down to the record. Two
    * passes over the input:
    *
    *  1. per-PARTITION framed-byte totals (the only driver collect is
    *     one (index, bytes) pair per partition — no data rows), whose
    *     prefix sums give every partition its exclusive starting
    *     offset in the global byte stream;
    *  2. each record is assigned shard `floor(cumBytes / target)`
    *     from its running global byte offset — contiguous cumulative
    *     packing, the distributed prefix-sum form of bin packing.
    *
    * Every shard's bytes land in (target − maxRec, target + maxRec)
    * (the last may be smaller), so a heavy-tailed corpus — record
    * sizes 100:1 and worse — still can't blow a shard past
    * target + one record (TfRecordSpec pins ≤ 1.5× target at 100:1
    * skew with records ≤ target/2; a SINGLE record bigger than the
    * target necessarily overflows its shard — no row-level sharding
    * can fix that). The round-4 row-count round-robin only bounded
    * shard bytes for near-uniform record sizes. Packing is
    * content-agnostic (never keyed on record bytes), so duplicate-
    * heavy pre-dedup corpora stay balanced. Order: each input
    * partition's records stay contiguous and in order inside a shard,
    * and shards cover contiguous byte ranges — but a shard straddling
    * an input-partition boundary receives its (at most a handful of)
    * per-partition runs in shuffle-fetch order, so cross-partition
    * interleave at the seam is not pinned. Sizes are pre-gzip
    * (compressed size depends on content; the target bounds the
    * uncompressed payload like a row-group target does).
    *
    * Both passes re-evaluate the input's lineage (cache upstream if
    * that is expensive); the balance bound needs only that partition
    * CONTENTS are stable across the two passes — within-partition
    * order may differ, the per-partition byte sums commute.
    *
    * filesWritten is ⌈totalBytes / target⌉ or one less (a big record
    * straddling the final boundary can leave the last byte-window
    * with no record start — its shard is simply absorbed upstream).
    * @return (filesWritten, recordsWritten) */
  def writeBalanced(records: Dataset[Array[Byte]], dir: String,
      targetShardBytes: Long = 128L * 1024 * 1024,
      gzip: Boolean = true): (Int, Long) = {
    require(targetShardBytes > 0, "targetShardBytes must be positive")
    val rdd = records.rdd
    // pass 1: metadata-only — one (partition, framedBytes) pair each
    val partBytes = rdd.mapPartitionsWithIndex { (idx, it) =>
      var s = 0L
      it.foreach(r => s += r.length + FrameOverhead)
      Iterator.single(idx -> s)
    }.collect().sortBy(_._1)
    val totalBytes = partBytes.iterator.map(_._2).sum
    if (totalBytes == 0L) return (0, 0L)
    // clamped so a tiny target on a huge corpus can't wrap Int
    val shards = math.min(Int.MaxValue.toLong, math.max(1L,
      math.ceil(totalBytes.toDouble / targetShardBytes).toLong)).toInt
    // exclusive prefix sums: partition idx starts at starts(idx) in
    // the global byte stream (tiny map — one long per partition)
    val starts: Map[Int, Long] = {
      var acc = 0L
      partBytes.map { case (idx, b) =>
        val e = idx -> acc; acc += b; e
      }.toMap
    }
    val packed = rdd.mapPartitionsWithIndex { (idx, it) =>
      var cum = starts(idx)
      it.map { r =>
        val sid = math.min(shards - 1L, cum / targetShardBytes).toInt
        cum += r.length + FrameOverhead
        (sid, r)
      }
    }.partitionBy(new org.apache.spark.Partitioner {
      override def numPartitions: Int = shards
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }).map(_._2)
    writeRdd(records.sparkSession, packed, dir, gzip)
  }

  /** @return (filesWritten, recordsWritten) */
  def write(records: Dataset[Array[Byte]], dir: String,
      gzip: Boolean = true): (Int, Long) =
    writeRdd(records.sparkSession, records.rdd, dir, gzip)

  private def writeRdd(spark: org.apache.spark.sql.SparkSession,
      records: org.apache.spark.rdd.RDD[Array[Byte]], dir: String,
      gzip: Boolean): (Int, Long) = {
    val ext = if (gzip) ".tfrecord.gz" else ".tfrecord"
    // carry the session's Hadoop conf to executors — a fresh
    // Configuration() there would drop every spark.hadoop.* setting
    // (S3A credentials/endpoints, fs.defaultFS)
    val hadoopConf = TfRecordSource.confEntries(
      spark.sparkContext.hadoopConfiguration)
    val counts = records.mapPartitionsWithIndex { (idx, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val conf = TfRecordSource.rebuildConf(hadoopConf)
        val finalPath = new Path(dir, f"part-$idx%05d$ext")
        val fs = finalPath.getFileSystem(conf)
        // attempt-unique temp + OVERWRITE rename on success: a
        // speculative or zombie attempt can never tear a file another
        // attempt wrote, and — unlike a delete-then-rename pair, which
        // has a window holding ZERO files — the overwrite rename is a
        // single FS operation, so once any attempt has committed the
        // final name always holds a COMPLETE file (last committer wins)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new Path(dir, f".part-$idx%05d.attempt-$attempt$ext.tmp")
        val raw: java.io.OutputStream = fs.create(tmp, true)
        val out = if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
        var n = 0L
        try it.foreach { r => TfRecordSource.writeFrame(out, r); n += 1 }
        finally out.close()
        val fc = FileContext.getFileContext(fs.getUri, conf)
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(finalPath),
          Options.Rename.OVERWRITE)
        // sweep temps stranded by FAILED attempts of this partition
        // (our own tmp was just renamed away, so it no longer matches;
        // a still-running zombie whose tmp we delete fails its rename,
        // which is harmless — this attempt already committed)
        Option(fs.globStatus(new Path(dir, f".part-$idx%05d.attempt-*$ext.tmp")))
          .getOrElse(Array.empty)
          .foreach(st => fs.delete(st.getPath, false))
        Iterator.single(n)
      }
    }.collect()
    (counts.length, counts.sum)
  }
}
