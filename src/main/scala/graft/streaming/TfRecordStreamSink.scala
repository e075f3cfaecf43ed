package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{TfRecordSink, TfRecordSource}

/** Streaming TFRecord export — the streaming twin of
  * [[graft.sources.TfRecordSink]], completing the interchange story the
  * reference's IO layer defines for batch (`utils/IOUtils.java:15-19`):
  * a continuously-ingested corpus exported as byte-packed tfrecord
  * shards that a training job can consume WHILE the stream runs.
  *
  * Spark's built-in file sink can't carry a custom record format, so
  * this is `foreachBatch` + an explicit commit protocol:
  *
  *  - each micro-batch lands in its own `batch-<id>/` subdirectory via
  *    [[TfRecordSink.writeBalanced]] (byte-packed shards, per-file
  *    atomic OVERWRITE-rename);
  *  - the batch COMMIT POINT is `batch-<id>/_MANIFEST.json`, written
  *    last and published by a single atomic rename. A consumer that
  *    only trusts manifested batches ([[readCommitted]]) can never
  *    observe a torn batch — no `_SUCCESS`-style races with a glob
  *    over half-written files;
  *  - `foreachBatch` replays a batch whose offsets were not yet
  *    committed to the checkpoint. [[writeBatch]] makes the replay
  *    EXACTLY-ONCE: a manifest already present for the batch id means
  *    the data is committed, so the replay short-circuits (the
  *    standard idempotent-by-batch-id pattern); no manifest means any
  *    files under the subdirectory are debris from a crashed attempt,
  *    so the subdirectory is deleted and rewritten from scratch —
  *    which also guarantees the post-write file listing in the
  *    manifest exactly matches this attempt's output.
  *
  * The one caveat shared with every non-transactional FS sink: a
  * zombie driver racing a restarted one on the SAME batch can
  * interleave attempts' files. Both write complete files and the
  * manifest rename is last-writer-wins-whole, so committed state stays
  * readable, but byte-identity of the winning file set is not pinned
  * in that pathological case (same stance as Spark's own file sink).
  *
  * At 100 TB/day: everything per-batch is distributed ([[TfRecordSink]]
  * collects one `(partition, bytes)` pair per partition, nothing
  * else); the driver-side work here is two filesystem metadata ops per
  * batch plus one small JSON write. Manifest listings grow one file
  * per batch — compact old batches with [[graft.io.Compactor]]-style
  * maintenance if batch cadence is seconds-scale for months.
  */
object TfRecordStreamSink {

  /** What [[writeBatch]] did: `skippedReplay` means the manifest
    * already existed and nothing was (re)written. */
  final case class BatchResult(batchId: Long, files: Int, records: Long,
      skippedReplay: Boolean)

  private def batchDir(dir: String, batchId: Long): Path =
    new Path(dir, f"batch-$batchId%08d")

  private val ManifestName = "_MANIFEST.json"

  /** Write ONE micro-batch's records under `dir/batch-<id>/` and
    * commit it by publishing the manifest. Idempotent per batch id —
    * see the object scaladoc for the replay/crash contract. Runs on
    * the driver (it is the `foreachBatch` body); the data write
    * inside [[TfRecordSink.writeBalanced]] is distributed. */
  def writeBatch(records: Dataset[Array[Byte]], dir: String, batchId: Long,
      targetShardBytes: Long = 128L * 1024 * 1024,
      gzip: Boolean = true): BatchResult = {
    val spark = records.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val bdir = batchDir(dir, batchId)
    val fs = bdir.getFileSystem(conf)
    val manifest = new Path(bdir, ManifestName)
    if (fs.exists(manifest)) return BatchResult(batchId, 0, 0L, skippedReplay = true)
    // no manifest ⇒ anything under bdir is a crashed attempt's debris
    if (fs.exists(bdir)) fs.delete(bdir, true)
    val (files, recs) = TfRecordSink.writeBalanced(records, bdir.toString,
      targetShardBytes, gzip)
    // bdir was cleaned above, so this listing is exactly this
    // attempt's output (writeBalanced skips empty shards — the
    // listing, not arithmetic over the shard count, is the truth)
    val names = Option(fs.globStatus(new Path(bdir, "part-*")))
      .getOrElse(Array.empty).map(_.getPath.getName).sorted
    val json = names.map(n => "\"" + n + "\"")
      .mkString(s"""{"batchId":$batchId,"records":$recs,"files":[""", ",", "]}")
    // an empty batch still commits (day-zero totality): zero files,
    // but the manifest marks the id as done so replay skips it
    fs.mkdirs(bdir)
    val tmp = new Path(bdir, s".$ManifestName.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    FileContext.getFileContext(fs.getUri, conf)
      .rename(fs.makeQualified(tmp), fs.makeQualified(manifest),
        Options.Rename.OVERWRITE)
    BatchResult(batchId, names.length, recs, skippedReplay = false)
  }

  /** Start the streaming export: every micro-batch of `records` becomes
    * one committed `batch-<id>/` of byte-packed tfrecord shards. */
  def start(records: Dataset[Array[Byte]], dir: String, checkpointDir: String,
      targetShardBytes: Long = 128L * 1024 * 1024,
      gzip: Boolean = true): StreamingQuery = {
    val body: (Dataset[Array[Byte]], Long) => Unit =
      (batch, id) => { writeBatch(batch, dir, id, targetShardBytes, gzip); () }
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(body)
      .start()
  }

  /** File paths of every COMMITTED batch (manifest present), in batch
    * order. Driver-side metadata only: one listing of `dir` plus one
    * small JSON read per batch. */
  def committedFiles(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch-"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val manifest = new Path(st.getPath, ManifestName)
        if (!fs.exists(manifest)) Nil // uncommitted: crashed or in flight
        else {
          val in = fs.open(manifest)
          val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          // names were written quoted and contain no escapes
          // (part-NNNNN.tfrecord[.gz] only)
          "\"(part-[^\"]+)\"".r.findAllMatchIn(json).map(m =>
            new Path(st.getPath, m.group(1)).toString).toList
        }
      }
  }

  /** Read back every committed batch as one dataset — the consumer
    * half of the commit protocol ([[TfRecordSource.readFiles]] over
    * the manifest listings; torn batches invisible by construction). */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
      dir: String): Dataset[Array[Byte]] =
    TfRecordSource.readFiles(spark, committedFiles(spark, dir))
}
