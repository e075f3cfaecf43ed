package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-files compaction — the unglamorous op every long-running
  * 100 TB pipeline needs: streaming sinks and per-batch jobs leave
  * thousands of KB-scale parquet files whose open/footer overhead
  * eventually dominates scan time. Compact rewrites a directory into
  * ⌈bytes / targetFileBytes⌉ files via coalesce (no shuffle — file
  * merging doesn't need a repartition; row order within files is not
  * part of the contract) and swaps it in place atomically-enough for
  * a single-writer pipeline (write sibling `.compact-tmp`, move the
  * original aside, move tmp in, drop the backup — a failure at any
  * step leaves a complete copy on disk). A completed compaction
  * leaves `_compaction_manifest.json` inside the directory (files
  * before/after, bytes, target, wall-clock stamp) so operators can
  * audit what ran without trawling job logs.
  *
  * Filesystem contract: the swap is two `rename`s of SIBLING paths,
  * so it needs rename within one filesystem/bucket — true on HDFS,
  * local FS, and S3A within a bucket (where rename is a copy but
  * still safe here: the backup ordering never leaves zero copies).
  * Compacting ACROSS filesystems is not supported — write to a
  * sibling and distcp instead.
  */
object Compactor {

  /** @return (filesBefore, filesAfter) */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path).filter(_.getPath.getName.startsWith("part-"))
    val totalBytes = parts.map(_.getLen).sum
    val target = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (parts.length <= target) return (parts.length, parts.length)

    // tmp/backup are SIBLINGS built from the normalized Path — building
    // them from the raw string put tmp INSIDE the dataset for a
    // trailing-slash dir, and the old delete-before-rename ordering
    // could destroy the original when the rename then failed. Order is
    // now: write tmp → move original aside → move tmp in → drop backup;
    // any failure leaves at least one complete copy on disk.
    val tmp = new Path(path.getParent, path.getName + ".compact-tmp")
    val backup = new Path(path.getParent, path.getName + ".compact-old")
    fs.delete(tmp, true)
    fs.delete(backup, true)
    spark.read.parquet(path.toString).coalesce(target)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(path, backup), s"compaction could not move $path aside")
    require(fs.rename(tmp, path), s"compaction rename failed for $dir — original preserved at $backup")
    fs.delete(backup, true)
    val after = fs.listStatus(path).count(_.getPath.getName.startsWith("part-"))
    val manifest =
      s"""{"files_before":${parts.length},"files_after":$after,""" +
        s""""bytes":$totalBytes,"target_file_bytes":$targetFileBytes,""" +
        s""""compacted_at_ms":${System.currentTimeMillis}}"""
    val mOut = fs.create(new Path(path, "_compaction_manifest.json"), true)
    try mOut.write(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally mOut.close()
    (parts.length, after)
  }
}
