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
  * a single-writer pipeline (write to `.compact-tmp`, delete, rename).
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

    val tmp = new Path(dir + ".compact-tmp")
    spark.read.parquet(dir).coalesce(target)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(path, true)
    require(fs.rename(tmp, path), s"compaction rename failed for $dir")
    val after = fs.listStatus(path).count(_.getPath.getName.startsWith("part-"))
    (parts.length, after)
  }
}
