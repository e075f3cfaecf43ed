package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout co-located joins (SURVEY §4 / the prompt's
  * "bucketing for co-located joins"): write both sides bucketed and
  * sorted on the join keys, and a later equi-join on those keys reads
  * pre-partitioned, pre-sorted buckets — SortMergeJoin with NO
  * Exchange on either side. The 100 TB play: pay the shuffle once at
  * layout time, then every downstream join/aggregation on the bucket
  * keys is shuffle-free.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // a FRESH session's in-memory catalog doesn't know tables a prior
    // run wrote, so Overwrite alone can't reclaim the on-disk location
    // and the create fails with LOCATION_ALREADY_EXISTS — drop the
    // entry AND delete any orphan directory first
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
