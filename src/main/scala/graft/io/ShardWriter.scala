package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Training-set export: write a dataset as N size-balanced parquet
  * shards plus a manifest — the output side of sequence packing
  * (q81) and mixture sampling (q96).
  *
  * Sharding is an explicit `repartition(n, hash(keyCol))`: hash
  * partitioning spreads rows near-uniformly regardless of the input's
  * skew or ordering, so every shard is a statistically interchangeable
  * sample of the corpus — what a training loader wants (contrast
  * range partitioning, which would sort correlated docs into the same
  * shard). One shuffle, parallel write, no driver involvement; the
  * manifest is computed distributed from the written files'
  * partition column.
  */
object ShardWriter {

  /** Write `df` into `shards` balanced parquet shards under `path`.
    * @return manifest (shard_id, n_rows), read back from the written
    *         data — it reports what actually landed on disk. */
  def writeSharded(df: DataFrame, path: String, shards: Int,
      keyCol: String): DataFrame = {
    require(shards > 0, "shards must be positive")
    val spark = df.sparkSession
    df.withColumn("__shard", pmod(xxhash64(col(keyCol)), lit(shards)).cast("int"))
      // range-partition the shard id: hashing the (already 0..n-1) id
      // into n partitions collides ~1/e of them onto shared tasks and
      // leaves others empty; range keeps ~one shard per write task
      .repartitionByRange(shards, col("__shard"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__shard")
      .parquet(path)
    spark.read.parquet(path)
      .groupBy(col("__shard").as("shard_id"))
      .agg(count(lit(1)).as("n_rows"))
  }
}
