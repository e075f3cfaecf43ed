package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (`TESTDATA.md`).
  *
  * All queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) and read
  * one parquet file per table. Filters/projections applied downstream
  * are pushed into the scan by Catalyst (verify via `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — read as raw nanos via the legacy conf and truncate
    * to micros, the same truncation DuckDB applies) and naive
    * TIMESTAMP(MICROS) (isAdjustedToUTC=false, which Spark decodes as
    * TIMESTAMP_NTZ). Normalize BOTH to session-zone TimestampType:
    * downstream queries call `unix_micros`/`window`, which reject NTZ,
    * and the session zone is pinned to UTC everywhere (Verify/Bench/
    * specs), so the NTZ→LTZ cast reproduces exactly the instant DuckDB's
    * `epoch_us` assigns the same naive value. With `nanosAsLong` set, a
    * NANOS column surfaces as LongType, MICROS-naive as TimestampNTZType. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  /** documents/embeddings arrive as ONE small parquet file (single
    * row group → a single scan task) but feed compute-heavy operators
    * (shingling, hashing, vector math). Repartition at load so the
    * per-row work uses every core: the shuffle moves <1 MB while the
    * downstream gains ~32× parallelism. CONDITIONAL: when the scan
    * already yields enough partitions (the real-scale case — many
    * files), repartitioning would shuffle the whole table for
    * nothing, so it is skipped. getNumPartitions only plans, it runs
    * no job. */
  private def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(target / 2, 2)) df
    else df.repartition(target)
  }

  def documents(s: SparkSession, d: String): DataFrame  = spread(s, load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = spread(s, load(s, d, "embeddings"))
}
