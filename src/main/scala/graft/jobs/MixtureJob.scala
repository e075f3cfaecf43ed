package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Epoch assembly: the step between a curated corpus ([[CurationJob]]'s
  * output) and what a trainer actually reads — one reproducible,
  * budgeted, shuffled, sharded sample list. Composes the individually
  * oracle-gated pieces into one runnable unit:
  *
  *   1. TEMPERATURE rates per slice (q107/q109's n^0.5 rule, the same
  *      engine-parity integer-ppm arithmetic: ⌊√n⌋ weights, one
  *      identically-associated double expression, integer div/mod).
  *      Rates are UNCAPPED: minority slices get rates above one
  *      (up-sampling), the dominant slice drops below one.
  *   2. REPETITION: per-doc `n_copies` = ⌊rate⌋ + md5-Bernoulli on the
  *      fraction (q109), then each copy becomes its own sample row —
  *      sampling-with-replacement materialized.
  *   3. SHUFFLE + BUDGET: every (doc, copy) gets the deterministic
  *      md5 permutation key; a GLOBAL running token sum in key order
  *      cuts the epoch at `tokenBudget` (q111's two-level bucket form
  *      — per-bucket running sums, bucket totals prefix-summed and
  *      broadcast; never a single-partition window). Because tokens
  *      are non-negative the running sum is monotone in key order, so
  *      the kept set is a PREFIX of the shuffle order — a uniformly
  *      down-sampled epoch, not a biased one.
  *   4. INDEX + SHARDS: a contiguous 1-based `sample_idx` over the
  *      kept prefix (same window pass — the count running sum shares
  *      the token sum's Sort/Exchange) and round-robin `shard_id`
  *      (q101's rule).
  *
  * 100 TB notes: the corpus pays ONE hash exchange (the bucket key);
  * rates and bucket offsets are tiny broadcast aggregates; everything
  * else is row-local. Nothing driver-side grows with the corpus.
  * Determinism: every random choice derives from md5 of stable ids,
  * so reruns — and independent reimplementations — produce the same
  * epoch byte-for-byte.
  */
object MixtureJob {

  /** @param sliceCol    column defining the mixture slices (lang/source)
    * @param tokenBudget global epoch token budget; `Long.MaxValue` = no
    *                    cut (the full temperature-weighted epoch)
    * @param shards      round-robin output shard count
    * @param buckets     shuffle-order buckets (q101's 1024 — uniform by
    *                    construction, no skew at any corpus shape) */
  case class Config(
      sliceCol: String = "lang",
      tokenBudget: Long = Long.MaxValue,
      shards: Int = 8,
      buckets: Int = 1024)

  /** One row per kept sample: (doc_id, slice, copy, tokens,
    * cum_tokens, sample_idx, shard_id), `sample_idx` contiguous from 1
    * in shuffle order. */
  def assemble(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    require(cfg.shards >= 1 && cfg.buckets >= 1, s"bad config: $cfg")
    val slice = col(cfg.sliceCol)

    // 1. temperature rates (q109's arithmetic, verbatim association)
    val counts = docs.groupBy(slice.as("__slice"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w", floor(sqrt(col("n").cast("double"))))
    val tot = counts.agg(sum(col("n")).as("n_total"), sum(col("w")).as("s_w"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate_ppm",
        floor(lit(1000000.0) * col("n_total") * col("w") / (col("n") * col("s_w"))))
      .select(col("__slice"), expr("rate_ppm div 1000000").as("__base"),
        (col("rate_ppm") % 1000000).as("__frac_ppm"))

    // 2. per-doc copies, then one row per copy
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 14), 16, 10)
      .cast("long") % 1000000
    val copies = docs
      .withColumn("__tok", size(split(trim(col("text")), "\\s+")).cast("long"))
      // null-safe: groupBy put null-slice docs in their own rates row,
      // and a null-rejecting === would silently drop them from the
      // epoch — null is a real slice ("unknown"), weighted like any
      .join(broadcast(rates), slice <=> col("__slice"))
      .withColumn("__n_copies",
        col("__base") + when(bucket < col("__frac_ppm"), 1L).otherwise(0L))
      .filter(col("__n_copies") >= 1L)
      .select(col("doc_id"), slice.as("slice"), col("__tok").as("tokens"),
        explode(expr("sequence(1L, __n_copies)")).as("copy"))

    // 3+4. one bucket-keyed exchange; token and count running sums
    // share the same window spec (one Sort, one WindowExec)
    val keyed = copies
      .withColumn("__key",
        md5(concat(col("doc_id").cast("string"), lit(":"), col("copy").cast("string"))))
      .withColumn("__bkt", expr(
        s"width_bucket(CAST(conv(substring(__key, 1, 8), 16, 10) AS DOUBLE), " +
          s"0.0, 4294967296.0, ${cfg.buckets})"))
    val w = Window.partitionBy(col("__bkt"))
      .orderBy(col("__key").asc, col("doc_id").asc, col("copy").asc)
    val local = keyed
      .withColumn("__ltok", sum(col("tokens")).over(w))
      .withColumn("__lcnt", count(lit(1)).over(w))
    val offsets = keyed.groupBy(col("__bkt"))
      .agg(sum(col("tokens")).as("__btok"), count(lit(1)).as("__bcnt"))
      .withColumn("__toff", coalesce(
        sum(col("__btok")).over(Window.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__coff", coalesce(
        sum(col("__bcnt")).over(Window.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__toff"), col("__coff"))
    local.join(broadcast(offsets), "__bkt")
      .withColumn("cum_tokens", col("__toff") + col("__ltok"))
      .filter(col("cum_tokens") <= cfg.tokenBudget)
      .withColumn("sample_idx", col("__coff") + col("__lcnt"))
      .withColumn("shard_id", (col("sample_idx") - 1) % cfg.shards)
      .select("doc_id", "slice", "copy", "tokens", "cum_tokens",
        "sample_idx", "shard_id")
  }

  /** `--job=mixtureJob` entry: reads a documents-shaped parquet dir,
    * writes the epoch sample list partitioned by `shard_id` (each
    * shard directory is one trainer reader's input), returns the
    * scalar summary. The write re-keys by shard — acceptable: the
    * sample list is (ids + counters), a sliver of corpus bytes. */
  def run(spark: org.apache.spark.sql.SparkSession, input: String,
      output: String, cfg: Config = Config()): String = {
    val epoch = assemble(spark.read.parquet(input), cfg)
    epoch.write.mode("overwrite").partitionBy("shard_id").parquet(output)
    val back = spark.read.parquet(output)
    val n = back.count()
    val toks = if (n == 0) 0L else back.agg(max(col("cum_tokens"))).head().getLong(0)
    s"""{"samples":$n,"epoch_tokens":$toks,"shards":${cfg.shards}}"""
  }
}
