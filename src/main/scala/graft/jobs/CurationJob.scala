package graft.jobs

import graft.operators.IncrementalNearDedup
import graft.sources.TfRecordSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the north-star extension
  * operators (dedup / quality / decontamination / export, each
  * individually oracle- or spec-gated as q40/q42/q51/q82/TfRecordSpec)
  * composed into one runnable unit, the way [[Jobs]] composes the
  * reference's ad-tech pipelines — so the library offers the LLM-data
  * surface as a JOB a user can run, not only as a query catalogue.
  *
  * Stage order is cheapest-cut-first, which is also the semantically
  * required order:
  *
  *   1. EXACT dedup — one fixed-width-key shuffle (`md5(text)`,
  *      min-id canonical, q40's rule). Must precede near-dedup: it is
  *      the operator with no bucket-width pathology, and it is what
  *      collapses the ≥cap-sized byte-identical families the
  *      [[graft.operators.LshGuard]] recall contract hands off.
  *   2. QUALITY floor — row-local char-length bounds + alpha ratio +
  *      min word count (q51's signals as a filter). No shuffle.
  *   3. NEAR dedup — [[IncrementalNearDedup.survivors]] against an
  *      empty store: MinHash-banded candidates under the hot-bucket
  *      guard, exact-Jaccard verify, transitive (connected-component)
  *      suppression keeping each cluster's min id.
  *   4. DECONTAMINATION — corpus docs sharing ≥ `contamMinShingles`
  *      word 3-grams with the benchmark set are dropped (q82's
  *      broadcast-probe shape: the benchmark side is tiny and
  *      broadcasts; the corpus streams through one equi-join).
  *   5. EXPORT — one JSON line per doc, byte-PACKED gzip TFRecord
  *      shards ([[TfRecordSink.writeBalanced]]) + a JSON manifest
  *      recording per-stage counts next to the shards.
  *
  * 100 TB notes: stages 1-4 are each one keyed shuffle or row-local;
  * nothing driver-side grows with the corpus (the manifest holds
  * scalar counts only). Per-stage counts cost one extra action each —
  * `run(stats = false)` skips them (the record count still comes free
  * from the export's metadata pass) for production-size runs.
  */
object CurationJob {

  /** Thresholds; defaults sized for the synthetic `documents` corpus
    * (short English-like templated text). */
  case class Config(
      minChars: Int = 30,
      maxChars: Int = 100000,
      minWords: Int = 5,
      minAlphaRatio: Double = 0.5,
      jaccardT: Double = 0.6,
      contamShingleLen: Int = 3,
      contamMinShingles: Int = 1,
      targetShardBytes: Long = 64L * 1024 * 1024,
      /** Spill dir for the near-dedup band/shingle-set tables. None =
        * executor-storage cache, fine up to corpora whose shingle sets
        * fit aggregate storage; set it for full-corpus runs at scale
        * (see [[IncrementalNearDedup.survivors]]'s materializeDir). */
      nearDedupSpillDir: Option[String] = None)

  /** Every stage as a lazily-declared frame, so callers can count,
    * inspect, or re-plan any cut without paying for the others. */
  case class Stages(input: DataFrame, afterExact: DataFrame,
      afterQuality: DataFrame, afterNear: DataFrame, curated: DataFrame)

  /** Per-stage row counts as written to the manifest; -1 = not
    * measured (`stats = false`). */
  case class Report(input: Long, afterExact: Long, afterQuality: Long,
      afterNear: Long, curated: Long, shards: Int, recordsWritten: Long)

  /** The quality floor as one row-local predicate — shared by the
    * batch plan and [[curateStream]] so the two paths cannot drift. */
  private[graft] def qualityPredicate(cfg: Config): org.apache.spark.sql.Column =
    length(col("text")).between(cfg.minChars, cfg.maxChars) &&
      size(split(trim(col("text")), "\\s+")) >= cfg.minWords &&
      (length(regexp_replace(col("text"), "[^\\p{L}]", "")) /
        greatest(length(col("text")), lit(1))) >= cfg.minAlphaRatio

  /** Declare the curation plan over `docs` (needs `doc_id`, `text`;
    * other columns ride along). `benchmark` needs `text`. Lazy — no
    * job runs until a stage is acted on. */
  def curate(docs: DataFrame, benchmark: DataFrame,
      cfg: Config = Config()): Stages = {
    val s = docs.sparkSession
    graft.GraftExtensions.ensureRegistered(s)

    // 1. exact: min-id row per text digest, one shuffle on the digest
    val cols = docs.columns.toSeq
    val afterExact = docs
      .groupBy(md5(col("text")).as("__h"))
      .agg(min_by(struct(cols.map(col): _*), col("doc_id")).as("__r"))
      .select(cols.map(c => col(s"__r.$c")): _*)

    // 2. quality floor: all row-local
    val afterQuality = afterExact.filter(qualityPredicate(cfg))

    // 3. near-dedup vs an empty store (LshGuard-capped banding, exact
    // verify, transitive min-id survivor selection)
    val emptyDocs = docs.select(col("doc_id"), col("text")).limit(0)
    val afterNear = IncrementalNearDedup.survivors(
      afterQuality,
      IncrementalNearDedup.bandTable(emptyDocs),
      IncrementalNearDedup.shingleSets(emptyDocs),
      t = cfg.jaccardT,
      maxBucket = graft.operators.LshGuard.maxBucket(s),
      materializeDir = cfg.nearDedupSpillDir)

    // 4. decontamination: benchmark shingles broadcast, corpus streams
    val shingles = (df: DataFrame) => df
      .filter(size(split(trim(col("text")), "\\s+")) >= cfg.contamShingleLen)
      .select(col("doc_id"),
        explode(expr(s"word_shingles(text, ${cfg.contamShingleLen})")).as("sh"))
    val probe = shingles(benchmark.select(lit(0L).as("doc_id"), col("text")))
      .select(col("sh")).distinct()
    val contaminated = shingles(afterNear)
      .join(broadcast(probe), "sh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sh")).as("__n"))
      .filter(col("__n") >= cfg.contamMinShingles)
      .select(col("doc_id"))
    val curated = afterNear.join(contaminated, Seq("doc_id"), "left_anti")

    Stages(docs, afterExact, afterQuality, afterNear, curated)
  }

  /** Streaming twin of [[curate]] — ingest-time curation over a
    * streaming `docs` frame (needs `doc_id`, `text`, event-time `ts`):
    *
    *   1. quality floor — the SAME row-local predicate as batch
    *      (shared [[qualityPredicate]], the paths cannot drift);
    *   2. near-dedup — [[StreamingOps.nearDedupStream]]'s
    *      fingerprint-keyed `dropDuplicatesWithinWatermark`. This
    *      SUBSUMES the batch plan's separate exact stage: identical
    *      texts always carry identical fingerprints, so byte-dups and
    *      fp-twins collapse in one stateful operator (state = one
    *      60-bit key per retained doc inside the watermark horizon).
    *      Recall is the documented ingest-time trade — fp-equal twins
    *      only; the full banded/batch sweep runs behind it;
    *   3. decontamination — ROW-LOCAL `array_intersect` against the
    *      benchmark's shingles collected to a plan literal (the
    *      benchmark is an eval set, megabytes by definition;
    *      `maxProbeShingles` guards the collect like J3's broadcast
    *      map). No streaming state, no shuffle — the stream shape of
    *      q82's broadcast probe.
    *
    * Returns the curated stream (all input columns); the caller picks
    * the sink (e.g. `foreachBatch` + [[TfRecordSink.writeBalanced]]
    * per micro-batch, or a JSONL file sink). */
  def curateStream(docs: DataFrame, benchmark: DataFrame,
      cfg: Config = Config(), watermark: String = "30 minutes",
      maxProbeShingles: Int = 1 << 20): DataFrame = {
    val s = docs.sparkSession
    graft.GraftExtensions.ensureRegistered(s)
    val near = graft.streaming.StreamingOps.nearDedupStream(
      docs.filter(qualityPredicate(cfg)), watermark = watermark)
    val probe = benchmark
      .filter(size(split(trim(col("text")), "\\s+")) >= cfg.contamShingleLen)
      .select(explode(expr(
        s"word_shingles(text, ${cfg.contamShingleLen})")).as("sh"))
      .distinct().limit(maxProbeShingles + 1)
      .collect().map(_.getString(0))
    require(probe.length <= maxProbeShingles,
      s"benchmark probe exceeds $maxProbeShingles shingles — too big for " +
        "a plan literal; decontaminate in batch (q82's broadcast join) instead")
    if (probe.isEmpty) near
    else near.filter(
      size(array_intersect(
        expr(s"word_shingles(text, ${cfg.contamShingleLen})"),
        typedLit(probe.toSeq))) < cfg.contamMinShingles)
  }

  /** Start the full STREAMING pipeline — the streaming twin of [[run]]:
    * [[curateStream]]'s kept docs, encoded exactly like the batch
    * export (one UTF-8 JSON line of `{doc_id, text}` per doc), flow
    * into [[graft.streaming.TfRecordStreamSink]]'s manifest-committed
    * `batch-<id>/` shard directories. Exactly-once per micro-batch by
    * batch-id dedup; a training job can consume committed batches
    * (`TfRecordStreamSink.readCommitted`) while ingest continues. */
  def runStream(docs: DataFrame, benchmark: DataFrame, outDir: String,
      checkpointDir: String, cfg: Config = Config(),
      watermark: String = "30 minutes"): org.apache.spark.sql.streaming.StreamingQuery = {
    val s = docs.sparkSession
    import s.implicits._
    val records = curateStream(docs, benchmark, cfg, watermark)
      .select(to_json(struct(col("doc_id"), col("text"))).as("j"))
      .select(encode(col("j"), "UTF-8").as("b")).as[Array[Byte]]
    graft.streaming.TfRecordStreamSink.start(
      records, outDir, checkpointDir, cfg.targetShardBytes)
  }

  /** Run the full pipeline: parquet `documents` in, gzip TFRecord
    * shards (one UTF-8 JSON line per doc) + `_manifest.json` out. */
  def run(spark: SparkSession, docsDir: String, benchmarkDir: String,
      outDir: String, cfg: Config = Config(), stats: Boolean = true): Report = {
    import spark.implicits._
    val stages = curate(
      spark.read.parquet(docsDir), spark.read.parquet(benchmarkDir), cfg)

    // the near-dedup output feeds the decontam probe join AND the
    // export (plus an optional count) — cache the narrow final frame,
    // not the wide intermediates
    val curated = stages.curated.cache()
    try {
      val records = curated
        .select(to_json(struct(col("doc_id"), col("text"))).as("j"))
        .select(encode(col("j"), "UTF-8").as("b")).as[Array[Byte]]
      val (shards, written) =
        TfRecordSink.writeBalanced(records, outDir, cfg.targetShardBytes)

      def n(df: DataFrame): Long = if (stats) df.count() else -1L
      val report = Report(n(stages.input), n(stages.afterExact),
        n(stages.afterQuality), n(stages.afterNear), written, shards, written)

      // scalar-only manifest, one driver-side file next to the shards.
      // The manifest is the COMMIT MARKER consumers key on, so it gets
      // the same tmp-write + atomic OVERWRITE-rename protocol as every
      // other commit point (SnapshotStore._CURRENT, TfRecordStreamSink
      // manifests, TfRecordSink's rename commit) — a crash mid-write
      // leaves only a dot-tmp, never a torn/empty marker.
      val manifest =
        s"""{"input":${report.input},"after_exact":${report.afterExact},
           |"after_quality":${report.afterQuality},"after_near":${report.afterNear},
           |"curated":${report.curated},"shards":${report.shards},
           |"records_written":${report.recordsWritten}}""".stripMargin.replace("\n", "")
      val path = new org.apache.hadoop.fs.Path(outDir, "_manifest.json")
      val tmp = new org.apache.hadoop.fs.Path(outDir, "._manifest.json.tmp")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(tmp, true)
      try out.write(manifest.getBytes("UTF-8")) finally out.close()
      org.apache.hadoop.fs.FileContext
        .getFileContext(fs.getUri, spark.sparkContext.hadoopConfiguration)
        .rename(fs.makeQualified(tmp), fs.makeQualified(path),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      report
    } finally curated.unpersist()
  }
}
