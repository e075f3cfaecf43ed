package graft.jobs

import graft.io.AdtechSinks
import graft.ops.{AdtechPipeline, PredictionPipeline}
import graft.sources.TfRecordSource
import org.apache.spark.sql.SparkSession

/** Job entry points mirroring the reference's `Main --job=` dispatch
  * (`Main.java:44-64`): the complete pipelines as runnable units, so a
  * user of the reference can switch wholesale —
  *
  *   bidLogJob:     TFRecord(.gz) BidLogs → validity filter → device
  *                  profiles → app profiles → suspicious ids → three
  *                  Base64 text outputs (`jobs1/BidLogJob.java:126-154`)
  *   predictionJob: job-1 outputs + IAPP profiles → anti-join →
  *                  1/16 sample → features → batched inference →
  *                  JSON text + table (`jobs2/PredictionJob.java:94-141`)
  *
  * Args are `key=value` pairs; thresholds default to the reference's
  * (`MyOptions.java:29-54`).
  */
object Jobs {

  def runBidLogJob(spark: SparkSession, inputGlob: String, outDir: String,
      t: AdtechPipeline.Thresholds = AdtechPipeline.Thresholds(),
      shards: Option[Int] = Some(1)): Unit = {
    val raw = TfRecordSource.read(spark, inputGlob)
    val logs = AdtechPipeline.validBidLogs(AdtechPipeline.decodeBidLogBytes(raw))
    val dps = AdtechPipeline.deviceProfiles(logs)
    AdtechPipeline.assertNoDuplicateIds(dps)
    val aps = AdtechPipeline.appProfiles(dps)
    val susp = AdtechPipeline.suspiciousIds(dps, aps, t)
    AdtechSinks.writeDeviceProfilesBase64(dps, s"$outDir/device-profile", shards)
    AdtechSinks.writeAppProfilesBase64(aps, s"$outDir/app-profile", shards)
    AdtechSinks.writeSuspiciousBase64(susp, s"$outDir/suspicious-user", shards)
  }

  def runPredictionJob(spark: SparkSession, dpDir: String, suspDir: String,
      iappDir: String, outDir: String,
      scorer: PredictionPipeline.Scorer = PredictionPipeline.DeterministicScorer,
      shards: Option[Int] = Some(1)): Unit = {
    val preds = PredictionPipeline.predictionJob(
      spark.read.textFile(dpDir),
      spark.read.textFile(suspDir),
      spark.read.textFile(iappDir), scorer)
    AdtechSinks.writePredictionsJson(preds, s"$outDir/prediction-json", shards)
    AdtechSinks.writePredictionsTable(preds, s"$outDir/prediction-table")
  }

  /** `maintenanceJob`'s ANN-root argument: `ivfRoot=` names a root
    * directly; `ivfPointer=` resolves through the [[graft.operators.SnapshotStore]]
    * pointer [[graft.operators.IvfStore.publishRoot]] maintains, so a
    * [[graft.operators.IvfStore.rebuildVia]] swap redirects the cron
    * automatically — the operator never edits crontab after a rebuild.
    * `ivfRoot=` wins when both are given (explicit beats indirection).
    * A pointer nothing has published yet resolves to None (the cron
    * entry is usually installed BEFORE the first publish; the dedup
    * stores must still get their compaction/fsck that night). */
  def resolveIvfRoot(spark: SparkSession,
      kv: Map[String, String]): Option[String] =
    kv.get("ivfRoot").orElse(kv.get("ivfPointer").flatMap { p =>
      // ONLY the never-published case degrades to None — probed as a
      // typed state check (no snapshot version on disk), never by
      // matching an error-message substring. An FS outage or torn
      // snapshot past this probe stays loud, or an operator would
      // read "no ANN reports tonight" as day-zero state while a
      // degraded store goes unmonitored behind a swallowed error.
      if (graft.operators.SnapshotStore.currentVersion(spark, p).isEmpty) {
        System.err.println(s"[maintenanceJob] pointer '$p' has no " +
          "published root yet — skipping the ANN reports this run")
        None
      } else Some(graft.operators.IvfStore.currentRoot(spark, p))
    })

  def main(args: Array[String]): Unit = {
    val kv = args.map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
    val builder = SparkSession.builder()
      .appName("graft-" + kv.getOrElse("job", "?"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // spark-submit injects the master; default for bare `sbt runMain`
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .getOrCreate()
    val t = AdtechPipeline.Thresholds(
      kv.get("userCountThreshold").map(_.toInt).getOrElse(4),
      kv.get("appCountThreshold").map(_.toInt).getOrElse(3),
      kv.get("geoCountThreshold").map(_.toInt).getOrElse(8),
      kv.get("bidLogCountThreshold").map(_.toInt).getOrElse(10))
    kv.getOrElse("job", sys.error("missing job=bidLogJob|predictionJob")) match {
      case "bidLogJob" =>
        runBidLogJob(spark, kv("input"), kv("output"), t)
      case "predictionJob" =>
        runPredictionJob(spark, kv("dp"), kv("suspicious"), kv("iapp"), kv("output"))
      case "curationJob" => // extension: LLM-corpus curation (CurationJob)
        val report = CurationJob.run(spark, kv("input"), kv("benchmark"),
          kv("output"), stats = kv.get("stats").forall(_.toBoolean))
        println(report)
      case "incrementalCurationJob" => // extension: daily curation vs stores
        val report = IncrementalCurationJob.ingestDay(
          spark.read.parquet(kv("input")), kv("root"), kv("day"),
          stats = kv.get("stats").forall(_.toBoolean),
          embeddingCol = kv.get("embeddingCol"),
          ivfRoot = kv.get("ivfRoot"),
          ivfPointer = kv.get("ivfPointer"),
          textIndexRoot = kv.get("textIndexRoot"))
        println(report)
      case "curationReportJob" => // extension: data-quality dashboard
        val counts = CurationReportJob.run(spark, kv("input"), kv("output"))
        println(counts.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(" "))
      case "maintenanceJob" => // extension: store maintenance + monitors
        // rebuildRoot= (with ivfPointer= and rebuildK=) arms the
        // evidence-gated auto-rebuild — see [[MaintenanceJob.RebuildPolicy]]
        val policy = kv.get("rebuildRoot").map { nr =>
          MaintenanceJob.RebuildPolicy(
            pointer = kv.getOrElse("ivfPointer", sys.error(
              "rebuildRoot= needs ivfPointer= — the policy swaps the " +
                "serving pointer, so the job must monitor through it")),
            newRoot = nr,
            k = kv.getOrElse("rebuildK", sys.error(
              "rebuildRoot= needs rebuildK= (the re-train centroid count)")).toInt,
            iters = kv.get("rebuildIters").map(_.toInt).getOrElse(5),
            driftRatioMax = kv.get("rebuildDriftMax").map(_.toDouble).getOrElse(2.0),
            recallMin = kv.get("rebuildRecallMin").map(_.toDouble).getOrElse(0.8))
        }
        val counts = MaintenanceJob.run(spark, kv("root"),
          resolveIvfRoot(spark, kv), kv("output"),
          keepDays = kv.get("keepDays").map(_.toInt).getOrElse(7),
          deep = kv.get("deep").exists(_.toBoolean),
          nprobe = kv.get("nprobe").map(_.toInt).getOrElse(8),
          topK = kv.get("topK").map(_.toInt).getOrElse(5),
          queriesPerDay = kv.get("queriesPerDay").map(_.toInt).getOrElse(16),
          rebuildPolicy = policy,
          textIndexRoot = kv.get("textIndexRoot"))
        println(counts.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(" "))
      case "mixtureJob" => // extension: epoch assembly (MixtureJob)
        val cfg = MixtureJob.Config(
          sliceCol = kv.getOrElse("slice", "lang"),
          tokenBudget = kv.get("tokenBudget").map(_.toLong).getOrElse(Long.MaxValue),
          shards = kv.get("shards").map(_.toInt).getOrElse(8))
        println(MixtureJob.run(spark, kv("input"), kv("output"), cfg))
      case other => sys.error(s"unknown job $other")
    }
    spark.stop()
  }
}
