package graft

import graft.jobs.Jobs
import graft.sources.TfRecordSource
import org.scalatest.funsuite.AnyFunSuite

/** Full two-job loop on golden corpus 07, through the real file
  * formats: TFRecord.gz in → Base64 text between jobs → JSON/table
  * out (the exact interchange topology of the reference). */
class JobsSpec extends AnyFunSuite with SparkSpec {

  test("bidLogJob → predictionJob end-to-end over files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jobs").toString

    // stage corpus 07 as tfrecord.gz input
    val in = getClass.getResourceAsStream("/golden/test07.bidlogs.txt")
    val logs = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map(java.util.Base64.getDecoder.decode).toSeq
    finally in.close()
    new java.io.File(s"$tmp/input").mkdirs()
    TfRecordSource.writeLocal(logs, new java.io.File(s"$tmp/input/bidlog-0.tfrecord.gz"), gzip = true)

    Jobs.runBidLogJob(spark, s"$tmp/input/bidlog-*", s"$tmp/out1")
    val dpLines = spark.read.textFile(s"$tmp/out1/device-profile").count()
    val apLines = spark.read.textFile(s"$tmp/out1/app-profile").count()
    val suspLines = spark.read.textFile(s"$tmp/out1/suspicious-user")
    assert(dpLines == 4 && apLines == 8 && suspLines.count() == 0) // golden 07

    // stage a small iapp side input (Base64 lines)
    import spark.implicits._
    val iapp = Seq(graft.io.AdtechProtos.IappRec("app.1234", 5L, 1000L))
      .map(r => graft.io.ProtoWriter.toBase64(graft.io.ProtoWriter.encodeIapp(r)))
    new java.io.File(s"$tmp/iapp").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/iapp/iapp.txt"),
      iapp.mkString("\n").getBytes("UTF-8"))

    Jobs.runPredictionJob(spark, s"$tmp/out1/device-profile",
      s"$tmp/out1/suspicious-user", s"$tmp/iapp", s"$tmp/out2")

    // corpus 07 uuids: only 0104F2D0-... has uuid[7]=='0' → 1 prediction
    val js = spark.read.textFile(s"$tmp/out2/prediction-json").collect()
    assert(js.length == 1)
    assert(js.head.contains(""""os":"IOS""""))
    assert(js.head.contains("0104F2D0-9283-4C26-BD80-D12DB87FE33C"))
    val tbl = spark.read.parquet(s"$tmp/out2/prediction-table").collect()
    assert(tbl.length == 1 && tbl.head.getString(0) == "IOS")
  }

  test("maintenanceJob: one cron entry lands compaction/fsck/drift/recall parquet, parity with direct library calls; total on day-zero roots") {
    import graft.jobs.{IncrementalCurationJob, MaintenanceJob}
    import graft.operators.IvfStore
    val s = spark
    import s.implicits._

    // day-zero totality FIRST: nothing ingested anywhere — the cron
    // entry's very first firing must land all four reports, empty or
    // near-empty, not die on an absent store
    val zeroRoot = java.nio.file.Files.createTempDirectory("mj-zero").toString
    val zeroCounts = MaintenanceJob.run(spark, s"$zeroRoot/stores",
      Some(s"$zeroRoot/ivf"), s"$zeroRoot/reports")
    assert(zeroCounts("fsck") == 0L && zeroCounts("drift") == 0L &&
      zeroCounts("recall") == 0L && zeroCounts("adc_recall") == 0L,
      s"day-zero counts: $zeroCounts")
    assert(spark.read.parquet(s"$zeroRoot/reports/adc_recall").columns.toSeq ===
      Seq("dt", "n_queries", "nprobe", "rerank", "topk", "recall"))
    // schema-stable landed dirs, readable even when empty
    assert(spark.read.parquet(s"$zeroRoot/reports/drift").columns.toSeq ===
      Seq("dt", "n", "mean_dist2", "seed_mean_dist2", "drift_ratio",
        "max_cell_frac"))
    assert(spark.read.parquet(s"$zeroRoot/reports/recall").columns.toSeq ===
      Seq("dt", "n_queries", "nprobe", "topk", "recall"))
    // compaction still reports one no-op row per dedup store + ivf
    val zc = spark.read.parquet(s"$zeroRoot/reports/compaction")
    assert(zc.count() == zeroCounts("compaction") &&
      zc.filter($"store" === "ivf").count() == 1)

    // a populated pipeline: two curated days with embeddings + the
    // co-appended ANN root (the IncrementalCurationJobSpec wiring)
    val root = java.nio.file.Files.createTempDirectory("mj-live").toString
    val ivf = s"$root/ivf"
    val rnd = new scala.util.Random(31)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    def rows(rs: (Long, String, Array[Float])*) =
      rs.toSeq.toDF("doc_id", "text", "embedding")
    val seed = rows((900L, "s", vec()), (901L, "s", vec()), (902L, "s", vec()))
    IvfStore.init(seed.drop("text"), "doc_id", "embedding", ivf,
      k = 2, iters = 2)
    val someText = "a perfectly ordinary sentence with enough distinct words to shingle and rank normally today"
    val otherText = "completely different content about distributed query engines and shuffle plans today"
    IncrementalCurationJob.ingestDay(
      rows((1L, someText, vec()), (2L, otherText, vec())),
      s"$root/stores", "2024-01-01",
      embeddingCol = Some("embedding"), ivfRoot = Some(ivf))
    IncrementalCurationJob.ingestDay(
      rows((10L, "fresh material covering storage compaction markers and " +
        "probe pruning behavior across committed days", vec())),
      s"$root/stores", "2024-01-02",
      embeddingCol = Some("embedding"), ivfRoot = Some(ivf))

    val counts = MaintenanceJob.run(spark, s"$root/stores", Some(ivf),
      s"$root/reports", deep = true, nprobe = 2, queriesPerDay = 2)

    // parity with the direct library calls — same functions, so the
    // landed artifacts must agree row-for-row
    val directFsck = IncrementalCurationJob
      .fsckStoresWithIvf(spark, s"$root/stores", ivf, deep = true)
      .values.map(_.size.toLong).sum
    assert(counts("fsck") == directFsck)
    assert(counts("fsck") == 0L, "healthy freshly-ingested stores audit " +
      "clean: " + spark.read.parquet(s"$root/reports/fsck").collect().mkString("; "))
    val landedDrift = spark.read.parquet(s"$root/reports/drift")
      .orderBy($"dt").collect().map(r => (r.getString(0), r.getLong(1)))
    val directDrift = IvfStore.driftReport(spark, ivf)
      .orderBy($"dt").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(landedDrift === directDrift)
    assert(landedDrift.map(_._1).toSeq === Seq("2024-01-01", "2024-01-02"))
    val landedRecall = spark.read.parquet(s"$root/reports/recall")
      .orderBy($"dt").collect()
    assert(landedRecall.length == 2 &&
      landedRecall.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
    // round 17: the cosine band-table maintenance rides the same run —
    // a freshly-ingested cos store is band-complete at the session
    // epoch, so the landed action is the no-op
    val cosb = spark.read.parquet(s"$root/reports/cos_bands")
    assert(cosb.columns.toSeq === Seq("action", "days_rebuilt", "epoch"))
    assert(cosb.collect().map(_.getString(0)).toSeq === Seq("in-sync"),
      s"got ${cosb.collect().toSeq}")
    val comp = spark.read.parquet(s"$root/reports/compaction")
    assert(comp.filter($"store" === "ivf").count() == 1)
    assert(counts("compaction") == comp.count())
    assert(counts("adc_recall") == 0L,
      "a float-serving root lands the empty ADC-recall report")

    // the cron entry's ANN-root argument: ivfPointer= follows the
    // published pointer (so a rebuildVia swap redirects the cron),
    // explicit ivfRoot= wins over it, neither → no ANN reports
    val ptr = s"$root/ivf-pointer"
    IvfStore.publishRoot(spark, ptr, ivf)
    assert(Jobs.resolveIvfRoot(spark, Map("ivfPointer" -> ptr)) === Some(ivf))
    IvfStore.init(seed.drop("text"), "doc_id", "embedding", s"$root/ivf-v2",
      k = 2, iters = 2) // publishRoot refuses an uncommitted target
    IvfStore.publishRoot(spark, ptr, s"$root/ivf-v2")
    assert(Jobs.resolveIvfRoot(spark, Map("ivfPointer" -> ptr)) ===
      Some(s"$root/ivf-v2"), "pointer re-publish must redirect the cron")
    assert(Jobs.resolveIvfRoot(spark,
      Map("ivfPointer" -> ptr, "ivfRoot" -> ivf)) === Some(ivf))
    assert(Jobs.resolveIvfRoot(spark, Map.empty) === None)
    // the cron entry is typically installed BEFORE the first publish:
    // an unpublished pointer must resolve to None (dedup maintenance
    // still runs that night), not kill the job at argument parsing
    assert(Jobs.resolveIvfRoot(spark,
      Map("ivfPointer" -> s"$root/never-published")) === None)
  }

  test("maintenanceJob(textIndexRoot): the retrieval store joins the compaction sweep and the fsck report") {
    import graft.jobs.{IncrementalCurationJob, MaintenanceJob}
    import graft.operators.TextIndexStore
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("mj-tix").toString
    val tix = s"$root/tix"
    def docs(ids: (Long, String)*) = ids.toSeq.toDF("doc_id", "text")
    IncrementalCurationJob.ingestDay(docs(
      1L -> "a perfectly ordinary sentence with enough distinct words to shingle and rank normally today"),
      s"$root/stores", "2024-01-01", textIndexRoot = Some(tix))
    IncrementalCurationJob.ingestDay(docs(
      2L -> "completely different content about distributed query engines and shuffle plans today"),
      s"$root/stores", "2024-01-02", textIndexRoot = Some(tix))
    IncrementalCurationJob.ingestDay(docs(
      3L -> "fresh material covering storage compaction markers and probe pruning behavior"),
      s"$root/stores", "2024-01-03", textIndexRoot = Some(tix))
    val before = TextIndexStore.topK(spark, tix, Seq("today"), 10)
      .collect().toSeq

    val counts = MaintenanceJob.run(spark, s"$root/stores", None,
      s"$root/reports", keepDays = 1, deep = true,
      textIndexRoot = Some(tix))
    val comp = spark.read.parquet(s"$root/reports/compaction")
      .filter($"store" === "text_index").collect()
    assert(comp.length === 1)
    assert(comp.head.getAs[Int]("folded_days") === 2,
      s"3 real days at keepDays=1 must fold 2: ${comp.head}")
    // keepDays=1 folded every store, so the protocol's awaiting-sweep
    // info transients are EXPECTED; healthy = nothing above info, and
    // the text_index rows prove the store rides the same report
    val fsck1 = spark.read.parquet(s"$root/reports/fsck")
    assert(fsck1.filter($"severity" =!= "info").count() === 0L,
      "healthy store (deep recount included) audits clean above info: " +
        fsck1.collect().mkString("; "))
    assert(fsck1.filter($"store" === "text_index").count() > 0,
      "the folded text index must land its grace-period transients")
    assert(TextIndexStore.topK(spark, tix, Seq("today"), 10).collect().toSeq
      === before, "maintenance must be probe-invisible")

    // plant a crashed-commit tmp marker + an orphan partition; the
    // next cron firing reports both, keyed to the store
    val f = new org.apache.hadoop.fs.Path(tix)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.create(new org.apache.hadoop.fs.Path(s"$tix/markers/.2024-01-09.tmp"),
      true).close()
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$tix/postings/dt=2024-01-08"))
    val counts2 = MaintenanceJob.run(spark, s"$root/stores", None,
      s"$root/reports2", keepDays = 1, deep = true,
      textIndexRoot = Some(tix))
    val fsck2 = spark.read.parquet(s"$root/reports2/fsck")
      .filter($"store" === "text_index")
      .select($"check").as[String].collect().toSet
    assert(fsck2 === Set("tmp-marker", "orphan-partition"),
      s"planted faults must land keyed to the store: $fsck2; " +
        s"counts: $counts2")

    // day-zero totality: an absent text-index root no-ops (the cron
    // is typically installed before the first co-append)
    val zc = MaintenanceJob.run(spark, s"$root/stores", None,
      s"$root/reports3", textIndexRoot = Some(s"$root/never-created"))
    assert(spark.read.parquet(s"$root/reports3/compaction")
      .filter($"store" === "text_index").count() === 0L)
    assert(zc("fsck") === 0L)
  }

  test("rebuild policy: drift breach swaps the pointer with landed evidence; cured store stops firing; taken newRoot degrades to a skipped row") {
    import graft.jobs.MaintenanceJob
    import graft.operators.IvfStore
    val s = spark
    import s.implicits._

    val root = java.nio.file.Files.createTempDirectory("mj-policy").toString
    val (ivf, ptr) = (s"$root/ivf", s"$root/ptr")
    val rnd = new scala.util.Random(7)
    def blob(center: Double, ids: Range) = ids.map(i => (i.toLong,
      Array.fill(8)((center + rnd.nextGaussian() * 0.05).toFloat)))
      .toDF("vec_id", "embedding")
    val day1 = blob(0.0, 0 until 24)            // the seed geometry
    val day2 = blob(50.0, 100 until 124)        // a far drifted blob
    IvfStore.init(day1, "vec_id", "embedding", ivf, k = 2, iters = 3)
    IvfStore.append(day1, ivf, "2024-01-01")
    IvfStore.append(day2, ivf, "2024-01-02")
    IvfStore.publishRoot(spark, ptr, ivf)

    def serving = IvfStore.currentRoot(spark, ptr)
    // trailing slash on the monitored root: the rail must compare
    // QUALIFIED paths, or a cosmetic crontab difference would skip
    // every rebuild forever as a spurious mismatch
    def runWith(newRoot: String, out: String) = MaintenanceJob.run(
      spark, s"$root/stores", Some(serving + "/"), out,
      nprobe = 1, queriesPerDay = 4,
      rebuildPolicy = Some(MaintenanceJob.RebuildPolicy(
        ptr, newRoot, k = 2, iters = 3,
        driftRatioMax = 3.0, recallMin = 0.0))) // recall axis disarmed

    // 1. the drifted day breaches drift_ratio -> rebuild fires, the
    // pointer swaps, and the landed row names the evidence
    val c1 = runWith(s"$root/ivf-v2", s"$root/rep1")
    assert(c1("rebuild") >= 1, s"policy should have fired: $c1")
    assert(serving === s"$root/ivf-v2", "pointer must now serve the rebuilt root")
    val row = spark.read.parquet(s"$root/rep1/rebuild")
      .filter($"trigger" === "drift").collect()
    assert(row.nonEmpty && row.head.getAs[String]("action") === "rebuilt" &&
      row.head.getAs[String]("dt") === "2024-01-02" &&
      row.head.getAs[Double]("observed") > 3.0 &&
      row.head.getAs[String]("old_root") === ivf &&
      row.head.getAs[String]("new_root") === s"$root/ivf-v2")
    // the closed-enum companions: serving_root says where the pointer
    // actually serves after the action, error is null off the failure
    // path (dashboards key alert rules on the bounded action column)
    assert(row.head.getAs[String]("serving_root") === s"$root/ivf-v2" &&
      row.head.isNullAt(row.head.fieldIndex("error")))
    // serving answers survive the swap: full probe over the rebuilt
    // root returns the same ids the old root returns
    val q = Seq(9000L -> Array.fill(8)(50.0))
    def top(r: String) = IvfStore.probe(spark, r, "vec_id", "embedding",
      q, nprobe = 99, topK = 5).collect().map(_.getLong(1)).toSet
    assert(top(s"$root/ivf-v2") === top(ivf))
    // the old root is untouched (vacuum is the operator's call)
    assert(new java.io.File(s"$ivf/cells").isDirectory)

    // 2. the rebuilt root's baseline covers both blobs -> no day
    // breaches -> the policy is armed but silent, pointer unchanged
    val c2 = runWith(s"$root/ivf-v3", s"$root/rep2")
    assert(c2("rebuild") === 0L, "cured store must stop firing: " +
      spark.read.parquet(s"$root/rep2/rebuild").collect().mkString("; "))
    assert(serving === s"$root/ivf-v2")
    assert(!new java.io.File(s"$root/ivf-v3").exists(),
      "no rebuild -> the new root must not even be initialized")

    // 3. evidence still breaching but newRoot already committed ->
    // skipped row, pointer NOT swapped (cron totality: never die on
    // leftover roots, surface the conflict instead)
    IvfStore.publishRoot(spark, ptr, ivf) // back to the drifted root
    val c3 = runWith(s"$root/ivf-v2", s"$root/rep3")
    assert(c3("rebuild") >= 1)
    val skipped = spark.read.parquet(s"$root/rep3/rebuild").collect()
    assert(skipped.forall(_.getAs[String]("action") === "skipped-existing-newroot"))
    assert(serving === ivf, "a skipped rebuild must not move the pointer")

    // 4. armed policy + monitored root != serving root + NOTHING
    // breached: the run must complete and land all reports (an
    // operator who left both ivfRoot= and ivfPointer= in crontab
    // after a swap hits this configuration every night)
    val c4 = MaintenanceJob.run(spark, s"$root/stores",
      Some(s"$root/ivf-v2"), s"$root/rep4", // healthy root monitored
      nprobe = 1, queriesPerDay = 4,
      rebuildPolicy = Some(MaintenanceJob.RebuildPolicy(
        ptr, s"$root/ivf-v9", k = 2, iters = 3,
        driftRatioMax = 3.0, recallMin = 0.0)))
    assert(c4("rebuild") === 0L && c4.contains("drift"),
      s"healthy-but-mismatched cron run must land reports, not die: $c4")

    // 5. a BREACH whose evidence came from a root the pointer does not
    // serve degrades to a mismatch row — never a swap, never a crash
    IvfStore.publishRoot(spark, ptr, s"$root/ivf-v2")
    val c5 = MaintenanceJob.run(spark, s"$root/stores",
      Some(ivf), s"$root/rep5", // drifted root monitored, v2 serving
      nprobe = 1, queriesPerDay = 4,
      rebuildPolicy = Some(MaintenanceJob.RebuildPolicy(
        ptr, s"$root/ivf-v9", k = 2, iters = 3,
        driftRatioMax = 3.0, recallMin = 0.0)))
    assert(c5("rebuild") >= 1)
    val mm = spark.read.parquet(s"$root/rep5/rebuild").collect()
    assert(mm.forall(_.getAs[String]("action") === "skipped-monitored-root-mismatch"), mm.mkString(";"))
    assert(serving === s"$root/ivf-v2", "mismatch must never swap")
    assert(!new java.io.File(s"$root/ivf-v9").exists())

    // 6. a rebuild that THROWS lands the closed enum 'failed-rebuild'
    // with the message in its own error column and serving_root naming
    // where the pointer actually is (here: untouched — pre-flip
    // failure) — never a free-text action value, never a dead cron
    IvfStore.publishRoot(spark, ptr, ivf) // drifted root serves again
    val blocker = new java.io.File(s"$root/ivf-blocked")
    assert(blocker.createNewFile(), "fixture: newRoot path occupied by a FILE")
    val c6 = runWith(s"$root/ivf-blocked", s"$root/rep6")
    assert(c6("rebuild") >= 1)
    val failed = spark.read.parquet(s"$root/rep6/rebuild").collect()
    assert(failed.forall(_.getAs[String]("action") === "failed-rebuild"),
      failed.mkString(";"))
    assert(failed.forall(r => Option(r.getAs[String]("error")).exists(_.nonEmpty)),
      "the failure message must land in the error column")
    assert(failed.forall(_.getAs[String]("serving_root") === ivf),
      "pre-flip failure: the pointer still serves the old root")
    assert(serving === ivf, "a failed rebuild must not move the pointer")
  }

  test("maintenanceJob retire report: a flipped-away root is marked, survives its grace cadence for in-flight readers, then is deleted") {
    import graft.jobs.MaintenanceJob
    import graft.operators.IvfStore
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("mj-retire").toString
    val (oldIvf, ptr) = (s"$root/ivf-old", s"$root/ptr")
    val rnd = new scala.util.Random(9)
    val day1 = (0 until 24).map(i => (i.toLong,
      Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    IvfStore.init(day1, "vec_id", "embedding", oldIvf, k = 2, iters = 3)
    IvfStore.append(day1, oldIvf, "2024-01-01")
    IvfStore.publishRoot(spark, ptr, oldIvf)
    // the evidence-gated flip already happened (a prior cron night)
    IvfStore.rebuildVia(spark, ptr, s"$root/ivf-new", k = 2, iters = 3): Unit
    def serving = IvfStore.currentRoot(spark, ptr)
    assert(serving === s"$root/ivf-new")
    val q = Seq(7000L -> Array.fill(8)(0.0))
    def probeOld() = IvfStore.probe(spark, oldIvf, "vec_id", "embedding",
      q, nprobe = 99, topK = 3).collect().map(_.getLong(1)).toSeq
    val preFlip = probeOld() // an in-flight reader's resolved root
    // a HEALTHY policy (nothing breaches): the retire step still runs
    def runJob(out: String) = MaintenanceJob.run(spark, s"$root/stores",
      Some(serving), out, nprobe = 1, queriesPerDay = 4,
      rebuildPolicy = Some(MaintenanceJob.RebuildPolicy(
        ptr, s"$root/ivf-unused", k = 2, iters = 3,
        driftRatioMax = 1e9, recallMin = 0.0)),
      retireKeepRoots = 1)
    val c1 = runJob(s"$root/rep1")
    assert(c1("retire") === 1L && c1("rebuild") === 0L, s"$c1")
    val r1 = spark.read.parquet(s"$root/rep1/retire").collect()
    assert(r1.length === 1 && r1.head.getAs[String]("action") === "marked" &&
      r1.head.getAs[String]("root").endsWith("ivf-old"), r1.mkString(";"))
    assert(probeOld() === preFlip,
      "in-flight pre-flip reader must survive the grace cadence")
    val c2 = runJob(s"$root/rep2")
    assert(c2("retire") === 1L)
    val r2 = spark.read.parquet(s"$root/rep2/retire").collect()
    assert(r2.length === 1 && r2.head.getAs[String]("action") === "deleted",
      r2.mkString(";"))
    assert(!new java.io.File(oldIvf).exists(), "grace elapsed — root retired")
    // serving never referenced the retired root again
    assert(IvfStore.probeVia(spark, ptr, "vec_id", "embedding", q,
      nprobe = 99, topK = 3).collect().nonEmpty)
    val c3 = runJob(s"$root/rep3")
    assert(c3("retire") === 0L, "steady state: nothing to mark or delete")
  }

  test("maintenanceJob retires flipped-away TEXT-INDEX roots through textIndexPointer: marked, grace for in-flight BM25 readers, deleted") {
    import graft.jobs.MaintenanceJob
    import graft.operators.TextIndexStore
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("mj-tix-retire").toString
    val (tixOld, tixNew, ptr) = (s"$root/tix-old", s"$root/tix-new", s"$root/tixptr")
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta"),
      (3L, "alpha delta"))
    TextIndexStore.append(docs.toDF("doc_id", "text"), tixOld, "day-1"): Unit
    TextIndexStore.publishRoot(spark, ptr, tixOld, "ws-v1"): Unit
    // the tokenizer-change reindex already happened (a prior run)
    TextIndexStore.rebuildVia(spark, ptr, tixNew, "ws-v2") { (target, days) =>
      days.foreach(d =>
        TextIndexStore.append(docs.toDF("doc_id", "text"), target, d): Unit)
    }: Unit
    assert(TextIndexStore.currentRoot(spark, ptr) === tixNew)
    def probeOld() = TextIndexStore.topK(spark, tixOld, Seq("beta"), 5)
      .collect().map(_.getLong(0)).toSeq
    val preFlip = probeOld() // an in-flight reader's resolved root
    def runJob(out: String) = MaintenanceJob.run(spark, s"$root/stores",
      None, out, textIndexRoot = Some(tixNew), retireKeepRoots = 1,
      textIndexPointer = Some(ptr))
    val c1 = runJob(s"$root/rep1")
    assert(c1("retire") === 1L, s"$c1")
    val r1 = spark.read.parquet(s"$root/rep1/retire").collect()
    assert(r1.length === 1 && r1.head.getAs[String]("action") === "marked" &&
      r1.head.getAs[String]("store") === "text_index" &&
      r1.head.getAs[String]("root").endsWith("tix-old"), r1.mkString(";"))
    assert(probeOld() === preFlip,
      "in-flight pre-flip BM25 reader must survive the grace cadence")
    val c2 = runJob(s"$root/rep2")
    assert(c2("retire") === 1L)
    val r2 = spark.read.parquet(s"$root/rep2/retire").collect()
    assert(r2.length === 1 && r2.head.getAs[String]("action") === "deleted" &&
      r2.head.getAs[String]("store") === "text_index", r2.mkString(";"))
    assert(!new java.io.File(tixOld).exists(), "grace elapsed — root retired")
    assert(TextIndexStore.topKVia(spark, ptr, Seq("beta"), 5)
      .collect().nonEmpty, "serving never referenced the retired root")
    val c3 = runJob(s"$root/rep3")
    assert(c3("retire") === 0L, "steady state: nothing to mark or delete")
  }
}
