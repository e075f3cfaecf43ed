package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.jobs.{IncrementalCurationJob, MaintenanceJob}
import graft.operators.IvfStore

/** The MAINTENANCE-CRON drill at the ~sf1 replica (round 14) — the
  * full `--job=maintenanceJob` story run once at the scale every
  * other sf1 number is recorded at, so the cron's cost is PRICED,
  * not guessed:
  *
  *   1. build a 10-day IVF store from the replica's embeddings
  *      (8 same-regime days + 2 days of a planted drifted regime),
  *      publish the serving pointer;
  *   2. time each monitor standalone (compact, fsck deep, drift,
  *      recall — the run()'s internals) for the breakdown;
  *   3. run the policy-armed maintenance pass
  *      ([[MaintenanceJob.run]] — the same single code path
  *      `--job=maintenanceJob` dispatches to) while a concurrent
  *      prober hammers the pointer with FULL probes (nprobe = k —
  *      exact, centroid-independent), asserting every answer before,
  *      during, and after the evidence-gated rebuild + atomic flip is
  *      bit-identical: "probes are never torn";
  *   4. run the pass AGAIN on the cured store and assert the drift
  *      monitor stopped firing (the rebuilt root's re-seeded baseline
  *      absorbs the planted regime) — its wall time is the
  *      steady-state nightly cron cost.
  *
  * Round 14 (cont.): a 10-day [[graft.operators.TextIndexStore]]
  * rides the same two passes — run 1 FOLDS its aged days while a
  * concurrent BM25 prober asserts bit-identical answers (scores
  * included: same postings, same stats, fixed-order sums), run 2
  * SWEEPS the replaced postings dirs under a fresh prober — the
  * listing-vs-sweep race class the IVF drill caught in round 14,
  * exercised on the new store's committed-view readers.
  *
  * Prints one JSON line per phase; SCALING.md holds the analyzed
  * table. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/bigsf1 sbt "runMain graft.tools.MaintenanceDrill [workDir]"
  */
object MaintenanceDrill {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/bigsf1")
    val work = args.headOption.getOrElse("/tmp/graft-mdrill")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-maintenance-drill")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val hp = new org.apache.hadoop.fs.Path(work)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    val (ivf, ptr, stores) = (s"$work/ivf", s"$work/ptr", s"$work/stores")
    def j(phase: String, sec: Double, extra: String = ""): Unit =
      println(f"""{"phase":"$phase","sec":$sec%.2f$extra}""")

    // ---- 1. the store: 8 same-regime days + 2 planted drifted days
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val k = 64
    val (_, tInit) = timed {
      IvfStore.init(emb.filter(pmod(xxhash64($"vec_id"), lit(8)) === 0),
        "vec_id", "embedding", ivf, k = k, iters = 4)
    }
    j("init(seed=1/8,k=64)", tInit)
    val (_, tAppend) = timed {
      (0 until 8).foreach { d =>
        IvfStore.append(emb.filter(pmod(xxhash64($"vec_id"), lit(8)) === d),
          ivf, f"2025-07-0${d + 1}%d")
      }
      // the drifted regime the frozen centroids never saw: every dim
      // shifted far off the training manifold. Fresh ids via the
      // NEGATIVE mirror (-(id+1)) — the replica generator already
      // occupies +k·10⁹ id spaces, so an additive offset would plant
      // dup-identity warns into the drill's own fsck report
      (8 until 10).foreach { d =>
        val drifted = emb.filter(pmod(xxhash64($"vec_id"), lit(8)) === (d - 8))
          .select((-$"vec_id" - lit(1L)).as("vec_id"),
            transform($"embedding", x => x + lit(30.0f)).as("embedding"))
        IvfStore.append(drifted, ivf, f"2025-07-${d + 2}%02d")
      }
    }
    j("append(10 days)", tAppend)
    // round 15: flip the store into PQ-encoded serving — the timed
    // backfill encodes all 10 committed days, which is exactly what
    // encode-at-append costs spread across the feed (same arithmetic,
    // same write shape; ~1/10th of this per daily append). Trained
    // RAW first so the acceptance section below prices BOTH arms
    // (round 17, verdict #2): raw recall, then the residual re-train
    // and its recall at the same m/k byte budget.
    val (_, tPq) = timed {
      IvfStore.enablePq(spark, ivf, m = 8, k = 64, iters = 4)
    }
    j("enablePq(raw: train m=8 k=64 + backfill 10 days)", tPq)
    IvfStore.publishRoot(spark, ptr, ivf)
    val total = emb.count() + 2 * (emb.count() / 8).min(emb.count())
    println(s"""{"phase":"corpus","days":10,"k":$k,"rows_approx":$total}""")

    // ---- 1b. the retrieval store (round 14): 10 day-sharded appends
    // of the replica's documents; probed CONCURRENTLY with the same
    // maintenance pass that folds it (run 1) and sweeps it (run 2)
    val (tix, tixPtr) = (s"$work/tix", s"$work/tixptr")
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val (_, tTix) = timed {
      (0 until 10).foreach { d =>
        graft.operators.TextIndexStore.append(
          docsAll.filter(pmod(xxhash64($"doc_id"), lit(10)) === d),
          tix, f"2025-07-${d + 1}%02d"): Unit
      }
    }
    j("textIndex.append(10 days)", tTix)
    // probe terms derived from the corpus (the q149 rule — the
    // replica's token mutation leaves no stopword literals)
    graft.GraftExtensions.ensureRegistered(spark)
    val tixTerms = docsAll
      .filter($"doc_id".isNotNull && $"text".isNotNull &&
        !$"text".rlike("^\\s*$"))
      .select(explode(expr("word_counts(text)")).as("w"))
      .groupBy($"w.word".as("word")).agg(sum($"w.tf").as("n"))
      .orderBy($"n".desc, $"word".asc).limit(3)
      .collect().map(_.getString(0)).toSeq
    def tixProbe(): Seq[(Long, Double, Long, Int)] =
      graft.operators.TextIndexStore.topK(spark, tix, tixTerms, topK = 20)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
        .sortBy(_._4).toSeq

    // ---- 1c. a containment dedup store under the maintenance root
    // (round 16): 10 day-sharded ingests of the replica's documents —
    // prices the DAY-SCOPED deep fsck on the dedup family (first
    // audit = full recount; steady-state re-audit reads zero files),
    // and rides every later compact/fsck pass of the drill's runs
    val ded = s"$stores/contain"
    val (_, tDed) = timed {
      (0 until 10).foreach { d =>
        graft.operators.DedupStore.ingestContained(
          docsAll.filter(pmod(xxhash64($"doc_id"), lit(10)) === d),
          ded, f"2025-07-${d + 1}%02d"): Unit
      }
    }
    j("containStore.ingest(10 days)", tDed)
    val (fd1, tDeep1) = timed {
      graft.operators.DedupStore.fsck(spark, ded, deep = true)
    }
    require(fd1.forall(_.severity != "error"), s"contain fsck: $fd1")
    j("containStore.fsck(deep, first full audit)", tDeep1)
    val (_, tDeep2) = timed {
      graft.operators.DedupStore.fsck(spark, ded, deep = true)
    }
    j("containStore.fsck(deep, watermarked re-audit)", tDeep2)

    // ---- 1d. a cosine dedup store (round 17): prices the persisted
    // cos_bands fast path against the pre-17 behavior (archive
    // re-band on every ingest) and the one-time rebuild that heals a
    // conf-epoch change — the verdict's before/after rows
    val cosd = s"$stores/cos"
    val (_, tCosBuild) = timed {
      (0 until 10).foreach { d =>
        graft.operators.DedupStore.ingestCosine(
          emb.filter(pmod(xxhash64($"vec_id"), lit(10)) === d),
          cosd, f"2025-07-${d + 1}%02d"): Unit
      }
    }
    j("cosStore.ingest(10 days, persisted bands)", tCosBuild)
    // steady-state day: re-serves shard 0's embeddings under mirror
    // ids — every row a cosine twin of an archived vector, so the
    // candidate/verify load is the store's worst case
    val (_, tCosFast) = timed {
      graft.operators.DedupStore.ingestCosine(
        emb.filter(pmod(xxhash64($"vec_id"), lit(10)) === 0)
          .select((-$"vec_id" - lit(1L)).as("vec_id"), $"embedding"),
        cosd, "2025-07-11"): Unit
    }
    j("cosStore.ingest(day 11, persisted-band fast path)", tCosFast)
    // the BEFORE price: a conf-epoch flip sends the next ingest to
    // the fallback — SRP re-derived over the whole archive, exactly
    // what every ingest paid before round 17. Negated embeddings
    // (cos = −1 to their sources) so the day commits SURVIVORS,
    // leaving the band table incomplete for the heal leg below.
    spark.conf.set("graft.cos.bits", "8")
    val (_, tCosFallback) = timed {
      graft.operators.DedupStore.ingestCosine(
        emb.filter(pmod(xxhash64($"vec_id"), lit(10)) === 1)
          .select((-$"vec_id" - lit(1L)).as("vec_id"),
            transform($"embedding", x => -x).as("embedding")),
        cosd, "2025-07-12"): Unit
    }
    j("cosStore.ingest(day 12, conf-change archive-reband fallback)",
      tCosFallback)
    spark.conf.unset("graft.cos.bits")
    // the one-time heal at the restored conf (day 12 committed vecs
    // but no bands, so the table is incomplete until this runs)
    val (cbr, tCosRebuild) = timed {
      graft.operators.DedupStore.rebuildCosBands(spark, cosd)
    }
    require(cbr.action == "rebuilt", s"expected a rebuild, got $cbr")
    require(graft.operators.DedupStore.rebuildCosBands(spark, cosd)
      .action == "in-sync", "second rebuild must no-op")
    j("cosStore.rebuildCosBands(heal at restored conf)", tCosRebuild,
      s""","days_rebuilt":${cbr.daysRebuilt}""")

    // ---- 2. the monitors standalone (the run()'s internals, priced)
    val (_, tCompact) = timed {
      IncrementalCurationJob.compactStoresWithIvf(spark, stores, ivf,
        keepDays = 7)
    }
    j("compact(stores+ivf,keep=7)", tCompact)
    val (fk, tFsck) = timed {
      IncrementalCurationJob.fsckStoresWithIvf(spark, stores, ivf,
        deep = true)
    }
    // findings SPLIT BY SEVERITY (round 16, verdict): the protocol's
    // expected info-class transients (awaiting-sweep right after a
    // fold) must be distinguishable from real errors in the artifact —
    // and a deep-fsck ERROR fails the drill outright
    val sev = fk.values.flatten.toSeq.groupBy(_.severity)
      .map { case (k2, v) => k2 -> v.size }
    val (fe, fw, fi) = (sev.getOrElse("error", 0), sev.getOrElse("warn", 0),
      sev.getOrElse("info", 0))
    j("fsck(deep)", tFsck,
      s""","findings":{"errors":$fe,"warns":$fw,"infos":$fi}""")
    require(fe == 0, s"deep fsck found $fe error-severity findings: " +
      fk.values.flatten.filter(_.severity == "error").mkString("; "))
    val (dr, tDrift) = timed { IvfStore.driftReport(spark, ivf).collect() }
    j("driftReport", tDrift,
      s""","max_ratio":${dr.flatMap(r => Option(r.get(4)).map(_ => r.getDouble(4))).max}""")
    val (rc, tRecall) = timed {
      IvfStore.recallReport(spark, ivf, nprobe = 8, topK = 5,
        queriesPerDay = 16).collect()
    }
    j("recallReport(nprobe=8/64)", tRecall,
      s""","min_recall":${rc.map(_.getDouble(4)).min}""")
    // the ADC serving acceptance numbers (rounds 16-17): what recall
    // does enablePq buy at the serving nprobe, with and without
    // re-rank — priced for BOTH codebook arms at the same m/k byte
    // budget, so the residual upgrade's accuracy claim carries an
    // at-scale number (round 17, verdict #2): raw first (the store
    // trained raw above), then the residual re-train and ITS recall.
    // Everything downstream (serving probes, the rebuild flip) runs
    // on the residual store — the published-accuracy form.
    def adcRecallArms(label: String): Unit = {
      val (arc, tAdcRecall) = timed {
        IvfStore.adcRecallReport(spark, ivf, arms = Seq((8, 0), (8, 40)),
          topK = 5, queriesPerDay = 16).collect()
      }
      def armMin(rr: Int) = arc.filter(_.getAs[Int]("rerank") == rr)
        .map(_.getAs[Double]("recall")).min
      j(s"adcRecallReport($label, nprobe=8, rerank 0|40)", tAdcRecall,
        s""","min_recall_adc":${armMin(0)},"min_recall_rerank40":${armMin(40)}""")
    }
    adcRecallArms("raw")
    val (_, tPqRes) = timed {
      IvfStore.enablePq(spark, ivf, m = 8, k = 64, iters = 4,
        residual = true)
    }
    j("enablePq(residual: retrain + re-encode 10 days)", tPqRes)
    adcRecallArms("residual")

    // ---- 3. the policy-armed pass under concurrent serving
    val queries = emb.orderBy(xxhash64($"vec_id")).limit(6)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => id -> v.toArray }.toSeq
    def fullProbe(): Seq[(Long, Long, Int)] =
      IvfStore.probeVia(spark, ptr, "vec_id", "embedding", queries,
        nprobe = k, topK = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .sortBy(x => (x._1, x._3)).toSeq
    val expected = fullProbe()
    val expectedTix = tixProbe()
    // the ADC serving arm (round 15): full-probe ADC is exact over
    // reconstructions and codebooks carry through rebuildVia, so its
    // answers too must be bit-identical before/during/after the flip
    def adcProbe(): Seq[(Long, Long, Double, Int)] =
      IvfStore.adcProbeVia(spark, ptr, "vec_id", queries,
        nprobe = k, topK = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(x => (x._1, x._4)).toSeq
    val (expectedAdc, tAdc) = timed { adcProbe() }
    val (_, tFloat) = timed { fullProbe() }
    j("adcProbe(full, 6 queries)", tAdc, f""","float_probe_sec":$tFloat%.2f""")
    @volatile var stop = false
    @volatile var torn: Option[String] = None
    val prober = new Thread(() => {
      var n = 0
      while (!stop && torn.isEmpty) {
        // a probe that THROWS is a serving outage, same severity as a
        // torn answer — a silently-dead prober thread would vacate
        // the drill's central assertion (this caught the round-14
        // replaced-dir/sweep race)
        try {
          val got = fullProbe()
          if (got != expected) torn = Some(s"probe #$n diverged")
        } catch {
          case e: Throwable => torn = Some(s"probe #$n threw: ${e.getMessage}")
        }
        n += 1
      }
      println(s"""{"phase":"concurrent_probes","count":$n}""")
    })
    // the BM25 prober: compaction folds postings days mid-pass; every
    // answer (scores included — same postings, same stats, fixed-sum
    // order) must stay bit-identical, and a FileNotFound from a
    // sweep racing a listing is the same outage class the IVF drill
    // caught in round 14
    @volatile var tornTix: Option[String] = None
    val tixProber = new Thread(() => {
      var n = 0
      while (!stop && tornTix.isEmpty) {
        try {
          val got = tixProbe()
          if (got != expectedTix) tornTix = Some(s"bm25 probe #$n diverged")
        } catch {
          case e: Throwable =>
            tornTix = Some(s"bm25 probe #$n threw: ${e.getMessage}")
        }
        n += 1
      }
      println(s"""{"phase":"concurrent_bm25_probes","count":$n}""")
    })
    @volatile var tornAdc: Option[String] = None
    val adcProber = new Thread(() => {
      var n = 0
      while (!stop && tornAdc.isEmpty) {
        try {
          if (adcProbe() != expectedAdc) tornAdc = Some(s"adc probe #$n diverged")
        } catch {
          case e: Throwable => tornAdc = Some(s"adc probe #$n threw: ${e.getMessage}")
        }
        n += 1
      }
      println(s"""{"phase":"concurrent_adc_probes","count":$n}""")
    })
    prober.start(); tixProber.start(); adcProber.start()
    val policy = MaintenanceJob.RebuildPolicy(ptr, s"$work/ivf-v2", k = k,
      iters = 5, driftRatioMax = 2.5, recallMin = 0.0)
    val (c1, tRun1) = timed {
      MaintenanceJob.run(spark, stores, Some(ivf), s"$work/reports1",
        deep = true, nprobe = 8, topK = 5, queriesPerDay = 16,
        rebuildPolicy = Some(policy), textIndexRoot = Some(tix),
        retireKeepRoots = 1, textIndexPointer = Some(tixPtr))
    }
    stop = true; prober.join(); tixProber.join(); adcProber.join()
    torn.foreach(t => sys.error(s"TORN PROBE: $t"))
    tornTix.foreach(t => sys.error(s"TORN BM25 PROBE: $t"))
    tornAdc.foreach(t => sys.error(s"TORN ADC PROBE: $t"))
    require(adcProbe() == expectedAdc,
      "post-flip ADC probe changed (codebooks must carry through rebuild)")
    // retire (round 15, keepRoots=1): run 1 only MARKS the root its
    // own flip replaced — the grace window for in-flight readers
    // (store = "ivf"; the text pointer is unpublished until the
    // reindex drill below, so it lands zero rows here — totality)
    val ret1 = spark.read.parquet(s"$work/reports1/retire")
      .filter($"store" === "ivf").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    require(ret1.map(_._2) == Seq("marked") && ret1.head._1.endsWith("/ivf"),
      s"run 1 must mark the flipped-away root, got $ret1")
    require(new java.io.File(s"$ivf/cells").isDirectory,
      "marked root must survive its grace cadence")
    require(tixProbe() == expectedTix, "post-fold BM25 probe changed")
    val tixComp = spark.read.parquet(s"$work/reports1/compaction")
      .filter($"store" === "text_index").collect()
    require(tixComp.length == 1 && tixComp.head.getAs[Int]("folded_days") == 3,
      s"10 text-index days at keepDays=7 must fold 3: ${tixComp.toSeq}")
    require(IvfStore.currentRoot(spark, ptr) == s"$work/ivf-v2",
      "the drift breach must have swapped the pointer")
    // the geometry stamp (round 17): the flip's publishRoot derives it
    // from the new root — residual codebooks carried, so says the stamp
    require(IvfStore.currentSummary(spark, ptr)
        .exists(_.contains("residual=true")),
      s"pointer must stamp the residual geometry, got ${
        IvfStore.currentSummary(spark, ptr)}")
    require(fullProbe() == expected, "post-flip full probe changed")
    val act = spark.read.parquet(s"$work/reports1/rebuild")
      .select($"action").distinct().as[String].collect().toSeq
    require(act == Seq("rebuilt"), s"expected a rebuilt row, got $act")
    val fsckBad = spark.read.parquet(s"$work/reports1/fsck")
      .filter($"severity" =!= "info").count()
    require(fsckBad == 0L,
      s"post-maintenance audit must be clean of warns/errors: $fsckBad rows")
    j("maintenanceJob(run1: monitors+rebuild+flip)", tRun1,
      s""","rebuild_rows":${c1("rebuild")}""")

    // ---- 4. the cured store: nightly steady-state cost, no re-fire;
    // the text index rides along — THIS run's sweep deletes the
    // replaced postings days while a fresh prober is live
    @volatile var stop2 = false
    @volatile var tornTix2: Option[String] = None
    val tixProber2 = new Thread(() => {
      var n = 0
      while (!stop2 && tornTix2.isEmpty) {
        try {
          if (tixProbe() != expectedTix) tornTix2 = Some(s"bm25 probe #$n diverged")
        } catch {
          case e: Throwable =>
            tornTix2 = Some(s"bm25 probe #$n threw: ${e.getMessage}")
        }
        n += 1
      }
      println(s"""{"phase":"concurrent_bm25_probes_sweep","count":$n}""")
    })
    tixProber2.start()
    val (c2, tRun2) = timed {
      MaintenanceJob.run(spark, stores, Some(s"$work/ivf-v2"),
        s"$work/reports2", deep = true, nprobe = 8, topK = 5,
        queriesPerDay = 16,
        rebuildPolicy = Some(policy.copy(newRoot = s"$work/ivf-v3")),
        textIndexRoot = Some(tix), retireKeepRoots = 1,
        textIndexPointer = Some(tixPtr))
    }
    stop2 = true; tixProber2.join()
    tornTix2.foreach(t => sys.error(s"TORN BM25 PROBE (sweep run): $t"))
    require(tixProbe() == expectedTix, "post-sweep BM25 probe changed")
    require(c2("rebuild") == 0L,
      s"cured store must stop firing: ${c2("rebuild")} rebuild rows")
    // retire phase 2: grace elapsed — the replaced root is deleted,
    // serving (through the pointer, on the rebuilt root) unaffected
    val ret2 = spark.read.parquet(s"$work/reports2/retire")
      .filter($"store" === "ivf").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    require(ret2.map(_._2) == Seq("deleted"),
      s"run 2 must delete the marked root, got $ret2")
    require(!new java.io.File(ivf).exists(), "retired root still on disk")
    require(adcProbe() == expectedAdc && fullProbe() == expected,
      "serving must not depend on the retired root")
    // day-scoped deep fsck (round 15): nothing moved since run 2's
    // audit — a third deep audit recounts ZERO text-index days
    val (_, tFsck3) = timed {
      graft.operators.TextIndexStore.fsck(spark, tix, deep = true)
    }
    j("textIndex.fsck(deep, watermarked re-audit)", tFsck3)
    val drift2 = spark.read.parquet(s"$work/reports2/drift")
      .select($"drift_ratio").as[Option[Double]].collect().flatten
    require(drift2.forall(_ < 2.5),
      s"rebuilt baseline must absorb the planted regime: ${drift2.max}")
    j("maintenanceJob(run2: cured steady-state)", tRun2,
      s""","max_drift_ratio":${drift2.max}""")

    // ---- 5. text-index reindex + retirement (round 16): publish the
    // serving pointer (discipline-stamped), rebuild into a fresh root
    // under a LIVE via-prober (zero-downtime reindex priced at sf1),
    // then two-phase-retire the flipped-away root with the prober
    // still running — the disk-leak closure the round-15 scaladoc
    // promised but only the IVF store had
    graft.operators.TextIndexStore.publishRoot(spark, tixPtr, tix, "ws-v1")
    def tixProbeVia(): Seq[(Long, Double, Long, Int)] =
      graft.operators.TextIndexStore.topKVia(spark, tixPtr, tixTerms, topK = 20)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
        .sortBy(_._4).toSeq
    require(tixProbeVia() == expectedTix, "pointer must serve the published root")
    @volatile var stop3 = false
    @volatile var tornVia: Option[String] = None
    val viaProber = new Thread(() => {
      var n = 0
      while (!stop3 && tornVia.isEmpty) {
        try {
          if (tixProbeVia() != expectedTix)
            tornVia = Some(s"via probe #$n diverged")
        } catch {
          case e: Throwable => tornVia = Some(s"via probe #$n threw: ${e.getMessage}")
        }
        n += 1
      }
      println(s"""{"phase":"concurrent_via_probes_reindex","count":$n}""")
    })
    viaProber.start()
    val dayShard = (0 until 10).map(d => f"2025-07-${d + 1}%02d" -> d).toMap
    val (_, tReindex) = timed {
      graft.operators.TextIndexStore.rebuildVia(spark, tixPtr,
          s"$work/tix-v2", "ws-v1-reindex") { (target, days2) =>
        days2.foreach { dd =>
          graft.operators.TextIndexStore.append(
            docsAll.filter(pmod(xxhash64($"doc_id"), lit(10)) === dayShard(dd)),
            target, dd): Unit
        }
      }: Unit
    }
    j("textIndex.rebuildVia(reingest 10 days)", tReindex)
    val (r1x, tRet1) = timed {
      graft.operators.TextIndexStore.retireRoots(spark, tixPtr, keepRoots = 1)
    }
    require(r1x.map(_.action) == Seq("marked"), s"run: $r1x")
    require(new java.io.File(s"$tix/postings").isDirectory,
      "marked text root must survive its grace cadence")
    val (r2x, tRet2) = timed {
      graft.operators.TextIndexStore.retireRoots(spark, tixPtr, keepRoots = 1)
    }
    require(r2x.map(_.action) == Seq("deleted"), s"run: $r2x")
    require(!new java.io.File(tix).exists(), "retired text root still on disk")
    stop3 = true; viaProber.join()
    tornVia.foreach(t => sys.error(s"TORN VIA-PROBE (reindex/retire): $t"))
    require(tixProbeVia() == expectedTix,
      "serving must not depend on the retired text root")
    j("textIndex.retireRoots(mark+delete)", tRet1 + tRet2,
      s""","discipline":"${graft.operators.TextIndexStore
        .currentDiscipline(spark, tixPtr).getOrElse("")}"""")
    println(s"""{"phase":"drill","ok":true}""")
    spark.stop()
  }
}
