package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfStore, KMeans}

/** [[IvfStore.compact]] + [[IvfStore.driftReport]] — the round-12
  * maintenance story for the IVF root: daily appends create one dir
  * per day×cell (the small-files accumulator); tiered compaction must
  * bound the day-dir count over a long feed WITHOUT changing a single
  * probe result, refuse re-appends of folded days, and keep the cell
  * partitioning (probes still prune). The drift report is the
  * evidence feed for the fresh-root rebuild decision: same-regime
  * days sit at ratio ≈ 1, an off-regime day stands out. */
class IvfStoreMaintenanceSpec extends AnyFunSuite with SparkSpec {

  private val rnd = new scala.util.Random(17)
  private def around(cx: Double*): Array[Double] =
    cx.toArray.map(_ + rnd.nextGaussian() * 0.3)
  private val centers =
    Seq(Seq(10.0, 0, 0, 0), Seq(0.0, 10, 0, 0), Seq(0.0, 0, 10, 0))

  private def vecs(rows: Seq[(Long, Array[Double])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }
  private def mkRows(ids: Range): Seq[(Long, Array[Double])] =
    ids.map(i => i.toLong -> around(centers(i % 3): _*))

  private def hfs =
    new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dayDirs(root: String): Seq[String] =
    Option(hfs.globStatus(new Path(s"$root/cells/dt=*")))
      .getOrElse(Array.empty).toSeq
      .map(_.getPath.getName.stripPrefix("dt="))

  private def probeAll(root: String, qs: Seq[(Long, Array[Double])]) =
    IvfStore.probe(spark, root, "vec_id", "embedding", qs,
      nprobe = 99, topK = 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq

  test("30-day feed: tiered compaction bounds day dirs; probes identical before/after; folded-day re-append refuses") {
    val root = Files.createTempDirectory("ivfst-comp").toString
    val days = (1 to 30).map(d =>
      f"2024-06-$d%02d" -> mkRows(d * 100 until d * 100 + 6))
    IvfStore.init(vecs(days.head._2), "vec_id", "embedding", root,
      k = 3, iters = 3)
    val queries = Seq(9001L -> centers(0).toArray, 9002L -> centers(2).toArray)

    // daily cadence with maintenance every 10 days
    val keep = 5
    var reports = List.empty[IvfStore.CompactionReport]
    days.zipWithIndex.foreach { case ((day, rows), i) =>
      IvfStore.append(vecs(rows), root, day)
      if ((i + 1) % 10 == 0)
        reports ::= IvfStore.compact(spark, root, keepDays = keep)
    }
    assert(reports.exists(r => r.mergedDay.isDefined && r.foldedDays >= 2),
      s"no maintenance run folded anything: $reports")
    // awaitingSweep makes the deferred-sweep timing self-explanatory:
    // on a productive run the replaced dirs still stand (grace
    // period), so after > before-ish but after - awaitingSweep is the
    // steady-state count a monitoring rule should use
    reports.filter(_.mergedDay.isDefined).foreach { r =>
      assert(r.awaitingSweep > 0,
        s"productive fold must report its un-swept victims: $r")
      assert(r.dayDirsAfter - r.awaitingSweep < r.dayDirsBefore,
        s"sweep-adjusted dir count must show the fold's decrease: $r")
    }
    reports.filter(_.mergedDay.isEmpty).foreach(r =>
      assert(r.awaitingSweep == 0, s"no-op run after a sweep: $r"))
    val expected = probeAll(root, queries) // current committed answer

    IvfStore.compact(spark, root, keepDays = keep) // sweeps the replaced tail

    // the small-files bound: keepDays real days + <= maxMergedParts
    // merged partitions on disk once the sweep ran
    val maxMergedParts = 4
    val onDisk = dayDirs(root)
    assert(onDisk.size <= keep + maxMergedParts,
      s"day dirs not bounded: ${onDisk.sorted}")
    val committed = IvfStore.committedDays(spark, root)
    assert(committed.count(!_.startsWith("merged-")) == keep)
    assert(committed.count(_.startsWith("merged-")) <= maxMergedParts)

    // compaction moved bytes, not semantics: bit-identical full probe
    assert(probeAll(root, queries) === expected,
      "compaction changed a probe result")

    // the merged partition keeps the cell partitioning (probes prune)
    val merged = committed.find(_.startsWith("merged-")).get
    assert(Option(hfs.globStatus(new Path(s"$root/cells/dt=$merged/cell=*")))
      .exists(_.nonEmpty), "merged day lost its cell partitioning")

    // a folded day is out of the re-append contract — loud refusal
    val folded = days.map(_._1).head
    assert(!committed.contains(folded))
    val e = intercept[IllegalStateException] {
      IvfStore.append(vecs(mkRows(0 until 3)), root, folded)
    }
    assert(e.getMessage.contains("folded"), e.getMessage)

    // still-windowed days keep the normal re-append path
    IvfStore.append(vecs(days.last._2), root, days.last._1)
    assert(probeAll(root, queries) === expected, "windowed re-append changed results")
  }

  test("probe enforces the driver-batch broadcast cap, loudly and conf-tunably") {
    val root = Files.createTempDirectory("ivfst-cap").toString
    IvfStore.init(vecs(mkRows(0 until 12)), "vec_id", "embedding", root,
      k = 2, iters = 2)
    IvfStore.append(vecs(mkRows(0 until 12)), root, "2024-06-01")
    val qs = (0 until 10).map(i => (1000L + i) -> centers(i % 3).toArray)
    spark.conf.set("graft.maxBroadcastRows", "8")
    try {
      val e = intercept[IllegalArgumentException] {
        IvfStore.probe(spark, root, "vec_id", "embedding", qs,
          nprobe = 2, topK = 3) // 10 x 2 = 20 pair rows > cap 8
      }
      assert(e.getMessage.contains("graft.maxBroadcastRows"), e.getMessage)
      spark.conf.set("graft.maxBroadcastRows", "500000")
      assert(IvfStore.probe(spark, root, "vec_id", "embedding", qs,
        nprobe = 2, topK = 3).collect().nonEmpty)
    } finally spark.conf.unset("graft.maxBroadcastRows")
  }

  test("fsck: healthy store audits clean; each constructed corruption is caught by its intended check") {
    import graft.operators.IvfIndex
    val root = Files.createTempDirectory("ivfst-fsck").toString
    IvfStore.init(vecs(mkRows(0 until 30)), "vec_id", "embedding", root,
      k = 3, iters = 3)
    IvfStore.append(vecs(mkRows(0 until 30)), root, "2024-06-01")
    IvfStore.append(vecs(mkRows(100 until 130)), root, "2024-06-02")
    assert(IvfStore.fsck(spark, root, deep = true).isEmpty,
      "healthy two-day store must audit clean")

    def sev(c: String) = IvfStore.fsck(spark, root, deep = true)
      .filter(_.check == c)

    // orphan partition: a day dir no marker ever named
    val conf = spark.sparkContext.hadoopConfiguration
    org.apache.hadoop.fs.FileUtil.copy(hfs,
      new Path(s"$root/cells/dt=2024-06-01"),
      hfs, new Path(s"$root/cells/dt=2024-06-09"), false, conf)
    assert(sev("orphan-partition").exists(x =>
      x.subject == "cells/dt=2024-06-09" && x.severity == "warn"))
    assert(hfs.delete(new Path(s"$root/cells/dt=2024-06-09"), true))

    // tmp marker + invalid day name + empty committed day
    def touchMarker(n: String): Unit = {
      val o = hfs.create(new Path(s"$root/_committed/$n"), true); o.close()
    }
    touchMarker(".2024-06-03.tmp")
    touchMarker("bad day name")
    touchMarker("2024-06-04") // committed, zero data files
    val shallow = IvfStore.fsck(spark, root)
    assert(shallow.exists(x => x.check == "tmp-marker" && x.severity == "warn"))
    assert(shallow.exists(x => x.check == "invalid-day-name" &&
      x.subject == "bad day name"))
    assert(shallow.exists(x => x.check == "empty-day" &&
      x.subject == "2024-06-04"))
    Seq(".2024-06-03.tmp", "bad day name", "2024-06-04")
      .foreach(n => hfs.delete(new Path(s"$root/_committed/$n"), false))

    // dup-identity (deep, warn): a day's partitions restored under a
    // second committed day
    org.apache.hadoop.fs.FileUtil.copy(hfs,
      new Path(s"$root/cells/dt=2024-06-01"),
      hfs, new Path(s"$root/cells/dt=2024-06-08"), false, conf)
    touchMarker("2024-06-08")
    assert(sev("dup-identity").exists(_.severity == "warn"))
    hfs.delete(new Path(s"$root/cells/dt=2024-06-08"), true)
    hfs.delete(new Path(s"$root/_committed/2024-06-08"), false)

    // cell-mismatch (deep, error): centroids swapped under committed
    // partitions — stored cells are no longer the argmin
    val cents = IvfIndex.open(spark, root)
    val swapped = Seq(cents(1), cents(0)) ++ cents.drop(2)
    val o = hfs.create(new Path(s"$root/_CENTROIDS.txt"), true)
    try o.write(swapped.map(_.mkString(",")).mkString("\n").getBytes("UTF-8"))
    finally o.close()
    assert(sev("cell-mismatch").exists(_.severity == "error"),
      "diverged centroids/partitions must fail the deep audit")

    // no-centroids (error): marker gone entirely
    assert(hfs.delete(new Path(s"$root/_CENTROIDS.txt"), false))
    assert(IvfStore.fsck(spark, root).exists(x =>
      x.check == "no-centroids" && x.severity == "error"))
  }

  test("rebuild: fresh root holds the exact committed corpus under retrained centroids; old root untouched") {
    val root = Files.createTempDirectory("ivfst-rb").toString
    val newRoot = Files.createTempDirectory("ivfst-rb-new").toString + "/r"
    IvfStore.init(vecs(mkRows(0 until 40)), "vec_id", "embedding", root,
      k = 3, iters = 4)
    IvfStore.append(vecs(mkRows(0 until 40)), root, "2024-06-01")
    IvfStore.append(vecs(mkRows(100 until 140)), root, "2024-06-02")
    // day 3 drifts off-regime; the frozen centroids never saw it
    val shifted = (200 until 240).map(i =>
      i.toLong -> around(35.0, 35.0, 35.0, 35.0))
    IvfStore.append(vecs(shifted), root, "2024-06-03")
    // fold the old tail so the rebuild must handle a merged pseudo-day
    IvfStore.compact(spark, root, keepDays = 1)
    val oldDays = IvfStore.committedDays(spark, root)
    assert(oldDays.exists(_.startsWith("merged-")))
    val queries = Seq(9001L -> centers(0).toArray,
      9002L -> Array(35.0, 35.0, 35.0, 35.0))
    val before = probeAll(root, queries)
    val oldDrift = IvfStore.driftReport(spark, root).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap

    IvfStore.rebuild(spark, root, newRoot, k = 4, iters = 5)

    // exact corpus carry-over: a full probe is centroid-independent,
    // so old and new roots must answer bit-identically
    assert(probeAll(newRoot, queries) === before,
      "rebuild changed a full-probe answer")
    // day granularity preserved; merged pseudo-days re-homed
    val newDays = IvfStore.committedDays(spark, newRoot)
    assert(newDays.toSet === oldDays.map(d =>
      if (d.startsWith("merged-")) "rebuilt-" + d.stripPrefix("merged-")
      else d).toSet, s"old=$oldDays new=$newDays")
    // the retrained geometry absorbs the drifted day
    val newDrift = IvfStore.driftReport(spark, newRoot).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(newDrift("2024-06-03") < oldDrift("2024-06-03") / 3,
      s"retraining must absorb the drifted regime: " +
        s"old=${oldDrift("2024-06-03")} new=${newDrift("2024-06-03")}")
    assert(IvfStore.fsck(spark, newRoot, deep = true).isEmpty,
      "rebuilt root must audit clean")
    // rebuilt pseudo-days belong to the merged TIER in the new root's
    // own compaction, never the retention window — otherwise they
    // sort after every date ('r' > '2'), permanently occupy keepDays
    // slots, and push genuinely recent days into early folding
    val r2 = IvfStore.compact(spark, newRoot, keepDays = 1)
    assert(r2.mergedDay.isEmpty,
      s"no real day has aged; rebuilt days must not hold retention slots: $r2")
    // old root untouched — consumers swap when ready
    assert(IvfStore.committedDays(spark, root) === oldDays)
    assert(probeAll(root, queries) === before)
  }

  test("rebuild retrain is bounded: past graft.ivf.maxTrainRows a deterministic id-hash slice trains; full probes stay exact") {
    // OWN rng (the recallReport-test rule): later fixtures calibrate
    // against the shared stream's draw order, which this test must
    // not consume from
    val rnd = new scala.util.Random(29)
    def around(cx: Double*): Array[Double] =
      cx.toArray.map(_ + rnd.nextGaussian() * 0.3)
    def mkRows(ids: Range): Seq[(Long, Array[Double])] =
      ids.map(i => i.toLong -> around(centers(i % 3): _*))
    val base = Files.createTempDirectory("ivfst-captrain").toString
    val (r1, r2, r3) = (s"$base/old", s"$base/capped", s"$base/full")
    IvfStore.init(vecs(mkRows(0 until 40)), "vec_id", "embedding", r1,
      k = 3, iters = 3)
    IvfStore.append(vecs(mkRows(0 until 120)), r1, "2024-06-01")
    IvfStore.append(vecs(mkRows(200 until 320)), r1, "2024-06-02")
    val queries = Seq(9001L -> centers(0).toArray, 9002L -> centers(2).toArray)
    val before = probeAll(r1, queries)

    // cap well below the 240-vector corpus: the retrain must slice
    spark.conf.set("graft.ivf.maxTrainRows", "60")
    try IvfStore.rebuild(spark, r1, r2, k = 3, iters = 3)
    finally spark.conf.unset("graft.ivf.maxTrainRows")
    // the seed baseline records how many rows actually trained — the
    // slice is hash-uniform around the cap, never the full corpus
    val trained = IvfStore.seedStats(spark, r2).get._2
    assert(trained > 10 && trained < 120,
      s"id-hash slice missed the cap window: trained on $trained of 240")
    // training quality is ALL the sample affects — probe exactness is
    // probe-side (q146's nprobe=k equality argument), so the
    // sampled-train root must answer full probes bit-identically
    assert(probeAll(r2, queries) === before,
      "sampled-train rebuild changed a full-probe answer")
    assert(IvfStore.committedDays(spark, r2) ===
      IvfStore.committedDays(spark, r1))
    assert(IvfStore.fsck(spark, r2, deep = true).isEmpty)

    // cap disabled (<= 0): the full corpus trains, same exactness
    spark.conf.set("graft.ivf.maxTrainRows", "0")
    try IvfStore.rebuild(spark, r1, r3, k = 3, iters = 3)
    finally spark.conf.unset("graft.ivf.maxTrainRows")
    assert(IvfStore.seedStats(spark, r3).get._2 === 240L)
    assert(probeAll(r3, queries) === before)
  }

  test("post-flip catch-up failure names the flipped pointer and forbids the pre-flip remedy") {
    // the unresolvable-partial-coverage pair from the catchUp spec,
    // reached through rebuildVia's POST-flip path: the wrap must say
    // the pointer already serves the new root (deleting it — the
    // pre-flip remedy — would take serving down). OWN rng: the shared
    // stream's draw order calibrates later fixtures.
    val rnd = new scala.util.Random(31)
    def around(cx: Double*): Array[Double] =
      cx.toArray.map(_ + rnd.nextGaussian() * 0.3)
    def mkRows(ids: Range): Seq[(Long, Array[Double])] =
      ids.map(i => i.toLong -> around(centers(i % 3): _*))
    val base = Files.createTempDirectory("ivfst-postflip").toString
    val (c1, c2) = (s"$base/old", s"$base/new")
    IvfStore.init(vecs(mkRows(0 until 30)), "vec_id", "embedding", c1,
      k = 3, iters = 3)
    IvfStore.append(vecs(mkRows(0 until 30)), c1, "2024-08-01")
    IvfStore.append(vecs(mkRows(100 until 130)), c1, "2024-08-02")
    IvfStore.rebuild(spark, c1, c2, k = 3, iters = 3) // carries d1, d2
    IvfStore.append(vecs(mkRows(200 until 230)), c1, "2024-08-03")
    IvfStore.compact(spark, c1, keepDays = 0) // partial-coverage state
    val e = intercept[IllegalStateException] {
      IvfStore.postFlipCatchUp(spark, c1, c2)
    }
    assert(e.getMessage.contains(s"already serves '$c2'") &&
      e.getMessage.contains("do NOT delete"), e.getMessage)
    assert(e.getCause != null &&
      e.getCause.getMessage.contains("lineage units"),
      "the underlying catch-up refusal must ride along as the cause")
  }

  test("readers never touch replaced-day debris: probes/monitors survive the dirs a concurrent sweep is about to delete") {
    // the round-14 sf1 drill's find: a probe concurrent with
    // maintenance died on FileNotFound — the raw leaf glob picked its
    // SCHEMA leaf from a replaced-day dir awaiting sweep (it sorts
    // first), and the next compact deleted it mid-read. Deterministic
    // stand-in for any mid-sweep state: corrupt the standing replaced
    // dirs' files (garbage bytes) — a reader that touches them in ANY
    // way (schema footer, listing, scan) dies; one that takes the
    // committed view doesn't notice.
    val rnd = new scala.util.Random(37)
    def around(cx: Double*): Array[Double] =
      cx.toArray.map(_ + rnd.nextGaussian() * 0.3)
    def mkRows(ids: Range): Seq[(Long, Array[Double])] =
      ids.map(i => i.toLong -> around(centers(i % 3): _*))
    val root = Files.createTempDirectory("ivfst-debris").toString
    IvfStore.init(vecs(mkRows(0 until 30)), "vec_id", "embedding", root,
      k = 3, iters = 3)
    (1 to 5).foreach(d => IvfStore.append(
      vecs(mkRows(d * 100 until d * 100 + 20)), root, f"2024-06-0$d%d"))
    // fold 01..03; their dirs STAND until the next compact's sweep
    val rep = IvfStore.compact(spark, root, keepDays = 2)
    assert(rep.mergedDay.isDefined && rep.awaitingSweep === 3)
    val queries = Seq(9001L -> centers(0).toArray, 9002L -> centers(2).toArray)
    val expected = probeAll(root, queries)

    // poison every standing replaced-day file — dt=2024-06-01 sorts
    // before the merged-* dir, so the OLD raw-glob schema leaf was
    // exactly one of these
    for (d <- 1 to 3) {
      val parts = Option(hfs.globStatus(
        new Path(s"$root/cells/dt=2024-06-0$d/cell=*/part-*")))
        .getOrElse(Array.empty)
      assert(parts.nonEmpty, s"replaced day 0$d should still stand")
      parts.foreach { p =>
        val o = hfs.create(p.getPath, true)
        try o.write("not a parquet file".getBytes("UTF-8")) finally o.close()
      }
    }

    // every reader path serves the committed view, untouched by the
    // debris: probe, drift, recall, rebuild, catch-up, fsck deep
    assert(probeAll(root, queries) === expected,
      "probe touched replaced-day debris")
    assert(IvfStore.driftReport(spark, root).collect().nonEmpty)
    assert(IvfStore.recallReport(spark, root, nprobe = 1, queriesPerDay = 2)
      .collect().nonEmpty)
    assert(IvfStore.hasProbeableData(spark, root))
    val rb = s"$root-rb"
    IvfStore.rebuild(spark, root, rb, k = 3, iters = 2)
    assert(probeAll(rb, queries) === expected,
      "rebuild read replaced-day debris")
    assert(IvfStore.catchUp(spark, root, rb) === Nil)
    // fsck deep still audits clean on committed content (the debris
    // shows up only as the protocol's awaiting-sweep transients)
    assert(IvfStore.fsck(spark, root, deep = true)
      .forall(_.check == "awaiting-sweep"))
  }

  test("driftReport: same-regime days at ratio ~1, an off-regime day stands out; pre-baseline stores degrade to null") {
    val root = Files.createTempDirectory("ivfst-drift").toString
    val seed = mkRows(0 until 60)
    IvfStore.init(vecs(seed), "vec_id", "embedding", root, k = 3, iters = 4)
    assert(IvfStore.seedStats(spark, root).exists(_._2 == 60L))

    IvfStore.append(vecs(mkRows(100 until 160)), root, "2024-06-01")
    // day 2 drifts: a regime the frozen centroids never saw
    val shifted = (200 until 260).map(i =>
      i.toLong -> around(35.0, 35.0, 35.0, 35.0))
    IvfStore.append(vecs(shifted), root, "2024-06-02")

    val rep = IvfStore.driftReport(spark, root).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4), r.getDouble(5))).toMap
    val (n1, _, ratio1, frac1) = rep("2024-06-01")
    val (n2, _, ratio2, frac2) = rep("2024-06-02")
    assert(n1 == 60L && n2 == 60L)
    assert(ratio1 < 2.0, s"same-regime day should sit near the baseline, got $ratio1")
    assert(ratio2 > 5.0 && ratio2 > 10 * ratio1,
      s"drifted day must stand out: day1=$ratio1 day2=$ratio2")
    // the occupancy axis: a same-regime day spreads over the k=3
    // cells; the off-regime day crowds into one (probe cost's view)
    assert(frac1 < 0.7, s"balanced day's max cell share too high: $frac1")
    assert(frac2 > 0.9, s"drifted day must crowd into one cell: $frac2")

    // a store initialized before the baseline existed: report still
    // runs, baseline columns null (no false alarm, no crash)
    assert(hfs.delete(new Path(s"$root/_SEED_STATS.txt"), false))
    val legacy = IvfStore.driftReport(spark, root).collect()
    assert(legacy.forall(r => r.isNullAt(3) && r.isNullAt(4)),
      "pre-baseline store must yield null baseline/ratio")
  }

  test("pointered root: probes serve THROUGH a live rebuild and flip atomically; old root vacuumable after the swap") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val base = Files.createTempDirectory("ivfst-ptr").toString
    val (r1, r2, ptr) = (s"$base/root-1", s"$base/root-2", s"$base/ptr")
    // enough committed work that the rebuild spans several probe
    // round-trips: 8 days, re-trained at iters=6
    IvfStore.init(vecs(mkRows(0 until 90)), "vec_id", "embedding", r1,
      k = 3, iters = 3)
    (1 to 8).foreach(d => IvfStore.append(
      vecs(mkRows(d * 1000 until d * 1000 + 90)), r1, f"2024-07-$d%02d"))
    IvfStore.publishRoot(spark, ptr, r1)
    assert(IvfStore.currentRoot(spark, ptr) === r1)
    // an unpublished pointer refuses loudly, naming the fix
    val e0 = intercept[IllegalArgumentException] {
      IvfStore.currentRoot(spark, s"$base/nowhere") }
    assert(e0.getMessage.contains("publishRoot"), e0.getMessage)

    val queries = Seq(9001L -> centers(0).toArray, 9002L -> centers(2).toArray)
    def probePtr(): Seq[(Long, Long, Double, Int)] =
      IvfStore.probeVia(spark, ptr, "vec_id", "embedding", queries,
        nprobe = 99, topK = 7).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(x => (x._1, x._4)).toSeq
    val expected = probePtr()

    // rebuild on a second thread; this thread hammers the pointer the
    // whole time. FULL probes are centroid-independent, so every
    // answer — before, during, and after the atomic flip — must be
    // bit-identical: "no torn reads" is exactly this invariant
    val fut = Future { IvfStore.rebuildVia(spark, ptr, r2, k = 4, iters = 6) }
    var during = 0
    while (!fut.isCompleted) {
      assert(probePtr() === expected,
        s"probe #$during diverged mid-rebuild")
      during += 1
    }
    val (_, replaced) = Await.result(fut, 1.minute)
    assert(during >= 1, "rebuild finished before a single concurrent " +
      "probe — grow the fixture so the overlap is actually exercised")
    assert(replaced === r1 && IvfStore.currentRoot(spark, ptr) === r2)
    assert(probePtr() === expected, "post-flip answer changed")

    // the old root is now vacuumable: serving never references it again
    assert(hfs.delete(new Path(r1), true))
    assert(probePtr() === expected, "serving must not depend on the old root")
    // the pointer's version lineage is SnapshotStore's to bound
    graft.operators.SnapshotStore.vacuum(spark, ptr, keep = 1)
    assert(probePtr() === expected)
  }

  test("catchUp closes the rebuild write window: a day appended mid-rebuild lands in the new root, idempotently") {
    val base = Files.createTempDirectory("ivfst-catchup").toString
    val (r1, r2) = (s"$base/old", s"$base/new")
    IvfStore.init(vecs(mkRows(0 until 30)), "vec_id", "embedding", r1,
      k = 3, iters = 3)
    IvfStore.append(vecs(mkRows(0 until 30)), r1, "2024-07-01")
    // manual rebuild (no pointer) snapshots the day list = {07-01} …
    IvfStore.rebuild(spark, r1, r2, k = 3, iters = 3)
    // … and a writer lands a new day on the old root after that
    // snapshot — the write-window scenario rebuildVia's scaladoc names
    IvfStore.append(vecs(mkRows(500 until 520)), r1, "2024-07-02")
    assert(IvfStore.committedDays(spark, r2) === Seq("2024-07-01"))
    assert(IvfStore.catchUp(spark, r1, r2) === Seq("2024-07-02"))
    // the gap day's vectors answer from the new root: full probes are
    // centroid-independent, so old and new must agree exactly
    val qs = Seq(9100L -> centers(1).toArray)
    assert(probeAll(r2, qs) === probeAll(r1, qs))
    assert(IvfStore.committedDays(spark, r2) ===
      Seq("2024-07-01", "2024-07-02"))
    assert(IvfStore.catchUp(spark, r1, r2) === Nil, "nothing left to heal")
  }

  test("recallReport on a dup-identity store: recall is a SET ratio, duplicates cannot inflate it") {
    val root = Files.createTempDirectory("ivfst-duprecall").toString
    def v(a: Double) = Array(a, 0.0, 0.0, 0.0)
    val rows = vecs(Seq(1L -> v(0.0), 2L -> v(5.9)))
    IvfStore.init(rows, "vec_id", "embedding", root, k = 2, iters = 2)
    IvfStore.append(rows, root, "2024-07-01")
    // the SAME ids again — dup-identity is a warn-level, legal state
    // (fsck names it; probes return such ids twice)
    IvfStore.append(rows, root, "2024-07-02")
    val rep = IvfStore.recallReport(spark, root,
        nprobe = 1, topK = 4, queriesPerDay = 99)
      .collect().map(r => (r.getString(0), r.getDouble(4))).toMap
    // every query's exact top-4 is {its own id, the other id} as a
    // SET; nprobe=1 reaches only the query's own cell → recall is
    // exactly 1/2. The pre-fix row-weighted join read 2/3 here (the
    // duplicated matched id paired 2×2 join rows against one
    // unmatched singleton), overstating the very metric the
    // RebuildPolicy's recallMin watches on degraded stores.
    assert(rep === Map("2024-07-01" -> 0.5, "2024-07-02" -> 0.5), rep.toString)
  }

  test("catchUp under compaction: coverage decided by content, not name — never duplicates, partial coverage refuses") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("ivfst-cucomp").toString
    // the COMMITTED view (what probes read): raw dirs legitimately
    // hold replaced-day copies until the next compact's sweep
    def distinctIds(root: String): Unit = {
      val days = IvfStore.committedDays(spark, root)
      val stored = spark.read
        .schema("vec_id LONG, embedding ARRAY<DOUBLE>, dt STRING, cell INT")
        .parquet(s"$root/cells").filter($"dt".isin(days: _*))
        .select($"vec_id").as[Long].collect().toSeq
      assert(stored.size === stored.distinct.size,
        s"duplicate vectors in $root: every probe would double-count")
    }

    // A: the SOURCE compacts between rebuild and catch-up — its merged
    // pseudo-day holds days the target already carried by name, and a
    // name-only diff would re-append them all (silent duplicates)
    val (a1, a2) = (s"$base/a-old", s"$base/a-new")
    IvfStore.init(vecs(mkRows(0 until 30)), "vec_id", "embedding", a1,
      k = 3, iters = 3)
    (1 to 4).foreach(d => IvfStore.append(
      vecs(mkRows(d * 100 until d * 100 + 20)), a1, f"2024-07-0$d%d"))
    IvfStore.rebuild(spark, a1, a2, k = 3, iters = 3)
    IvfStore.compact(spark, a1, keepDays = 1) // folds d1..d3 at the source
    assert(IvfStore.catchUp(spark, a1, a2) === Nil,
      "the folded days' rows are all covered in the target by name")
    distinctIds(a2)

    // B: the TARGET compacts too — a source day folded at the target
    // must count as covered (re-append would crash on the replaced
    // marker or duplicate after its sweep), while a genuinely new day
    // still heals
    IvfStore.compact(spark, a2, keepDays = 1)
    IvfStore.append(vecs(mkRows(900 until 920)), a1, "2024-07-05")
    assert(IvfStore.catchUp(spark, a1, a2) === Seq("2024-07-05"))
    distinctIds(a2)
    val qs = Seq(9200L -> centers(0).toArray)
    assert(probeAll(a2, qs) === probeAll(a1, qs),
      "both roots hold the same corpus after the heal")

    // C: a source pseudo-day the target holds only PARTIALLY is
    // unresolvable — re-appending duplicates the held part, skipping
    // loses the rest — and must refuse loudly, naming the remedy
    val (c1, c2) = (s"$base/c-old", s"$base/c-new")
    IvfStore.init(vecs(mkRows(0 until 30)), "vec_id", "embedding", c1,
      k = 3, iters = 3)
    IvfStore.append(vecs(mkRows(0 until 30)), c1, "2024-08-01")
    IvfStore.append(vecs(mkRows(100 until 130)), c1, "2024-08-02")
    IvfStore.rebuild(spark, c1, c2, k = 3, iters = 3) // carries d1, d2
    IvfStore.append(vecs(mkRows(200 until 230)), c1, "2024-08-03")
    IvfStore.compact(spark, c1, keepDays = 0) // folds d1..d3 at the source
    val e = intercept[IllegalStateException] {
      IvfStore.catchUp(spark, c1, c2)
    }
    assert(e.getMessage.contains("lineage units") &&
      e.getMessage.contains("fresh root"), e.getMessage)

    // D: lineage survives the rebuilt-* rename — a source that had
    // already compacted BEFORE the rebuild, then tier-folds its
    // merged day again afterwards, is still fully covered: the
    // rebuilt marker carries its origin day list, so the fold's
    // content resolves even though the folded names never committed
    // at the target (a lineage-less check would refuse spuriously or
    // re-append every folded day as duplicates)
    val (d1r, d2r) = (s"$base/d-old", s"$base/d-new")
    IvfStore.init(vecs(mkRows(0 until 30)), "vec_id", "embedding", d1r,
      k = 3, iters = 3)
    (1 to 4).foreach(d => IvfStore.append(
      vecs(mkRows(d * 100 until d * 100 + 20)), d1r, f"2024-09-0$d%d"))
    IvfStore.compact(spark, d1r, keepDays = 2) // merged-X folds d1, d2
    IvfStore.rebuild(spark, d1r, d2r, k = 3, iters = 3)
    spark.conf.set("graft.store.maxMergedParts", "1")
    try IvfStore.compact(spark, d1r, keepDays = 1) // tier-fold: merged-X + d3
    finally spark.conf.unset("graft.store.maxMergedParts")
    assert(IvfStore.catchUp(spark, d1r, d2r) === Nil,
      "tier-folded source is fully covered via the carried lineage")
    distinctIds(d2r)
  }

  test("recallReport: drifted day's serving recall falls while its dist2 rises; same-regime day stays near 1") {
    // OWN rng: the midplane geometry below is calibrated against the
    // trained centroids' sampling asymmetry, so the fixture must not
    // depend on how many draws earlier tests consumed from the shared
    // stream
    val rnd = new scala.util.Random(17)
    def around(cx: Double*): Array[Double] =
      cx.toArray.map(_ + rnd.nextGaussian() * 0.3)
    def mkRows(ids: Range): Seq[(Long, Array[Double])] =
      ids.map(i => i.toLong -> around(centers(i % 3): _*))
    val root = Files.createTempDirectory("ivfst-recall").toString
    IvfStore.init(vecs(mkRows(0 until 60)), "vec_id", "embedding", root,
      k = 3, iters = 4)
    // day 1: the training regime — tight clusters, each wholly inside
    // its cell, so nprobe=1 reads every true neighbor
    IvfStore.append(vecs(mkRows(100 until 160)), root, "2024-06-01")
    // day 2: a drifted regime along the MIDPLANE between two frozen
    // centroids — every vector sits on a near-tied boundary, so a
    // query's true neighbors (the nearest siblings along the line)
    // straddle it ~50/50 and nprobe=1 reads only one side. This is
    // the geometry dist2 alone can't grade: the crowding axis
    // (q-drift test) has HIGH dist2 but perfect recall (all siblings
    // share one cell); here dist2 is high AND recall decays — the
    // axis a serving operator actually alarms on. (A blob merely FAR
    // from all centroids decays recall only mildly — near neighbors
    // correlate with same-cell assignment; measured 0.8 on that
    // fixture — boundary-straddling is what serving recall punishes.)
    // construction: dims 1-2 sit at the c1/c2 midpoint with TINY
    // jitter (they alone decide the cell, by sign(x2 - x1)), dims 3-4
    // carry the neighbor-structure noise — so which side of the
    // boundary a vector falls on is independent of who its neighbors
    // are, the worst case for fixed-nprobe serving
    // jitter scale: the d2(c1)-d2(c2) tie-break is ~20·(x2-x1), so
    // sigma 0.15 spreads it +-4 — enough to dominate the trained
    // centroids' sampling asymmetry (~1) and split sides ~50/50,
    // while contributing ~nothing to neighbor distances next to the
    // sigma-1.0 dims
    val drifted = (200 until 260).map { i =>
      i.toLong -> Array(5.0 + rnd.nextGaussian() * 0.15,
        5.0 + rnd.nextGaussian() * 0.15,
        rnd.nextGaussian() * 1.0, rnd.nextGaussian() * 1.0)
    }
    IvfStore.append(vecs(drifted), root, "2024-06-02")

    val rec = IvfStore.recallReport(spark, root, nprobe = 1,
        topK = 5, queriesPerDay = 20).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
    val (nq1, r1) = rec("2024-06-01")
    val (nq2, r2) = rec("2024-06-02")
    assert(nq1 == 20L && nq2 == 20L, s"sample sizes: $nq1/$nq2")
    // near-full, not exactly 1: a trained boundary can clip a cluster
    // tail even in-regime (observed 0.90 on this fixture) — the GAP
    // below is the load-bearing assertion
    assert(r1 >= 0.85, s"same-regime day must serve near-full recall: $r1")
    assert(r2 < 0.75, s"drifted day's recall must decay at nprobe=1: $r2")
    assert(r1 - r2 > 0.25, s"recall gap must be visible: $r1 vs $r2")
    // the self-inclusion FLOOR (documented in the scaladoc): the
    // query's own cell is always probed, so even this drifted day
    // cannot read below 1/topK — alarm thresholds must sit above it
    assert(r2 >= 1.0 / 5, s"self-recall cannot dip below 1/topK: $r2")
    // the two axes agree on WHICH day drifted
    val drift = IvfStore.driftReport(spark, root).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(drift("2024-06-02") > 3 * drift("2024-06-01"),
      s"dist2 axis must rise with the regime shift: $drift")
    // schema stability — the report is a landed artifact
    assert(IvfStore.recallReport(spark, root, nprobe = 3, queriesPerDay = 4)
      .columns.toSeq === Seq("dt", "n_queries", "nprobe", "topk", "recall"))
    // full-probe recall is 1 by construction (the q146 exactness
    // argument): both arms identical when nprobe = k
    val full = IvfStore.recallReport(spark, root, nprobe = 3,
      topK = 5, queriesPerDay = 8).collect()
    assert(full.forall(_.getDouble(4) == 1.0),
      s"nprobe=k recall must be exactly 1: ${full.mkString(",")}")
  }

  test("driftReport survives a hand-restored root: out-of-range cells degrade to null-weighted rows, the feed stays up") {
    val root = Files.createTempDirectory("ivfst-restored").toString
    IvfStore.init(vecs(mkRows(0 until 30)), "vec_id", "embedding", root,
      k = 3, iters = 3)
    IvfStore.append(vecs(mkRows(0 until 30)), root, "2024-06-01")
    val clean = IvfStore.driftReport(spark, root).collect()
    val cleanMean = clean.head.getDouble(2)

    // a restore from a DIFFERENT root: day partitions land under cell
    // ids the committed centroid set never defined. Under ANSI mode a
    // bare element_at(cents, cell+1) would throw INVALID_ARRAY_INDEX,
    // taking the drift feed down on exactly the corrupted roots it
    // documents tolerating — the bounded-cell guard must degrade such
    // rows to a null d2 instead (excluded from the mean's weights).
    val conf = spark.sparkContext.hadoopConfiguration
    val srcCell = Option(hfs.globStatus(
      new Path(s"$root/cells/dt=2024-06-01/cell=*"))).get.head.getPath
    org.apache.hadoop.fs.FileUtil.copy(hfs, srcCell,
      hfs, new Path(s"$root/cells/dt=2024-06-01/cell=99"), false, conf)

    val rep = IvfStore.driftReport(spark, root).collect()
    assert(rep.length == 1, "the report must still produce the day row")
    val r = rep.head
    assert(r.getLong(1) > 30L, "restored rows are scanned (n counts them)")
    val mean = r.getDouble(2)
    assert(!mean.isNaN && !mean.isInfinite,
      s"mean_dist2 must stay finite under restored debris: $mean")
    assert(math.abs(mean - cleanMean) < 1e-9,
      s"null-d2 rows must not ride the mean's denominator: $mean vs $cleanMean")
    // and the audit that NAMES the divergence still fires
    assert(IvfStore.fsck(spark, root, deep = true)
      .exists(f => f.check == "cell-mismatch" && f.severity == "error"),
      "fsck deep must flag the restored out-of-range cells")
  }

  test("unusable restored vectors: fsck deep names them, probes skip them instead of null-ranking them first") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("ivfst-unusable").toString
    IvfStore.init(vecs(mkRows(0 until 24)), "vec_id", "embedding", root,
      k = 3, iters = 3)
    IvfStore.append(vecs(mkRows(0 until 24)), root, "2024-06-01")
    assert(IvfStore.fsck(spark, root, deep = true).isEmpty)
    val before = probeAll(root, Seq(9001L -> centers(0).toArray))

    // hand-restore a data file holding vectors append would have
    // corrupt-dropped: a NaN element, an Inf element, a ragged width,
    // a null element — written straight into a committed cell dir
    // (the restore-from-elsewhere scenario; single-part write so the
    // copy is one file)
    val junk = Seq(
      (900L, Seq(Double.NaN, 1.0, 1.0, 1.0)),
      (901L, Seq(Double.PositiveInfinity, 1.0, 1.0, 1.0)),
      (902L, Seq(1.0, 2.0)),
      (903L, Seq[java.lang.Double](1.0, null, 3.0, 4.0).map(
        Option(_).map(_.doubleValue).getOrElse(Double.NaN))))
      .toDF("vec_id", "embedding")
    // (the null-element case travels as NaN through the tuple encoder;
    // NaN already covers the non-finite class — keep all four ids)
    val tmp = Files.createTempDirectory("ivfst-junkpq").toString
    junk.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Option(hfs.globStatus(new Path(s"$tmp/part-*"))).get.head.getPath
    val destCell = Option(hfs.globStatus(
      new Path(s"$root/cells/dt=2024-06-01/cell=*"))).get.head.getPath
    org.apache.hadoop.fs.FileUtil.copy(hfs, part,
      hfs, new Path(destCell, "part-restored.parquet"), false,
      spark.sparkContext.hadoopConfiguration)

    // fsck deep names the class loudly
    val findings = IvfStore.fsck(spark, root, deep = true)
    assert(findings.exists(f => f.check == "unusable-vector" &&
      f.severity == "warn" && f.detail.startsWith("4 ")),
      s"expected all 4 restored vectors flagged (NaN element, Inf " +
        s"element, ragged width, NaN-carried null element): $findings")

    // probes must SKIP undefined distances — without the corrupt-drop
    // the ragged row's NULL dist2 sorts first (Spark nulls-first) and
    // poisons rank 1 of every probe touching its cell
    val after = probeAll(root, Seq(9001L -> centers(0).toArray))
    assert(after === before,
      s"restored junk leaked into probe results: $after")
    // and the drift feed stays finite
    val mean = IvfStore.driftReport(spark, root).collect().head.getDouble(2)
    assert(!mean.isNaN && !mean.isInfinite)
  }

  test("retireRoots: two-phase grace deletes a flipped-away root; rollback unmarks; retained lineage and current never deleted") {
    val base = Files.createTempDirectory("ivfst-retire").toString
    val (r1, r2, r3, ptr) =
      (s"$base/root-1", s"$base/root-2", s"$base/root-3", s"$base/ptr")
    val day1 = mkRows(0 until 30)
    IvfStore.init(vecs(day1), "vec_id", "embedding", r1, k = 3, iters = 3)
    IvfStore.append(vecs(day1), r1, "2024-07-01")
    IvfStore.publishRoot(spark, ptr, r1)
    IvfStore.rebuildVia(spark, ptr, r2, k = 3, iters = 3): Unit
    val queries = Seq(9001L -> centers(0).toArray)
    // an in-flight reader that resolved the pointer PRE-flip: its
    // root must stay readable through the whole grace cadence
    val preFlipRoot = r1
    def probeOld() = IvfStore.probe(spark, preFlipRoot, "vec_id",
      "embedding", queries, nprobe = 99, topK = 5).collect()
    val expected = probeOld().map(_.getLong(1)).toSeq

    // run 1 (keepRoots=1): r1 leaves the retained set -> MARKED only
    val run1 = IvfStore.retireRoots(spark, ptr, keepRoots = 1)
    assert(run1 === Seq(IvfStore.RetiredRoot(
      hfs.makeQualified(new Path(r1)).toString, "marked")))
    assert(new java.io.File(s"$r1/cells").isDirectory,
      "marking must not delete — the grace window is the point")
    assert(probeOld().map(_.getLong(1)).toSeq === expected,
      "pre-flip reader broken inside the grace window")

    // run 2: the mark stands, r1 still outside the retained set -> gone
    val run2 = IvfStore.retireRoots(spark, ptr, keepRoots = 1)
    assert(run2.map(_.action) === Seq("deleted"))
    assert(!new java.io.File(r1).exists(), "grace elapsed — root retired")
    // serving is unaffected (the pointer never referenced r1 again)
    assert(IvfStore.probeVia(spark, ptr, "vec_id", "embedding", queries,
      nprobe = 99, topK = 5).collect().nonEmpty)
    // steady state: nothing to mark, nothing to delete
    assert(IvfStore.retireRoots(spark, ptr, keepRoots = 1) === Nil)

    // rollback safety: r2 marked, then the pointer flips BACK to it
    // before the next run — the mark must clear, never delete
    IvfStore.rebuildVia(spark, ptr, r3, k = 3, iters = 3): Unit
    val m1 = IvfStore.retireRoots(spark, ptr, keepRoots = 1)
    assert(m1.map(_.action) === Seq("marked"))
    IvfStore.publishRoot(spark, ptr, r2) // rollback: r2 serves again
    val m2 = IvfStore.retireRoots(spark, ptr, keepRoots = 1)
    assert(m2.exists(r => r.action == "unmarked" &&
      r.root == hfs.makeQualified(new Path(r2)).toString),
      s"rolled-back root must be unmarked, not deleted: $m2")
    assert(new java.io.File(s"$r2/cells").isDirectory,
      "rollback target deleted — serving is down")
    // r3 (now replaced by the rollback) enters its own grace window
    assert(m2.exists(r => r.action == "marked" &&
      r.root == hfs.makeQualified(new Path(r3)).toString), s"$m2")
    // keepRoots=2 retains both lineage roots: no candidates at all
    // (the mark from the keepRoots=1 pass clears as a rollback)
    val wide = IvfStore.retireRoots(spark, ptr, keepRoots = 2)
    assert(wide.forall(_.action == "unmarked"), s"$wide")
    assert(new java.io.File(s"$r3/cells").isDirectory)
  }
}
