package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupStore

/** [[DedupStore.ingestCosine]] — day-over-day SEMANTIC near-dedup:
  * an archived vector's cosine-twin arriving on a later day dies
  * against the embedding store; intra-day twins collapse to the min
  * id; zero-norm and NaN-poisoned vectors carry no signature and pass
  * through (committing nothing, suppressing nobody); committed-day
  * re-runs are idempotent; raising `graft.cos.tables` mid-life
  * applies to the WHOLE archive (signatures recompute from stored
  * embeddings — the conf-flip-safety the scaladoc promises);
  * compaction folds the vecs table without changing suppression; the
  * fsck deep pass audits vecs identity uniqueness. */
class CosineStoreSpec extends AnyFunSuite with SparkSpec {

  private val Dim = 32
  private val rnd = new scala.util.Random(7)
  private def vec(): Array[Float] =
    Array.fill(Dim)(rnd.nextGaussian().toFloat)
  /** cos(v, twin(v)) ≈ 0.998 at this dim/perturbation — comfortably
    * inside the SRP recall envelope (miss-all-8-tables ≈ 1e-5). */
  private def twin(v: Array[Float]): Array[Float] = {
    val t = v.clone(); t(0) = t(0) + 0.3f; t
  }
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def d(x: Array[Float], y: Array[Float]) =
      x.iterator.zip(y.iterator).map { case (p, q) => p.toDouble * q }.sum
    d(a, b) / math.sqrt(d(a, a) * d(b, b))
  }

  private def vecs(rows: (Long, Array[Float])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  private def ids(df: DataFrame): Set[Long] = {
    val s = spark
    import s.implicits._
    df.select($"vec_id").as[Long].collect().toSet
  }

  test("cross-day cosine-twins suppressed, intra-day min-id wins, sig-less vectors pass") {
    val a = vec(); val b = vec(); val c = vec()
    // sanity: the planted geometry is what the suppression rule assumes
    assert(cos(a, twin(a)) >= 0.99, s"twin margin too thin: ${cos(a, twin(a))}")
    assert(Seq(a -> b, a -> c, b -> c).forall { case (x, y) => cos(x, y) < 0.9 },
      "random gaussian vectors must sit below the threshold")

    val root = Files.createTempDirectory("cosst").toString
    val d1 = ids(DedupStore.ingestCosine(
      vecs(1L -> a, 2L -> b), root, "2024-06-01"))
    assert(d1 === Set(1L, 2L))

    val day2 = vecs(
      10L -> twin(a),                    // cosine-twin of archived 1 → dies
      11L -> c,                          // fresh → survives
      13L -> twin(c),                    // intra-day twin of 11 → 13 dies
      14L -> Array.fill(Dim)(0f),        // zero norm: no signature, passes
      15L -> (vec().updated(3, Float.NaN)), // NaN-poisoned: passes, harms nobody
      // Inf-poisoned: nrm = Inf is NOT NaN and IS > 0, but every
      // cosine against it is NaN, which Spark orders above minCos —
      // without the finite-norm guard this one row would suppress
      // arbitrary same-bucket neighbors and commit itself forever
      16L -> (vec().updated(5, Float.PositiveInfinity)))
    val d2 = ids(DedupStore.ingestCosine(day2, root, "2024-06-02"))
    assert(d2 === Set(11L, 14L, 15L, 16L), s"got $d2")

    // idempotent re-run of the committed day: identical survivors
    val d2again = ids(DedupStore.ingestCosine(day2, root, "2024-06-02"))
    assert(d2again === d2, "re-run self-suppressed against its own vectors")

    // day 3: twin of the day-2 SURVIVOR 11 dies; twin of the day-2
    // SUPPRESSED 13 also dies (13's canonical 11 is committed and
    // twin(twin(c)) stays within the cosine radius of c)
    val d3 = ids(DedupStore.ingestCosine(
      vecs(20L -> twin(c), 21L -> vec()), root, "2024-06-03"))
    assert(d3 === Set(21L))

    // sig-less rows committed nothing: the store holds only real vectors
    val s = spark
    import s.implicits._
    val stored = spark.read.parquet(s"$root/vecs")
      .select($"vec_id").as[Long].collect().toSet
    assert(!stored.contains(14L) && !stored.contains(15L) &&
      !stored.contains(16L),
      s"sig-less rows must not pollute the store: $stored")

    // compaction folds the vecs table; suppression unchanged
    val r = DedupStore.compact(spark, root, keepDays = 1)
    assert(r.mergedDay.isDefined)
    val d4 = ids(DedupStore.ingestCosine(
      vecs(30L -> twin(b), 31L -> vec()), root, "2024-06-04"))
    assert(d4 === Set(31L), "compacted vector store lost archived embeddings")

    // the fsck deep pass knows the vecs table: healthy store is clean,
    // a duplicated-partition restore is an error
    assert(!DedupStore.fsck(spark, root, deep = true).exists(_.severity == "error"))
    val hfs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    FileUtil.copy(hfs, new Path(s"$root/vecs/dt=2024-06-04"),
      hfs, new Path(s"$root/vecs/dt=2024-06-09"), false,
      spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(new Path(s"$root/_committed/2024-06-09"), true)
    out.close()
    assert(DedupStore.fsck(spark, root, deep = true).exists(f =>
      f.check == "dup-identity" && f.subject == "vecs.vec_id"),
      "duplicated vecs partitions must fail identity uniqueness")
  }

  test("raising graft.cos.tables mid-life recalls archive-wide (sigs recompute from stored embeddings)") {
    val a = vec()
    val root = Files.createTempDirectory("cosconf").toString
    try {
      spark.conf.set("graft.cos.tables", "4")
      assert(ids(DedupStore.ingestCosine(
        vecs(1L -> a), root, "2024-06-01")) === Set(1L))
      // the day-2 ingest banding runs at 12 tables on BOTH sides —
      // including day 1's archived vector, which was ingested at 4
      spark.conf.set("graft.cos.tables", "12")
      assert(ids(DedupStore.ingestCosine(
        vecs(10L -> twin(a), 11L -> vec()), root, "2024-06-02")) === Set(11L),
        "archived vector ingested under the old conf must still suppress")
    } finally spark.conf.unset("graft.cos.tables")
  }

  /** Total numFiles over data scans under `root` while `body` runs —
    * the DedupStoreFsckSpec read-volume probe, here pointed at the
    * archive's embedding files. */
  private def filesReadUnder(root: String)(body: => Unit): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[FileSourceScanExec, java.lang.Boolean])
    val total = new java.util.concurrent.atomic.AtomicLong(0)
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)
        case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          walk(im.relation.cachedPlan)
        case fsc: FileSourceScanExec => Seq(fsc)
        case other => other.children.flatMap(walk)
      }
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        walk(qe.executedPlan).foreach { sc =>
          if (seen.add(sc) &&
              sc.relation.location.rootPaths.exists(_.toString.contains(root)))
            total.addAndGet(sc.metrics("numFiles").value): Unit
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)
    try {
      body
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext, 30000L)
    } finally spark.listenerManager.unregister(qel)
    total.get()
  }

  test("persisted cos_bands: steady-state banding reads ZERO archive embedding files; a conf change falls back archive-wide; ONE rebuild restores the fast path") {
    val root = Files.createTempDirectory("cosbands").toString
    val a = vec()
    def vecFiles(): Long = {
      val dir = new java.io.File(s"$root/vecs")
      if (!dir.isDirectory) 0L
      else dir.listFiles().filter(_.getName.startsWith("dt="))
        .flatMap(_.listFiles()).count(_.getName.startsWith("part-")).toLong
    }
    assert(ids(DedupStore.ingestCosine(
      vecs(1L -> a, 2L -> vec()), root, "2024-06-01")) === Set(1L, 2L))
    assert(ids(DedupStore.ingestCosine(
      vecs(3L -> vec()), root, "2024-06-02")) === Set(3L))
    val archive2 = vecFiles()
    // steady state: the verify join reads the archive embeddings ONCE;
    // banding rides the persisted slim table — zero embedding reads
    val read3 = filesReadUnder(s"$root/vecs") {
      assert(ids(DedupStore.ingestCosine(
        vecs(10L -> twin(a), 11L -> vec()), root, "2024-06-03")) === Set(11L),
        "archived twin must still suppress through the persisted bands")
    }
    assert(read3 === archive2,
      s"fast-path ingest must read the $archive2 archive embedding files " +
        s"exactly once (the verify join), got $read3")
    // candidate-present ingest (a twin): with zero candidates AQE's
    // empty-relation propagation collapses the suppression plan and
    // the executed scans vanish from the final plan tree — the
    // metric, not the behavior, needs a live candidate
    val bandReads = filesReadUnder(s"$root/cos_bands") {
      assert(ids(DedupStore.ingestCosine(
        vecs(20L -> twin(a), 21L -> vec()), root, "2024-06-04")) === Set(21L))
    }
    assert(bandReads > 0, "fast path must read the persisted band table")
    try {
      // conf change: epoch mismatch → the ingest re-bands the WHOLE
      // archive from embeddings (the retroactive-conf contract) —
      // archive scanned twice (banding + verify), no bands committed
      spark.conf.set("graft.cos.bits", "8")
      val archive4 = vecFiles()
      val read5 = filesReadUnder(s"$root/vecs") {
        assert(ids(DedupStore.ingestCosine(
          vecs(30L -> twin(a), 31L -> vec()), root, "2024-06-05")) === Set(31L),
          "epoch-mismatch fallback must still suppress archive-wide")
      }
      assert(read5 === 2 * archive4,
        s"fallback must scan the $archive4 archive embedding files twice " +
          s"(banding + verify), got $read5")
      assert(!new java.io.File(s"$root/cos_bands/dt=2024-06-05").exists(),
        "an epoch-mismatch ingest must not mix conf eras in the band table")
      // ONE rebuild at the new conf restores the fast path
      val r1 = DedupStore.rebuildCosBands(spark, root)
      assert(r1.action === "rebuilt" && r1.daysRebuilt === 5 &&
        r1.epoch.contains("bits=8"), s"got $r1")
      assert(DedupStore.rebuildCosBands(spark, root).action === "in-sync")
      val archive5 = vecFiles()
      val read6 = filesReadUnder(s"$root/vecs") {
        assert(ids(DedupStore.ingestCosine(
          vecs(40L -> twin(a), 41L -> vec()), root, "2024-06-06")) === Set(41L))
      }
      assert(read6 === archive5,
        s"post-rebuild ingest must be back to one archive scan: $read6 vs $archive5")
    } finally spark.conf.unset("graft.cos.bits")
  }

  test("deep fsck cos-bands-mismatch: a tampered band partition is an error until rebuildCosBands heals it") {
    val root = Files.createTempDirectory("cosfsck").toString
    assert(ids(DedupStore.ingestCosine(
      vecs(1L -> vec(), 2L -> vec()), root, "2024-06-01")) === Set(1L, 2L))
    assert(ids(DedupStore.ingestCosine(
      vecs(3L -> vec()), root, "2024-06-02")) === Set(3L))
    assert(DedupStore.fsck(spark, root, deep = true)
      .forall(_.severity == "info"))
    // tamper: day-2's bands replaced by day-1's — wrong signatures
    val hfs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new Path(s"$root/cos_bands/dt=2024-06-02"), true)
    FileUtil.copy(hfs, new Path(s"$root/cos_bands/dt=2024-06-01"),
      hfs, new Path(s"$root/cos_bands/dt=2024-06-02"), false,
      spark.sparkContext.hadoopConfiguration)
    val f1 = DedupStore.fsck(spark, root, deep = true)
    assert(f1.exists(x => x.check == "cos-bands-mismatch" &&
      x.severity == "error"), s"got $f1")
    // dirty day re-surfaces until repaired; rebuild heals
    assert(DedupStore.fsck(spark, root, deep = true)
      .exists(_.check == "cos-bands-mismatch"))
    // epoch-matched and day-complete, so the heal needs force
    assert(DedupStore.rebuildCosBands(spark, root).action === "in-sync")
    assert(DedupStore.rebuildCosBands(spark, root, force = true)
      .action === "rebuilt")
    assert(DedupStore.fsck(spark, root, deep = true)
      .forall(_.severity == "info"))
  }

  test("minCos outside (0, 1] is rejected") {
    val root = Files.createTempDirectory("cosr").toString
    val e = intercept[IllegalArgumentException] {
      DedupStore.ingestCosine(vecs(1L -> vec()), root, "2024-06-01",
        minCos = 0.0)
    }
    assert(e.getMessage.contains("minCos"))
  }
}
