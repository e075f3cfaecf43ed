package graft.operators

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Versioned keyed snapshot store — the operational wrapper that turns
  * q90's incremental monoid merge into a day-over-day PIPELINE: a
  * profile table maintained on disk, updated by merging each day's
  * delta into the current snapshot, with atomic publication so readers
  * never see a torn table.
  *
  * Layout under `root`:
  * {{{
  *   v=00000001/part-*.parquet     full snapshot, one dir per version
  *   v=00000002/part-*.parquet
  *   _CURRENT                      tiny pointer file: "v=00000002"
  * }}}
  *
  * Commit protocol (same family as TfRecordStreamSink's manifests and
  * TfRecordSink's rename commit): the new version directory is written
  * COMPLETELY first, then `_CURRENT` is replaced by one atomic
  * OVERWRITE rename. A reader resolves the pointer once and reads that
  * immutable directory — a concurrent commit publishes a NEW directory
  * and flips the pointer; nothing the reader holds is mutated. A crash
  * before the flip leaves an orphan `v=` dir that the pointer never
  * references: invisible to readers, version numbering skips past it
  * (next = max existing + 1, pointed or not), [[vacuum]] sweeps it.
  *
  * Single WRITER at a time is assumed (one daily driver) — the
  * standard warehouse-job discipline; readers are unrestricted.
  *
  * At 100 TB: the store pays one full-outer co-partitioned merge join
  * per update (both sides hash-partition on the key; with a bucketed
  * layout even that Exchange disappears — q89) and one snapshot
  * rewrite. That is the batch-incremental trade: rewrite cost buys
  * immutable-snapshot reads, time travel to any retained version, and
  * trivially correct crash recovery. For sub-day latencies the
  * streaming twin is `StreamingOps.runningProfiles` (state-store
  * backed); this store is the batch system of record behind it.
  */
object SnapshotStore {

  private val Pointer = "_CURRENT"
  private val VerFmt = "v=%08d"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Version the pointer currently publishes, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val p = new Path(root, Pointer)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      Some(s.stripPrefix("v=").toLong)
    }
  }

  /** All version numbers on disk, pointed or orphaned. */
  private def versionsOnDisk(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val r = new Path(root)
    if (!f.exists(r)) Nil
    else f.listStatus(r).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  /** The current snapshot, or an empty frame of `schema` when the
    * store has never committed (day zero). */
  def read(spark: SparkSession, root: String, schema: StructType): DataFrame =
    currentVersion(spark, root) match {
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(v) =>
        spark.read.schema(schema).parquet(s"$root/${VerFmt.format(v)}")
    }

  /** Write `df` as the next version and atomically publish it.
    * @return the committed version number */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val next = (versionsOnDisk(spark, root) :+ 0L).max + 1
    val dir = new Path(root, VerFmt.format(next))
    // a crashed prior attempt can't collide: `next` skips every dir on
    // disk; Overwrite still clears any half-written partial of THIS
    // attempt's own retries
    df.write.mode(SaveMode.Overwrite).parquet(dir.toString)
    val tmp = new Path(root, s".$Pointer.tmp")
    val out = f.create(tmp, true)
    try out.write(VerFmt.format(next).getBytes("UTF-8")) finally out.close()
    FileContext.getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
      .rename(f.makeQualified(tmp), f.makeQualified(new Path(root, Pointer)),
        Options.Rename.OVERWRITE)
    next
  }

  /** Merge `delta` into the current snapshot with `merge` (a full
    * snapshot-out function of (current, delta) — e.g. q90's full-outer
    * monoid merge) and commit the result.
    * @return the committed version number */
  def upsert(root: String, delta: DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame): Long = {
    val current = read(delta.sparkSession, root, delta.schema)
    commit(merge(current, delta), root)
  }

  /** POINTED-LINEAGE versions (≤ current), oldest first — the commit
    * history a consumer can walk ([[IvfStore.retireRoots]] reads the
    * root-swap history through this). Empty when never committed. */
  private[operators] def pointedVersions(spark: SparkSession,
      root: String): Seq[Long] =
    currentVersion(spark, root) match {
      case None => Nil
      case Some(c) => versionsOnDisk(spark, root).filter(_ <= c).sorted
    }

  /** The immutable directory a version's snapshot lives in. */
  private[operators] def versionDir(root: String, v: Long): String =
    s"$root/${VerFmt.format(v)}"

  /** One [[retireRoots]] outcome: `marked` (first sighting — grace
    * window opened), `deleted` (grace elapsed, directory removed),
    * `unmarked` (a previously-marked root re-entered the retained
    * lineage — a pointer rollback; never delete it). */
  final case class RetiredRoot(root: String, action: String)

  /** RETIREMENT of replaced serving roots — the missing end of the
    * pointer-flip rebuild pattern ("vacuum the old root at leisure"):
    * nothing ever deleted flipped-away roots, so every evidence-gated
    * rebuild doubled store disk until an operator hand-deleted. Round
    * 15 built this for the IVF pointer; round 16 lifts it HERE because
    * it is a property of the POINTER PROTOCOL, not of any one store:
    * every serving pointer in the engine is a [[SnapshotStore]] whose
    * snapshots carry the current root path as their FIRST (string)
    * column — [[IvfStore.publishRoot]]'s `ivf_root`,
    * [[TextIndexStore.publishRoot]]'s `text_index_root` (+ the
    * discipline note column, which retirement ignores). This walks the
    * pointer's committed lineage and deletes roots absent from the
    * newest `keepRoots` DISTINCT lineage roots — with the store
    * family's two-phase grace instead of a clock (the sweep-at-the-
    * NEXT-run rule): a retirement candidate is first MARKED
    * (`$pointer/_retire/<digest>`, content = the root path); only a
    * run that finds the mark already standing deletes the directory.
    * In-flight probes that resolved the pointer pre-flip read the old
    * root's intact files through the whole grace cadence (maintenance
    * runs are the cadence).
    *
    * Safety rails: the CURRENT root is never a candidate regardless
    * of `keepRoots`; a marked root that re-enters the retained
    * lineage (pointer rollback) is un-marked, never deleted; phase-2
    * deletion re-checks candidacy from the mark's own content, so it
    * stays correct even after [[vacuum]] trims the pointer versions
    * that first named the root. Idempotent — a crash between delete
    * and unmark re-deletes a path that no longer exists (a no-op)
    * and clears the mark. */
  def retireRoots(spark: SparkSession, pointer: String,
      keepRoots: Int = 2): Seq[RetiredRoot] = {
    require(keepRoots >= 1, "keepRoots must be >= 1")
    val conf = spark.sparkContext.hadoopConfiguration
    def qual(s0: String): String = {
      val hp = new Path(s0)
      hp.getFileSystem(conf).makeQualified(hp).toString
    }
    // lineage roots, NEWEST first, distinct by qualified path. The
    // snapshot's FIRST column is the root path by the pointer-payload
    // convention above; the parquet footer self-describes the schema,
    // so no per-store schema threading is needed here.
    val lineage = pointedVersions(spark, pointer).reverse
      .flatMap { v =>
        val rows = spark.read.parquet(versionDir(pointer, v)).collect()
        rows.headOption.map(r => qual(r.getString(0)))
      }.distinct
    if (lineage.isEmpty) return Nil
    val retained = lineage.take(keepRoots).toSet + lineage.head // head = current
    val markDir = new Path(pointer, "_retire")
    val f = markDir.getFileSystem(conf)
    val marks: Map[String, String] = // digest -> marked root path
      if (!f.exists(markDir)) Map.empty
      else f.listStatus(markDir).toSeq.map(_.getPath)
        .filterNot(_.getName.startsWith("."))
        .flatMap(p => MarkerProtocol.readMarker(f, p).headOption
          .map(p.getName -> _)).toMap
    def digest(r: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(r.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    val out = scala.collection.mutable.ArrayBuffer.empty[RetiredRoot]
    // phase 2 first: standing marks whose root is STILL outside the
    // retained set delete now; rolled-back ones un-mark
    marks.foreach { case (dg, r) =>
      val q = qual(r)
      if (retained.contains(q)) {
        f.delete(new Path(markDir, dg), false): Unit
        out += RetiredRoot(r, "unmarked")
      } else {
        f.delete(new Path(q), true): Unit
        f.delete(new Path(markDir, dg), false): Unit
        out += RetiredRoot(r, "deleted")
      }
    }
    // phase 1: newly-seen candidates open their grace window
    lineage.drop(keepRoots).filterNot(retained.contains).foreach { r =>
      val dg = digest(r)
      if (!marks.contains(dg) && f.exists(new Path(r))) {
        MarkerProtocol.atomicMarker(conf, markDir, dg, r + "\n")
        out += RetiredRoot(r, "marked")
      }
    }
    out.toSeq
  }

  /** Delete orphaned versions and all but the newest `keep` pointed
    * lineage versions; never deletes the pointer target.
    *
    * Orphans and lineage are budgeted SEPARATELY: a crashed commit's
    * orphan (version > current, never published) is half-written
    * garbage, so it is deleted unconditionally rather than allowed to
    * consume a slot of the `keep` budget — otherwise, with lineage
    * [1,2,3], current=3 and torn orphan 4, `vacuum(keep=2)` would
    * retain the unreadable 4 and delete 2, the only usable rollback
    * target. The budget is spent exclusively on pointed-lineage
    * versions (≤ current); with no pointer at all, every dir on disk
    * is a crashed first commit and is swept.
    * @return versions deleted */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 1, "keep must be >= 1")
    val cur = currentVersion(spark, root)
    val f = fs(spark, root)
    val (lineage, orphans) = cur match {
      case Some(c) => versionsOnDisk(spark, root).partition(_ <= c)
      case None    => (Nil, versionsOnDisk(spark, root))
    }
    val victims = orphans ++ lineage.sorted.reverse
      .filterNot(cur.contains) // the published version is never a victim
      .drop(keep - 1)          // keep the newest (keep-1) besides current
    victims.foreach(v => f.delete(new Path(root, VerFmt.format(v)), true))
    victims.sorted
  }
}
