package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

/** Day-over-day INCREMENTAL IVF index (round 11) — the vector-index
  * counterpart of [[DedupStore]]'s incremental disciplines: a
  * continuously-growing embedding corpus served by ANN probes without
  * rebuilding the index per day. [[IvfIndex]] is the offline-rebuild
  * batch form; this store freezes its centroids once and then appends
  * each day's vectors as committed day partitions.
  *
  * Layout under `root`:
  * {{{
  *   _CENTROIDS.txt                    frozen at init ([[IvfIndex.open]] reads it)
  *   cells/dt=2024-01-01/cell=N/...    one day's assigned vectors
  *   _committed/2024-01-01             day marker (same protocol as DedupStore)
  * }}}
  *
  * `dt` is the OUTER partition dim so a day commits as one subtree;
  * probes filter BOTH partition columns (`dt IN committed AND cell IN
  * probed`), so unprobed cells and uncommitted/debris days contribute
  * zero files to the scan — the same file-index pruning [[IvfIndex]]
  * asserts, now day-aware.
  *
  * Contract, mirrored from the dedup stores:
  *  - FROZEN centroids: [[init]] trains once on a seed corpus;
  *    every [[append]] assigns against that committed set, so cell
  *    semantics never shift under committed data — and [[init]]
  *    REFUSES a root that already holds centroids or committed days
  *    (re-training in place would silently invalidate every stored
  *    cell assignment: probes would prune by new-centroid geometry
  *    against old-centroid partitions). Distribution DRIFT therefore
  *    degrades recall over time (new-regime vectors crowd into few
  *    cells); the maintenance story is a periodic REBUILD into a
  *    FRESH root ([[init]] + re-append, or [[IvfIndex.build]]) —
  *    which also re-trains the centroids — and a consumer-side root
  *    swap (the SnapshotStore pointer pattern), never in-place
  *    mutation. The same rebuild is the small-files compaction story
  *    (one dir per day×cell accumulates at daily cadence).
  *  - Idempotent re-append: the day's prior partitions are cleared
  *    first (the [[DedupStore]] commitDay discipline — dynamic
  *    overwrite only replaces partitions PRESENT in the incoming
  *    frame, so a corrected replay whose rows vacate a cell, or an
  *    empty replay, would otherwise leave stale vectors standing
  *    under the re-published marker), then written and re-committed
  *    atomically. The day's MARKER is retracted before any partition
  *    is touched, so a crash ANYWHERE inside [[append]] — first-time
  *    or re-append — leaves the day uncommitted and invisible to
  *    probes (never a live marker over an empty or partial subtree);
  *    re-append it.
  *  - Single writer per day. Probes are safe concurrent with appends
  *    of NEW days (they see only marker-committed days); a re-append
  *    of an ALREADY-COMMITTED day mutates that day's partitions under
  *    the live marker — like [[IvfIndex]]'s rebuild, that protects
  *    against crashes, NOT concurrent readers. Pause probes (or run
  *    the backfill through a fresh-root rebuild) for committed-day
  *    backfills.
  *  - Rows [[KMeans.assign]] deems unusable (null vector, wrong
  *    dimension) are skipped silently — the sig-less pass-through
  *    discipline; they are data-quality casualties, not index
  *    corruption. A store whose every committed day held only
  *    unusable rows has nothing to probe and [[probe]] says so
  *    loudly instead of dying in parquet schema inference.
  *
  * At 100 TB: append cost is one map-side assignment pass over the
  * delta (|delta|·k·d flops, no shuffle — `cell` is computed
  * row-locally) plus the partitioned write; probes pay
  * `nprobe/k · committed bytes` exactly as the batch index does. */
object IvfStore {

  private val MarkerDir = "_committed"

  /** Train the frozen centroid set on `seed` and commit it. Writes NO
    * vectors — follow with [[append]] (the seed day included, if its
    * rows belong in the index). Refuses an already-initialized root
    * (see the centroid-freeze contract above). Returns the model with
    * its SSE trace. */
  def init(seed: DataFrame, idCol: String, vecCol: String, root: String,
      k: Int, iters: Int = 5): KMeans.Model = {
    val spark = seed.sparkSession
    require(scala.util.Try(IvfIndex.open(spark, root)).isFailure &&
        committedDays(spark, root).isEmpty,
      s"refusing to re-initialize '$root': it already holds a committed " +
        "centroid set or committed days, and re-training in place would " +
        "silently invalidate every stored cell assignment — rebuild into a " +
        "FRESH root and swap consumers")
    val model = KMeans.train(seed, idCol, vecCol, k, iters)
    IvfIndex.commitCentroids(spark, root, model.centroids)
    model
  }

  /** Days whose marker committed, sorted. */
  def committedDays(spark: SparkSession, root: String): Seq[String] = {
    val d = new Path(root, MarkerDir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith(".")).sorted
  }

  /** Assign `delta` against the frozen centroids and commit it as
    * `day`'s partitions (idempotent — see the re-append contract). */
  def append(delta: DataFrame, root: String, day: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    MarkerProtocol.requireDayName(day)
    val spark = delta.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val cents = IvfIndex.open(spark, root) // refuses an uninitialized root
    // RE-APPEND crash discipline (round 12): retract the day's marker
    // BEFORE touching its partitions. A re-append clears + rewrites
    // the day's data; with the old marker left live through that
    // window, a crash between the pre-delete and the re-publish left
    // a COMMITTED marker over an empty (or partial) day subtree —
    // probes silently omitted that day's vectors. With the marker
    // retracted first, ANY crash inside append leaves the day
    // uncommitted — loudly visible via [[committedDays]] — and the
    // recovery is the same "re-append it" as for a first-time crash.
    val fsys = new Path(root).getFileSystem(conf)
    fsys.delete(new Path(new Path(root, MarkerDir), day), false)
    // clear the day's prior partitions (DedupStore.commitDay's rule):
    // dynamic overwrite replaces only partitions present in the
    // incoming frame — without the delete, a corrected replay that
    // vacates a cell leaves the old cell's vectors committed
    val dayDir = new Path(s"$root/cells/dt=$day")
    fsys.delete(dayDir, true)
    val assigned = KMeans.assign(delta, cents, vecCol)
      .select(col(idCol), col(vecCol), col("cell"))
      .withColumn("dt", lit(day))
    PartitionedLayout.overwritePartitions(
      assigned, s"$root/cells", Seq("dt", "cell"))
    MarkerProtocol.atomicMarker(conf, new Path(root, MarkerDir), day)
  }

  /** L2 top-k per query over the `nprobe` nearest cells of every
    * COMMITTED day — [[IvfIndex.probe]]'s exact semantics over the
    * day-partitioned layout (shared core: `probeCells`). */
  def probe(spark: SparkSession, root: String, idCol: String, vecCol: String,
      queries: Seq[(Long, Array[Double])], nprobe: Int, topK: Int): DataFrame = {
    val cents = IvfIndex.open(spark, root)
    val days = committedDays(spark, root)
    require(days.nonEmpty,
      s"no committed days at $root — append at least one day before probing")
    // loud guard for the committed-but-empty store (every appended row
    // unusable/empty): a bare parquet read over zero data files dies
    // in schema inference with a message that points nowhere
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val anyData = Option(
      fs.globStatus(new Path(s"$root/cells/dt=*/cell=*/part-*")))
      .exists(_.nonEmpty)
    require(anyData, s"store at $root has committed days but no indexed " +
      "vectors (every appended row was empty or unusable) — nothing to probe")
    val cells = spark.read.parquet(s"$root/cells")
      .filter(col("dt").isin(days: _*))
    IvfIndex.probeCells(cells, idCol, vecCol, queries, cents, nprobe, topK)
  }
}
