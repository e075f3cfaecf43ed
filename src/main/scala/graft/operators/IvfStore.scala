package graft.operators

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  *    semantics never shift under committed data. Distribution DRIFT
  *    therefore degrades recall over time (new-regime vectors crowd
  *    into few cells); the maintenance story is a periodic REBUILD
  *    into a fresh root ([[init]] + re-append, or [[IvfIndex.build]])
  *    — which also re-trains the centroids — and a consumer-side
  *    root swap (the SnapshotStore pointer pattern), NOT in-place
  *    mutation. The same rebuild is the small-files compaction story
  *    (one dir per day×cell accumulates at daily cadence).
  *  - Idempotent re-append: dynamic partition overwrite replaces
  *    exactly the day's partitions; the marker re-publishes
  *    atomically. A crash between the table write and the marker
  *    leaves the day invisible to probes — re-append it.
  *  - Single writer per day; concurrent probes are safe at any time
  *    (they see only marker-committed days).
  *  - Rows [[KMeans.assign]] deems unusable (null vector, wrong
  *    dimension) are skipped silently — the sig-less pass-through
  *    discipline; they are data-quality casualties, not index
  *    corruption.
  *
  * At 100 TB: append cost is one map-side assignment pass over the
  * delta (|delta|·k·d flops, no shuffle — `cell` is computed
  * row-locally) plus the partitioned write; probes pay
  * `nprobe/k · committed bytes` exactly as the batch index does. */
object IvfStore {

  private val MarkerDir = "_committed"

  // same day-name discipline as DedupStore.requireDay: the partition
  // paths and marker names must round-trip literally
  private def requireDay(day: String): Unit =
    require(day.nonEmpty && day.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '_' || c == '.') && !day.startsWith("."),
      s"day must be [A-Za-z0-9._-]+ and not dot-led, got '$day'")

  /** Train the frozen centroid set on `seed` and commit it. Writes NO
    * vectors — follow with [[append]] (the seed day included, if its
    * rows belong in the index). Returns the model with its SSE trace. */
  def init(seed: DataFrame, idCol: String, vecCol: String, root: String,
      k: Int, iters: Int = 5): KMeans.Model = {
    val model = KMeans.train(seed, idCol, vecCol, k, iters)
    IvfIndex.commitCentroids(seed.sparkSession, root, model.centroids)
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
    * `day`'s partitions. */
  def append(delta: DataFrame, root: String, day: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    requireDay(day)
    val spark = delta.sparkSession
    val cents = IvfIndex.open(spark, root) // refuses an uninitialized root
    val assigned = KMeans.assign(delta, cents, vecCol)
      .select(col(idCol), col(vecCol), col("cell"))
      .withColumn("dt", lit(day))
    PartitionedLayout.overwritePartitions(
      assigned, s"$root/cells", Seq("dt", "cell"))
    val marker = new Path(s"$root/$MarkerDir/$day")
    val tmp = new Path(s"$root/$MarkerDir/.$day.tmp")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(tmp, true).close()
    FileContext.getFileContext(fs.getUri, spark.sparkContext.hadoopConfiguration)
      .rename(fs.makeQualified(tmp), fs.makeQualified(marker),
        Options.Rename.OVERWRITE): Unit
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
    val cells = spark.read.parquet(s"$root/cells")
      .filter(col("dt").isin(days: _*))
    IvfIndex.probeCells(cells, idCol, vecCol, queries, cents, nprobe, topK)
  }
}
