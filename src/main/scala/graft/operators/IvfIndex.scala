package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Disk-backed IVF index — [[KMeans]] composed with
  * [[PartitionedLayout]] into the ANN shape that actually serves at
  * 100 TB: cells are Hive partitions (`cells/cell=N/`), so a probe
  * reads `nprobe/k` of the corpus AT THE FILE INDEX — unprobed cells
  * contribute zero files to the scan before a single row is decoded
  * (the in-memory q47 filters rows AFTER a full scan; this prunes the
  * scan itself — IvfIndexSpec asserts the `numFiles` metric, not just
  * the plan string).
  *
  * Layout under `root`:
  * {{{
  *   cells/cell=0/part-*.parquet   assigned rows, one dir per cell
  *   cells/cell=1/...
  *   _CENTROIDS.txt                k lines: "v1,v2,...,vd"
  * }}}
  * The centroids file is the index's commit marker and publishes via
  * tmp + atomic OVERWRITE rename (the SnapshotStore/_manifest
  * protocol): a crash mid-build leaves cell debris but no marker, and
  * [[open]] on an uncommitted root fails loudly rather than probing a
  * torn index. Rebuilds overwrite the cells statically first, then
  * flip the marker — which protects against CRASHES, not against
  * concurrent READERS: a probe running during a rebuild can scan
  * half-rewritten cells under the old marker. For zero-downtime
  * rebuild, build into a fresh root and switch consumers (or wrap
  * roots in a SnapshotStore-style pointer); this operator keeps the
  * single-writer, offline-rebuild contract.
  *
  * Metric is L2 throughout — cells are trained by [[KMeans]] (L2
  * means), probed by L2 centroid distance, ranked by L2; for cosine
  * serving, L2-normalize the vectors upstream (then L2 order = cosine
  * order).
  *
  * `probe` takes a DRIVER-SIDE query batch — the ANN serving shape
  * (requests arrive in small batches; guard the size like the
  * broadcast-map collect in PredictionPipeline). Each query selects
  * its `nprobe` nearest cells on the driver (|Q|·k·d flops), the
  * union of probed cells prunes the scan, and one broadcast join
  * fans (query, cell) pairs over only those cells' rows; ranking is
  * a per-query top-k window over candidate rows. Approximate by
  * design (recall is bounded by the probed cells), deterministic
  * given the index. */
object IvfIndex {

  private val Marker = "_CENTROIDS.txt"

  private def l2d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Train k cells on `df`, write the partitioned layout, commit the
    * centroids marker. Returns the trained model (with SSE trace). */
  def build(df: DataFrame, idCol: String, vecCol: String, root: String,
      k: Int, iters: Int = 5): KMeans.Model = {
    val spark = df.sparkSession
    val model = KMeans.train(df, idCol, vecCol, k, iters)
    PartitionedLayout.writePartitioned(
      KMeans.assign(df, model.centroids, vecCol).drop("dist2"),
      s"$root/cells", Seq("cell"))
    commitCentroids(spark, root, model.centroids)
    model
  }

  /** Publish the centroids marker via [[MarkerProtocol.atomicMarker]]
    * (shared with [[IvfStore.init]] — same file, same open()). */
  private[operators] def commitCentroids(spark: SparkSession, root: String,
      centroids: Seq[Array[Double]]): Unit =
    MarkerProtocol.atomicMarker(spark.sparkContext.hadoopConfiguration,
      new Path(root), Marker,
      centroids.map(_.mkString(",")).mkString("\n"))

  /** The committed centroids; throws with the path when the index was
    * never committed (or a build crashed before its marker flip). */
  def open(spark: SparkSession, root: String): Seq[Array[Double]] = {
    val marker = new Path(root, Marker)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(marker),
      s"no committed IVF index at $root ($Marker missing — build crashed or never ran)")
    val in = fs.open(marker)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split("\n").toSeq.map(_.split(",").map(_.toDouble))
  }

  /** L2 top-k per query over the `nprobe` nearest cells. Output:
    * (qid, <idCol>, dist2, rank) — rank 1 = nearest; ties break on
    * the row id for determinism. */
  def probe(spark: SparkSession, root: String, idCol: String, vecCol: String,
      queries: Seq[(Long, Array[Double])], nprobe: Int, topK: Int): DataFrame = {
    // open() BEFORE constructing the reader: on a never-built root the
    // caller must get the marker protocol's loud, path-naming error,
    // not a raw path-does-not-exist from the cells scan
    val cents = open(spark, root)
    probeCells(spark.read.parquet(s"$root/cells"), idCol, vecCol,
      queries, cents, nprobe, topK)
  }

  /** The probe core over an arbitrary cell frame — ONE copy shared
    * with [[IvfStore.probe]], whose frame carries an extra committed-
    * days filter (both filters are partition-column predicates, so
    * pruning still happens at the file index). */
  private[operators] def probeCells(cells: DataFrame, idCol: String,
      vecCol: String, queries: Seq[(Long, Array[Double])],
      cents: Seq[Array[Double]], nprobe: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = cells.sparkSession
    import spark.implicits._
    require(nprobe >= 1 && topK >= 1, s"nprobe/topK must be >= 1")
    // the documented driver-side batch guard, ENFORCED (round 12):
    // the (query, cell) pair frame is broadcast, so its row count is
    // the thing the 8 GB-per-broadcast limit actually sees — ONE
    // knob shared with every other broadcast cap ([[BroadcastGuard]])
    val cap = BroadcastGuard.cap(spark)
    require(queries.size.toLong * math.min(nprobe, cents.size) <= cap,
      s"probe batch of ${queries.size} queries x $nprobe cells exceeds " +
        s"the broadcast cap ($cap rows; conf graft.maxBroadcastRows) — " +
        "shard the query batch across probe calls")
    // (query, probed cell) pairs — driver-side |Q|·k·d flops
    val pairs = for {
      (qid, qv) <- queries
      cell <- cents.indices
        .sortBy(i => (l2d2(qv, cents(i)), i)).take(nprobe)
    } yield (qid, qv.toSeq, cell)
    val pairsDf = pairs.toDF("qid", "q_emb", "cell")
    val probedCells = pairs.map(_._3).distinct

    // the isin over the partition column prunes at the file index:
    // unprobed cells never reach the scan
    val candidates = cells
      .filter(col("cell").isin(probedCells: _*))
      .join(broadcast(pairsDf), "cell")
    // native JIT L2² (round 17): bit-identical to the zip_with+
    // aggregate HOF (sequential double fold; null on width mismatch),
    // minus the per-element interpreted lambda calls and the zipped
    // array alloc per candidate row — the probe's hot inner loop
    val d2 = graft.functions.Vectors.l2d2(col(vecCol), col("q_emb"))
    candidates
      .withColumn("dist2", d2)
      // defensive corrupt-drop (round 13): [[KMeans.assign]] never
      // writes a null/wrong-dim/non-finite vector, but a RESTORED or
      // hand-copied cell dir can hold one, and its distance is
      // undefined in the ranking — worse, a wrong-dim row's NULL
      // dist2 sorts FIRST under asc (Spark nulls-first), poisoning
      // rank 1 of every probe that touches its cell. Undefined
      // distances leave the candidate set; fsck deep names the rows.
      .filter(col("dist2").isNotNull && !isnan(col("dist2")) &&
        col("dist2") < lit(Double.PositiveInfinity))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("dist2").asc, col(idCol).asc)))
      .filter(col("rank") <= topK)
      .select(col("qid"), col(idCol), col("dist2"), col("rank"))
  }
}
