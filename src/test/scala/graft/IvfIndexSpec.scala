package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex

/** IvfIndex: probe results equal an independent in-memory reference,
  * the probe scan reads ONLY the probed cells' files (numFiles
  * metric), the centroids marker commits atomically and gates open(),
  * and rebuild overwrites cleanly. */
class IvfIndexSpec extends AnyFunSuite with SparkSpec {

  private val sf =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.01"

  private def l2d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** FileSourceScanExec nodes, drilling through AQE's wrapper (the
    * probe plan has exchanges, so AQE adopts it and collectLeaves on
    * the outer plan sees only AdaptiveSparkPlanExec). */
  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan) // materialized stages are leaves wrapping their subtree
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scansOf(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scansOf)
    }

  test("build + probe: pruned scan, reference-exact results, committed marker") {
    assume(new java.io.File(sf).isDirectory)
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("ivf").toString
    val emb = s.read.parquet(s"$sf/embeddings.parquet")

    val model = IvfIndex.build(emb, "vec_id", "embedding", root, k = 8, iters = 3)
    assert(IvfIndex.open(s, root).map(_.toSeq) === model.centroids.map(_.toSeq))

    // driver-side mirror of the corpus for the independent reference
    val all: Seq[(Long, Array[Double])] = emb
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.map { case (id, v) => id -> v.toArray }
    def cellOf(v: Array[Double]): Int =
      model.centroids.indices.minBy(i => (l2d2(model.centroids(i), v), i))

    val queries = all.filter(_._1 % 100 == 0).take(5)
    val nprobe = 2
    val probed = IvfIndex.probe(s, root, "vec_id", "embedding",
      queries, nprobe = nprobe, topK = 3)
    val rows = probed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

    // 1) the scan read exactly the probed cells' files
    val probedCells = queries.flatMap { case (_, qv) =>
      model.centroids.indices.sortBy(i => (l2d2(qv, model.centroids(i)), i))
        .take(nprobe)
    }.distinct
    val filesIn = (c: Int) => {
      val d = new java.io.File(s"$root/cells/cell=$c")
      if (!d.isDirectory) 0 else d.listFiles().count(_.getName.startsWith("part-"))
    }
    val expectedFiles = probedCells.map(filesIn).sum
    val totalFiles = model.centroids.indices.map(filesIn).sum
    val scan = scansOf(probed.queryExecution.executedPlan).head
    assert(scan.partitionFilters.nonEmpty, "cell isin missed the file index")
    assert(scan.metrics("numFiles").value === expectedFiles.toLong,
      s"scan read ${scan.metrics("numFiles").value} files, probed cells hold $expectedFiles")
    assert(expectedFiles < totalFiles,
      s"fixture degenerate: probe covered every cell ($expectedFiles of $totalFiles)")

    // 2) results equal the in-memory reference (same fold order → ==)
    val reference = queries.flatMap { case (qid, qv) =>
      val cells = model.centroids.indices
        .sortBy(i => (l2d2(qv, model.centroids(i)), i)).take(nprobe).toSet
      all.filter { case (_, v) => cells.contains(cellOf(v)) }
        .map { case (id, v) => (qid, id, l2d2(v, qv)) }
        .sortBy { case (_, id, d2) => (d2, id) }.take(3)
        .zipWithIndex.map { case ((q, id, d2), i) => (q, id, d2, i + 1) }
    }.toSet
    assert(rows.toSet === reference)

    // 3) open() refuses an uncommitted root, naming it — and probe()
    // surfaces THAT error (open runs before the cells reader), not a
    // raw path-does-not-exist from the scan
    val bare = Files.createTempDirectory("ivf-none").toString
    val e = intercept[IllegalArgumentException](IvfIndex.open(s, bare))
    assert(e.getMessage.contains(bare))
    val ep = intercept[IllegalArgumentException](
      IvfIndex.probe(s, bare, "vec_id", "embedding", queries.take(1), 1, 1))
    assert(ep.getMessage.contains(bare), ep.getMessage)

    // 4) rebuild with different k overwrites and re-commits
    val m2 = IvfIndex.build(emb, "vec_id", "embedding", root, k = 4, iters = 2)
    assert(IvfIndex.open(s, root).size === 4)
    assert(IvfIndex.probe(s, root, "vec_id", "embedding", queries.take(1), 1, 2)
      .count() === 2L)
    assert(m2.sseHistory.size === 2)

    // 5) edge batches: empty query set is total and empty; nprobe > k
    // clamps to every cell (full recall, never an index error)
    assert(IvfIndex.probe(s, root, "vec_id", "embedding",
      Seq.empty, nprobe = 2, topK = 3).count() === 0L)
    val everything = IvfIndex.probe(s, root, "vec_id", "embedding",
      queries.take(1), nprobe = 99, topK = 1)
    assert(everything.count() === 1L)
    // with all cells probed, rank 1 IS the exact global nearest
    val (qid0, qv0) = queries.head
    val globalNearest = all.minBy { case (id, v) => (l2d2(v, qv0), id) }._1
    assert(everything.collect().head.getLong(1) === globalNearest)
  }
}
