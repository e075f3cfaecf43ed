package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans
import graft.operators.KMeans.{MeanBuf, VectorMean}

/** KMeans: planted well-separated blobs are recovered exactly, SSE is
  * non-increasing across Lloyd iterations, training is deterministic,
  * empty cells survive, and the VectorMean merge law holds under
  * arbitrary splits. */
class KMeansSpec extends AnyFunSuite with SparkSpec {

  private val dim = 8

  /** 4 well-separated centers at ±10 per coordinate block; seeded
    * noise ±0.5 — separation ≫ noise, so exact recovery is the only
    * correct answer. */
  private def blobs(nPerBlob: Int, seed: Int = 7): Seq[(Long, Int, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val centers = Seq(
      Array.fill(dim)(10.0), Array.fill(dim)(-10.0),
      Array.tabulate(dim)(i => if (i % 2 == 0) 10.0 else -10.0),
      Array.fill(dim)(0.0))
    for (b <- 0 until 4; i <- 0 until nPerBlob) yield {
      val v = centers(b).map(c => (c + rnd.nextDouble() - 0.5).toFloat)
      ((b * nPerBlob + i).toLong, b, v)
    }
  }

  private def blobFrame(rows: Seq[(Long, Int, Array[Float])]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, b, v) => (id, b, v.toSeq) }
      .toDF("id", "blob", "embedding")
      .selectExpr("id", "blob", "cast(embedding as array<float>) as embedding")
      .repartition(5)
  }

  test("planted blobs are recovered exactly; SSE never increases") {
    val rows = blobs(50)
    val df = blobFrame(rows).cache()
    try {
      val m = KMeans.train(df, "id", "embedding", k = 4, iters = 4)
      assert(m.centroids.size === 4)
      assert(m.sseHistory.size === 4)
      m.sseHistory.sliding(2).foreach { case Seq(a, b) =>
        assert(b <= a + 1e-9, s"SSE increased: ${m.sseHistory}")
      }
      // purity: each planted blob lands wholly in one distinct cell
      val s = spark
      import s.implicits._
      val cellsPerBlob = KMeans.assign(df, m.centroids, "embedding")
        .groupBy($"blob")
        .agg(org.apache.spark.sql.functions.collect_set($"cell").as("cells"))
        .as[(Int, Seq[Int])].collect().toMap
      assert(cellsPerBlob.values.forall(_.size == 1),
        s"a blob straddles cells: $cellsPerBlob")
      assert(cellsPerBlob.values.map(_.head).toSet.size === 4,
        s"blobs collapsed into shared cells: $cellsPerBlob")
      // converged centroids sit on the blob means (noise is ±0.5)
      m.centroids.foreach(c =>
        assert(Seq(10.0, -10.0, 0.0).exists(t => math.abs(c(0) - t) < 1.0)))
    } finally df.unpersist()
  }

  test("training is deterministic: same frame, same model") {
    val df = blobFrame(blobs(30)).cache()
    try {
      val a = KMeans.train(df, "id", "embedding", k = 4, iters = 3)
      val b = KMeans.train(df, "id", "embedding", k = 4, iters = 3)
      assert(a.sseHistory === b.sseHistory)
      assert(a.centroids.map(_.toSeq) === b.centroids.map(_.toSeq))
    } finally df.unpersist()
  }

  test("k exceeding the natural cluster count: empty cells keep their centroid, nothing throws") {
    // two tight blobs, k=5 — at least three cells end up empty or
    // split; the invariant is totality + the SSE trace staying finite
    val df = blobFrame(blobs(20).filter(_._2 < 2)).cache()
    try {
      val m = KMeans.train(df, "id", "embedding", k = 5, iters = 3)
      assert(m.centroids.size === 5)
      assert(m.sseHistory.forall(v => !v.isNaN && !v.isInfinite))
      val assigned = KMeans.assign(df, m.centroids, "embedding")
      assert(assigned.count() === 40L)
    } finally df.unpersist()
  }

  test("NULL/empty/wrong-dim vectors corrupt-drop at the seam; clean rows train unchanged") {
    val s = spark
    import s.implicits._
    val clean = blobFrame(blobs(25))
    val dirty = clean.unionByName(
      Seq((9001L, -1, null.asInstanceOf[Seq[Float]]),
        (9002L, -1, Seq.empty[Float]),
        (9003L, -1, Seq.fill(dim + 3)(1.0f)))
        .toDF("id", "blob", "embedding")
        .selectExpr("id", "blob", "cast(embedding as array<float>) as embedding"))
    val a = KMeans.train(clean.cache(), "id", "embedding", k = 4, iters = 3)
    val b = KMeans.train(dirty.cache(), "id", "embedding", k = 4, iters = 3)
    try {
      // degenerate rows influence nothing: same seeds, same model
      assert(a.centroids.map(_.toSeq) === b.centroids.map(_.toSeq))
      assert(a.sseHistory === b.sseHistory)
      // assign drops exactly the three degenerate rows
      val assigned = KMeans.assign(dirty, b.centroids, "embedding")
      assert(assigned.count() === 100L)
      assert(assigned.filter($"id" >= 9000L).count() === 0L)
    } finally { clean.unpersist(); dirty.unpersist() }
  }

  test("empty or all-degenerate frames fail seeding loudly, not with an opaque NPE") {
    val s = spark
    import s.implicits._
    val empty = blobFrame(blobs(5)).limit(0)
    val e1 = intercept[IllegalArgumentException](
      KMeans.train(empty, "id", "embedding", k = 2, iters = 1))
    assert(e1.getMessage.contains("empty frame"))
    val allNull = Seq((1L, 0, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "blob", "embedding")
      .selectExpr("id", "blob", "cast(embedding as array<float>) as embedding")
    val e2 = intercept[IllegalArgumentException](
      KMeans.train(allNull, "id", "embedding", k = 2, iters = 1))
    assert(e2.getMessage.contains("empty frame"))
  }

  test("VectorMean merge law: any split of the rows yields the batch mean") {
    val agg = new VectorMean
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(40)(Seq.fill(dim)(rnd.nextDouble() * 10 - 5))
    val batch = vecs.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(1, 7, 20, 39)) {
      val (l, r) = vecs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged.n === batch.n)
      merged.sum.zip(batch.sum).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9)
      }
    }
    assert(agg.merge(agg.zero, batch).sum.toSeq === batch.sum.toSeq)
    assert(agg.finish(MeanBuf(Array(2.0, 4.0), 2L)) === Seq(1.0, 2.0))
    assert(agg.finish(agg.zero) === Seq.empty)
  }
}
