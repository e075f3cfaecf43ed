package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed connected components via Pregel-style min-label
  * propagation (the primitive behind near-dup *clustering*: LSH/Jaccard
  * emit pairs, canonical-survivor selection needs the transitive
  * closure).
  *
  * Each round every node takes `min(own label, min(neighbor labels))` —
  * one equi-join + one aggregate per round, converging in O(component
  * diameter) rounds. Nothing is collected to the driver and no step is
  * quadratic, so the same loop runs where components span machines.
  * `localCheckpoint` truncates the per-round lineage (swap for
  * `checkpoint` + a checkpoint dir on a real cluster); the previous
  * round's plan would otherwise double every iteration.
  *
  * SMALL-GRAPH FAST PATH (round 9): the input here is the VERIFIED
  * near-dup pair list — after exact dedup and the LshGuard cap it is
  * normally a sliver of the corpus (hundreds of edges at gate scale,
  * maybe millions on a crawl), yet the loop pays ~8 scheduled jobs of
  * fixed overhead regardless (2 joins + a convergence check per
  * round, times O(log d) rounds) — measured at ~2.5 s of q110's 6 s
  * on an idle local[32], pure scheduling. Under
  * `graft.cc.maxLocalEdges` (default 500k edges) and long-typed ids,
  * the edge list is collected once and union-find (index-based, path
  * compression, union-by-min-id) labels it on the driver in O(E α(E))
  * — ~24 MB for the worst-case cap (two long arrays + an int parent
  * array), the same guarded-smallness discipline as
  * [[BroadcastGuard]] and the J3 capped collect. Past the cap — the
  * regime where the dup graph is genuinely big — the distributed
  * loop runs unchanged, and the one `count()` that decides reads the
  * cached pair frame both paths need anyway. Identical labels either
  * way (ExtendedOpsSpec fuzzes both paths against each other).
  *
  * No analogue in the reference (its only dup handling is an assertion,
  * `transforms/AppProfiles.java:50-56`); standard large-scale dedup
  * practice per the MinHashLSH/CC pipelines in public Spark code.
  */
object ConnectedComponents {

  /** Edge cap for the driver-local fast path. */
  val DefaultMaxLocalEdges = 500000L

  private def maxLocalEdges(s: SparkSession): Long =
    s.conf.getOption("graft.cc.maxLocalEdges").map(_.toLong)
      .getOrElse(DefaultMaxLocalEdges)

  /** @param pairs     two numeric columns (a, b) — undirected edges
    * @param maxRounds safety bound for the distributed loop; with
    *                  pointer jumping convergence is O(log diameter),
    *                  so 25 rounds covers graphs far beyond any
    *                  physical dataset
    * @return (id, component) — component = min node id reachable */
  def label(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    val Seq(a, b) = pairs.columns.toSeq.take(2).map(col)
    // null-keyed edges carry no joinable endpoint: the distributed
    // loop's equi-joins would silently ignore them (while leaking a
    // (null, null) label row), and the fast path's getLong would NPE
    // — drop them up front so BOTH paths see the same graph and a
    // null never reaches either labeling
    val p = pairs.select(a.as("src"), b.as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull).cache()
    val longIds = p.schema.fields.forall(_.dataType == LongType)
    val n = p.count() // materializes the cache; both paths reread it
    val result =
      if (longIds && n <= maxLocalEdges(spark)) {
        val edges = p.collect().map(r => (r.getLong(0), r.getLong(1)))
        labelLocal(spark, edges)
      } else labelDistributed(p, maxRounds)
    p.unpersist()
    result
  }

  /** Index-based union-find, union by min id (ids sorted ascending,
    * so min index == min id — the root of every tree stays the
    * component minimum, matching the distributed loop exactly). */
  private def labelLocal(spark: SparkSession,
      edges: Array[(Long, Long)]): DataFrame = {
    val ids: Array[Long] = {
      val s = new Array[Long](edges.length * 2)
      var i = 0
      edges.foreach { case (x, y) => s(i) = x; s(i + 1) = y; i += 2 }
      java.util.Arrays.sort(s)
      s.distinct
    }
    val parent = Array.tabulate(ids.length)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (x, y) =>
      val rx = find(java.util.Arrays.binarySearch(ids, x))
      val ry = find(java.util.Arrays.binarySearch(ids, y))
      if (rx < ry) parent(ry) = rx else if (ry < rx) parent(rx) = ry
    }
    val rows = ids.indices.map(i => Row(ids(i), ids(find(i))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1,
        math.min(spark.sparkContext.defaultParallelism, rows.length))),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("component", LongType, nullable = false))))
  }

  private def labelDistributed(p: DataFrame, maxRounds: Int): DataFrame = {
    val edges = p.union(p.select(col("dst"), col("src"))).cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("root")).localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // step 1: take min over neighbors' labels (hook)
      val nbrMin = edges
        .join(labels.select(col("id").as("dst_id"), col("root").as("nroot")),
          col("dst") === col("dst_id"))
        .groupBy(col("src")).agg(min(col("nroot")).as("nbr_root"))
      val hooked = labels
        .join(nbrMin.select(col("src").as("id2"), col("nbr_root")),
          col("id") === col("id2"), "left")
        .select(col("id"),
          least(col("root"), coalesce(col("nbr_root"), col("root"))).as("root"))
      // step 2: pointer jump — root := root's root (labels shrink
      // monotonically, so the root's root is always ≤ the root).
      // Plain neighbor propagation needs DIAMETER rounds (a long path
      // would exhaust the cap); hooking + jumping needs O(log d).
      val next = hooked.as("x")
        .join(hooked.select(col("id").as("rid"), col("root").as("rroot")),
          col("x.root") === col("rid"))
        .select(col("x.id").as("id"), col("rroot").as("root"))
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.root") =!= col("o.root")).isEmpty
      labels = next
      round += 1
    }
    edges.unpersist()
    // an unconverged labeling is PARTIAL (some nodes still carry a
    // non-minimal root) — never let it be mistaken for a result
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxRounds rounds — " +
        "raise maxRounds (convergence is O(log diameter) with pointer jumping)")
    labels.select(col("id"), col("root").as("component"))
  }
}
