package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * No analogue in the reference (its only dup handling is an assertion,
  * `transforms/AppProfiles.java:50-56`); standard large-scale dedup
  * practice per the MinHashLSH/CC pipelines in public Spark code.
  */
object ConnectedComponents {

  /** @param pairs     two numeric columns (a, b) — undirected edges
    * @param maxRounds safety bound; with pointer jumping convergence
    *                  is O(log diameter), so 25 rounds covers graphs
    *                  far beyond any physical dataset
    * @return (id, component) — component = min node id reachable */
  def label(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    val Seq(a, b) = pairs.columns.toSeq.take(2).map(col)
    val p = pairs.select(a.as("src"), b.as("dst"))
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
