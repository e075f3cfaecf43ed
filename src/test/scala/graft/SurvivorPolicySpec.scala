package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Survivor-selection policy semantics: q78 (min doc_id per near-dup
  * cluster) vs q110 (longest doc, min-id tiebreak). The gate corpus
  * proves each against its own oracle but cannot show the policies
  * DIFFER — its clusters happen to be template families where the
  * min-id doc is rarely the longest, but nothing pins that. This spec
  * plants a cluster where the two policies must disagree, and a
  * same-length cluster where q110's tiebreak must fall back to min-id.
  */
class SurvivorPolicySpec extends AnyFunSuite with SparkSpec {

  private lazy val dir: String = {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-survivor").toString
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val base2 = (1 to 20).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      // cluster 1: doc 1 is the min id, doc 2 is the LONGEST
      (1L, base),                          // 20 tokens
      (2L, s"$base extra1 extra2"),        // 22 tokens — q110's winner
      (3L, s"$base extra3"),               // 21 tokens
      // cluster 2 (disjoint vocabulary): same length — q110 must
      // tiebreak to min id
      (10L, s"$base2 alpha"),              // 21 tokens
      (11L, s"$base2 beta"),               // 21 tokens
      // singleton: survives under both policies
      (100L, "a completely different document about unrelated matters entirely")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length($"text").cast("long"))
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def survivors(q: String): Map[Long, (Long, Boolean)] = {
    val s = spark
    import s.implicits._
    QueryRegistry.byName(q).fn(spark, dir)
      .select($"doc_id", $"cluster_root", $"had_dups")
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, root, dups) => id -> (root, dups) }.toMap
  }

  test("planted clusters actually form (both docs 1-3 and 10-11 connect)") {
    val s = spark
    import s.implicits._
    val clusters = graft.operators.ConnectedComponents
      .label(graft.queries.DedupQueries.jaccardPairs(spark, dir)
        .select($"doc_a", $"doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(clusters.get(2L).contains(1L) && clusters.get(3L).contains(1L),
      s"cluster 1 did not form: $clusters")
    assert(clusters.get(11L).contains(10L), s"cluster 2 did not form: $clusters")
    assert(!clusters.contains(100L), "singleton must not join a cluster")
  }

  test("q78 keeps the min-id doc; q110 keeps the longest — they disagree on cluster 1") {
    val minId = survivors("q78_dedup_prune")
    val longest = survivors("q110_dedup_keep_longest")
    // min-id policy: doc 1 survives cluster 1
    assert(minId.keySet === Set(1L, 10L, 100L))
    assert(minId(1L) === ((1L, true)))
    // keep-longest policy: doc 2 (22 tokens) survives cluster 1, but
    // the cluster ROOT stays the component label (min id = 1)
    assert(longest.keySet === Set(2L, 10L, 100L))
    assert(longest(2L) === ((1L, true)), "winner keeps the component root label")
  }

  test("q110 tiebreak: equal-length docs fall back to min doc_id") {
    val longest = survivors("q110_dedup_keep_longest")
    assert(longest.contains(10L) && !longest.contains(11L),
      "same token count must keep the smaller doc_id")
    assert(longest(10L) === ((10L, true)))
  }

  test("singletons pass through both policies unflagged") {
    for (q <- Seq("q78_dedup_prune", "q110_dedup_keep_longest"))
      assert(survivors(q)(100L) === ((100L, false)), s"$q mishandled the singleton")
  }
}
