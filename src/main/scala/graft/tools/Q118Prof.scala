package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMP (round-17 dev): stage-level timing of the incremental
  * containment pipeline (q118's gate shape). Not part of any gate;
  * delete after the round. */
object Q118Prof {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.GraftExtensions.ensureRegistered(spark)
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q118prof] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val t = 0.7
    for (rep <- 1 to 3) {
      println(s"=== rep $rep")
      val docs = graft.Tables.documents(spark, d)
      val dSets = graft.operators.IncrementalNearDedup
        .shingleSets(docs.filter($"doc_id" % 2 === 1)).cache()
      phase("dSets-materialize")(noop(dSets))
      val sSets = graft.operators.IncrementalNearDedup
        .shingleSets(docs.filter($"doc_id" % 2 === 0))
        .select($"id", $"n", $"hset")
      phase("sSets")(noop(sSets))
      val allSets = dSets.unionByName(sSets)
      // occupancy + hot (the no-storeDf batch route)
      val occ = graft.operators.IncrementalContainment.shingleDf(allSets)
      val hot = occ.groupBy($"sh").agg(sum($"cnt").as("__w"))
        .filter($"__w" > 1024).select($"sh")
      phase("hot")(noop(hot))
      val cand = graft.operators.IncrementalContainment.candidates(
        dSets, sSets, allSets, t, 1024, None)
      phase("cand")(noop(cand))
      val pairs = graft.operators.IncrementalContainment.fromSets(
        dSets, sSets, t, 1024, None)
      phase("pairs-full")(noop(pairs))
      dSets.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
