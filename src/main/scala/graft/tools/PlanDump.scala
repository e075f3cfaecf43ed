package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-17 optimization-evidence dump: writes one
  * `plans/r17/<query>_<tag>.txt` per bench query with the
  * `explain("formatted")` output, so before/after plan claims in
  * OPTIMIZATION_r17.md are checkable without running Spark.
  *
  * Usage: `runMain graft.tools.PlanDump <tag> [query...]` — tag is
  * `before`/`after`; with no query names, dumps the whole bench set.
  * Session mirrors Bench's shape (32 shuffle partitions, AQE on) so
  * exchange/partitioning details match what the bench executes.
  * Eager lifecycle entries (q145/q146: the registered frame is a
  * checkpoint scan of store output) get the registry frame's plan
  * plus a note; their serving-probe plans live in PLANS.md.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false") // match Bench
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.ensureRegistered(spark)
    val benchSet = graft.QueryRegistry.all.filter(_.bench)
    val qs = if (args.length > 1)
      args.drop(1).toSeq.flatMap(n => graft.QueryRegistry.all.filter(_.name == n))
    else benchSet
    val outDir = java.nio.file.Paths.get(sys.props("user.dir"), "plans", "r17")
    java.nio.file.Files.createDirectories(outDir)
    def fmt(plan: String): String = plan
      .replaceAll("[^\\x09\\x0A\\x20-\\x7E]+", "·")
      .replaceAll("(·.{0,2}){8,}", "·<binary literal elided>·")
    for (q <- qs) {
      val out = outDir.resolve(s"${q.name}_$tag.txt")
      try {
        val qe = q.fn(spark, sfDir).queryExecution
        val txt = fmt(qe.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        java.nio.file.Files.writeString(out, s"===== ${q.name} ($tag)\n$txt")
        println(s"[plandump] wrote $out")
      } catch { case e: Throwable =>
        println(s"[plandump] ERR ${q.name}: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
