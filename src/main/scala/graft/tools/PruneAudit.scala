package graft.tools

import org.apache.spark.sql.execution.FileSourceScanExec

/** One-shot audit: per registered query, each parquet scan's read
  * schema width vs the file's full column count — a scan reading
  * everything for a narrow projection means pruning broke. Reports
  * only full-width scans of tables with > 4 columns (narrow tables
  * read whole are usually legitimate). */
object PruneAudit {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    graft.GraftExtensions.ensureRegistered(s)
    for (q <- graft.QueryRegistry.all) {
      try {
        q.fn(s, d).queryExecution.executedPlan.collect {
          case scan: FileSourceScanExec =>
            val table = scan.relation.location.rootPaths.headOption
              .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
            val full = scan.relation.dataSchema.fields.length
            val read = scan.requiredSchema.fields.length
            (table, read, full)
        }.collect {
          case (t, r, f) if r == f && f > 4 =>
            println(s"FULLSCAN ${q.name}: $t reads all $f columns")
        }
      } catch { case e: Throwable => println(s"ERR ${q.name}: ${e.getMessage}") }
    }
    s.stop()
  }
}
