package graft.tools

import org.apache.spark.sql.execution.FileSourceScanExec

/** One-shot audit: per registered query, each parquet scan's read
  * schema width vs the file's full column count — a scan reading
  * everything for a narrow projection means pruning broke. Reports
  * only full-width scans of tables with > 4 columns (narrow tables
  * read whole are usually legitimate; the one repo-wide hit, q02,
  * emits validated full records by design). */
object PruneAudit {
  def main(args: Array[String]): Unit = AuditRunner.run { (q, qe) =>
    qe.executedPlan.collect {
      case scan: FileSourceScanExec =>
        val table = scan.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        val full = scan.relation.dataSchema.fields.length
        val read = scan.requiredSchema.fields.length
        (table, read, full)
    }.collect {
      case (t, r, f) if r == f && f > 4 =>
        s"FULLSCAN ${q.name}: $t reads all $f columns"
    }
  }
}
