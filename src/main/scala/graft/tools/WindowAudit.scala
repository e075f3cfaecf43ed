package graft.tools

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

/** One-shot audit: list every registered query whose OPTIMIZED plan
  * contains a Window with an empty partition spec (single-partition
  * WindowExec at runtime). Each hit needs a boundedness argument —
  * a global window over an aggregate of bounded cardinality is fine;
  * one over a raw table is a scale killer (see q32's history). */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    graft.GraftExtensions.ensureRegistered(s)
    for (q <- graft.QueryRegistry.all) {
      try {
        val plan: LogicalPlan = q.fn(s, d).queryExecution.optimizedPlan
        val hits = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty =>
            w.child.nodeName // what feeds the global window
        }
        if (hits.nonEmpty) println(s"GLOBALWINDOW ${q.name}: fed by ${hits.mkString(", ")}")
      } catch { case e: Throwable => println(s"ERR ${q.name}: ${e.getMessage}") }
    }
    s.stop()
  }
}
