package graft.tools

import org.apache.spark.sql.catalyst.plans.logical.Join

/** One-shot audit: every condition-less logical Join (cross join) in
  * a registered plan, with each side's maxRows bound if Catalyst can
  * prove one. A cross join is only scale-safe when one side is
  * provably tiny (1-row aggregate, limit-capped set). */
object CrossAudit {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    graft.GraftExtensions.ensureRegistered(s)
    for (q <- graft.QueryRegistry.all) {
      try {
        val plan = q.fn(s, d).queryExecution.optimizedPlan
        plan.collect {
          case j: Join if j.condition.isEmpty =>
            s"${q.name}: cross of ${j.left.nodeName}(maxRows=${j.left.maxRows}) x " +
              s"${j.right.nodeName}(maxRows=${j.right.maxRows})"
        }.foreach(h => println(s"CROSS $h"))
        val phys = q.fn(s, d).queryExecution.executedPlan.toString
        if (phys.contains("CartesianProduct"))
          println(s"CARTESIAN ${q.name}")
      } catch { case e: Throwable => println(s"ERR ${q.name}: ${e.getMessage}") }
    }
    s.stop()
  }
}
