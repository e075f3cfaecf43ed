package graft.tools

import org.apache.spark.sql.catalyst.plans.logical.Join

/** One-shot audit: every condition-less logical Join (cross join) in
  * a registered plan with each side's maxRows bound if Catalyst can
  * prove one, plus any CartesianProduct in the physical plan. A
  * cross join is only scale-safe when one side is provably tiny
  * (1-row aggregate, limit- or chunk-capped broadcast set);
  * CartesianProduct (the shuffle cartesian) is never acceptable —
  * PlanShapeSpec's all-plan tripwire bans it in CI. */
object CrossAudit {
  def main(args: Array[String]): Unit = AuditRunner.run { (q, qe) =>
    val crosses = qe.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty =>
        s"CROSS ${q.name}: ${j.left.nodeName}(maxRows=${j.left.maxRows}) x " +
          s"${j.right.nodeName}(maxRows=${j.right.maxRows})"
    }
    val cartesian =
      if (qe.executedPlan.toString.contains("CartesianProduct"))
        Seq(s"CARTESIAN ${q.name}") else Nil
    crosses ++ cartesian
  }
}
