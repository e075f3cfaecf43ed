package graft.tools

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** One-shot audit: list every registered query whose OPTIMIZED plan
  * contains a Window with an empty partition spec (single-partition
  * WindowExec at runtime). Each hit needs a boundedness argument —
  * a global window over an aggregate of bounded cardinality is fine;
  * one over a raw table is a scale killer (see q32's history).
  * PlanShapeSpec's all-plan tripwire asserts the strict form in CI. */
object WindowAudit {
  def main(args: Array[String]): Unit = AuditRunner.run { (q, qe) =>
    qe.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        s"GLOBALWINDOW ${q.name}: fed by ${w.child.nodeName}"
    }
  }
}
