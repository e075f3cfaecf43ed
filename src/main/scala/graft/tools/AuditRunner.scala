package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Shared harness for the one-shot plan audits: one local session,
  * one QueryExecution per registered query (optimized + physical
  * plans both read from it), fixture dir from GRAFT_TESTDATA_DIR
  * like the specs, failures printed per query instead of aborting
  * the sweep. */
private[graft] object AuditRunner {
  /** @param names non-empty → audit exactly these queries in the
    *        given order (PlanAudit's snapshot set); empty → the whole
    *        registry. */
  def run(inspect: (graft.Q, QueryExecution) => Seq[String],
      names: Seq[String] = Nil): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"
    graft.GraftExtensions.ensureRegistered(s)
    val qs =
      if (names.isEmpty) graft.QueryRegistry.all
      else names.map(graft.QueryRegistry.byName)
    for (q <- qs) {
      try inspect(q, q.fn(s, d).queryExecution).foreach(println)
      catch { case e: Throwable => println(s"ERR ${q.name}: ${e.getMessage}") }
    }
    s.stop()
  }
}
