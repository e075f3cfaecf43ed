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
    *        registry.
    * @param extra sections to print AFTER the registry sweep, from
    *        the same session — for plans the registry cannot snapshot
    *        (PlanAudit's q146 probe fixture); failures print an ERR
    *        line like a query failure. */
  def run(inspect: (graft.Q, QueryExecution) => Seq[String],
      names: Seq[String] = Nil,
      extra: SparkSession => Seq[String] = _ => Nil): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"
    graft.GraftExtensions.ensureRegistered(s)
    // resolve each name inside the loop: a typo'd entry in a snapshot
    // set prints an ERR line like a query failure instead of aborting
    // the whole sweep before any output (and skipping s.stop())
    val keys =
      if (names.isEmpty) graft.QueryRegistry.all.map(_.name)
      else names
    val registry = graft.QueryRegistry.byName
    for (name <- keys) {
      try {
        val q = registry.getOrElse(name,
          throw new NoSuchElementException(s"unknown query name: $name"))
        inspect(q, q.fn(s, d).queryExecution).foreach(println)
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage}") }
    }
    try extra(s).foreach(println)
    catch { case e: Throwable => println(s"ERR extra-sections: ${e.getMessage}") }
    s.stop()
  }
}
