package graft

import graft.ops.PredictionPipeline
import org.scalatest.funsuite.AnyFunSuite

/** The size guards must hold at scale: an over-cap broadcast side
  * falls back to chunked broadcast (round 4 — same results, bounded
  * executor memory), and an unbounded side-input collect still fails
  * loudly rather than OOMing. Caps are lowered via session conf so
  * the over-cap regime runs on fixture-sized data. */
class GuardSpec extends AnyFunSuite with SparkSpec {

  private val sf =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"

  private def withConf[T](key: String, value: String)(f: => T): T = {
    spark.conf.set(key, value)
    try f finally spark.conf.unset(key)
  }

  private def rows(name: String): Set[String] =
    QueryRegistry.byName(name).fn(spark, sf)
      .collect().map(_.mkString("|")).toSet

  test("q45/q46/q47 chunked-broadcast fallback matches the single-broadcast result") {
    assume(new java.io.File(sf).isDirectory)
    for (q <- Seq("q45_ann_bruteforce", "q46_ann_lsh", "q47_ann_ivf")) {
      val whole = rows(q)
      val chunked = withConf("graft.maxBroadcastRows", "3")(rows(q))
      assert(whole.nonEmpty, s"$q: empty result")
      assert(chunked === whole, s"$q: chunked regime diverged")
    }
  }

  test("over-cap q45 plan is a union of per-chunk broadcasts") {
    assume(new java.io.File(sf).isDirectory)
    withConf("graft.maxBroadcastRows", "3") {
      val plan = QueryRegistry.byName("q45_ann_bruteforce").fn(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("Union"), "expected per-chunk union in the plan")
      // one join node per chunk — a single un-chunked broadcast has
      // exactly 1 (sparkPlan precedes EnsureRequirements, so count
      // join nodes, not the exchanges inserted later)
      assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size >= 2,
        "expected one broadcast join per chunk")
      // and the chunks really partition the query set by hash
      assert(plan.contains("pmod"), "expected pmod chunk filters")
    }
  }

  test("inputToModel refuses an IAPP side input over the cap") {
    import spark.implicits._
    val iapp = (1 to 10)
      .map(i => graft.io.AdtechProtos.IappRec(s"bundle$i", i, i)).toDS()
    val dps = spark.emptyDataset[graft.io.AdtechProtos.DeviceProfileRec]
    val susp = spark.emptyDataset[graft.io.AdtechProtos.DeviceIdRec]
    withConf("graft.maxSideInputRows", "5") {
      val e = intercept[IllegalArgumentException] {
        PredictionPipeline.inputToModel(dps, susp, iapp)
      }
      assert(e.getMessage.contains("not a broadcastable dim table"))
    }
  }
}
