package graft

import graft.ops.PredictionPipeline
import org.scalatest.funsuite.AnyFunSuite

/** The size guards must actually fire: an unbounded broadcast side or
  * side-input collect should fail loudly, not OOM silently at scale.
  * Caps are lowered via session conf so the failure path runs on
  * fixture-sized data. */
class GuardSpec extends AnyFunSuite with SparkSpec {

  private val sf =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"

  private def withConf[T](key: String, value: String)(f: => T): T = {
    spark.conf.set(key, value)
    try f finally spark.conf.unset(key)
  }

  test("q45 refuses to broadcast a query set over the cap") {
    assume(new java.io.File(sf).isDirectory)
    withConf("graft.maxBroadcastRows", "3") {
      val e = intercept[IllegalArgumentException] {
        QueryRegistry.byName("q45_ann_bruteforce").fn(spark, sf).collect()
      }
      assert(e.getMessage.contains("too large to broadcast"))
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
