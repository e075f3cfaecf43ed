package graft

import graft.io.AdtechProtos._
import graft.ops.AdtechPipeline
import graft.ops.AdtechPipeline.Thresholds
import org.scalatest.funsuite.AnyFunSuite

/** J1 suspicious-detection rule matrix, mirroring the per-rule
  * behavior of `__Test05/06BidLogJob` (geo vs unpopular-apps vs
  * bid-count triggers; popularity flipping a verdict). Profiles are
  * hand-built; AppProfiles derive from them so popularity reflects
  * the corpus like the real pipeline. */
class SuspiciousSpec extends AnyFunSuite with SparkSpec {

  private def app(bundle: String, cnt: Int) =
    AppActivity(bundle, 1000L, 2000L, Map(1 -> cnt))
  private def geo(n: Int): Seq[GeoActivity] =
    (1 to n).map(i => GeoActivity(s"C$i", s"r$i"))
  private def dp(uuid: String, apps: Seq[AppActivity], geos: Seq[GeoActivity]) =
    DeviceProfileRec(1, uuid, apps, 1000L, 2000L, geos)

  private def run(dps: Seq[DeviceProfileRec], t: Thresholds): Set[String] = {
    import spark.implicits._
    val dpDf = spark.createDataset(dps).toDF()
    val aps = AdtechPipeline.appProfiles(dpDf)
    AdtechPipeline.suspiciousIds(dpDf, aps, t)
      .select("uuid").as[String].collect().toSet
  }

  // popular bundle shared by 6 devices (user_count 6 > 4)
  private def popularCrowd: Seq[DeviceProfileRec] =
    (1 to 6).map(i => dp(s"CROWD-$i", Seq(app("popular.app", 1)), geo(1)))

  test("geo-count trigger: more than geoCount distinct geos") {
    val flagged = dp("GEO-HEAVY", Seq(app("popular.app", 1)), geo(9))
    val ok = dp("GEO-OK", Seq(app("popular.app", 1)), geo(8))
    val out = run(popularCrowd ++ Seq(flagged, ok), Thresholds())
    assert(out == Set("GEO-HEAVY"))
  }

  test("unpopular-app trigger: more than appCount unpopular apps") {
    val flagged = dp("APP-HEAVY", (1 to 4).map(i => app(s"rare.$i", 1)), geo(1))
    val ok = dp("APP-OK", (1 to 3).map(i => app(s"rare.b$i", 1)), geo(1))
    val out = run(popularCrowd ++ Seq(flagged, ok), Thresholds())
    assert(out == Set("APP-HEAVY"))
  }

  test("bid-count trigger: more than bidLogCount total logs") {
    val flagged = dp("BID-HEAVY", Seq(app("popular.app", 11)), geo(1))
    val ok = dp("BID-OK", Seq(app("popular.app", 10)), geo(1))
    val out = run(popularCrowd ++ Seq(flagged, ok), Thresholds())
    assert(out == Set("BID-HEAVY"))
  }

  test("popularity flips a verdict (the __Test06 threshold-flip shape)") {
    // 4 distinct bundles, each with 6 crowd devices + MULTI = 7 users:
    // popular at the default t=4 (7 > 4), unpopular at t=7 — the
    // multi-app device's 4 bundles all flip and it becomes suspicious.
    val crowds = (1 to 4).flatMap(b =>
      (1 to 6).map(i => dp(s"C$b-$i", Seq(app(s"shared.$b", 1)), geo(1))))
    val multi = dp("MULTI", (1 to 4).map(b => app(s"shared.$b", 1)), geo(1))
    assert(run(crowds :+ multi, Thresholds()) == Set.empty[String])
    assert(run(crowds :+ multi, Thresholds(userCount = 7)) == Set("MULTI"))
  }

  test("thresholds are strict inequalities (boundary values pass)") {
    // exactly geoCount geos + exactly bidLogCount logs + exactly
    // appCount unpopular apps → NOT suspicious
    val boundary = dp("EDGE",
      (1 to 3).map(i => app(s"rare.$i", 1)) :+ app("popular.app", 7), geo(8))
    val out = run(popularCrowd :+ boundary, Thresholds())
    assert(out == Set.empty[String]) // 3 unpopular, 10 logs, 8 geos
  }
}
