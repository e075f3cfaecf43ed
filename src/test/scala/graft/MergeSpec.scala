package graft

import graft.io.AdtechProtos._
import graft.ops.AdtechPipeline
import org.scalatest.funsuite.AnyFunSuite

/** A1 merge semantics matrix (the `__Test03BidLogJob` shapes):
  * case-insensitive uuid merging, case-SENSITIVE bundles and geos,
  * per-exchange count summation, min/max timestamp propagation,
  * duplicated-input multisets. */
class MergeSpec extends AnyFunSuite with SparkSpec {

  private def log(uuid: String, bundle: String, exch: Int, at: Long,
      country: String = "usa", region: String = "ca") = BidLogFlat(
    id = s"id-$at", bundle = bundle, os = "ios", ifa = uuid,
    country = country, region = region, exchange = exch,
    receivedAt = at, processedAt = at + 1, bidResult = 1, bidPrice = 10)

  private val U = "0104f2d0-9283-4c26-bd80-d12db87fe33c"

  private def profiles(logs: Seq[BidLogFlat]): Seq[DeviceProfileRec] = {
    import spark.implicits._
    AdtechPipeline.deviceProfiles(
      AdtechPipeline.validBidLogs(spark.createDataset(logs)))
      .as[DeviceProfileRec].collect().toSeq
  }

  test("uuids merge case-insensitively into canonical UPPER") {
    val out = profiles(Seq(
      log(U.toLowerCase, "app.a", 1, 100L),
      log(U.toUpperCase, "app.a", 1, 200L),
      log(U.toLowerCase.capitalize, "app.a", 2, 300L)))
    assert(out.size == 1)
    val dp = out.head
    assert(dp.uuid == U.toUpperCase)
    assert(dp.firstAt == 100L && dp.lastAt == 300L)
    assert(dp.app.head.countPerExchange == Map(1 -> 2, 2 -> 1))
    assert(dp.app.head.firstAt == 100L && dp.app.head.lastAt == 300L)
  }

  test("bundles are case-sensitive (Bundle1 != BUNDLE1)") {
    val out = profiles(Seq(
      log(U, "Bundle1", 1, 100L), log(U, "BUNDLE1", 1, 200L)))
    assert(out.head.app.map(_.bundle).toSet == Set("Bundle1", "BUNDLE1"))
  }

  test("geos are case-sensitive distinct pairs") {
    val out = profiles(Seq(
      log(U, "app.a", 1, 100L, "usa", "ca"),
      log(U, "app.a", 1, 200L, "Usa", "ca"),
      log(U, "app.a", 1, 300L, "USA", "ca"),
      log(U, "app.a", 1, 400L, "usa", "ca"))) // dup collapses
    assert(out.head.geo.map(g => (g.country, g.region)).toSet ==
      Set(("usa", "ca"), ("Usa", "ca"), ("USA", "ca")))
    assert(out.head.geo.size == 3)
  }

  test("duplicated identical logs count as a multiset (not a set)") {
    val l = log(U, "app.a", 21, 100L)
    val out = profiles(Seq(l, l, l))
    assert(out.head.app.head.countPerExchange == Map(21 -> 3))
  }

  test("profile first/last equal min/max across bundles") {
    val out = profiles(Seq(
      log(U, "app.a", 1, 500L), log(U, "app.b", 2, 100L), log(U, "app.c", 3, 900L)))
    val dp = out.head
    assert(dp.firstAt == 100L && dp.lastAt == 900L)
    assert(dp.app.find(_.bundle == "app.b").get.firstAt == 100L)
    assert(dp.app.find(_.bundle == "app.a").get.lastAt == 500L)
  }
}
