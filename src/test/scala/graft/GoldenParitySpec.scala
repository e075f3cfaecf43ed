package graft

import graft.io.AdtechProtos
import graft.io.AdtechProtos._
import graft.ops.AdtechPipeline
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity golden tests: the judge corpus of the reference
  * (Base64 BidLogs + expected DeviceProfiles / AppProfiles /
  * suspicious IDs from `__Test07/08/09BidLogJob.java`) run through the
  * Spark pipeline, compared as canonicalized sets exactly like the
  * reference harness (`__TestHelper.java:32-75`: uuid case-folded,
  * arrays as multisets).
  */
class GoldenParitySpec extends AnyFunSuite with SparkSpec {

  private def lines(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  private def b64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)

  // ---- canonical forms (uuid lowercased, arrays sorted) ----
  private type NApp = (String, Long, Long, List[(Int, Int)])
  private case class NDp(os: Int, uuid: String, firstAt: Long, lastAt: Long,
      apps: List[NApp], geos: List[(String, String)])

  private def norm(r: DeviceProfileRec): NDp = NDp(
    r.os, r.uuid.toLowerCase, r.firstAt, r.lastAt,
    r.app.map(a => (a.bundle, a.firstAt, a.lastAt, a.countPerExchange.toList.sorted))
      .toList.sortBy(_._1),
    r.geo.map(g => (g.country, g.region)).toList.sorted)

  private def normAp(r: AppProfileRec): (String, Int, List[(Int, Int)]) =
    (r.bundle, r.userCount, r.userCountPerExchange.toList.sorted)

  private def runCorpus(n: String): (Set[NDp], Set[(String, Int, List[(Int, Int)])], Set[(Int, String)]) = {
    import spark.implicits._
    val (dps, aps, susp) = AdtechPipeline.bidLogJob(lines(s"test$n.bidlogs.txt").toDS())
    AdtechPipeline.assertNoDuplicateIds(dps)
    val actualDps = dps.as[DeviceProfileRec].collect().map(norm).toSet
    val actualAps = aps.as[AppProfileRec].collect().map(normAp).toSet
    val actualSusp = susp.as[(Int, String)].collect()
      .map { case (os, u) => (os, u.toLowerCase) }.toSet
    (actualDps, actualAps, actualSusp)
  }

  private def expected(n: String) = {
    val dps = lines(s"test$n.dp.txt").map(s => norm(AdtechProtos.decodeDeviceProfile(b64(s)))).toSet
    val aps = lines(s"test$n.ap.txt").map(s => normAp(AdtechProtos.decodeAppProfile(b64(s)))).toSet
    val susp = lines(s"test$n.susp.txt").map { l =>
      val Array(os, uuid) = l.split(",")
      (if (os == "ANDROID") 1 else 2, uuid.toLowerCase)
    }.toSet
    (dps, aps, susp)
  }

  for (n <- Seq("07", "08", "09")) {
    test(s"corpus $n: device profiles, app profiles, suspicious ids match the reference") {
      val (adp, aap, asusp) = runCorpus(n)
      val (edp, eap, esusp) = expected(n)
      assert(adp.size == edp.size, s"dp count: ${adp.size} vs ${edp.size}")
      assert(adp == edp, {
        val miss = edp -- adp; val extra = adp -- edp
        s"dp mismatch; missing=$miss extra=$extra"
      })
      assert(aap == eap, {
        val miss = eap -- aap; val extra = aap -- eap
        s"ap mismatch; missing=$miss extra=$extra"
      })
      assert(asusp == esusp, s"suspicious mismatch: $asusp vs $esusp")
    }
  }

  test("decoder round-trips a known fixture row") {
    // First log of corpus 07 (documented in FIXTURES.md §A1).
    val log = AdtechProtos.decodeBidLog(b64(lines("test07.bidlogs.txt").head))
    assert(log.ifa == "0104f2d0-9283-4c26-bd80-d12db87fe33c")
    assert(log.bundle == "app.1234")
    assert(log.os.equalsIgnoreCase("ios"))
    assert(log.country == "usa" && log.region == "CA")
    assert(log.exchange == 21 && log.bidResult == 1)
  }
}
