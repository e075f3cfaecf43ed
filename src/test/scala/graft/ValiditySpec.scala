package graft

import graft.io.AdtechProtos.BidLogFlat
import graft.ops.AdtechPipeline
import org.scalatest.funsuite.AnyFunSuite

/** F1 validity-rule matrix, mirroring the reference's exhaustive
  * rule-toggling tests (`__Test01BidLogUtils.java:93-187`): a valid
  * base log, then each of the 11 rules violated independently must
  * drop the row — including the JDK-UUID laxity edge cases the
  * reference pins (`:168-175`). */
class ValiditySpec extends AnyFunSuite with SparkSpec {

  private val base = BidLogFlat(
    id = "id-1", bundle = "app.1234", os = "ios",
    ifa = "0104f2d0-9283-4c26-bd80-d12db87fe33c",
    country = "usa", region = "ca",
    exchange = 21, receivedAt = 1000L, processedAt = 2000L,
    bidResult = 1, bidPrice = 500)

  private def survives(log: BidLogFlat): Boolean = {
    import spark.implicits._
    AdtechPipeline.validBidLogs(spark.createDataset(Seq(log))).count() == 1
  }

  test("the valid base log passes") { assert(survives(base)) }

  test("each rule violated independently drops the row") {
    val invalid = Seq(
      "exchange=0"            -> base.copy(exchange = 0),
      "bid_result=0"          -> base.copy(bidResult = 0),
      "BID with price<=0"     -> base.copy(bidResult = 1, bidPrice = 0),
      "non-BID with price!=0" -> base.copy(bidResult = 2, bidPrice = 5),
      "received_at<=0"        -> base.copy(receivedAt = 0L),
      "processed<=received"   -> base.copy(processedAt = 1000L),
      "unknown os"            -> base.copy(os = "windows"),
      "bad uuid"              -> base.copy(ifa = "v"),
      "blank bundle"          -> base.copy(bundle = "  "),
      "blank country"         -> base.copy(country = ""),
      "blank region"          -> base.copy(region = " \t"))
    invalid.foreach { case (name, log) =>
      assert(!survives(log), s"rule: $name must invalidate")
    }
  }

  test("os matching is case-insensitive; non-BID with price 0 is valid") {
    assert(survives(base.copy(os = "IoS")))
    assert(survives(base.copy(os = "ANDROID")))
    assert(survives(base.copy(bidResult = 2, bidPrice = 0)))
  }

  test("UUID validity has exact java.util.UUID laxity") {
    // JDK accepts short dash-separated hex groups
    assert(survives(base.copy(ifa = "1-1-1-1-1")))
    // and rejects these
    Seq("v", "", "0104f2d09283-4c26-bd80-d12db87fe33c", "g104f2d0-9283-4c26-bd80-d12db87fe33c")
      .foreach(u => assert(!survives(base.copy(ifa = u)), s"uuid '$u'"))
  }
}
