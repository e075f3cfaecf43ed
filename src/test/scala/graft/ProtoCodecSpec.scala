package graft

import graft.io.{AdtechProtos, ProtoWriter}
import graft.io.AdtechProtos._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Codec properties: decode∘encode = id over ScalaCheck-generated
  * records (fixed seed — deterministic), plus golden-fixture
  * round-trips. */
class ProtoCodecSpec extends AnyFunSuite {

  /** 100 deterministic samples of a generator. */
  private def samples[T](g: Gen[T]): Seq[T] =
    (0 until 100).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val genGeo = for {
    c <- Gen.alphaNumStr.map(_.take(8)); r <- Gen.alphaNumStr.map(_.take(8))
  } yield GeoActivity(c, r)

  private val genApp = for {
    b <- Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
    f <- Gen.chooseNum(1L, 1L << 40); l <- Gen.chooseNum(1L, 1L << 40)
    cpe <- Gen.mapOf(Gen.zip(Gen.chooseNum(1, 22), Gen.chooseNum(1, 1000)))
  } yield AppActivity(b, f, math.max(f, l), cpe)

  private val genDp = for {
    os <- Gen.oneOf(1, 2)
    uuid <- Gen.uuid.map(_.toString.toUpperCase)
    apps <- Gen.listOfN(3, genApp).map(_.distinctBy(_.bundle))
    f <- Gen.chooseNum(1L, 1L << 40); l <- Gen.chooseNum(1L, 1L << 40)
    geos <- Gen.listOfN(2, genGeo).map(_.distinct)
  } yield DeviceProfileRec(os, uuid, apps, f, math.max(f, l), geos)

  test("DeviceProfile: decode(encode(x)) == x") {
    samples(genDp).foreach { dp =>
      assert(AdtechProtos.decodeDeviceProfile(ProtoWriter.encodeDeviceProfile(dp)) == dp)
    }
  }

  test("AppProfile: decode(encode(x)) == x") {
    val genAp = for {
      b <- Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
      uc <- Gen.chooseNum(1, 100000)
      cpe <- Gen.mapOf(Gen.zip(Gen.chooseNum(1, 22), Gen.chooseNum(1, 100000)))
    } yield AppProfileRec(b, uc, cpe)
    samples(genAp).foreach { ap =>
      assert(AdtechProtos.decodeAppProfile(ProtoWriter.encodeAppProfile(ap)) == ap)
    }
  }

  test("DeviceId / Iapp: round-trip") {
    samples(Gen.zip(Gen.oneOf(1, 2), Gen.uuid)).foreach { case (os, u) =>
      val id = DeviceIdRec(os, u.toString)
      assert(AdtechProtos.decodeDeviceId(ProtoWriter.encodeDeviceId(id)) == id)
    }
    samples(Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.posNum[Long], Gen.posNum[Long]))
      .foreach { case (b, np, ta) =>
        val r = IappRec(b, np, ta)
        assert(AdtechProtos.decodeIapp(ProtoWriter.encodeIapp(r)) == r)
      }
  }

  test("golden fixtures survive decode→encode→decode") {
    val in = getClass.getResourceAsStream("/golden/test08.dp.txt")
    val fixtures = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    fixtures.foreach { b64 =>
      val dec = AdtechProtos.decodeDeviceProfile(java.util.Base64.getDecoder.decode(b64))
      val rt = AdtechProtos.decodeDeviceProfile(ProtoWriter.encodeDeviceProfile(dec))
      assert(rt == dec)
    }
  }
}
