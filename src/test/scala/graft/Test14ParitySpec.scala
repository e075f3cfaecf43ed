package graft

import graft.io.AdtechProtos
import graft.ops.PredictionPipeline
import org.scalatest.funsuite.AnyFunSuite

/** Job-2 front-half golden parity: the reference's __Test14
  * `testInputToModel01` fixtures (7 Base64 DeviceProfiles, 3
  * suspicious ids, empty IAPP) → exactly the 4 expected surviving
  * devices, each carrying its base image at all non-overwritten
  * feature indices (`__Test14PredictionJob.java:108-160`). */
class Test14ParitySpec extends AnyFunSuite with SparkSpec {

  private def lines(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  test("__Test14 input-to-model: anti-join + sample select exactly the 4 expected devices") {
    import spark.implicits._
    val out = PredictionPipeline.inputToModel(
      PredictionPipeline.decodeDeviceProfiles(lines("test14.dp.txt").toDS()),
      PredictionPipeline.decodeSuspicious(lines("test14.susp.txt").toDS()),
      PredictionPipeline.decodeIapp(spark.emptyDataset[String]))
    val got = out.select("os", "uuid", "features")
      .as[(Int, String, Array[Float])].collect()

    val expected = lines("test14.expected_ids.txt")
      .map(s => AdtechProtos.decodeDeviceId(java.util.Base64.getDecoder.decode(s)))
      .map(id => (id.os, id.uuid.toLowerCase)).toSet
    assert(got.map(r => (r._1, r._2.toLowerCase)).toSet == expected)
    assert(got.length == 4)

    // every non-overwritten index equals the device's base image
    val overwritten = Set(486, 686, 586, 777) ++ (100 to 700 by 40)
    got.foreach { case (_, uuid, f) =>
      assert(f.length == 784)
      val base = PredictionPipeline.baseImages(uuid.toUpperCase.charAt(0) % 15)
      (0 until 784).filterNot(overwritten).foreach { i =>
        assert(f(i) == base(i), s"uuid=$uuid index=$i")
      }
    }
  }
}
