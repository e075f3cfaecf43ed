package graft

import graft.jobs.Jobs
import graft.sources.TfRecordSource
import org.scalatest.funsuite.AnyFunSuite

/** Full two-job loop on golden corpus 07, through the real file
  * formats: TFRecord.gz in → Base64 text between jobs → JSON/table
  * out (the exact interchange topology of the reference). */
class JobsSpec extends AnyFunSuite with SparkSpec {

  test("bidLogJob → predictionJob end-to-end over files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jobs").toString

    // stage corpus 07 as tfrecord.gz input
    val in = getClass.getResourceAsStream("/golden/test07.bidlogs.txt")
    val logs = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map(java.util.Base64.getDecoder.decode).toSeq
    finally in.close()
    new java.io.File(s"$tmp/input").mkdirs()
    TfRecordSource.writeLocal(logs, new java.io.File(s"$tmp/input/bidlog-0.tfrecord.gz"), gzip = true)

    Jobs.runBidLogJob(spark, s"$tmp/input/bidlog-*", s"$tmp/out1")
    val dpLines = spark.read.textFile(s"$tmp/out1/device-profile").count()
    val apLines = spark.read.textFile(s"$tmp/out1/app-profile").count()
    val suspLines = spark.read.textFile(s"$tmp/out1/suspicious-user")
    assert(dpLines == 4 && apLines == 8 && suspLines.count() == 0) // golden 07

    // stage a small iapp side input (Base64 lines)
    import spark.implicits._
    val iapp = Seq(graft.io.AdtechProtos.IappRec("app.1234", 5L, 1000L))
      .map(r => graft.io.ProtoWriter.toBase64(graft.io.ProtoWriter.encodeIapp(r)))
    new java.io.File(s"$tmp/iapp").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/iapp/iapp.txt"),
      iapp.mkString("\n").getBytes("UTF-8"))

    Jobs.runPredictionJob(spark, s"$tmp/out1/device-profile",
      s"$tmp/out1/suspicious-user", s"$tmp/iapp", s"$tmp/out2")

    // corpus 07 uuids: only 0104F2D0-... has uuid[7]=='0' → 1 prediction
    val js = spark.read.textFile(s"$tmp/out2/prediction-json").collect()
    assert(js.length == 1)
    assert(js.head.contains(""""os":"IOS""""))
    assert(js.head.contains("0104F2D0-9283-4C26-BD80-D12DB87FE33C"))
    val tbl = spark.read.parquet(s"$tmp/out2/prediction-table").collect()
    assert(tbl.length == 1 && tbl.head.getString(0) == "IOS")
  }
}
