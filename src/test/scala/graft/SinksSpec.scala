package graft

import graft.io.{AdtechProtos, AdtechSinks}
import graft.ops.{AdtechPipeline, PredictionPipeline}
import org.scalatest.funsuite.AnyFunSuite

/** Sink round-trips: job-1 outputs written in the reference's Base64
  * interchange format must decode back to the same profiles (the S3→S2
  * loop the reference runs between its two jobs), and the JSON/table
  * sinks must carry the documented shapes. */
class SinksSpec extends AnyFunSuite with SparkSpec {

  private def lines(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  test("job-1 outputs round-trip through the Base64 text sinks into job-2's sources") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val (dps, aps, susp) = AdtechPipeline.bidLogJob(lines("test08.bidlogs.txt").toDS())
    AdtechSinks.writeDeviceProfilesBase64(dps, s"$tmp/dp")
    AdtechSinks.writeAppProfilesBase64(aps, s"$tmp/ap")
    AdtechSinks.writeSuspiciousBase64(susp, s"$tmp/susp")

    // Re-read through the job-2 source path (S2 decode)
    val dps2 = PredictionPipeline.decodeDeviceProfiles(spark.read.textFile(s"$tmp/dp"))
    assert(dps2.count() == 7)
    val orig = dps.as[AdtechProtos.DeviceProfileRec].collect()
      .map(r => r.copy(app = r.app.sortBy(_.bundle), geo = r.geo.sortBy(g => (g.country, g.region)))).toSet
    val rt = dps2.collect()
      .map(r => r.copy(app = r.app.sortBy(_.bundle), geo = r.geo.sortBy(g => (g.country, g.region)))).toSet
    assert(rt == orig)

    val susp2 = PredictionPipeline.decodeSuspicious(spark.read.textFile(s"$tmp/susp"))
    assert(susp2.count() == 3)

    // single shard, .txt-style one-line-per-proto
    val files = new java.io.File(s"$tmp/dp").listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length == 1)
  }

  test("prediction JSON sink writes canonical compact proto-JSON") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-json").toString
    val preds = Seq((2, "3721AFB0-22DE-408B-B97D-CB6CA8953CC9", 7, 0.5)).toDF("os", "uuid", "prediction", "score")
    AdtechSinks.writePredictionsJson(preds, s"$tmp/js")
    val line = spark.read.textFile(s"$tmp/js").collect().head
    assert(line == """{"id":{"os":"IOS","uuid":"3721AFB0-22DE-408B-B97D-CB6CA8953CC9"},"prediction":7,"score":0.5}""")
  }

  test("prediction table sink carries the BigQuery schema shape") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tbl").toString
    val preds = Seq((1, "U", 3, 0.25)).toDF("os", "uuid", "prediction", "score")
    AdtechSinks.writePredictionsTable(preds, s"$tmp/t")
    val back = spark.read.parquet(s"$tmp/t")
    assert(back.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("os", "string"), ("uuid", "string"), ("prediction", "integer"), ("score", "float")))
    assert(back.collect().head.getString(0) == "ANDROID")
  }
  test("ShardWriter: balanced shards, nothing lost, manifest matches disk") {
    import spark.implicits._
    val n = 5000
    val df = (1 to n).map(i => (i.toLong, s"doc body $i")).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val shards = 8
    val manifest = graft.io.ShardWriter.writeSharded(df, out, shards, "doc_id")
      .as[(Int, Long)].collect().toMap
    assert(manifest.keySet == (0 until shards).toSet)
    assert(manifest.values.sum == n.toLong, "rows lost or duplicated")
    val expect = n.toDouble / shards
    manifest.values.foreach { c =>
      assert(math.abs(c - expect) < expect * 0.25, s"shard imbalance: $manifest")
    }
    // round-trip: content preserved
    val back = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(back == (1 to n).map(_.toLong).toSet)
  }
  test("Compactor: collapses a many-file directory, preserves content") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (1 to 2000).map(i => (i.toLong, s"row $i")).toDF("id", "payload")
    df.repartition(64).write.parquet(out) // 64 tiny files
    val (before, after) = graft.io.Compactor.compact(spark, out, targetFileBytes = 64L * 1024 * 1024)
    assert(before == 64)
    assert(after < before && after >= 1, s"$before -> $after")
    val back = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(back == (1 to 2000).map(i => (i.toLong, s"row $i")).toSet, "content changed")
    // a completed compaction leaves an audit manifest in the directory
    // (underscore-prefixed: invisible to parquet reads, like _SUCCESS)
    val mf = new java.io.File(out, "_compaction_manifest.json")
    assert(mf.isFile, "compaction must leave _compaction_manifest.json")
    val mjson = new String(java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
    assert(mjson.contains("\"files_before\":64"))
    assert(mjson.contains(s""""files_after":$after"""))
    assert(mjson.contains("\"bytes\":") && mjson.contains("\"compacted_at_ms\":"))
    // idempotent: already-compact directory is untouched
    val (b2, a2) = graft.io.Compactor.compact(spark, out)
    assert(b2 == a2)
  }
}
