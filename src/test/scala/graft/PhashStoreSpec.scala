package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ByteGridHashImpl
import graft.operators.DedupStore

/** [[DedupStore.ingestPhash]] — day-over-day multimodal near-dedup:
  * an archived payload's byte-twin arriving on a later day dies
  * against the 16-byte/payload signature store; intra-day twins
  * collapse to the min id; tiny (<64 B) payloads pass through
  * unsuppressed; committed-day re-runs are idempotent (the store
  * protocol's self-exclusion); compaction folds the sigs table like
  * any other store table without changing suppression. */
class PhashStoreSpec extends AnyFunSuite with SparkSpec {

  private val rnd = new scala.util.Random(47)
  private def blob(): Array[Byte] = Array.fill(4096)(rnd.nextInt().toByte)
  private def twin(b: Array[Byte]): Array[Byte] = {
    val t = b.clone()
    t(500) = (t(500) ^ 0x31).toByte
    t(501) = (t(501) ^ 0x52).toByte
    t
  }

  private def payloads(rows: (Long, Array[Byte])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "payload")
  }

  private def ids(df: DataFrame): Set[Long] = {
    val s = spark
    import s.implicits._
    df.select($"doc_id").as[Long].collect().toSet
  }

  test("cross-day byte-twins suppressed, intra-day min-id wins, tiny payloads pass") {
    val a = blob(); val b = blob(); val c = blob()
    // sanity: twins sit inside the banding's exact-recall radius
    assert(ByteGridHashImpl.hamming(
      ByteGridHashImpl.compute(a), ByteGridHashImpl.compute(twin(a))) <= 6)

    val root = Files.createTempDirectory("phs").toString
    val d1 = ids(DedupStore.ingestPhash(
      payloads(1L -> a, 2L -> b), root, "2024-06-01"))
    assert(d1 === Set(1L, 2L))

    val day2 = payloads(
      10L -> twin(a),          // near-twin of archived 1 → suppressed
      11L -> c,                // fresh → survives
      13L -> twin(c),          // intra-day twin of 11... ids: 11 < 13 → 13 suppressed
      14L -> Array.fill(10)(7.toByte)) // tiny: no signature, passes
    val d2 = ids(DedupStore.ingestPhash(day2, root, "2024-06-02"))
    assert(d2 === Set(11L, 14L), s"got $d2")

    // idempotent re-run of the committed day: identical survivors
    val d2again = ids(DedupStore.ingestPhash(day2, root, "2024-06-02"))
    assert(d2again === d2, "re-run self-suppressed against its own sigs")

    // day 3: twin of the day-2 SURVIVOR 11 dies; twin of the day-2
    // SUPPRESSED 13 also dies (13's canonical 11 is committed, and
    // twin(c) is within radius of c's signature)
    val d3 = ids(DedupStore.ingestPhash(
      payloads(20L -> twin(c), 21L -> blob()), root, "2024-06-03"))
    assert(d3 === Set(21L))

    // compaction folds the sigs table; suppression unchanged
    val r = DedupStore.compact(spark, root, keepDays = 1)
    assert(r.mergedDay.isDefined)
    val d4 = ids(DedupStore.ingestPhash(
      payloads(30L -> twin(b), 31L -> blob()), root, "2024-06-04"))
    assert(d4 === Set(31L), "compacted sig store lost archived signatures")
  }

  test("runPayloadStream: micro-batches dedup against the sig store; committed exports audit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("phs-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("phs-sck").toString
    val a = blob(); val b = blob()
    val in = MemoryStream[(Long, Array[Byte])]
    val q = graft.jobs.IncrementalCurationJob.runPayloadStream(
      in.toDF().toDF("doc_id", "payload"), root, ckpt)
    try {
      in.addData((1L, a), (2L, b))
      q.processAllAvailable() // batch 0: both fresh
      in.addData((10L, twin(a)), (11L, blob()))
      q.processAllAvailable() // batch 1: 10 dies vs streamed 1
    } finally q.stop()
    def dayIds(day: String): Set[Long] =
      graft.sources.PayloadRecords.readCommitted(spark, s"$root/out/dt=$day")
        .select($"doc_id").as[Long].collect().toSet
    assert(dayIds("batch-000000000") === Set(1L, 2L))
    assert(dayIds("batch-000000001") === Set(11L),
      "archived payload's byte-twin must die against the stream's sig store")
    // the export manifests carry the payload accounting end-to-end
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$root/out/dt=batch-000000001/_manifest.json")))
  }

  test("streaming auto-compaction bounds store files over a 50-micro-batch feed") {
    // one committed store day per micro-batch is the engine's fastest
    // small-files accumulator; the round-11 every-N-batches trigger
    // must bound both the day count and the data-file count while
    // keepDays recent batch-days stay day-partitioned (the replay
    // window) — and must not change suppression semantics
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("phs-cad").toString
    val ckpt = java.nio.file.Files.createTempDirectory("phs-cadck").toString
    val first = blob()
    val in = MemoryStream[(Long, Array[Byte])]
    val q = graft.jobs.IncrementalCurationJob.runPayloadStream(
      in.toDF().toDF("doc_id", "payload"), root, ckpt,
      compactEvery = 10, keepDays = 3)
    try {
      (0 until 50).foreach { i =>
        // batch 0's payload re-served in the LAST batch: suppression
        // must reach across every compaction epoch
        val p = if (i == 0) first else if (i == 49) twin(first) else blob()
        in.addData((i.toLong * 10) -> p)
        q.processAllAvailable()
      }
    } finally q.stop()
    val phashRoot = s"$root/phash"
    val days = DedupStore.committedDays(spark, phashRoot)
    // 5 compaction triggers ran (batches 10, 20, 30, 40, 50-1 → ids
    // 9, 19, 29, 39, 49); between triggers ≤ 10 new batch-days
    // accumulate, the tier holds ≤ maxMergedParts merged partitions
    assert(days.size <= 3 + 10 + 4,
      s"day count unbounded under streaming cadence: ${days.size} ($days)")
    assert(days.size < 25 && DedupStore.committedFileCount(spark, phashRoot) < 40,
      s"file count unbounded: ${DedupStore.committedFileCount(spark, phashRoot)}")
    // the batch-49 twin of the batch-0 payload died against the
    // (by now thrice-compacted) archive
    val sigDocs = spark.read.parquet(s"$phashRoot/sigs")
      .select($"doc_id").as[Long].collect().toSet
    assert(!sigDocs.contains(490L),
      "re-served payload survived — compaction lost archived signatures")
    assert(sigDocs.contains(0L) && sigDocs.size === 49, s"${sigDocs.size}")
  }

  test("banding radius is enforced: a looser threshold than pigeonhole-exact is rejected") {
    val root = Files.createTempDirectory("phs-r").toString
    val e = intercept[IllegalArgumentException] {
      DedupStore.ingestPhash(payloads(1L -> blob()), root, "2024-06-01",
        maxHamming = 12)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }
}
