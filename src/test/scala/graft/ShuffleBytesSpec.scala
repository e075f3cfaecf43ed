package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.scalatest.funsuite.AnyFunSuite

/** Measured-shuffle guards: PlanShapeSpec asserts what the plan SAYS,
  * this asserts what actually MOVED. A SparkListener totals shuffle
  * write bytes across the stages a query runs; the bucketed q89 must
  * move ZERO shuffle bytes end to end (bucketed writes fan out
  * per-task without an exchange, bucketed reads satisfy every
  * downstream distribution), while q05's repartition+cache path — the
  * in-memory variant of the same computation — demonstrably shuffles.
  * This is the difference the bucketed layout buys at 100 TB, pinned
  * as a number instead of a plan string. */
class ShuffleBytesSpec extends AnyFunSuite with SparkSpec {

  private val sf =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"

  private def shuffleBytesOf(f: => Unit): Long = {
    val bytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      // drain queued listener events before reading the total
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext, 30000L)
    } finally spark.sparkContext.removeSparkListener(listener)
    bytes.get()
  }

  private def shuffleRecordsOf(f: => Unit): Long = {
    val recs = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        recs.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext, 30000L)
    } finally spark.sparkContext.removeSparkListener(listener)
    recs.get()
  }

  private def run(name: String): Unit = {
    assume(new java.io.File(sf).isDirectory)
    QueryRegistry.byName(name).fn(spark, sf).write
      .format("noop").mode("overwrite").save()
  }

  test("q89 bucketed distinct counts move zero shuffle bytes; q05 provably shuffles") {
    val bucketed = shuffleBytesOf(run("q89_bucketed_distinct_counts"))
    assert(bucketed == 0L,
      s"bucketed layout leaked a $bucketed-byte shuffle — co-location lost")
    val cached = shuffleBytesOf(run("q05_distinct_counts"))
    assert(cached > 0L, "q05's repartition path should register shuffle bytes " +
      "(if this fails the listener is broken, making the q89 zero vacuous)")
  }

  test("heavy hitters shuffle records are sketch-bounded, not key-space-bounded") {
    // the HeavyHitters claim as a NUMBER: phase 1 moves one <=k-entry
    // summary per partition, phase 2 moves <=|candidates| partial
    // groups per partition — vs a naive groupBy(token) that shuffles
    // every distinct token each partition saw. At 100 TB the naive
    // exchange is the multi-TB bottleneck; here it's pinned as a
    // record-count ratio so a regression (e.g. the sketch silently
    // falling back to a full shuffle) fails CI.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // synthetic corpus, NOT the documents fixture: its vocabulary is
    // only ~31 distinct words, smaller than any useful k, so it can't
    // distinguish the paths. 50k tokens over 8 partitions — one hot
    // token (~30%), a warm band, and a ~35k-unique tail, the Zipf
    // shape heavy hitters exist for. Deterministic, recomputed per
    // pass (no scan, no cache, no fixture).
    def toks = s.range(0L, 50000L, 1L, 8).select(
      when($"id" % 10 < 3, lit("hot"))
        .when($"id" % 10 === 3, concat(lit("w"), $"id" % 20))
        .otherwise(concat(lit("u"), $"id")).as("tok")).as[String]
    val sketchRecs = shuffleRecordsOf {
      graft.operators.HeavyHitters.exactAbove(toks, theta = 0.01)
        .write.format("noop").mode("overwrite").save()
    }
    val naiveRecs = shuffleRecordsOf {
      toks.groupBy($"tok").count()
        .write.format("noop").mode("overwrite").save()
    }
    assert(naiveRecs > 10000L, // ~35k unique tail reaches the exchange
      s"corpus too small to distinguish the paths (naive=$naiveRecs)")
    assert(sketchRecs < naiveRecs / 10L,
      s"sketch path shuffled $sketchRecs records vs naive $naiveRecs — " +
        "the k-bound is not holding")
    assert(sketchRecs <= 2000L, // partitions × (summary + candidate partials)
      s"sketch path shuffled $sketchRecs records; expected a k-bounded count")
  }
}
