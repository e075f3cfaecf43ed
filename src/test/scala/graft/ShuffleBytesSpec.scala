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
}
