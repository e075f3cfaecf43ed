package graft

import graft.ops.PredictionPipeline
import graft.ops.PredictionPipeline.Scorer
import org.apache.spark.util.LongAccumulator
import org.scalatest.funsuite.AnyFunSuite

/** Instrumented scorer for [[InferencePerfSpec]] — top-level so the
  * closure serializes without dragging the suite along. */
private[graft] class CountingScorer(calls: LongAccumulator, oversize: LongAccumulator)
    extends Scorer {
  def score(batch: Seq[Array[Float]]): Seq[Array[Float]] = {
    calls.add(1)
    if (batch.size > 60) oversize.add(1)
    PredictionPipeline.DeterministicScorer.score(batch)
  }
}

/** Perf-shaped batching guards, mirroring the reference's
  * __Test15/__Test16PredictionJob (the job-2 corpus multiplied ×25 and
  * ×100 under a 10s timeout — their only purpose is to fail if someone
  * de-batches inference into per-element scorer calls,
  * `java/judge/.../jobs2/__Test15PredictionJob.java:44-65`,
  * `__Test16PredictionJob.java:42-55`).
  *
  * The Spark analogue instruments the [[Scorer]] seam with
  * accumulators: over a corpus of n rows in p partitions, grouped(60)
  * batching means exactly Σ⌈rows_p/60⌉ scorer calls and no batch over
  * 60 — a per-element regression shows up as ~n calls. A generous
  * wall-clock bound (vs the reference's 10s) rides along so a
  * catastrophic plan regression (per-row model setup, driver-side
  * loop) also fails even if call counting were bypassed. */
class InferencePerfSpec extends AnyFunSuite with SparkSpec {

  private def corpus(mult: Int) = {
    import spark.implicits._
    // 40 distinct device shapes × mult copies, distinct uuids per copy
    val base = (0 until 40).map { i =>
      (i % 5, f"${('a' + i % 26).toChar}%c0000000-dev-$i%04d",
        Array.tabulate(784)(j => (i * 784 + j) % 255 / 255.0f))
    }
    val rows = for { (os, uuid, f) <- base; m <- 0 until mult }
      yield (os, s"$uuid-$m", f)
    rows.toDF("os", "uuid", "features").repartition(4)
  }

  private def check(mult: Int, budgetSec: Int): Unit = {
    val n = 40 * mult
    val calls = spark.sparkContext.longAccumulator("scorer-calls")
    val oversize = spark.sparkContext.longAccumulator("oversize-batches")
    val t0 = System.nanoTime()
    val out = PredictionPipeline.predict(corpus(mult), new CountingScorer(calls, oversize))
    assert(out.count() === n.toLong)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(oversize.value === 0L, "a scorer batch exceeded BUFFER_MAX_SIZE=60")
    val minCalls = math.ceil(n / 60.0).toLong
    assert(calls.value >= minCalls)
    assert(calls.value <= minCalls + 4, // +1 ragged tail per partition
      s"${calls.value} scorer calls for $n rows — inference de-batched")
    assert(elapsed < budgetSec, f"x$mult inference took $elapsed%.1fs (budget ${budgetSec}s)")
  }

  test("x25 corpus: batched scorer calls, inside the time budget")(check(25, 15))
  test("x100 corpus: batched scorer calls, inside the time budget")(check(100, 15))
}
