package graft

import org.scalatest.funsuite.AnyFunSuite

/** Day-zero totality: EVERY registry query must be total on an empty
  * corpus. At 100 TB this is not a corner case — first-day runs,
  * empty deltas, fully-filtered partitions and dried-up upstream
  * feeds all present every operator with zero-row inputs, and a
  * driver-side `.head`/`.max`-style assumption that "some row exists"
  * turns a routine empty batch into a 3 a.m. page.
  *
  * The fixture writes `limit(0)` versions of all ten tables (schemas
  * preserved — parquet carries the schema even for zero rows; the
  * events table is rewritten through the same nanos-as-long path
  * [[Tables.events]] uses) and runs all 100 `SparkEntry.queries`
  * against them, asserting each plans and executes without throwing.
  * Row counts are NOT asserted — a query MAY legitimately emit rows
  * from an empty corpus (e.g. a global aggregate's single null row);
  * the contract under test is totality, not emptiness.
  *
  * The batch-incremental operators get the same treatment from the
  * other side: an empty DELTA against a populated store
  * ([[graft.operators.IncrementalNearDedup.survivors]],
  * [[graft.operators.BloomAntiJoin]]'s empty-left case) and the
  * composed [[graft.jobs.CurationJob]] over an empty corpus.
  */
class EmptyCorpusSpec extends AnyFunSuite with SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val src = "/root/testdata/sf0.001"
    // events.parquet is TIMESTAMP(NANOS); read raw nanos exactly like
    // Tables.events does, so the rewrite round-trips through the same
    // code path the queries use.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { n =>
      spark.read.parquet(s"$src/$n.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("all registry queries are total on an empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        try { q(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("CurationJob.curate is total on an empty corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val bench = Seq("the benchmark eval question text").toDF("text")
    val r = graft.jobs.CurationJob.curate(docs, bench)
    assert(r.curated.count() === 0L)
  }

  test("IncrementalNearDedup: empty delta against a populated store survives nothing, throws nothing") {
    val s = spark
    import s.implicits._
    val store = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val delta = store.limit(0)
    val out = graft.operators.IncrementalNearDedup.survivors(
      delta,
      graft.operators.IncrementalNearDedup.bandTable(store),
      graft.operators.IncrementalNearDedup.shingleSets(store))
    assert(out.count() === 0L)
  }
}
