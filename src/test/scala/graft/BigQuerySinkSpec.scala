package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.BigQuerySink

/** [[BigQuerySink]] — the S5 live-connector adapter
  * (TensorFlowScorer pattern): this hermetic environment has no
  * spark-bigquery-connector jar, so the spec pins the availability
  * probe and the graceful-refusal path — a missing connector must
  * fail fast on the driver with instructions, never surface as a
  * ClassNotFoundException from inside a write job. (The row shape
  * itself is shared with `AdtechSinks.writePredictionsTable`, whose
  * schema SinksSpec pins — one shaping function, so the live sink
  * cannot drift from it.) A deployment WITH the connector needs no
  * code change: the probe resolves through Spark's data-source
  * registry, not a version-pinned provider class. */
class BigQuerySinkSpec extends AnyFunSuite with SparkSpec {

  test("no connector on this classpath: available=false, refusal carries instructions") {
    val s = spark
    import s.implicits._
    assert(!BigQuerySink.available(spark),
      "this environment must not resolve a 'bigquery' data source")
    val preds = Seq((1, "u1", 3, 0.5f)).toDF("os", "uuid", "prediction", "score")
    val e = intercept[IllegalArgumentException] {
      BigQuerySink.writePredictionsBigQuery(preds, "proj.ds.predictions")
    }
    assert(e.getMessage.contains("spark-bigquery-connector") &&
      e.getMessage.contains("writePredictionsTable"),
      s"refusal must name the jar and the off-GCP stand-in: ${e.getMessage}")
  }
}
