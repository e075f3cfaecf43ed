package graft

import graft.io.AdtechProtos._
import graft.ops.PredictionPipeline
import org.scalatest.funsuite.AnyFunSuite

/** Parity tests for pipeline #2 pieces, mirroring the reference's
  * judge oracles:
  *  - M1 feature formula: the three __Test11PredictionUtils cases
  *    (expected values from `__Test11PredictionUtils.java:38-127`).
  *  - F6 sampling, J2 anti-join, F4 default-drop, J4 duplicate abort
  *    through the composite (semantics of `__Test13PredictionJob`).
  */
class PredictionParitySpec extends AnyFunSuite with SparkSpec {

  private val Eps = 1e-4f
  private val Uuid1 = "3721afb0-22de-408b-b97d-cb6ca8953cc9"
  private val B = Seq("edu.usfca.cs.app1", "edu.usfca.cs.app2", "id12341234",
    "id98769876", "edu.usfca.cs.app")

  private def app(bundle: String, exch: Int) =
    AppActivity(bundle, 1234L, 1234L, Map(exch -> 1))
  private def dp(os: Int, uuid: String, apps: Seq[AppActivity]) =
    DeviceProfileRec(os, uuid, apps, 1234L, 1234L, Seq(GeoActivity("US", "CA")))

  private val iapp3 = Map(
    B(0) -> IappRec(B(0), 12L, 1000L),
    B(2) -> IappRec(B(2), 6L, 5000L),
    B(3) -> IappRec(B(3), 1L, 3000L))

  test("M1 features: __Test11 case 1 (4 bundles, 3-entry iapp)") {
    val d = dp(1, Uuid1, Seq(app(B(0), 22), app(B(1), 21), app(B(2), 1), app(B(4), 1)))
    val f = PredictionPipeline.getInputFeatures(d, iapp3)
    assert(f.length == 784)
    assert(math.abs(f(486) - 0.5f) < Eps)
    assert(math.abs(f(686) - 0.4f) < Eps)
    assert(math.abs(f(586) - 0.9f) < Eps)
    assert(math.abs(f(777) - 0.666592601f) < Eps)
  }

  test("M1 features: __Test11 case 2 (3 bundles)") {
    val d = dp(2, Uuid1, Seq(app(B(1), 22), app(B(2), 21), app(B(3), 1)))
    val f = PredictionPipeline.getInputFeatures(d, iapp3)
    assert(math.abs(f(486) - 0.5f) < Eps)
    assert(math.abs(f(686) - 0.5f) < Eps)
    assert(math.abs(f(586) - 0.35f) < Eps)
    assert(math.abs(f(777) - 0.888790134f) < Eps)
  }

  test("M1 features: __Test11 case 3 (empty iapp → zeros)") {
    val d = dp(1, Uuid1, Seq(app(B(1), 22), app(B(2), 21), app(B(3), 1)))
    val f = PredictionPipeline.getInputFeatures(d, Map.empty)
    assert(f.length == 784)
    assert(f(486) == 0f && f(686) == 0f && f(586) == 0f && f(777) == 0f)
  }

  test("M1 base image + modulo features: clone of upper(uuid)[0]%15 with overwrites") {
    val d = dp(1, Uuid1, Seq(app(B(1), 22)))
    val f = PredictionPipeline.getInputFeatures(d, Map.empty)
    val base = PredictionPipeline.baseImages('3' % 15)
    // untouched indices must equal the base image
    assert(f(0) == base(0) && f(485) == base(485) && f(487) == base(487))
    // f[i] = (first_at % i)/i for i=100,140,...,700
    for (i <- 100 to 700 by 40)
      assert(math.abs(f(i) - (1234L % i).toFloat / i) < 1e-7f, s"index $i")
  }

  test("composite: F4 default-drop + J2 anti-join + F6 sample") {
    import spark.implicits._
    // uuid[7]=='0' passes the sample; UUID1[7]=='0' ✓
    val keep = dp(1, Uuid1.toUpperCase, Seq(app(B(0), 1)))
    val dropSample = dp(1, "b586eaed-6788-4e5e-9084-268170604108".toUpperCase, Seq(app(B(0), 1))) // [7]=='d'
    val suspect = dp(2, "9fce9026-1f71-4edc-a662-cbc5fcf868e4".toUpperCase, Seq(app(B(0), 1))) // [7]=='0' but suspicious
    val dps = spark.createDataset(Seq(keep, dropSample, suspect))
    val susp = spark.createDataset(Seq(DeviceIdRec(2, suspect.uuid)))
    val iapp = spark.createDataset(Seq(IappRec(B(0), 5L, 100L)))
    val out = PredictionPipeline.inputToModel(dps, susp, iapp)
      .selectExpr("uuid", "features[486] as f486").as[(String, Double)].collect().toMap
    assert(out.keySet == Set(Uuid1.toUpperCase))
    assert(math.abs(out(Uuid1.toUpperCase) - 0.5) < 1e-4) // 1 hit / (1+1)
  }

  test("composite: J4 duplicate ids (case-insensitive) abort") {
    import spark.implicits._
    val d1 = dp(2, Uuid1.toUpperCase, Seq(app(B(0), 1)))
    val d2 = dp(2, Uuid1.toLowerCase, Seq(app(B(1), 1)))
    val dps = spark.createDataset(Seq(d1, d2))
    val ex = intercept[IllegalArgumentException] {
      PredictionPipeline.inputToModel(dps,
        spark.emptyDataset[DeviceIdRec], spark.emptyDataset[IappRec])
    }
    assert(ex.getMessage.contains("CorruptedData"))
  }

  test("M2 predict: batch-60 inference, argmax tie-break, deterministic") {
    import spark.implicits._
    val rows = (0 until 130).map { i => // >2 batches
      dp(1, f"${i}%08x-22de-408b-b97d-cb6ca8953cc9".toUpperCase, Seq(app(B(0), 1)))
    }
    val feats = spark.createDataset(rows)
      .map(d => (d.os, d.uuid, PredictionPipeline.getInputFeatures(d, Map.empty)))
      .toDF("os", "uuid", "features")
    val out = PredictionPipeline.predict(feats)
    assert(out.count() == 130)
    val preds = out.selectExpr("prediction").distinct().as[Int].collect()
    assert(preds.forall(p => p >= 0 && p <= 9))
    // deterministic across runs
    val a = out.orderBy("uuid").collect().toSeq
    val b = PredictionPipeline.predict(feats).orderBy("uuid").collect().toSeq
    assert(a == b)
  }
}
